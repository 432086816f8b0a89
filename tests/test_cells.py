"""Kernel invariants — vectorized ports of the reference's TestCellId family
(SURVEY.md §5: test_inverses, test_tokens, parent/child, continuity,
neighbor suites), fixed seeds."""

import numpy as np
import pytest

from s2sphere_ray import cells as ck
from s2sphere_ray import geometry as g

RNG = np.random.default_rng(42)
LAT = RNG.uniform(-89.9, 89.9, 5000)
LNG = RNG.uniform(-180.0, 180.0, 5000)
IDS = ck.cell_id_from_latlng(LAT, LNG)


def test_known_values():
    # Publicly known S2 tokens (verifiable against any S2 implementation).
    ids = ck.cell_id_from_latlng(
        np.array([0.0, 48.8584, 40.7486, -33.8568]),
        np.array([0.0, 2.2945, -73.9857, 151.2153]),
    )
    toks = ck.token_from_cell_id(ids)
    assert toks[0] == "1000000000000001"
    assert toks[1] == "47e66fe1f36a36a5"
    assert toks[2].startswith("89c259")
    assert toks[3].startswith("6b12")


def test_validity_and_leaf():
    assert ck.is_valid(IDS).all()
    assert ck.is_leaf(IDS).all()
    assert (ck.level(IDS) == 30).all()
    assert (ck.face(IDS) < 6).all()


def test_inverses_leaf_roundtrip():
    lat2, lng2 = ck.cell_id_to_latlng(IDS)
    ids2 = ck.cell_id_from_latlng(lat2, lng2)
    assert (IDS == ids2).all()
    # decode error bounded by half a leaf diagonal (~1e-8 deg * few)
    assert np.abs(lat2 - LAT).max() < 1e-6
    # lng error grows as 1/cos(lat) toward the poles
    dlng = np.abs(lng2 - LNG)
    dlng = np.minimum(dlng, 360 - dlng)
    assert (dlng * np.cos(np.deg2rad(LAT))).max() < 1e-6


def test_token_roundtrip():
    toks = ck.token_from_cell_id(IDS[:2000])
    back = ck.token_to_cell_id_array(toks)
    assert (back == IDS[:2000]).all()
    for lvl in (0, 7, 15, 23):
        p = ck.parent(IDS[:500], lvl)
        toks = ck.token_from_cell_id(p)
        assert (ck.token_to_cell_id_array(toks) == p).all()
        assert all(len(t) <= 16 and not t.endswith("0") for t in toks)


def test_parent_child_relationships():
    for lvl in (0, 5, 12, 29):
        p = ck.parent(IDS, lvl)
        assert (ck.level(p) == lvl).all()
        assert (ck.range_min(p) <= IDS).all()
        assert (IDS <= ck.range_max(p)).all()
        assert ck.contains(p, IDS).all()
        if lvl > 0:
            gp = ck.parent(IDS, lvl - 1)
            assert ck.contains(gp, p).all()
    # child arithmetic: children partition the parent range
    p10 = np.unique(ck.parent(IDS[:100], 10))
    for pos in range(4):
        c = ck.child(p10, pos)
        assert (ck.level(c) == 11).all()
        assert ck.contains(p10, c).all()


def test_scalar_vector_parity():
    for k in range(0, 5000, 97):
        cid = g.CellId.from_latlng(g.LatLng.from_degrees(LAT[k], LNG[k]))
        assert cid.id == int(IDS[k])
        assert cid.to_token() == ck.token_from_cell_id(IDS[k : k + 1])[0]


def test_hilbert_continuity():
    # advance(1) at level L yields a spatially adjacent cell (center distance
    # ≤ 2 cell diagonals) — reference test_continuity.
    for lvl in (5, 10):
        p = np.unique(ck.parent(IDS[:1000], lvl))
        nxt = ck.advance(p, 1)
        valid = ck.is_valid(nxt) & (ck.face(nxt) < 6)
        lat1, lng1 = ck.cell_id_to_latlng(p[valid])
        lat2, lng2 = ck.cell_id_to_latlng(nxt[valid])
        d = ck.haversine_rad(lat1, lng1, lat2, lng2)
        max_diag = g.MAX_DIAG.get_value(lvl)
        assert (d <= 2 * max_diag).all()


def test_edge_neighbors_symmetry_and_level():
    p = np.unique(ck.parent(IDS[:1500], 9))
    nb = ck.edge_neighbors(p)
    assert (ck.level(nb.reshape(-1)) == 9).all()
    for k in range(4):
        back = ck.edge_neighbors(nb[:, k])
        assert np.all(np.any(back == p[:, None], axis=1))


def test_all_neighbors_matches_scalar():
    p = np.unique(ck.parent(IDS[:300], 8))
    an = ck.all_neighbors(p)
    for k in range(0, len(p), 13):
        scalar = sorted(set(c.id for c in g.CellId(int(p[k])).get_all_neighbors(8)))
        assert scalar == sorted(set(int(x) for x in an[k]))


def test_vertex_neighbors_scalar():
    # 3–4 neighbors sharing the closest vertex, all at requested level.
    for k in range(0, 200, 29):
        cid = g.CellId(int(IDS[k]))
        for lvl in (5, 12):
            vns = cid.get_vertex_neighbors(lvl)
            assert 3 <= len(vns) <= 4
            assert all(v.level() == lvl for v in vns)
            assert any(v.contains(cid) for v in vns)


def test_poles_and_dateline():
    ids = ck.cell_id_from_latlng(
        np.array([90.0, -90.0, 0.0, 0.0]), np.array([0.0, 0.0, 180.0, -180.0])
    )
    assert ck.is_valid(ids).all()
    # ±180° land on adjacent leaves straddling the meridian (sin(±π) = ∓ε),
    # matching the reference's unnormalized LatLng semantics: same face.
    assert int(ck.face(ids[2:3])[0]) == int(ck.face(ids[3:4])[0]) == 3


def test_wrapping_advance():
    # advance from last cell of face 5 wraps (invalid) — prev of first is too;
    # interior advances stay valid.
    first_face0 = g.CellId.from_face_pos_level(0, 0, 10)
    import numpy as np

    arr = np.array([first_face0.id], dtype=np.uint64)
    assert ck.is_valid(ck.advance(arr, 1)).all()


def test_empty_batch():
    empty = ck.cell_id_from_latlng(np.array([]), np.array([]))
    assert empty.shape == (0,)
    assert ck.token_from_cell_id(empty) == []


def test_face_centers_and_corners():
    # Face center directions map to the 6 face cells; corner-adjacent
    # points (u,v → ±1) stay valid and round-trip (FIXTURES.md §2 edge rows).
    centers = np.array(
        [
            [1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
            [-1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0],
        ]
    )
    ids = ck.cell_id_from_point(centers[:, 0], centers[:, 1], centers[:, 2])
    assert ck.is_valid(ids).all()
    assert (ck.face(ids) == np.arange(6)).all()
    eps = 1e-12
    for face_idx in range(6):
        for u in (-1.0 + eps, 0.0, 1.0 - eps):
            for v in (-1.0 + eps, 0.0, 1.0 - eps):
                x, y, z = ck.face_uv_to_xyz(np.array([face_idx]), np.array([u]), np.array([v]))
                n = np.sqrt(x * x + y * y + z * z)
                cid = ck.cell_id_from_point(x / n, y / n, z / n)
                assert ck.is_valid(cid).all()
                assert int(ck.face(cid)[0]) == face_idx
                lat2, lng2 = ck.cell_id_to_latlng(cid)
                cid2 = ck.cell_id_from_latlng(lat2, lng2)
                assert int(cid2[0]) == int(cid[0])


def test_coverage_half_leaf_diag():
    # Reference test_coverage: every point is within half a leaf diagonal
    # of its cell's center.
    lat2, lng2 = ck.cell_id_to_latlng(IDS[:2000])
    d = ck.haversine_rad(LAT[:2000], LNG[:2000], lat2, lng2)
    assert d.max() <= 0.5 * g.MAX_DIAG.get_value(30) * (1 + 1e-9)


def test_vertex_neighbors_vectorized_matches_scalar():
    """cells.vertex_neighbors ≡ geometry.CellId.get_vertex_neighbors
    (order-free, sentinel-0 dropped), incl. face-edge/corner cells."""
    extra = ck.cell_id_from_latlng(
        np.array([45.0, -45.0, 0.0, 35.26, -35.26]),
        np.array([0.0, 90.0, 45.0, 45.0, -135.0]),
    )
    ids = np.concatenate([IDS[:200], extra])
    for lvl in (4, 9, 15):
        p = np.unique(ck.parent(ids, lvl + 3))
        vn = ck.vertex_neighbors(p, lvl)
        assert vn.shape == (len(p), 4)
        for k in range(0, len(p), 7):
            scalar = sorted(
                c.id for c in g.CellId(int(p[k])).get_vertex_neighbors(lvl)
            )
            got = sorted(int(x) for x in vn[k] if int(x) != 0)
            assert scalar == got, (k, lvl)


def test_neighbors_expand_vertex_kind():
    import pyarrow as pa

    from s2sphere_ray.stages.encode import neighbors_expand

    p = np.unique(ck.parent(IDS[:64], 10))
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(len(p), dtype=np.int64)),
            "cell_id": pa.array(p, pa.uint64()),
        }
    )
    out = neighbors_expand(batch, kind="vertex", nbr_level=7)
    assert set(out.column_names) == {"doc_id", "cell_id", "neighbor_id"}
    nb = out["neighbor_id"].to_numpy()
    assert (nb != 0).all()
    by_doc = {}
    for d, v in zip(out["doc_id"].to_numpy(), nb):
        by_doc.setdefault(int(d), []).append(int(v))
    for r, cid in enumerate(p):
        exp = sorted(
            c.id for c in g.CellId(int(cid)).get_vertex_neighbors(7)
        )
        assert sorted(by_doc[r]) == exp


def test_token_array_matches_list_encode():
    """token_array_from_cell_id is buffer-identical to the list encode."""
    import pyarrow as pa

    rng = np.random.default_rng(5)
    ids = rng.integers(0, 2**63, 5000, dtype=np.int64).view(np.uint64)
    ids[::7] |= np.uint64(1)          # leaf cells
    ids[::11] = np.uint64(0)          # "X" convention
    ids[::13] &= ~np.uint64(0xFFFF)   # deep trailing zeros
    arr = ck.token_array_from_cell_id(ids)
    assert arr.to_pylist() == ck.token_from_cell_id(ids)
    assert arr.type == pa.string()


def test_token_decode_rejects_malformed():
    import pytest

    with pytest.raises(ValueError, match="non-hex"):
        ck.token_to_cell_id_array(["zz", "4"])
    with pytest.raises(ValueError, match="longer than 16"):
        ck.token_to_cell_id_array(["89c2500000000000f", "4"])
