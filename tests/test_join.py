"""Spatial join: all strategies equal brute force, skew split preserved,
candidate generation duplicate-free."""

import numpy as np
import pyarrow as pa
import pytest

from s2sphere_ray import regions as R
from s2sphere_ray import cells as ck
from s2sphere_ray.pages import geocode_from_doc_id
from s2sphere_ray.stages import join as J

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def setup():
    regions = R.regions_from_sf_dir(SF)
    doc_id = np.arange(1500, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    expected = set()
    for row in regions.to_pylist():
        m = J.refine_mask(lat, lng, row)
        for d in doc_id[m]:
            expected.add((int(d), int(row["region_id"])))
    return regions, doc_id, lat, lng, expected


def test_key_algebra_no_duplicates(setup):
    regions, doc_id, lat, lng, expected = setup
    key_table, levels = J.build_region_keys(regions)
    idx = J._BroadcastIndex(key_table, regions, levels)
    leaf = ck.cell_id_from_latlng(lat, lng)
    prow, ridx = idx.candidates(leaf)
    pairs = list(zip(prow.tolist(), ridx.tolist()))
    assert len(pairs) == len(set(pairs))
    rows = regions.to_pylist()
    got = set()
    for p, r in zip(prow, ridx):
        if J.refine_mask(lat[p : p + 1], lng[p : p + 1], rows[int(r)])[0]:
            got.add((int(doc_id[p]), int(rows[int(r)]["region_id"])))
    assert got == expected


def _pairs(ds):
    return set((r["doc_id"], r["region_id"]) for r in ds.take_all())


def _points_ds(doc_id, lat, lng):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": doc_id, "lat": lat, "lng": lng})
    ).repartition(4)


def test_broadcast_equals_brute(ray_session, setup):
    regions, doc_id, lat, lng, expected = setup
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng), regions, strategy="broadcast"
    )
    assert _pairs(out) == expected


def test_shuffle_equals_brute(ray_session, setup):
    regions, doc_id, lat, lng, expected = setup
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng), regions, strategy="shuffle"
    )
    assert _pairs(out) == expected


def test_shuffle_skew_split_equals_brute(ray_session, setup):
    regions, doc_id, lat, lng, expected = setup
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng),
        regions,
        strategy="shuffle",
        hot_threshold=40,
        split_delta=3,
    )
    assert _pairs(out) == expected


def test_shuffle_skew_materialized_equals_streaming(ray_session, setup):
    """The num_rows-hinted skew path pins the key stream in the object
    store (one upstream execution); past _P_SIDE_MATERIALIZE_ROWS, or
    with no hint, the stream is re-executed per pass.  Both must give
    identical pairs."""
    regions, doc_id, lat, lng, expected = setup
    kwargs = dict(
        strategy="shuffle", hot_threshold=40, split_delta=3
    )
    hinted = J.spatial_join(
        _points_ds(doc_id, lat, lng),
        regions,
        num_rows=len(doc_id),  # under the cap → materialized path
        **kwargs,
    )
    assert _pairs(hinted) == expected
    import s2sphere_ray.stages.join as join_mod

    old = join_mod._P_SIDE_MATERIALIZE_ROWS
    join_mod._P_SIDE_MATERIALIZE_ROWS = 0  # force the streaming fallback
    try:
        streamed = J.spatial_join(
            _points_ds(doc_id, lat, lng),
            regions,
            num_rows=len(doc_id),
            **kwargs,
        )
        assert _pairs(streamed) == expected
    finally:
        join_mod._P_SIDE_MATERIALIZE_ROWS = old


def test_snap_levels_variation(ray_session, setup):
    # Different canonical level sets must not change results.
    regions, doc_id, lat, lng, expected = setup
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng),
        regions,
        strategy="broadcast",
        snap_levels=(6, 10),
    )
    assert _pairs(out) == expected


def test_empty_regions(ray_session, setup):
    regions, doc_id, lat, lng, _ = setup
    empty = regions.slice(0, 0)
    out = J.spatial_join(_points_ds(doc_id, lat, lng), empty, strategy="broadcast")
    assert out.count() == 0


def test_shuffle_skew_adaptive_depth_no_duplicates(ray_session, setup):
    """Extreme skew: two hot cells with very different counts must split
    to different depths (count-adaptive δ) and the output must equal brute
    force as a MULTISET — no duplicated pairs from the split region keys."""
    regions, _, _, _, _ = setup
    rng = np.random.default_rng(11)
    # ~6000 points inside one city disc (very hot), ~300 in another
    # (mildly hot), plus background.
    lat1, lng1 = 40.7, -74.0
    lat2, lng2 = 51.5, -0.1
    lat = np.concatenate(
        [
            lat1 + rng.uniform(-0.2, 0.2, 6000),
            lat2 + rng.uniform(-0.2, 0.2, 300),
            rng.uniform(-60, 60, 700),
        ]
    )
    lng = np.concatenate(
        [
            lng1 + rng.uniform(-0.2, 0.2, 6000),
            lng2 + rng.uniform(-0.2, 0.2, 300),
            rng.uniform(-179, 179, 700),
        ]
    )
    doc_id = np.arange(len(lat), dtype=np.int64)
    expected = []
    for row in regions.to_pylist():
        m = J.refine_mask(lat, lng, row)
        for d in doc_id[m]:
            expected.append((int(d), int(row["region_id"])))
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng),
        regions,
        strategy="shuffle",
        hot_threshold=200,
        split_delta=2,
        max_split_rounds=3,
    )
    got = sorted(
        (r["doc_id"], r["region_id"]) for r in out.take_all()
    )
    assert got == sorted(expected)


def test_bloom_filter_no_false_negatives():
    from s2sphere_ray.state import BloomFilter

    rng = np.random.default_rng(3)
    members = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    bf = BloomFilter.build(members, fp_rate=0.01)
    assert bf.contains(members).all()  # never a false negative
    probes = rng.integers(-(2**62), 2**62, size=50000, dtype=np.int64)
    fresh = probes[~np.isin(probes, members)]
    fp = bf.contains(fresh).mean()
    assert fp < 0.03  # ~1% target with slack
    assert bf.nbytes() < 20000 * 2  # ~1.2 B/key


def test_shuffle_join_bloom_semi_join_equals_exact(ray_session, setup):
    """bloom_threshold=0 forces the Bloom pushdown; results must equal the
    exact semi-join (false positives are filtered by the sort-merge)."""
    regions, doc_id, lat, lng, expected = setup
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng),
        regions,
        strategy="shuffle",
        bloom_threshold=0,
    )
    assert _pairs(out) == expected


def test_auto_snap_levels_invariant(ray_session, setup):
    """snap_levels='auto' (cover-histogram percentiles) must not change
    results on either strategy."""
    regions, doc_id, lat, lng, expected = setup
    for strategy in ("broadcast", "shuffle"):
        out = J.spatial_join(
            _points_ds(doc_id, lat, lng),
            regions,
            strategy=strategy,
            snap_levels="auto",
        )
        assert _pairs(out) == expected
    from s2sphere_ray.stages.join import auto_snap_levels, covers_for_regions

    lv = auto_snap_levels(covers_for_regions(regions))
    assert 1 <= len(lv) <= 3
    assert all(0 <= l <= 30 for l in lv)


# ---------------------------------------------------------------------------
# Concave loop regions (geometry.Loop, refine_mask kind='loop')
# ---------------------------------------------------------------------------


def _loop_regions():
    return R.make_loop_regions(np.arange(5, dtype=np.int64))


def test_loop_scalar_matches_vectorized():
    """geometry.Loop.contains_point and refine_mask kind='loop' are the
    same predicate bit-for-bit (same IEEE expression order)."""
    regions = _loop_regions()
    doc_id = np.arange(3000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    for row in regions.to_pylist():
        m = J.refine_mask(lat, lng, row)
        loop = R.region_object(row)
        x, y, z = ck.latlng_to_xyz(lat, lng)
        for i in range(0, len(doc_id), 97):  # sampled scalar cross-check
            assert loop.contains_point((x[i], y[i], z[i])) == bool(m[i])


def test_loop_is_actually_concave():
    """Direct convexity violation: two points just inside adjacent star
    tips are INSIDE, but their geodesic midpoint (over the notch) is
    OUTSIDE — the property a convex-only polygon type cannot express."""
    import json
    import math as _m

    from s2sphere_ray import geometry as g

    regions = _loop_regions().to_pylist()
    for row in regions:
        verts = json.loads(row["poly_json"])
        nv = len(verts)
        clat, clng = row["axis_lat"], row["axis_lng"]
        r_out = 10.0 + 3.0 * float((row["region_id"] - 3000) % 5)
        stretch = max(0.2, _m.cos(_m.radians(clat)))
        probes = []
        for tip in (0, 2):  # angles of two adjacent outer tips
            ang = 2 * _m.pi * tip / nv
            probes.append(
                (
                    clat + 0.9 * r_out * _m.sin(ang),
                    clng + 0.9 * r_out * _m.cos(ang) / stretch,
                )
            )
        la = np.array([p[0] for p in probes])
        ln = np.array([p[1] for p in probes])
        m = J.refine_mask(la, ln, row)
        assert m.all(), "tip probes must be inside"
        x, y, z = ck.latlng_to_xyz(la, ln)
        mid = g.normalize((x[0] + x[1], y[0] + y[1], z[0] + z[1]))
        loop = R.region_object(row)
        assert not loop.contains_point(mid), "midpoint over the notch"


def test_loop_covering_invariant():
    """RegionCoverer over Loop regions satisfies check_covering: every
    cover cell may-intersect, interior cells are contained, and sampled
    interior points are covered."""
    from s2sphere_ray import geometry as g

    regions = _loop_regions().to_pylist()
    for row in regions:
        loop = R.region_object(row)
        cov = g.RegionCoverer(max_cells=12)
        cover = cov.get_covering(loop)
        ids = cover.cell_ids
        assert 0 < len(ids) <= 12 + 4
        for a in range(len(ids) - 1):
            assert ids[a].id < ids[a + 1].id
            assert not ids[a].contains(ids[a + 1])
        for c in ids:
            assert loop.may_intersect_cell(g.Cell(c))
        # Sampled containment: points known inside must be covered.
        clat, clng = row["axis_lat"], row["axis_lng"]
        lat_s = np.array([clat, clat + 0.5, clat - 0.5])
        lng_s = np.array([clng, clng, clng])
        m = J.refine_mask(lat_s, lng_s, row)
        x, y, z = ck.latlng_to_xyz(lat_s, lng_s)
        for i in range(len(lat_s)):
            if m[i]:
                cid = g.CellId.from_point((x[i], y[i], z[i]))
                assert cover.contains_cellid(cid)
        interior = cov.get_interior_covering(loop)
        for c in interior.cell_ids:
            assert loop.contains_cell(g.Cell(c))


def test_loop_broadcast_join_equals_brute(ray_session):
    regions = _loop_regions()
    doc_id = np.arange(1500, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    expected = set()
    for row in regions.to_pylist():
        m = J.refine_mask(lat, lng, row)
        for d in doc_id[m]:
            expected.add((int(d), int(row["region_id"])))
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng), regions, strategy="broadcast"
    )
    assert _pairs(out) == expected


def test_loop_shuffle_join_equals_brute(ray_session):
    regions = _loop_regions()
    doc_id = np.arange(1500, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    expected = set()
    for row in regions.to_pylist():
        m = J.refine_mask(lat, lng, row)
        for d in doc_id[m]:
            expected.add((int(d), int(row["region_id"])))
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng), regions, strategy="shuffle"
    )
    assert _pairs(out) == expected


def test_spatial_anti_join_complement(ray_session):
    """mode='anti' is the exact complement of the inner broadcast join's
    matched point set: inner ∪ anti = all points, inner ∩ anti = ∅."""
    import ray.data as rd
    import numpy as np
    import pyarrow as pa
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.regions import make_cap_regions, make_rect_regions
    from s2sphere_ray.stages.join import spatial_join

    doc_id = np.arange(3000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    pts = rd.from_arrow(pa.table({"doc_id": doc_id, "lat": lat, "lng": lng}))
    regions = pa.concat_tables(
        [
            make_rect_regions(np.arange(10, dtype=np.int64)),
            make_cap_regions(np.arange(1, 20, dtype=np.int64)),
        ],
        promote_options="default",
    )
    inner = {
        r["doc_id"]
        for r in spatial_join(
            pts, regions, strategy="broadcast", point_cols=("doc_id",)
        ).take_all()
    }
    anti = {
        r["doc_id"]
        for r in spatial_join(
            pts, regions, strategy="broadcast", point_cols=("doc_id",),
            mode="anti",
        ).take_all()
    }
    assert inner | anti == set(doc_id.tolist())
    assert not (inner & anti)
    assert anti and inner  # both sides non-trivial


def test_spatial_join_hash_equals_broadcast(ray_session):
    """strategy='hash' (native hash-partitioned join) emits exactly the
    same (point, region) pairs as broadcast and shuffle on mixed
    rect+cap+poly regions."""
    import ray.data as rd
    import numpy as np
    import pyarrow as pa
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.regions import regions_from_sf_dir
    from s2sphere_ray.stages.join import spatial_join

    doc_id = np.arange(4000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    pts = rd.from_arrow(
        pa.table({"doc_id": doc_id, "lat": lat, "lng": lng})
    ).materialize()
    regions = regions_from_sf_dir("/root/testdata/sf0.001")

    def pairs(strategy, **kw):
        return sorted(
            (r["doc_id"], r["region_id"])
            for r in spatial_join(
                pts, regions, strategy=strategy, point_cols=("doc_id",), **kw
            ).take_all()
        )

    want = pairs("broadcast")
    assert want, "no matches — vacuous"
    assert pairs("hash", num_rows=4000) == want
    assert pairs("shuffle") == want


def test_spatial_join_empty_regions(ray_session):
    """Zero-region table: every strategy returns an empty result with the
    right schema instead of crashing in key emission."""
    import ray.data as rd
    import numpy as np
    import pyarrow as pa
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.regions import regions_from_sf_dir
    from s2sphere_ray.stages.join import spatial_join

    doc_id = np.arange(100, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    pts = rd.from_arrow(pa.table({"doc_id": doc_id, "lat": lat, "lng": lng}))
    empty = regions_from_sf_dir("/root/testdata/sf0.001").slice(0, 0)
    for strategy in ("broadcast", "shuffle", "hash"):
        out = spatial_join(
            pts, empty, strategy=strategy, point_cols=("doc_id",)
        ).take_all()
        assert out == [], strategy


def test_hot_key_fallback_exchange_equals_gather(ray_session, setup, monkeypatch):
    """Forcing the hot-key pre-count past its driver-gather budget (the
    bucketed-exchange fallback) must not change the join result."""
    regions, doc_id, lat, lng, expected = setup
    monkeypatch.setattr(J, "_HOT_KEY_GATHER_ROWS", 1)
    out = J.spatial_join(
        _points_ds(doc_id, lat, lng),
        regions,
        strategy="shuffle",
        hot_threshold=40,
        split_delta=3,
    )
    assert _pairs(out) == expected
