"""Vectorized cell-set algebra must equal the CellId-object CellUnion
algebra (G1-G4) on randomized mixed-level unions."""

import numpy as np
import pytest

from s2sphere_ray import cells as ck
from s2sphere_ray import geometry as g
from s2sphere_ray.functions import cellsets as cs


def _random_ids(rng, n, levels=(2, 4, 6, 8, 11)):
    lat = rng.uniform(-88, 88, n)
    lng = rng.uniform(-180, 180, n)
    leaf = ck.cell_id_from_latlng(lat, lng)
    lv = rng.choice(levels, n)
    return ck.parent(leaf, lv)


def _obj_union(ids):
    return g.CellUnion([int(x) for x in ids])


def _ids_of(u):
    return np.array([c.id for c in u.cell_ids], dtype=np.uint64)


@pytest.mark.parametrize("seed", range(6))
def test_normalize_ids_matches_object(seed):
    rng = np.random.default_rng(seed)
    ids = _random_ids(rng, 400)
    got = cs.normalize_ids(ids)
    want = _ids_of(_obj_union(ids))
    assert np.array_equal(got, want)


def test_normalize_ids_collapses_quads():
    # All four children of a cell plus a stray: quad lifts to the parent
    # and cascades when the other three uncles are present too.
    base = ck.parent(ck.cell_id_from_latlng(np.array([10.0]), np.array([10.0])), 4)[0]
    kids = [int(x) for x in _children(base)]
    grand = [int(x) for c in kids for x in _children(np.uint64(c))]
    got = cs.normalize_ids(np.array(grand, dtype=np.uint64))
    assert got.tolist() == [int(base)]


def _children(cid):
    l = ck.lsb(np.array([cid], np.uint64))[0] >> np.uint64(2)
    return [np.uint64(int(cid) - 3 * int(l) + 2 * k * int(l)) for k in range(4)]


@pytest.mark.parametrize("seed", range(6))
def test_pairwise_algebra_matches_object(seed):
    rng = np.random.default_rng(100 + seed)
    a_ids = cs.normalize_ids(_random_ids(rng, 250))
    b_ids = cs.normalize_ids(_random_ids(rng, 250))
    ua, ub = _obj_union(a_ids), _obj_union(b_ids)

    inter = cs.intersection_ids(a_ids, b_ids)
    want_inter = _ids_of(g.CellUnion.get_intersection(ua, ub))
    assert np.array_equal(inter, want_inter)

    uni = cs.union_ids(a_ids, b_ids)
    want_uni = _ids_of(g.CellUnion.get_union(ua, ub))
    assert np.array_equal(uni, want_uni)

    diff = cs.difference_ids(a_ids, b_ids)
    want_diff = _ids_of(g.CellUnion.get_difference(ua, ub))
    assert np.array_equal(diff, want_diff)


def test_empty_and_degenerate():
    e = np.zeros(0, np.uint64)
    one = cs.normalize_ids(
        ck.parent(ck.cell_id_from_latlng(np.array([0.0]), np.array([0.0])), 8)
    )
    assert len(cs.intersection_ids(e, one)) == 0
    assert np.array_equal(cs.union_ids(e, one), one)
    assert np.array_equal(cs.difference_ids(one, e), one)
    assert len(cs.difference_ids(one, one)) == 0


def test_cellset_ops_sql_matches_ray(ray_session, tmp_path):
    """The full in-SQL cellset derivation (encode → normalize → pair
    algebra with a recursive subdivision CTE) must match the Ray
    pipeline on a DENSER corpus than the driver testdata — 3000
    sequential docs across 4 groups make collapse cascades and
    subdivision depth do real work."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2sphere_ray.oracle_sql import cellset_ops_sql
    from s2sphere_ray.queries import SQL_GEOCODE, q_cellset_ops

    n = 3000
    doc_id = np.arange(n, dtype=np.int64)
    lang = np.array(["aa", "bb", "cc", "dd"])[doc_id % 4]
    tbl = pa.table({"doc_id": pa.array(doc_id), "lang": pa.array(lang)})
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/documents.parquet")

    want = (
        q_cellset_ops(sf_dir)
        .to_pandas()
        .sort_values(["lang_a", "lang_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    got = (
        con.execute(cellset_ops_sql(SQL_GEOCODE))
        .df()
        .sort_values(["lang_a", "lang_b"])
        .reset_index(drop=True)
    )
    got = got[want.columns.tolist()].astype(want.dtypes.to_dict())
    assert want.equals(got), (want, got)
    # The corpus genuinely exercises the algebra: some difference must
    # have subdivided (n_diff > n_a happens only via subdivision).
    assert (want.n_diff_ab > want.n_a).any() or (
        want.n_diff_ba > want.n_b
    ).any()
