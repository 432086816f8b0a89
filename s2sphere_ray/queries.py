"""Registered engine queries + matching DuckDB oracle SQL.

Every entry in ``QUERIES`` is a callable ``sf_dir -> Dataset | pa.Table``;
``ORACLE_SQL`` holds the ANSI-SQL equivalent DuckDB runs on the same
parquet views (driver contract, __ray_entry__.py). Naming rule: every
computed column is aliased identically in both. Float-compare strategy:
integer outputs wherever possible (per-row rounding to integer units before
aggregation ⇒ exact integer sums on both sides); float outputs only where
the derivation is bit-exact on both sides (integer-hash geocode).

Queries without an oracle entry are geometry/sketch ops that SQL cannot
express (cell ids, covers, minhash…) — the driver records rows-only checks
and pytest covers their invariants (SURVEY §5).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import cells as ck
from .pages import (
    geocode_batch,
    geocode_sql,
    read_pages,
)
from .regions import (
    cap_regions_sql,
    make_cap_regions,
    make_poly_regions,
    make_rect_regions,
    rect_regions_sql,
    regions_from_sf_dir,
)
from .stages.encode import cell_encode, cell_token, _np
from .stages.join import CAP_DIST_SQL, spatial_join
from .stages.knn import knn_points
from .stages.tiles import tile_counts, top_k_tiles, hilbert_sort
from .functions.dedup import exact_dedup, minhash_lsh_pairs
from .functions.text import token_count_batch, quality_batch
from .functions.sim import cosine_topk
from .functions.multimodal import synth_media_table, extract_features

LAT_SQL, LNG_SQL = geocode_sql("doc_id")
_POINTS_CTE = (
    f"points AS (SELECT doc_id, {LAT_SQL} AS lat, {LNG_SQL} AS lng"
    " FROM documents)"
)


def _rd():
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return rd


def _docs(sf_dir: str, columns):
    return _rd().read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _points(sf_dir: str):
    """Geocoded points dataset (doc_id, lat, lng) — narrow read."""
    ds = _docs(sf_dir, ["doc_id"])
    return ds.map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)


def _tag_ds(ds, col: str, val: str):
    """Append a constant string column — used by the consolidated registry
    entries that union several kernel variants into one driver-checked
    result (the driver's correctness window holds at most 50 queries, so
    same-oracle variants share one entry distinguished by this label)."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(col, pa.array([val] * len(batch), pa.string()))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Geocode + cell ops
# ---------------------------------------------------------------------------


SQL_GEOCODE = (
    f"SELECT doc_id, {LAT_SQL} AS lat, {LNG_SQL} AS lng FROM documents"
)


def _sql_cell_tokens(level: int, with_order_key: bool = False) -> str:
    from .oracle_sql import s2_token_sql

    inner = s2_token_sql(
        level, f"SELECT doc_id, {LAT_SQL} AS lat, {LNG_SQL} AS lng FROM documents"
    )
    if with_order_key:
        return inner  # exposes the Hilbert order key ``n``
    return f"SELECT doc_id, cell_token FROM ({inner})"


def q_encode_suite(sf_dir: str):
    """Per-document encode suite in ONE pass over the geocoded points:
    geocode (E1, bit-exact integer-hash lat/lng), level-12 cell token
    (E3/E4, checked against the in-SQL Hilbert encode), and the leaf
    encode→decode→encode identity (E5): (doc_id, lat, lng, cell_token,
    ok). Consolidates the former q_geocode / q_cell_tokens_l12 /
    q_cell_roundtrip registry rows — one read + one map instead of
    three — so the 50-entry driver window covers every kernel."""

    def suite(batch: pa.Table) -> pa.Table:
        tok = cell_token(cell_encode(batch, level=12))
        lat = _np(batch["lat"])
        lng = _np(batch["lng"])
        ids = ck.cell_id_from_latlng(lat, lng)
        lat2, lng2 = ck.cell_id_to_latlng(ids)
        ids2 = ck.cell_id_from_latlng(lat2, lng2)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lat": batch["lat"],
                "lng": batch["lng"],
                "cell_token": tok["cell_token"],
                "ok": pa.array(ids == ids2),
            }
        )

    return _points(sf_dir).map_batches(suite, batch_format="pyarrow")


SQL_ENCODE_SUITE = (
    f"WITH pts AS (SELECT doc_id, {LAT_SQL} AS lat, {LNG_SQL} AS lng"
    " FROM documents),"
    " tok AS (" + _sql_cell_tokens(12) + ")"
    " SELECT p.doc_id, p.lat, p.lng, t.cell_token,"
    " CAST(1 AS BOOLEAN) AS ok FROM pts p JOIN tok t USING (doc_id)"
)


def golden_cover_regions() -> pa.Table:
    """Fixed region set for the cover golden — independent of ``sf_dir``
    so one frozen golden file serves every scale factor. Key ranges match
    sf0.01's actual tables but are pinned here by value."""
    from .regions import (
        make_cap_regions,
        make_loop_regions,
        make_poly_regions,
        make_rect_regions,
    )

    return pa.concat_tables(
        [
            make_rect_regions(np.arange(25, dtype=np.int64)),
            make_cap_regions(np.arange(1, 101, dtype=np.int64)),
            make_poly_regions(np.arange(5, dtype=np.int64)),
            make_loop_regions(np.arange(5, dtype=np.int64)),
        ],
        promote_options="default",
    )


def q_cover_regions_golden(sf_dir: str):
    """Coverer CORRECTNESS row (VERDICT r2 item 8, widened in r4):
    EXTERIOR (I2) and INTERIOR (I3) covers for a fixed 135-region set,
    both computed through the distributed actor-pool stage (E7) and
    exploded to one row per (variant, region_id, cell_rank, cover_token)
    so cover CONTENT and ORDER are pinned for both modes. The oracle is
    the frozen self-golden parquet (tests/fixtures/cover_golden.parquet)
    — a regression anchor, not an independent derivation (DuckDB cannot
    run the best-first coverer); regenerate only on an intentional
    semantic change via tools/make_cover_golden.py. Interior covers were
    rows-only before this consolidation (former q_cover_regions)."""
    from .stages.cover import cover_regions

    def explode(batch: pa.Table) -> pa.Table:
        toks = batch["cover_tokens"].to_pylist()
        rid = batch["region_id"].to_numpy()
        counts = np.array([len(t) for t in toks], dtype=np.int64)
        flat = [t for row in toks for t in row]
        ranks = np.concatenate(
            [np.arange(c, dtype=np.int64) for c in counts]
        ) if len(counts) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "region_id": pa.array(np.repeat(rid, counts)),
                "cell_rank": pa.array(ranks),
                "cover_token": pa.array(flat, pa.string()),
            }
        )

    regions = golden_cover_regions()
    ext = cover_regions(
        _rd().from_arrow(regions), max_cells=8, tokens=True
    ).map_batches(explode, batch_format="pyarrow")
    intr = cover_regions(
        _rd().from_arrow(regions),
        max_cells=8,
        tokens=True,
        interior=True,
        interior_work_budget=400,
    ).map_batches(explode, batch_format="pyarrow")
    return _tag_ds(ext, "variant", "exterior").union(
        _tag_ds(intr, "variant", "interior")
    )


_COVER_GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "cover_golden.parquet",
)
SQL_COVER_GOLDEN = (
    "SELECT variant, region_id, cell_rank, cover_token"
    f" FROM read_parquet('{_COVER_GOLDEN_PATH}')"
)


# ---------------------------------------------------------------------------
# Spatial joins (E9/E12)
# ---------------------------------------------------------------------------


def _rect_regions(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    return make_rect_regions(nation["n_nationkey"].to_numpy().astype(np.int64))


def q_join_rect(sf_dir: str):
    """Rect containment join through ALL THREE E9 strategies — plain
    shuffle, shuffle with hot-key splitting, and Ray's native
    hash-partitioned join — each tagged and unioned, all against ONE
    oracle (the strategies must be byte-equal). Consolidates the former
    q_join_rect / q_join_rect_skew rows and promotes the hash strategy
    (previously pytest-only) into the driver's correctness window."""
    regions = _rect_regions(sf_dir)
    shuffle = spatial_join(
        _points(sf_dir),
        regions,
        strategy="shuffle",
        point_cols=("doc_id",),
        point_types={"doc_id": pa.int64()},
    )
    skew = spatial_join(
        _points(sf_dir),
        regions,
        strategy="shuffle",
        point_cols=("doc_id",),
        hot_threshold=500,
        split_delta=3,
        point_types={"doc_id": pa.int64()},
    )
    hashj = spatial_join(
        _points(sf_dir), regions, strategy="hash", point_cols=("doc_id",)
    )
    return (
        _tag_ds(shuffle, "strategy", "shuffle")
        .union(_tag_ds(skew, "strategy", "skew"))
        .union(_tag_ds(hashj, "strategy", "hash"))
    )


_SQL_JOIN_RECT_ONE = (
    f"WITH {_POINTS_CTE}, rects AS ({rect_regions_sql()})"
    " SELECT p.doc_id, r.region_id FROM points p JOIN rects r"
    " ON p.lat >= r.lat_lo AND p.lat <= r.lat_hi"
    " AND p.lng >= r.lng_lo AND p.lng <= r.lng_hi"
)
SQL_JOIN_RECT = (
    f"SELECT doc_id, region_id, 'shuffle' AS strategy FROM ({_SQL_JOIN_RECT_ONE})"
    f" UNION ALL SELECT doc_id, region_id, 'skew' FROM ({_SQL_JOIN_RECT_ONE})"
    f" UNION ALL SELECT doc_id, region_id, 'hash' FROM ({_SQL_JOIN_RECT_ONE})"
)


def q_join_anti(sf_dir: str):
    """Spatial ANTI-join: documents whose geocoded point lies in NO rect
    and NO cap region — the curation-style negative geo filter, via the
    broadcast index with mode="anti" (one lookup pass, complement mask;
    no shuffle). Oracle = double NOT EXISTS."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    supplier = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]
    )
    regions = pa.concat_tables(
        [
            make_rect_regions(nation["n_nationkey"].to_numpy().astype(np.int64)),
            make_cap_regions(supplier["s_suppkey"].to_numpy().astype(np.int64)),
        ],
        promote_options="default",
    )
    return spatial_join(
        _points(sf_dir),
        regions,
        strategy="broadcast",
        point_cols=("doc_id",),
        mode="anti",
    )


SQL_JOIN_ANTI = (
    f"WITH {_POINTS_CTE}, rects AS ({rect_regions_sql()}),"
    f" caps AS ({cap_regions_sql()})"
    " SELECT p.doc_id FROM points p"
    " WHERE NOT EXISTS (SELECT 1 FROM rects r"
    " WHERE p.lat >= r.lat_lo AND p.lat <= r.lat_hi"
    " AND p.lng >= r.lng_lo AND p.lng <= r.lng_hi)"
    " AND NOT EXISTS (SELECT 1 FROM caps c"
    " WHERE " + CAP_DIST_SQL.format(
        lat="p.lat", lng="p.lng", alat="c.axis_lat", alng="c.axis_lng"
    ) + " <= radians(c.radius_deg))"
)


def q_join_cap(sf_dir: str):
    import pyarrow.parquet as pq

    supplier = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    regions = make_cap_regions(supplier["s_suppkey"].to_numpy().astype(np.int64))
    return spatial_join(
        _points(sf_dir), regions, strategy="broadcast", point_cols=("doc_id",)
    )


_CAP_DIST = CAP_DIST_SQL.format(
    lat="p.lat", lng="p.lng", alat="c.axis_lat", alng="c.axis_lng"
)
SQL_JOIN_CAP = (
    f"WITH {_POINTS_CTE}, caps AS ({cap_regions_sql()})"
    " SELECT p.doc_id, c.region_id + 1000 AS region_id FROM points p"
    f" JOIN caps c ON {_CAP_DIST} <= radians(c.radius_deg)"
)


def q_join_poly(sf_dir: str):
    """Polygon containment join, convex AND concave in one result set
    (region_id ranges 2000+/3000+ keep the legs disjoint): convex
    spherical polygons via the edge-normal min-dot predicate, plus
    GENERAL star-shaped loops with reflex vertices via crossing-parity
    refinement (geometry.Loop / refine_mask kind='loop'). The oracle
    regenerates both region families in SQL and unions the identical
    predicates — hash-exact. (Round 4 merged the former standalone
    q_join_poly_concave row here to stay inside the driver's 50-query
    window; both code paths are still fully exercised.)"""
    import pyarrow.parquet as pq

    from .regions import make_loop_regions

    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey"])
    keys = region["r_regionkey"].to_numpy().astype(np.int64)
    pts = _points(sf_dir)
    convex = spatial_join(
        pts, make_poly_regions(keys), strategy="broadcast", point_cols=("doc_id",)
    )
    concave = spatial_join(
        pts, make_loop_regions(keys), strategy="broadcast", point_cols=("doc_id",)
    )
    return convex.union(concave)


_POINTS_XYZ_CTE = (
    _POINTS_CTE + ", pxyz AS (SELECT doc_id,"
    " cos(radians(lng)) * cos(radians(lat)) AS x,"
    " sin(radians(lng)) * cos(radians(lat)) AS y,"
    " sin(radians(lat)) AS z FROM points)"
)

# Convex-polygon containment in SQL: regenerate the deterministic vertices
# (regions.make_poly_regions) from r_regionkey, build edge normals via cross
# products, and keep points whose minimum edge dot-product is ≥ 0 — the
# identical predicate to stages/join.refine_mask (kind='poly').
SQL_JOIN_POLY = (
    f"WITH {_POINTS_XYZ_CTE},"
    " par AS (SELECT CAST(r_regionkey AS BIGINT) AS k,"
    " CAST(r_regionkey AS BIGINT) + 2000 AS region_id,"
    " CAST((CAST(r_regionkey AS BIGINT)*7919) % 100 - 50 AS DOUBLE) AS clat,"
    " CAST((CAST(r_regionkey AS BIGINT)*104729) % 320 - 160 AS DOUBLE) AS clng,"
    " 10.0 + 3.0 * CAST(CAST(r_regionkey AS BIGINT) % 5 AS DOUBLE) AS r,"
    " 4 + CAST(r_regionkey AS BIGINT) % 5 AS nv FROM region),"
    " verts AS (SELECT p.region_id, a.a AS idx, p.nv,"
    " p.clat + p.r * sin(2 * pi() * a.a / p.nv) AS vlat,"
    " p.clng + p.r * cos(2 * pi() * a.a / p.nv)"
    " / greatest(0.2, cos(radians(p.clat))) AS vlng"
    " FROM par p JOIN generate_series(0, 8) AS a(a) ON a.a < p.nv),"
    " vxyz AS (SELECT region_id, idx, nv,"
    " cos(radians(vlng)) * cos(radians(vlat)) AS vx,"
    " sin(radians(vlng)) * cos(radians(vlat)) AS vy,"
    " sin(radians(vlat)) AS vz FROM verts),"
    " edges AS (SELECT a.region_id, a.idx,"
    " a.vy * b.vz - a.vz * b.vy AS nx,"
    " a.vz * b.vx - a.vx * b.vz AS ny,"
    " a.vx * b.vy - a.vy * b.vx AS nz"
    " FROM vxyz a JOIN vxyz b ON a.region_id = b.region_id"
    " AND b.idx = (a.idx + 1) % a.nv),"
    " checks AS (SELECT pt.doc_id, e.region_id,"
    " min(e.nx * pt.x + e.ny * pt.y + e.nz * pt.z) AS mindot"
    " FROM pxyz pt CROSS JOIN edges e GROUP BY pt.doc_id, e.region_id)"
    " SELECT doc_id, region_id FROM checks WHERE mindot >= 0.0"
)


# Concave-loop containment in SQL: regenerate the deterministic star
# vertices (regions.make_loop_regions) from r_regionkey, then per
# (point, edge) evaluate the SAME strict crossing predicate as
# geometry.simple_crossing with (c, d) = (ref, point), ref = antipode of
# the loop center; a point is inside iff its crossing count is odd.
SQL_JOIN_LOOP = (
    f"WITH {_POINTS_XYZ_CTE},"
    " par AS (SELECT CAST(r_regionkey AS BIGINT) + 3000 AS region_id,"
    " CAST((CAST(r_regionkey AS BIGINT)*7919) % 90 - 45 AS DOUBLE) AS clat,"
    " CAST((CAST(r_regionkey AS BIGINT)*104729) % 320 - 160 AS DOUBLE) AS clng,"
    " 10.0 + 3.0 * CAST(CAST(r_regionkey AS BIGINT) % 5 AS DOUBLE) AS r_out,"
    " 2 * (5 + CAST(r_regionkey AS BIGINT) % 3) AS nv FROM region),"
    " verts AS (SELECT p.region_id, a.a AS idx, p.nv,"
    " p.clat + (CASE WHEN a.a % 2 = 0 THEN p.r_out ELSE 0.4 * p.r_out END)"
    " * sin(2 * pi() * a.a / p.nv) AS vlat,"
    " p.clng + (CASE WHEN a.a % 2 = 0 THEN p.r_out ELSE 0.4 * p.r_out END)"
    " * cos(2 * pi() * a.a / p.nv)"
    " / greatest(0.2, cos(radians(p.clat))) AS vlng"
    " FROM par p JOIN generate_series(0, 13) AS a(a) ON a.a < p.nv),"
    " vxyz AS (SELECT region_id, idx, nv,"
    " cos(radians(vlng)) * cos(radians(vlat)) AS vx,"
    " sin(radians(vlng)) * cos(radians(vlat)) AS vy,"
    " sin(radians(vlat)) AS vz FROM verts),"
    " refs AS (SELECT region_id,"
    " -(cos(radians(clng)) * cos(radians(clat))) AS rx,"
    " -(sin(radians(clng)) * cos(radians(clat))) AS ry,"
    " -(sin(radians(clat))) AS rz FROM par),"
    " edges AS (SELECT a.region_id, a.idx,"
    " a.vx AS ax, a.vy AS ay, a.vz AS az,"
    " b.vx AS bx, b.vy AS b_y, b.vz AS bz,"
    " a.vy * b.vz - a.vz * b.vy AS abx,"
    " a.vz * b.vx - a.vx * b.vz AS aby,"
    " a.vx * b.vy - a.vy * b.vx AS abz"
    " FROM vxyz a JOIN vxyz b ON a.region_id = b.region_id"
    " AND b.idx = (a.idx + 1) % a.nv),"
    " checks AS (SELECT pt.doc_id, e.region_id,"
    " SUM(CASE WHEN"
    " (-(e.abx * r.rx + e.aby * r.ry + e.abz * r.rz))"
    " * (e.abx * pt.x + e.aby * pt.y + e.abz * pt.z) > 0 AND"
    " (-(e.abx * r.rx + e.aby * r.ry + e.abz * r.rz))"
    " * (-((r.ry * pt.z - r.rz * pt.y) * e.bx"
    " + (r.rz * pt.x - r.rx * pt.z) * e.b_y"
    " + (r.rx * pt.y - r.ry * pt.x) * e.bz)) > 0 AND"
    " (-((r.ry * pt.z - r.rz * pt.y) * e.bx"
    " + (r.rz * pt.x - r.rx * pt.z) * e.b_y"
    " + (r.rx * pt.y - r.ry * pt.x) * e.bz))"
    " * ((r.ry * pt.z - r.rz * pt.y) * e.ax"
    " + (r.rz * pt.x - r.rx * pt.z) * e.ay"
    " + (r.rx * pt.y - r.ry * pt.x) * e.az) > 0"
    " THEN 1 ELSE 0 END) AS ncross"
    " FROM pxyz pt CROSS JOIN edges e"
    " JOIN refs r ON r.region_id = e.region_id"
    " GROUP BY pt.doc_id, e.region_id)"
    " SELECT doc_id, region_id FROM checks WHERE ncross % 2 = 1"
)

# Merged convex + concave containment oracle (region_id ranges disjoint).
SQL_JOIN_POLY_ALL = (
    f"SELECT * FROM ({SQL_JOIN_POLY}) UNION ALL SELECT * FROM ({SQL_JOIN_LOOP})"
)


# ---------------------------------------------------------------------------
# kNN (E11)
# ---------------------------------------------------------------------------


def _knn_queries(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    from .regions import cap_params_from_key

    supplier = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    keys = supplier["s_suppkey"].to_numpy().astype(np.int64)
    qlat, qlng, _ = cap_params_from_key(keys)
    return pa.table(
        {
            "query_id": pa.array(keys),
            "lat": pa.array(qlat.astype(np.float64)),
            "lng": pa.array(qlng.astype(np.float64)),
        }
    )


def knn_base(sf_dir: str):
    """Brute-force exact kNN (bench headline 'knn' — kept single-variant
    so BENCH series stay comparable across rounds)."""
    out = knn_points(_points(sf_dir), _knn_queries(sf_dir), k=5)
    return out.select_columns(["query_id", "rank", "doc_id"])


# Within-radius variant parameters: ~637 km discs over the supplier
# query set — nonzero hits at every sf (sf0.001: 10 pairs) without
# blowing up near the hot cities (rank cap bounds per-query output).
WITHIN_RADIUS_RAD = 0.1
WITHIN_K = 20


def q_knn(sf_dir: str):
    """Exact kNN through BOTH E11 paths — brute-force and cell-ring-pruned
    — plus the E11b within-radius distance join (every point within 0.1 rad
    of each query, ranked, capped at 20/query) through BOTH its strategies
    (broadcast + cell-partitioned shuffle), tagged and unioned against one
    oracle (identical rows required). Consolidates the former
    q_knn / q_knn_pruned registry rows."""
    from .stages.knn import knn_points_pruned, within_radius_join

    pruned = knn_points_pruned(
        _points(sf_dir), _knn_queries(sf_dir), k=5, level=6
    ).select_columns(["query_id", "rank", "doc_id"])
    out = _tag_ds(knn_base(sf_dir), "method", "brute").union(
        _tag_ds(pruned, "method", "pruned")
    )
    for strategy in ("broadcast", "shuffle"):
        within = within_radius_join(
            _points(sf_dir),
            _knn_queries(sf_dir),
            WITHIN_RADIUS_RAD,
            WITHIN_K,
            strategy=strategy,
        ).select_columns(["query_id", "rank", "doc_id"])
        out = out.union(_tag_ds(within, "method", f"within_{strategy}"))
    return out


_SQL_KNN_D = (
    f"WITH {_POINTS_CTE}, q AS (SELECT CAST(s_suppkey AS BIGINT) AS query_id,"
    " CAST((s_suppkey*7919)%140-70 AS DOUBLE) AS qlat,"
    " CAST((s_suppkey*104729)%360-180 AS DOUBLE) AS qlng FROM supplier),"
    " d AS (SELECT q.query_id, p.doc_id, "
    + CAP_DIST_SQL.format(lat="p.lat", lng="p.lng", alat="q.qlat", alng="q.qlng")
    + " AS dist FROM q CROSS JOIN points p)"
)
_SQL_KNN_ONE = (
    _SQL_KNN_D
    + " SELECT query_id, rank, doc_id FROM (SELECT query_id, doc_id,"
    " ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rank"
    " FROM d) t WHERE rank <= 5"
)
# WHERE before the window: rank numbers only the within-radius hits.
_SQL_KNN_WITHIN = (
    _SQL_KNN_D
    + " SELECT query_id, rank, doc_id FROM (SELECT query_id, doc_id,"
    " ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rank"
    f" FROM d WHERE dist <= {WITHIN_RADIUS_RAD!r}) t WHERE rank <= {WITHIN_K}"
)
SQL_KNN = (
    f"SELECT query_id, rank, doc_id, 'brute' AS method FROM ({_SQL_KNN_ONE})"
    f" UNION ALL SELECT query_id, rank, doc_id, 'pruned' FROM ({_SQL_KNN_ONE})"
    " UNION ALL SELECT query_id, rank, doc_id, 'within_broadcast'"
    f" FROM ({_SQL_KNN_WITHIN})"
    " UNION ALL SELECT query_id, rank, doc_id, 'within_shuffle'"
    f" FROM ({_SQL_KNN_WITHIN})"
)


# ---------------------------------------------------------------------------
# Tiling (E13–E15)
# ---------------------------------------------------------------------------


def tile_counts_base(sf_dir: str):
    """Per-tile page counts at level 8 (bench headline 'tile_counts' —
    kept single-variant so BENCH series stay comparable)."""
    out = tile_counts(_points(sf_dir), 8, num_rows=_docs(sf_dir, ["doc_id"]).count())
    return out.select_columns(["tile_token", "n_rows"])


def q_tile_counts_l8(sf_dir: str):
    """E13/E15 tile aggregate AND the E14 densest-20 top-k over it, tagged
    ('all' / 'top20') and unioned — exact-checked: the oracle recomputes
    tile tokens wholly in SQL (oracle_sql.py). Consolidates the former
    q_tile_counts_l8 / q_top_tiles_l8 registry rows."""
    n = _docs(sf_dir, ["doc_id"]).count()
    top = top_k_tiles(_points(sf_dir), 8, 20, num_rows=n).select_columns(
        ["tile_token", "n_rows"]
    )
    return _tag_ds(tile_counts_base(sf_dir), "variant", "all").union(
        _tag_ds(top, "variant", "top20")
    )


def q_write_tiles_roundtrip(sf_dir: str):
    """E18 write→read-back round-trip: pages are written through the
    resumable partitioned sink (``write_tiles``: tile-prefix partitions +
    per-partition manifests), re-read from the written parquet, and
    re-aggregated per level-8 tile. Must match the q_tile_counts_l8 oracle
    exactly — proving the sink loses/duplicates nothing. A second
    ``write_tiles`` call with the same fingerprint must skip every
    partition (resume contract), which the query asserts.
    """
    import shutil
    import tempfile

    from .stages.tiles import read_manifests, write_tiles

    import hashlib

    # Per-process dir: two concurrent runs on the same sf_dir must not
    # race each other's partitions/manifests (rerun in-process still
    # exercises the rmtree + resume path).
    sf_tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out_dir = os.path.join(
        tempfile.gettempdir(), f"s2ray_write_rt_{sf_tag}_{os.getpid()}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    # Parquet-metadata row count (free) sizes the partition-prefix length
    # so small inputs don't scatter over thousands of tiny directories.
    try:
        n_hint = _docs(sf_dir, ["doc_id"]).count()
    except Exception:
        n_hint = None
    write_tiles(
        _points(sf_dir), out_dir, level=8, fingerprint="rt-v1",
        num_rows=n_hint,
    )
    manifests = read_manifests(out_dir)
    rows_before = sum(m["rows"] for m in manifests)
    # Resume: nothing to rewrite, manifests unchanged.
    write_tiles(
        _points(sf_dir), out_dir, level=8, fingerprint="rt-v1",
        num_rows=n_hint,
    )
    manifests2 = read_manifests(out_dir)
    assert sum(m["rows"] for m in manifests2) == rows_before, "resume rewrote"

    back = _rd().read_parquet(out_dir, columns=["tile_token"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["tile_token"].combine_chunks())
        return pa.table(
            {
                "tile_token": vc.field("values"),
                "n_rows": vc.field("counts").cast(pa.int64()),
            }
        )

    # Token cardinality is 6·4^L — a bucketed exchange, not the native
    # key-sorted groupby (the repo-wide high-cardinality idiom).
    from .functions._buckets import bucketed_sum

    return bucketed_sum(
        back.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["tile_token"],
        ["n_rows"],
        pa.schema([("tile_token", pa.string()), ("n_rows", pa.int64())]),
    )


def q_hilbert_order(sf_dir: str):
    """First 100 pages in Hilbert (leaf cell id) order, ties by doc_id —
    exact-checked against the in-SQL encode's order key."""
    ds = _points(sf_dir).map_batches(
        lambda b: cell_token(cell_encode(b)), batch_format="pyarrow"
    )
    return (
        hilbert_sort(ds, tiebreak_cols=("doc_id",))
        .select_columns(["doc_id", "cell_token"])
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Dedup / text / similarity over documents & embeddings
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    # num_rows from parquet metadata (cheap) so derive_buckets sizes the
    # hash shuffle to the data instead of the 4xCPU floor.
    out = exact_dedup(
        ds,
        key_col="text",
        id_col="doc_id",
        num_rows=_docs(sf_dir, ["doc_id"]).count(),
    )
    return out.select_columns(["doc_id"])


SQL_DEDUP_EXACT = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def q_text_stats(sf_dir: str):
    """Per-document text statistics in ONE fused map over the documents:
    whitespace token count, character count, the BPE-ish regex token
    count (one RE2 pass in Arrow C++), mean token length, stopword hits
    and alpha ratio — consolidates the former q_token_count / q_quality
    registry rows (which were two separate full passes over the same
    input) into a single read + single stateless stage."""
    from .functions.text import regex_token_count_batch

    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        lambda b: quality_batch(regex_token_count_batch(token_count_batch(b))),
        batch_format="pyarrow",
        batch_size=None,
    )
    return out.select_columns(
        [
            "doc_id",
            "n_tokens",
            "n_chars_obs",
            "n_bpe_tokens",
            "mean_token_len_x1000",
            "stopword_hits",
            "alpha_ratio_x1000",
        ]
    )


_STOP_SQL = "('the','of','and','to','in','is','was','for','on','that','with','as','by','at','from','are','this','be','an','or')"
SQL_TEXT_STATS = (
    "SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,"
    " CAST(length(text) AS BIGINT) AS n_chars_obs,"
    " CAST(len(regexp_extract_all(coalesce(text, ''),"
    " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,"
    " CAST(length(replace(text,' ','')) AS BIGINT) * 1000"
    " // CAST(len(string_split(text,' ')) AS BIGINT) AS mean_token_len_x1000,"
    f" CAST(len(list_filter(string_split(text,' '), x -> x IN {_STOP_SQL})) AS BIGINT)"
    " AS stopword_hits,"
    " CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) * 1000"
    " // CAST(greatest(length(text), 1) AS BIGINT) AS alpha_ratio_x1000"
    " FROM documents"
)


def q_corpus_histograms(sf_dir: str):
    """Corpus histograms from FOUR sources in one long-format entry
    (variant, lang, n_docs): the declared ``lang`` column, the
    marker-heuristic language-ID actor pool (E22), the URL-host
    histogram (variant 'domain' — one RE2 extract_regex pass in Arrow
    C++ over the derived pages URLs, key reuses the ``lang`` column
    name), and the BPE tokenizer suite (variant 'bpe', E30): 8 merge
    rounds trained on the corpus's own word histogram
    (``functions/bpe.bpe_train``), emitting per round the learned
    packed pair (``merge:kk``) and its freq-weighted count
    (``mcnt:kk``), plus per document its trained BPE token count
    (``ntok:<doc_id>`` — ``bpe_token_counts``) and the sum of its
    emitted token IDS (``tsum:<doc_id>`` — an order-free pin of
    ``bpe_encode``'s actual id sequences).  The oracle replays the
    merge loop bit-for-bit with unrolled CTEs
    (``oracle_sql.bpe_leg_sql``).  Consolidates the former
    q_lang_counts / q_langid_counts / q_domain_counts registry rows;
    every leg pre-aggregates per block before its tiny groupby."""
    from ray.data.aggregate import Sum

    from .functions.text import LangIdStage
    from .functions._buckets import derive_concurrency

    def counts_of(ds, col):
        def partial(batch: pa.Table) -> pa.Table:
            vc = pc.value_counts(batch[col].combine_chunks())
            return pa.table(
                {
                    "lang": vc.field("values"),
                    "n_docs": pc.cast(vc.field("counts"), pa.int64()),
                }
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"))
        )

    declared = counts_of(_docs(sf_dir, ["lang"]), "lang")
    guessed = counts_of(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            LangIdStage,
            batch_format="pyarrow",
            num_cpus=1,
            concurrency=derive_concurrency(0.5),
        ),
        "lang_guess",
    )
    ds_url = read_pages(sf_dir, columns=["url", "doc_id"])

    def extract_domain(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        # Arrow requires a NAMED group; capture semantics are identical
        # to the oracle's unnamed group 1.
        dom = pc.struct_field(
            pc.extract_regex(url, r"^https://(?P<domain>[^/]+)/"), 0
        )
        vc = pc.value_counts(pc.fill_null(dom, ""))
        return pa.table(
            {
                "lang": vc.field("values"),
                "n_docs": vc.field("counts").cast(pa.int64()),
            }
        )

    domains = (
        ds_url.map_batches(extract_domain, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    # -- variant 'bpe' (E30).  Train ONCE (the model tuple threads into
    # both scoring passes); the merge table itself is driver-side tiny
    # (8 rows), the two corpus passes are map-only broadcast scorers.
    from .functions.bpe import (
        bpe_encode,
        bpe_token_counts,
        bpe_train,
        word_histogram,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])
    model = bpe_train(word_histogram(docs, "text"), num_merges=8)
    merges, _ = model
    mlang: list[str] = []
    mval: list[int] = []
    for k, (a, b, _nid, cnt) in enumerate(merges):
        mlang += [f"merge:{k:02d}", f"mcnt:{k:02d}"]
        mval += [(a << 32) | b, cnt]
    merge_ds = _rd().from_arrow(
        pa.table(
            {
                "lang": pa.array(mlang, pa.string()),
                "n_docs": pa.array(mval, pa.int64()),
            }
        )
    )

    def ntok_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "lang": pc.binary_join_element_wise(
                    "ntok:", ids.cast(pa.string()), ""
                ),
                "n_docs": batch["n_bpe_tokens"],
            }
        )

    ntok = bpe_token_counts(docs, model=model).map_batches(
        ntok_rows, batch_format="pyarrow", batch_size=None
    )

    def tsum_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        toks = batch["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lens = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cs = np.concatenate(([np.int64(0)], np.cumsum(flat)))
        off = np.concatenate(([np.int64(0)], np.cumsum(lens)))
        sums = cs[off[1:]] - cs[off[:-1]]
        return pa.table(
            {
                "lang": pc.binary_join_element_wise(
                    "tsum:", ids.cast(pa.string()), ""
                ),
                "n_docs": pa.array(sums),
            }
        )

    tsum = bpe_encode(docs, model=model).map_batches(
        tsum_rows, batch_format="pyarrow", batch_size=None
    )
    bpe = merge_ds.union(ntok).union(tsum)

    return (
        _tag_ds(declared, "variant", "declared")
        .union(_tag_ds(guessed, "variant", "guessed"))
        .union(_tag_ds(domains, "variant", "domain"))
        .union(_tag_ds(bpe, "variant", "bpe"))
    )


_SQL_LANG_DECLARED = (
    "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"
)


def minhash_pairs_base(sf_dir: str):
    """MinHash-LSH pairs alone (bench headline 'minhash' — kept
    single-variant so BENCH series stay comparable)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return minhash_lsh_pairs(ds, jaccard_threshold=0.8)


def q_neardup_pairs(sf_dir: str):
    """Near-duplicate candidate pairs from BOTH probabilistic sketches —
    MinHash-LSH (Jaccard ≥ 0.8) and SimHash pigeonhole banding (hamming
    ≤ 3) — tagged (method) and unioned.  ORACLE-EXACT since round 4:
    oracle_sql.neardup_pairs_sql replays FNV-1a token hashing, shingling,
    the seeded minhash permutations, banded LSH + exact-Jaccard verify,
    and simhash bit voting + the full hamming filter entirely in DuckDB
    SQL (the sketch kernels are additionally golden-pinned by
    q_sketch_golden). Consolidates the former q_minhash_pairs /
    q_simhash_pairs registry rows."""
    from .functions.dedup import simhash_neardup_pairs
    from .functions._schema import PAIR_SCHEMA, stabilize_schema

    ds = _docs(sf_dir, ["doc_id", "text"])
    # The exact-verify pair stream comes off a groupby shuffle and can
    # carry schema-less empty blocks (functions/_schema.py) — heal the
    # compact pair table before projecting/unioning.
    mh = stabilize_schema(
        minhash_pairs_base(sf_dir), PAIR_SCHEMA
    ).select_columns(["id_a", "id_b"])
    sh = _rd().from_arrow(
        simhash_neardup_pairs(ds, max_hamming=3, num_rows=ds.count())
    ).select_columns(["id_a", "id_b"])
    return _tag_ds(mh, "method", "minhash_lsh").union(
        _tag_ds(sh, "method", "simhash")
    )


def _embedding_queries(sf_dir: str):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    return emb.filter(pc.less(emb["vec_id"], 3)).rename_columns(
        ["query_id", "embedding", "label"]
    )


def simsearch_base(sf_dir: str):
    """Brute-force cosine top-k alone (bench headline 'simsearch')."""
    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    out = cosine_topk(ds, _embedding_queries(sf_dir), k=10)
    return out.select_columns(["query_id", "rank", "vec_id"])


def q_simsearch(sf_dir: str):
    """Similarity-search suite, three retrieval paths in one entry:

    - 'brute' / 'ivf': dense ANN top-k through BOTH E21 paths —
      brute-force cosine and IVF with ``nprobe == n_centroids``
      (probing every inverted list makes the approximate path exact, so
      one oracle covers both while the full IVF machinery runs
      end-to-end; recall-vs-nprobe is covered in pytest);
    - 'keyword': sparse integer-idf TF-IDF retrieval
      (text.keyword_topk) over the documents table — queries are the
      first three tokens of docs 0/100/200, scores are exact integer
      Σ tf·(floor(log2(N/df))+1), ranked (score DESC, id ASC).  The
      ``vec_id`` column carries the hit's doc_id for this method.
    """
    from .functions.sim import ivf_topk
    from .functions.text import keyword_topk

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    ivf = ivf_topk(
        ds, _embedding_queries(sf_dir), k=10, n_centroids=8, nprobe=8
    ).select_columns(["query_id", "rank", "vec_id"])

    import pyarrow.dataset as pads

    qdocs = (
        _rd()
        .read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin([0, 100, 200]),
        )
        .take_all()
    )
    q_terms = {int(r["doc_id"]): r["text"].split()[:3] for r in qdocs}
    kw = keyword_topk(
        _docs(sf_dir, ["doc_id", "text"]), q_terms, k=10
    ).map_batches(
        lambda b: pa.table(
            {
                "query_id": b["query_id"],
                "rank": b["rank"],
                "vec_id": b["doc_id"],
            }
        )
        if b.num_columns
        else pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return (
        _tag_ds(simsearch_base(sf_dir), "method", "brute")
        .union(_tag_ds(ivf, "method", "ivf"))
        .union(_tag_ds(kw, "method", "keyword"))
    )


_SQL_SIMSEARCH_ONE = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings"
    " WHERE vec_id < 3), s AS (SELECT q.query_id, e.vec_id,"
    " list_cosine_similarity(e.embedding, q.qe) AS sim FROM embeddings e"
    " CROSS JOIN q) SELECT query_id, rank, vec_id FROM (SELECT query_id,"
    " vec_id, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC,"
    " vec_id) AS rank FROM s) t WHERE rank <= 10"
)
_SQL_KEYWORD_TOPK = (
    "WITH qdoc AS (SELECT doc_id AS query_id,"
    " string_split(text, ' ') AS ws FROM documents"
    " WHERE doc_id IN (0, 100, 200)),"
    " qterm AS (SELECT DISTINCT query_id, unnest(ws[1:3]) AS w"
    " FROM qdoc),"
    " toks AS (SELECT doc_id, w FROM (SELECT doc_id,"
    " unnest(string_split(text, ' ')) AS w FROM documents)"
    " WHERE w <> ''),"
    " nn AS (SELECT COUNT(*) AS n FROM documents),"
    " dfq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM toks"
    " JOIN (SELECT DISTINCT w FROM qterm) USING (w) GROUP BY w),"
    " icl AS (SELECT w, length(printf('%b', (SELECT n FROM nn) // df))"
    " - 1 + 1 AS wgt FROM dfq),"
    " tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY"
    " doc_id, w),"
    " sc AS (SELECT q.query_id, tf.doc_id,"
    " SUM(tf.tf * icl.wgt) AS score FROM qterm q"
    " JOIN tf ON q.w = tf.w JOIN icl ON icl.w = q.w"
    " GROUP BY q.query_id, tf.doc_id)"
    " SELECT query_id, rank, doc_id AS vec_id FROM"
    " (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id"
    " ORDER BY score DESC, doc_id) AS rank FROM sc WHERE score > 0) t"
    " WHERE rank <= 10"
)
SQL_SIMSEARCH = (
    "SELECT query_id, rank, vec_id, 'brute' AS method"
    f" FROM ({_SQL_SIMSEARCH_ONE})"
    " UNION ALL SELECT query_id, rank, vec_id, 'ivf'"
    f" FROM ({_SQL_SIMSEARCH_ONE})"
    " UNION ALL SELECT query_id, rank, vec_id, 'keyword'"
    f" FROM ({_SQL_KEYWORD_TOPK})"
)


def q_media(sf_dir: str):
    """Multimodal plumbing (E25) — BOTH pipelines in one entry, long
    format (variant, media_id, idx, val): 'frames' rows are resize →
    1→k frame-sample expansion with per-frame byte sizes (idx=frame_idx,
    val=n_bytes); 'features' rows are per-media decode→feature-extract
    sums (idx=0, val=feat_sum_x1000). mode="fake" throughout — synthetic
    payloads are random bytes, not decodable media; real codecs (when
    installed) must not be pointed at them. Deterministic and
    sf-INDEPENDENT (fixed 200-item seeded table), so since round 4 it is
    HASH-EXACT against the frozen self-golden
    tests/fixtures/media_golden.parquet (regenerate via
    tools/make_media_golden.py only on intentional semantic change —
    the cover_golden pattern). Consolidates the former q_media_frames /
    q_media_features rows."""
    from .functions.multimodal import ResizeStage, sample_frames
    from .functions._buckets import derive_concurrency

    media = synth_media_table(200)
    resized = _rd().from_arrow(media).map_batches(
        ResizeStage,
        fn_constructor_kwargs=dict(target=32, mode="fake"),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=derive_concurrency(0.5),
        num_cpus=1,
    )
    frames = sample_frames(resized, n_frames=8, stride=2, mode="fake")

    def frame_rows(batch: pa.Table) -> pa.Table:
        pl = batch["frame_payload"]
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
        return pa.table(
            {
                "media_id": batch["media_id"],
                "idx": pc.cast(batch["frame_idx"], pa.int64()),
                "val": pc.cast(pc.binary_length(pl), pa.int64()),
            }
        )

    feats = extract_features(_rd().from_arrow(media), dim=16, mode="fake")
    # Oracle: the frozen self-golden parquet (tools/make_media_golden.py)
    # — valid because the media table is sf-independent and seeded; a
    # regression anchor like cover_golden, not an independent derivation.

    def feature_rows(batch: pa.Table) -> pa.Table:
        f = (
            batch["features"].combine_chunks().flatten().to_numpy().reshape(-1, 16)
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "idx": pa.array(np.zeros(len(batch), dtype=np.int64)),
                "val": pa.array(
                    np.round(f.sum(axis=1) * 1000).astype(np.int64)
                ),
            }
        )

    return _tag_ds(
        frames.map_batches(frame_rows, batch_format="pyarrow"),
        "variant",
        "frames",
    ).union(
        _tag_ds(
            feats.map_batches(feature_rows, batch_format="pyarrow"),
            "variant",
            "features",
        )
    )


# ---------------------------------------------------------------------------
# Relational ops (E19) — shuffle scaffolding with exact oracles
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style: per (returnflag, linestatus) integer-exact sums."""
    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native partial: C++ hash groupby, no pandas copy.
        qty = _np(batch["l_quantity"]).astype(np.int64)
        rev_cents = np.floor(
            _np(batch["l_extendedprice"]) * (1.0 - _np(batch["l_discount"])) * 100
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(qty),
                "sum_rev_cents": pa.array(rev_cents),
            }
        )
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("sum_rev_cents", "sum"), ([], "count_all")]
        )
        # Select by the deterministic generated names, not position —
        # pyarrow's key/aggregate column ordering has differed across
        # releases (ADVICE r3).
        return pa.table(
            {
                "l_returnflag": agg["l_returnflag"],
                "l_linestatus": agg["l_linestatus"],
                "sum_qty": agg["sum_qty_sum"],
                "sum_rev_cents": agg["sum_rev_cents_sum"],
                "n_rows": agg["count_all"],
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_rev_cents", alias_name="sum_rev_cents"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


SQL_PRICING = (
    "SELECT l_returnflag, l_linestatus,"
    " CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,"
    " CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)"
    " AS sum_rev_cents, COUNT(*) AS n_rows"
    " FROM lineitem GROUP BY l_returnflag, l_linestatus"
)


def q_orders_by_segment(sf_dir: str):
    """orders ⋈ customer (broadcast small side) → per-segment totals."""
    import ray
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    # Broadcast lookup as sorted key array + dictionary-coded segment —
    # per batch one np.searchsorted, zero Python per row, no object dicts.
    keys = cust["c_custkey"].to_numpy()
    order = np.argsort(keys)
    seg_dict = cust["c_mktsegment"].combine_chunks().dictionary_encode()
    codes = seg_dict.indices.to_numpy().astype(np.int32)[order]
    cats = seg_dict.dictionary
    ref = ray.put((keys[order], codes, cats))
    ds = _rd().read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        sk, scodes, scats = ray.get(ref)
        k = batch["o_custkey"].to_numpy()
        idx = np.searchsorted(sk, k).clip(0, max(len(sk) - 1, 0))
        match = sk[idx] == k  # missing FK -> null segment group
        seg = pa.DictionaryArray.from_arrays(
            pa.array(scodes[idx], mask=~match), scats
        ).cast(pa.string())
        cents = np.floor(_np(batch["o_totalprice"]) * 100 + 0.5).astype(np.int64)
        t = pa.table(
            {"c_mktsegment": seg, "sum_total_cents": pa.array(cents)}
        )
        agg = t.group_by("c_mktsegment").aggregate(
            [("sum_total_cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "c_mktsegment": agg["c_mktsegment"],
                "sum_total_cents": agg["sum_total_cents_sum"],
                "n_orders": agg["count_all"],
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("sum_total_cents", alias_name="sum_total_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


SQL_ORDERS_SEG = (
    "SELECT c.c_mktsegment, CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)"
    " AS sum_total_cents, COUNT(*) AS n_orders FROM orders o"
    " JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment"
)


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type (streaming-shaped op)."""
    ds = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native partial: C++ hash groupby on (type, hour).
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        cents = np.floor(_np(batch["value"]) * 100 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "hour": hour,
                "sum_value_cents": pa.array(cents),
            }
        )
        agg = t.group_by(["event_type", "hour"]).aggregate(
            [([], "count_all"), ("sum_value_cents", "sum")]
        )
        return pa.table(
            {
                "event_type": agg["event_type"],
                "hour": agg["hour"],
                "n_events": agg["count_all"],
                "sum_value_cents": agg["sum_value_cents_sum"],
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
        )
    )


SQL_EVENTS_HOURLY = (
    "SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,"
    " CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents"
    " FROM events GROUP BY event_type, date_trunc('hour', ts)"
)


def q_sessions(sf_dir: str):
    """Keyed ordered windows over the events log, long format
    (variant, user_id, k, v):

    - 'session': session windows (30-min gap) per user
      (functions/sessions.sessionize) — k = session_start epoch
      microseconds, v = n_events;
    - 'rn' / 'lag_milli' / 'lead_milli' / 'runsum_milli' /
      'rank_milli' / 'dense_rank_milli' / 'movsum3_milli': per-event
      window functions (functions/windows.keyed_window — ROW_NUMBER,
      LAG, LEAD, inclusive running SUM and 3-row moving SUM over
      PARTITION BY user_id ORDER BY ts, event_id, plus RANK /
      DENSE_RANK of the value within the key; values in exact int64
      milli-units) — k = event_id, v = the feature; NULL lag/lead
      rows (first/last event of a user) are omitted.

    Both ops are the same engine shape: ONE user-hash-bucketed
    exchange, then a vectorized lexsort kernel per bucket."""
    from .functions.sessions import sessionize
    from .functions.windows import keyed_window

    ds = _rd().read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )
    n = ds.count()
    sess = sessionize(
        ds.select_columns(["user_id", "ts", "event_id"]),
        gap_minutes=30,
        num_rows=n,
    )
    win = keyed_window(ds, num_rows=n)

    def melt_sessions(batch: pa.Table) -> pa.Table:
        ts = batch["session_start"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        k = (
            ts.to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        return pa.table(
            {
                "variant": pa.array(np.repeat("session", batch.num_rows)),
                "user_id": batch["user_id"].cast(pa.int64()),
                "k": pa.array(k),
                "v": batch["n_events"].cast(pa.int64()),
            }
        )

    def melt_windows(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy().astype(np.int64)
        eid = batch["event_id"].to_numpy().astype(np.int64)
        parts = []
        for name in (
            "rn",
            "lag_milli",
            "lead_milli",
            "runsum_milli",
            "rank_milli",
            "dense_rank_milli",
            "movsum3_milli",
        ):
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ok = (
                ~np.asarray(col.is_null())
                if col.null_count
                else np.ones(len(col), dtype=bool)
            )
            vals = col.to_numpy(zero_copy_only=False)
            parts.append(
                pa.table(
                    {
                        "variant": pa.array(
                            np.repeat(name, int(ok.sum()))
                        ),
                        "user_id": pa.array(uid[ok]),
                        "k": pa.array(eid[ok]),
                        "v": pa.array(vals[ok].astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    return sess.map_batches(
        melt_sessions, batch_format="pyarrow", batch_size=None
    ).union(
        win.map_batches(melt_windows, batch_format="pyarrow", batch_size=None)
    )


from .functions.sessions import SESSIONS_SQL as _SESSIONS_CORE_SQL  # noqa: E402
from .functions.windows import WINDOW_SQL_CTE as _WINDOW_CTE  # noqa: E402

SQL_SESSIONS = (
    f"WITH core AS ({_SESSIONS_CORE_SQL}), {_WINDOW_CTE}"
    " SELECT 'session' AS variant, user_id,"
    " CAST(epoch_us(session_start) AS BIGINT) AS k,"
    " CAST(n_events AS BIGINT) AS v FROM core"
    " UNION ALL SELECT 'rn', user_id, event_id, rn FROM wfun"
    " UNION ALL SELECT 'lag_milli', user_id, event_id, lag_milli"
    " FROM wfun WHERE lag_milli IS NOT NULL"
    " UNION ALL SELECT 'lead_milli', user_id, event_id, lead_milli"
    " FROM wfun WHERE lead_milli IS NOT NULL"
    " UNION ALL SELECT 'runsum_milli', user_id, event_id, runsum_milli"
    " FROM wfun"
    " UNION ALL SELECT 'rank_milli', user_id, event_id, rank_milli"
    " FROM wfun"
    " UNION ALL SELECT 'dense_rank_milli', user_id, event_id,"
    " dense_rank_milli FROM wfun"
    " UNION ALL SELECT 'movsum3_milli', user_id, event_id, movsum3_milli"
    " FROM wfun"
)


def q_embed_neardup(sf_dir: str):
    """Embedding near-duplicate suite, two strategies over the same
    planted-duplicate corpus (every 50th vector re-appears as
    vec_id+100000):

    - 'lsh_pairs': sign-LSH bucketing → within-bucket exact float64
      cosine ≥ 0.99 (identical vectors collide at every level, so the
      planted pairs are guaranteed found);
    - 'semdedup': SemDeDup-style pruning (sim.semdedup) — k-means
      buckets (k=8, 3 Lloyd iterations, scale=100 integer milli units)
      bound the pairwise work, then the integer cross-multiplied cosine
      gate drops every vector with a smaller-id same-cluster neighbor
      at ≥ 99/100; emitted as (dropped id, keeper id).  The oracle
      replays the ENTIRE pipeline in SQL from first principles:
      augmented table → expanded k-means CTEs → final assignment →
      within-cluster integer-dot join with the identical
      10000·dp² ≥ 9801·|a|²·|b|² gate."""
    import pyarrow.parquet as pq

    from .functions.sim import embedding_neardup_pairs, semdedup

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vid = emb["vec_id"].to_numpy()
    dups = emb.filter(pa.array(vid % 50 == 0))
    dups = dups.set_column(
        0, "vec_id", pc.add(dups["vec_id"], 100000)
    )
    both = pa.concat_tables([emb, dups])

    def tag(name):
        def f(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or b.num_rows == 0:
                return pa.table(
                    {
                        "variant": pa.array([], pa.string()),
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "variant": pa.array(np.repeat(name, b.num_rows)),
                    "id_a": b["id_a"],
                    "id_b": b["id_b"],
                }
            )

        return f

    pairs = embedding_neardup_pairs(
        _rd().from_arrow(both), threshold=0.99
    ).map_batches(tag("lsh_pairs"), batch_format="pyarrow", batch_size=None)
    sd = semdedup(
        _rd().from_arrow(both), k=8, iters=3, thr_num=99, thr_den=100,
        scale=100,
    ).map_batches(tag("semdedup"), batch_format="pyarrow", batch_size=None)
    return pairs.union(sd)


def q_cellset_ops(sf_dir: str):
    """CellUnion set algebra (G1-G4) over POINT-DERIVED unions, fully
    distributed and ORACLE-EXACT since round 4: each language's corpus
    becomes a normalized CellUnion of its documents' S2 cells (level 6
    for even doc ids, level 8 for odd — mixed levels force the
    containment-removal AND quad-collapse branches of normalize), then
    every unordered language pair reports intersection / union /
    both-direction difference cell counts.

    Scale design: per-batch (lang, cell) dedup partials shrink the
    exchange to distinct cells; groupby(lang).map_groups normalizes per
    group with the VECTORIZED kernels (functions/cellsets.py — numpy
    fixpoint, no Python per cell); the driver gathers only normalized
    unions, bounded by the level-8 cell space (6·4^8 ≈ 393 k ids ≈
    3 MB/group), never the corpus.  Pair algebra is vectorized
    searchsorted containment + frontier subdivision.  The coverer-based
    union construction this row used before round 4 remains pinned by
    q_cover_regions_golden; the object↔vector algebra equivalence is
    property-tested (tests/test_cellsets.py).  The SQL oracle derives
    the same counts independently: in-SQL Hilbert encode → fixpoint
    normalize (unrolled collapse rounds) → interval set algebra with a
    recursive subdivision CTE (oracle_sql.cellset_ops_sql)."""
    from .functions import cellsets as cs
    from .pages import geocode_from_doc_id

    ds = _docs(sf_dir, ["doc_id", "lang"])

    def to_cells(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].combine_chunks().to_numpy()
        lat, lng = geocode_from_doc_id(doc_id)
        leaf = ck.cell_id_from_latlng(lat, lng)
        lv = np.where(doc_id % 2 == 0, 6, 8)
        cell = ck.parent(leaf, lv)
        t = pa.table(
            {
                "lang": batch["lang"],
                "cell": pa.array(cell.astype(np.uint64)),
            }
        )
        return t.group_by(["lang", "cell"]).aggregate([])  # batch-local dedup

    def normalize_group(group: pa.Table) -> pa.Table:
        ids = cs.normalize_ids(group["cell"].to_numpy())
        return pa.table(
            {
                "lang": pa.array([group["lang"][0].as_py()] * len(ids)),
                "cell": pa.array(ids),
            }
        )

    norm = (
        ds.map_batches(to_cells, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(normalize_group, batch_format="pyarrow")
    )
    batches = list(norm.iter_batches(batch_format="pyarrow"))
    unions_tbl = (
        pa.concat_tables(batches, promote_options="default")
        if batches
        else pa.table(
            {"lang": pa.array([], pa.string()), "cell": pa.array([], pa.uint64())}
        )
    )
    langs = sorted(set(unions_tbl["lang"].to_pylist()))
    unions = {
        lang: np.sort(
            unions_tbl.filter(pc.equal(unions_tbl["lang"], lang))["cell"]
            .combine_chunks()
            .to_numpy()
        )
        for lang in langs
    }
    rows = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            a, b = unions[la], unions[lb]
            rows.append(
                (
                    la,
                    lb,
                    len(a),
                    len(b),
                    len(cs.intersection_ids(a, b)),
                    len(cs.union_ids(a, b)),
                    len(cs.difference_ids(a, b)),
                    len(cs.difference_ids(b, a)),
                )
            )
    cols = list(zip(*rows)) if rows else [[]] * 8
    return pa.table(
        {
            "lang_a": pa.array(cols[0], pa.string()),
            "lang_b": pa.array(cols[1], pa.string()),
            "n_a": pa.array(cols[2], pa.int64()),
            "n_b": pa.array(cols[3], pa.int64()),
            "n_inter": pa.array(cols[4], pa.int64()),
            "n_union": pa.array(cols[5], pa.int64()),
            "n_diff_ab": pa.array(cols[6], pa.int64()),
            "n_diff_ba": pa.array(cols[7], pa.int64()),
        }
    )


def q_curation_export(sf_dir: str):
    """Full training-data EXPORT pipeline: quality gate → exact dedup →
    LSH near-dup removal (distributed left-anti join dropping the id_b
    side of every banded-LSH candidate pair, verify="none" crawl mode) →
    language-partitioned resumable parquet write (per-partition manifests)
    → read-back per-language counts from the written output + manifest
    row totals. Deterministic; ORACLE-EXACT since round 4
    (oracle_sql.curation_export_sql replays gate → min-id dedup → the
    banded-LSH candidate set → anti-filter → counts entirely in DuckDB).
    The resume contract is asserted in-query (second write skips
    everything). No stage materializes anything on the driver.
    """
    import shutil
    import tempfile
    import hashlib

    from .functions.dedup import exact_dedup, minhash_lsh_pairs
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    ds = ds.map_batches(quality_batch, batch_format="pyarrow")

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["n_tokens"], 10),
            pc.greater_equal(batch["alpha_ratio_x1000"], 300),
        )
        return batch.filter(m)

    ds = ds.map_batches(keep, batch_format="pyarrow").select_columns(
        ["doc_id", "text", "lang"]
    )
    from .functions._buckets import derive_buckets

    n_docs = _docs(sf_dir, ["doc_id"]).count()  # parquet metadata, cheap
    deduped = exact_dedup(ds, key_col="text", id_col="doc_id", num_rows=n_docs)
    # Near-dup removal, fully distributed (the 100-TB default): banded
    # LSH in verify="none" mode — the band exchange carries only
    # (band_id, band_hash, id) = 20 B/row, candidate pairs stream out as
    # a Dataset with NO driver materialization — then the id_b side of
    # every candidate pair is dropped via a native hash left-anti join.
    # At crawl dup rates the drop set is a large fraction of the corpus,
    # so it must never become a driver-side array or a broadcast set.
    pairs = minhash_lsh_pairs(deduped, verify="none", num_rows=n_docs)
    # Round-4: the native left_anti join is OFF the table here — its left
    # side (the deduped corpus) comes out of a groupby whose empty shuffle
    # partitions emit 0-row blocks, and a 0-row FIRST block silently
    # suppresses Ray's one-shot join-schema broadcast (crash at
    # num_cpus=32; see stages/join.anti_join_drop_ids for the mechanism).
    # The union + sort-groupby anti-join moves the same bytes and is
    # parallelism-independent.
    from .stages.join import anti_join_drop_ids

    curated = anti_join_drop_ids(
        deduped,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        ),
        "doc_id",
        pairs.select_columns(["id_b"]),
        "id_b",
        num_rows=n_docs,
    )

    sf_tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out_dir = os.path.join(
        tempfile.gettempdir(), f"s2ray_curated_{sf_tag}_{os.getpid()}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    curated.write_parquet(out_dir, partition_cols=["lang"])
    # Manifest per language partition (rows from footers) + resume assert.
    manifests = {}
    for entry in sorted(os.listdir(out_dir)):
        if not entry.startswith("lang="):
            continue
        import pyarrow.parquet as pq

        part = entry.split("=", 1)[1]
        rows = sum(
            pq.read_metadata(os.path.join(out_dir, entry, f)).num_rows
            for f in os.listdir(os.path.join(out_dir, entry))
            if f.endswith(".parquet")
        )
        manifests[part] = rows

    back = _rd().read_parquet(out_dir, columns=["lang"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["lang"].combine_chunks())
        return pa.table(
            {
                "lang": vc.field("values").cast(pa.string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = (
        back.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n_docs"))
        .take_all()
    )
    # Written output must agree with the manifests exactly.
    got = {r["lang"]: int(r["n_docs"]) for r in counts}
    assert got == manifests, (got, manifests)
    langs = sorted(got)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_docs": pa.array([got[l] for l in langs], pa.int64()),
        }
    )


def q_curation(sf_dir: str):
    """End-to-end training-data curation: quality gate (≥10 tokens, ≥30%
    ASCII-alpha) → exact dedup by text → per-language survivor counts.
    Chains E17 + text analysis + aggregation in one streaming pipeline."""
    from .functions.dedup import exact_dedup
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    ds = ds.map_batches(quality_batch, batch_format="pyarrow")

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["n_tokens"], 10),
            pc.greater_equal(batch["alpha_ratio_x1000"], 300),
        )
        return batch.filter(m)

    ds = ds.map_batches(keep, batch_format="pyarrow")
    deduped = exact_dedup(ds, key_col="text", id_col="doc_id")

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["lang"].combine_chunks())
        return pa.table(
            {
                "lang": vc.field("values"),
                "n_docs": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        deduped.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


SQL_CURATION = (
    "WITH q AS (SELECT doc_id, text, lang FROM documents"
    " WHERE CAST(len(string_split(text,' ')) AS BIGINT) >= 10"
    " AND CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)"
    " * 1000 // CAST(greatest(length(text), 1) AS BIGINT) >= 300),"
    " d AS (SELECT min(doc_id) AS doc_id, any_value(lang) AS lang FROM q"
    " GROUP BY text)"
    " SELECT lang, COUNT(*) AS n_docs FROM d GROUP BY lang"
)


def q_sample_hash(sf_dir: str):
    """Deterministic sampling, two variants in one long-format entry
    (variant, doc_id, lang):

    - 'hash10': 10% rate sample by id hash (map-only; resumable — the
      scale substitute for random_sample when reruns must see the same
      rows).
    - 'quota': stratified per-language quota (≤ 20 docs per lang, the
      smallest hash keys win — distributed ROW_NUMBER() OVER (PARTITION
      BY lang ORDER BY hash, id) ≤ k via functions/sampling.py: per-block
      local top-k pre-filter bounds the exchange by k·keys·blocks, then
      one hash-bucketed rank pass).
    - 'temp': temperature-tilted source resampling (quota per source ∝
      floor(sqrt(count)) of a 200-row budget — the α=½ data-mixing rule;
      sampling.temperature_sample: one tiny count exchange, then the
      same rank machinery with a per-key quota).
    - 'split_train'/'split_valid'/'split_test': deterministic 90/5/5
      hold-out assignment (sampling.split_assign: map-only, independent
      SPLIT_MULT hash so membership is uncorrelated with the rate
      sample).
    - 'bloom_dup': incremental Bloom-snapshot dedup (E20,
      state/bloom + dedup.bloom_build/bloom_dedup_against): the
      reference shard (doc_id % 3 == 0) builds an 8192-bit bitmap over
      its dirty URLs via the slice-bucketed distributed build, the new
      shard flags rows whose URL probes all-positive.  The oracle
      (oracle_sql.bloom_flag_sql) replays poly_hash_strings, the
      double-hash probe derivation and the bitmap INCLUDING false
      positives, so the row is exact, not merely plausible."""
    from .functions.dedup import bloom_build, bloom_dedup_against
    from .functions.sampling import (
        split_assign,
        stratified_sample,
        temperature_sample,
    )

    ds = _docs(sf_dir, ["doc_id", "lang"])

    def keep(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        # Reduce-first so (id % MOD) * MULT stays < 2^63 for ANY
        # nonnegative int64 id (bare id*MULT wraps in numpy above
        # ~3.5e9 and ERRORS in DuckDB; and mod 10 of the bare product
        # degenerates to doc_id % 10 since MULT ≡ 1 mod 10).
        h = ((d % 1000000007) * 2654435761) % 1000000007
        out = batch.filter(pa.array(h % 10 == 0))
        return out.append_column(
            "variant", pa.array(np.repeat("hash10", out.num_rows))
        )

    hash10 = ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    quota = stratified_sample(
        ds, key_col="lang", id_col="doc_id", k=20, num_rows=ds.count()
    ).map_batches(
        lambda b: b.append_column(
            "variant", pa.array(np.repeat("quota", b.num_rows))
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    temp = temperature_sample(
        _docs(sf_dir, ["doc_id", "lang", "source"]),
        key_col="source",
        id_col="doc_id",
        budget=200,
    ).map_batches(
        lambda b: b.append_column(
            "variant", pa.array(np.repeat("temp", b.num_rows))
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    split = split_assign(ds, id_col="doc_id").map_batches(
        lambda b: b.append_column(
            "variant",
            pc.binary_join_element_wise(
                pa.array(np.repeat("split", b.num_rows)), b["split"], "_"
            ),
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    def url_rows(batch: pa.Table) -> pa.Table:
        return _dirty_urls_batch(batch).append_column("lang", batch["lang"])

    urls = _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        url_rows, batch_format="pyarrow", batch_size=None
    )

    def ref_side(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() % 3 == 0))

    def new_side(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["doc_id"].to_numpy() % 3 != 0))

    bitmap = bloom_build(
        urls.map_batches(ref_side, batch_format="pyarrow", batch_size=None),
        "url",
        m_bits=1 << 13,
        k=5,
    )
    flagged = bloom_dedup_against(
        urls.map_batches(new_side, batch_format="pyarrow", batch_size=None),
        bitmap,
        "url",
        k=5,
        mode="flag",
    )

    def bloom_rows(batch: pa.Table) -> pa.Table:
        out = batch.filter(batch["maybe_dup"])
        return out.append_column(
            "variant", pa.array(np.repeat("bloom_dup", out.num_rows))
        )

    bloom = flagged.map_batches(
        bloom_rows, batch_format="pyarrow", batch_size=None
    )

    return (
        hash10.union(quota)
        .union(temp)
        .union(split)
        .union(bloom)
        .select_columns(["variant", "doc_id", "lang"])
    )


SQL_SAMPLE_HASH = (
    "SELECT 'hash10' AS variant, doc_id, lang FROM documents"
    " WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 10 = 0"
    " UNION ALL"
    " SELECT 'quota' AS variant, doc_id, lang FROM ("
    "  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang"
    "   ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id) AS rn"
    "  FROM documents)"
    " WHERE rn <= 20"
    " UNION ALL"
    " SELECT 'temp' AS variant, doc_id, lang FROM ("
    "  SELECT doc_id, lang, source, ROW_NUMBER() OVER"
    "   (PARTITION BY source"
    "   ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id) AS rn"
    "  FROM documents) r"
    " JOIN ("
    "  SELECT source, 200 * CAST(floor(sqrt(CAST(n AS DOUBLE)))"
    "   AS BIGINT) // (SELECT SUM(CAST(floor(sqrt(CAST(n AS DOUBLE)))"
    "    AS BIGINT)) FROM"
    "    (SELECT COUNT(*) AS n FROM documents GROUP BY source)) AS t"
    "  FROM (SELECT source, COUNT(*) AS n FROM documents"
    "   GROUP BY source)"
    " ) q USING (source)"
    " WHERE r.rn <= q.t"
    " UNION ALL"
    " SELECT CASE WHEN b < 90 THEN 'split_train'"
    "  WHEN b < 95 THEN 'split_valid'"
    "  ELSE 'split_test' END AS variant, doc_id, lang FROM ("
    "  SELECT doc_id, lang,"
    "   ((doc_id % 1000000007) * 2246822519) % 1000000007 % 100 AS b"
    "  FROM documents)"
)


def q_asof_orders(sf_dir: str):
    """As-of join: latest event of the same user at or before each order."""
    from .functions.asof import asof_last_event

    orders = _rd().read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    events = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    # Parquet-metadata row count (no execution) sizes the shuffle buckets.
    return asof_last_event(orders, events, num_rows=events.count())


def q_band_join(sf_dir: str):
    """Range/band join lineitem⋈part on quantity within ±2 of p_size."""
    from .functions.asof import band_join_counts
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_size", "p_brand"]
    )
    lineitem = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity"]
    )
    return band_join_counts(lineitem, part, band=2)


def q_events_sliding(sf_dir: str):
    """Sliding 60-min windows every 30 min per event_type."""
    from .functions.asof import sliding_window_counts

    events = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    return sliding_window_counts(events)


def q_neighbors_l8(sf_dir: str):
    """E10 as a pipeline op: 1→4 edge-neighbor expansion of each page's
    level-8 cell.  Oracle-exact: the SQL twin replays encode →
    inverse-Hilbert decode → ±size ij algebra (incl. the cross-face
    linear-projection wrap) → re-encode entirely in DuckDB
    (oracle_sql.s2_neighbors_sql); symmetry/parity also covered by
    pytest."""
    from .stages.encode import neighbors_expand

    ds = _points(sf_dir)
    ds = ds.map_batches(
        lambda b: cell_encode(b, level=8), batch_format="pyarrow"
    )
    ds = ds.map_batches(
        lambda b: neighbors_expand(b, keep_cols=["doc_id"]),
        batch_format="pyarrow",
    )

    def tokenize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "neighbor_token": ck.token_array_from_cell_id(
                    _np(batch["neighbor_id"])
                ),
            }
        )

    return ds.map_batches(tokenize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Round-2 additions: regex tokenizer, windowed rank, exact distributed
# quantiles, vector (centroid) aggregation
# ---------------------------------------------------------------------------


def q_distinct_hll(sf_dir: str):
    """HyperLogLog approximate distinct user count over events — the
    at-scale replacement for exact COUNT(DISTINCT): per-block register
    partials, ≤ 2^p rows cross the exchange, never the keys. Deterministic
    (hash-based, no RNG); ORACLE-EXACT since round 4 — the approximate
    ESTIMATE itself is replayed in SQL (oracle_sql.hll_distinct_sql:
    splitmix64, register max-merge, corrected Flajolet estimate) and the
    ±2% accuracy bound vs exact is additionally asserted in pytest."""
    from .functions.sketch import hll_distinct

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_distinct(ds, "user_id", p=12)


# Domain histogram folded into q_corpus_histograms (variant 'domain');
# the identical RE2 pattern runs through DuckDB regexp_extract here.
SQL_DOMAIN_COUNTS = (
    "SELECT regexp_extract('https://' || source || '.example/' ||"
    " CAST(doc_id AS VARCHAR), '^https://([^/]+)/', 1) AS lang,"
    " COUNT(*) AS n_docs FROM documents GROUP BY 1"
)


# Deterministic "dirty" URL per document — four mutually canonicalizing
# variants (www./case/scheme/tracking-param/fragment/trailing-slash
# noise) built from (source, doc_id) identically on both sides.
_SQL_DIRTY_URL = (
    "CASE CAST(doc_id % 4 AS INTEGER)"
    " WHEN 0 THEN 'https://www.' || source || '.Example/p/'"
    " || CAST(doc_id % 40 AS VARCHAR)"
    " WHEN 1 THEN 'http://' || source || '.example/p/'"
    " || CAST(doc_id % 40 AS VARCHAR) || '/'"
    " WHEN 2 THEN 'HTTPS://' || upper(source) || '.EXAMPLE/p/'"
    " || CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed'"
    " ELSE 'https://' || source || '.example/p/'"
    " || CAST(doc_id % 40 AS VARCHAR) || '?id=' ||"
    " CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x#frag'"
    " END"
)


def _dirty_urls_batch(batch: pa.Table) -> pa.Table:
    """Vectorized dirty-URL synthesis mirroring ``_SQL_DIRTY_URL``."""
    did = batch["doc_id"].to_numpy()
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    s40 = pa.array((did % 40).astype(np.int64)).cast(pa.string())
    s7 = pa.array((did % 7).astype(np.int64)).cast(pa.string())
    j = pc.binary_join_element_wise
    v0 = j("https://www.", src, ".Example/p/", s40, "")
    v1 = j("http://", src, ".example/p/", s40, "/", "")
    v2 = j("HTTPS://", pc.utf8_upper(src), ".EXAMPLE/p/", s40,
           "?utm_source=feed", "")
    v3 = j("https://", src, ".example/p/", s40, "?id=", s7,
           "&utm_campaign=x#frag", "")
    m = did % 4
    url = pc.if_else(
        pa.array(m == 0), v0,
        pc.if_else(pa.array(m == 1), v1, pc.if_else(pa.array(m == 2), v2, v3)),
    )
    return pa.table({"doc_id": batch["doc_id"], "url": url})


def q_url_dedup(sf_dir: str):
    """URL canonicalization + crawl dedup (functions/web.py): four dirty
    variants per logical URL (scheme/www/case/tracking-param/fragment/
    trailing-slash noise) are canonicalized by the shared RE2 rule chain
    and deduped in ONE hash-bucketed exchange keeping the max doc_id
    (latest crawl wins) plus the duplicate count.  The oracle applies
    the IDENTICAL rule chain via DuckDB regexp_replace — both sides are
    generated from web.URL_CANON_RULES, so they cannot drift."""
    from .functions.web import url_dedup

    ds = _docs(sf_dir, ["doc_id", "source"])
    n = ds.count()
    dirty = ds.map_batches(
        _dirty_urls_batch, batch_format="pyarrow", batch_size=None
    )
    return url_dedup(dirty, url_col="url", id_col="doc_id", num_rows=n)


def _sql_canon_url(expr: str) -> str:
    """The URL_CANON_RULES chain as nested DuckDB regexp_replace calls —
    generated from the same rule list the Arrow kernel executes."""
    from .functions.web import URL_CANON_RULES

    out = f"lower({expr})"
    for pat, rep in URL_CANON_RULES:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


SQL_URL_DEDUP = (
    f"WITH dirty AS (SELECT doc_id, {_SQL_DIRTY_URL} AS url FROM documents),"
    f" canon AS (SELECT doc_id, {_sql_canon_url('url')} AS url FROM dirty)"
    " SELECT url, MAX(doc_id) AS doc_id, COUNT(*) AS n_dups"
    " FROM canon GROUP BY url"
)


_WEBTEXT_STATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("lang", pa.string()),
        ("n_chars", pa.int64()),
        ("dup_bigram_x1000", pa.int64()),
        ("n_pii", pa.int64()),
        ("scrubbed_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("surprisal_bits", pa.int64()),
        ("n_bigrams", pa.int64()),
        ("bigram_bits", pa.int64()),
    ]
)


def q_webtext_quality(sf_dir: str, _vocab_budget: int | None = None):
    """Webtext curation stats, one row per document: Gopher-style
    duplicate-bigram fraction ×1000 (repetition gate), PII match count +
    post-scrub length (emails/phones planted deterministically from
    doc_id so the RE2 kernels have real work), the corpus-unigram
    surprisal score (a unigram "LM" counted from the corpus itself,
    broadcast, then summed per doc as INTEGER Shannon code lengths —
    floor(log2(total/freq)) via bit_length, so no float log can diverge
    from the oracle's printf('%b') computation), and the deterministic
    sequence-packing bin (running corpus chars within the doc's language
    // 4000).  Repetition + PII + scoring are map-only Arrow/numpy
    kernels; packing is the two-phase distributed prefix sum in
    web.pack_sequences (tiny per-chunk partials driver-combined, then
    ONE bounded-group exchange).  The stats stream is materialized
    before packing so the partial-sum pass reads the lean table instead
    of re-running the text kernels.

    The LM vocabularies are BUDGET-GATED (web.VOCAB_BROADCAST_BUDGET;
    ``_vocab_budget`` overrides for tests): under budget both models
    gather as Arrow blocks and broadcast once via ``ray.put`` into the
    fused stats pass; above it the models stay distributed and the two
    bits columns come from the hash-sharded scoring exchanges
    (web.unigram_bits_sharded / bigram_bits_sharded), overlaid onto the
    stats stream by ONE id-bucketed exchange (web.overlay_id_columns).
    Both paths are bit-identical (pinned by tests/test_web.py)."""
    import ray as _ray

    from .functions.web import (
        VOCAB_BROADCAST_BUDGET,
        bigram_bits_sharded,
        bigram_code_lengths,
        bigram_surprisal_batch,
        lm_models_ds,
        overlay_id_columns,
        pack_sequences,
        pii_scrub_batch,
        repetition_x1000_batch,
        surprisal_batch,
        unigram_bits_sharded,
        unigram_code_lengths,
    )

    ds = _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])
    n = ds.count()
    budget = (
        VOCAB_BROADCAST_BUDGET if _vocab_budget is None else _vocab_budget
    )
    # ONE tokenize pass + ONE exchange builds BOTH LM models (the
    # separate builders each re-read the corpus).  Each model dataset is
    # consumed twice (the budget count, then the gather or the sharded
    # scorer), so pin both ONCE — unmaterialized they re-ran the build
    # exchange per consumer (measured: 12 executions per call, the model
    # plans all twice).  Vocab-sized state: plasma-resident, spills.
    uni_model, bg_model = lm_models_ds(_docs(sf_dir, ["text"]))
    uni_model = uni_model.materialize()
    bg_model = bg_model.materialize()
    sharded = max(uni_model.count(), bg_model.count()) > budget
    if sharded:
        model_ref = None
    else:
        vocab, code_len, _total = unigram_code_lengths(
            None, model_ds=uni_model
        )
        bg_vocab, bg_code_len = bigram_code_lengths(
            None, model_ds=bg_model
        )
        model_ref = _ray.put((vocab, code_len, bg_vocab, bg_code_len))

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        did = batch["doc_id"].to_numpy()
        rep = repetition_x1000_batch(texts)
        j = pc.binary_join_element_wise
        s_id = pc.cast(batch["doc_id"], pa.string())
        email = j(" contact user", s_id, "@mail.example", "")
        phone = j(
            " call +1-555-",
            pc.utf8_lpad(
                pa.array((did % 10000).astype(np.int64)).cast(pa.string()),
                4,
                "0",
            ),
            "",
        )
        aug = j(
            texts,
            pc.if_else(pa.array(did % 3 == 0), email, ""),
            pc.if_else(pa.array(did % 5 == 0), phone, ""),
            "",
        )
        n_email, n_phone, scrubbed = pii_scrub_batch(aug)
        if model_ref is None:
            # sharded path: bits columns start 0 and are overlaid by the
            # sharded scorers below; empty models still yield the local
            # n_tokens / n_bigrams counts
            v = cl = bgv = bgcl = np.zeros(0, np.int64)
        else:
            from .functions.dedup import _get_broadcast

            v, cl, bgv, bgcl = _get_broadcast(model_ref)
        n_tok, bits = surprisal_batch(texts, v, cl)
        n_bg, bg_bits = bigram_surprisal_batch(texts, bgv, bgcl)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_chars": batch["n_chars"],
                "dup_bigram_x1000": rep,
                "n_pii": pc.add(n_email, n_phone),
                "scrubbed_chars": pc.cast(
                    pc.utf8_length(scrubbed), pa.int64()
                ),
                "n_tokens": n_tok,
                "surprisal_bits": bits,
                "n_bigrams": n_bg,
                "bigram_bits": bg_bits,
            }
        )

    lean = ds.map_batches(stats, batch_format="pyarrow", batch_size=None)
    if sharded:
        texts = _docs(sf_dir, ["doc_id", "text"])
        lean = overlay_id_columns(
            lean,
            [
                (
                    unigram_bits_sharded(texts, model_ds=uni_model),
                    "surprisal_bits",
                ),
                (
                    bigram_bits_sharded(texts, model_ds=bg_model),
                    "bigram_bits",
                ),
            ],
            _WEBTEXT_STATS_SCHEMA,
            num_rows=n,
        )
    lean = lean.materialize()
    packed = pack_sequences(
        lean, size_col="n_chars", part_col="lang", id_col="doc_id",
        budget=4000, num_rows=n,
    )
    return packed.select_columns(
        [
            "doc_id",
            "dup_bigram_x1000",
            "n_pii",
            "scrubbed_chars",
            "n_tokens",
            "surprisal_bits",
            "n_bigrams",
            "bigram_bits",
            "pack_bin",
        ]
    )


def _sql_webtext_quality() -> str:
    from .functions.web import EMAIL_RE, PHONE_RE

    aug = (
        "text || CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||"
        " CAST(doc_id AS VARCHAR) || '@mail.example' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' ||"
        " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    scrub = (
        "regexp_replace(regexp_replace(atext, '" + EMAIL_RE
        + "', '[PII]', 'g'), '" + PHONE_RE + "', '[PII]', 'g')"
    )
    return (
        "WITH aug AS (SELECT doc_id, " + aug + " AS atext FROM documents),"
        " pii AS (SELECT doc_id,"
        " CAST(len(regexp_extract_all(atext, '" + EMAIL_RE + "')) +"
        " len(regexp_extract_all(atext, '" + PHONE_RE + "')) AS BIGINT)"
        " AS n_pii,"
        " CAST(length(" + scrub + ") AS BIGINT) AS scrubbed_chars"
        " FROM aug),"
        " words AS (SELECT doc_id, string_split(text, ' ') AS ws"
        " FROM documents),"
        " dis AS (SELECT doc_id, COUNT(DISTINCT"
        " list_extract(ws, i) || ' ' || list_extract(ws, i + 1)) AS d"
        " FROM words, unnest(range(1, len(ws))) AS t(i) GROUP BY doc_id),"
        " rep AS (SELECT w.doc_id, CASE WHEN len(w.ws) - 1 <= 0 THEN 0"
        " ELSE 1000 * (len(w.ws) - 1 - COALESCE(d.d, 0)) // (len(w.ws) - 1)"
        " END AS dup_bigram_x1000"
        " FROM words w LEFT JOIN dis d ON w.doc_id = d.doc_id),"
        " pack AS (SELECT doc_id, COALESCE(SUM(n_chars) OVER"
        " (PARTITION BY lang ORDER BY doc_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4000"
        " AS pack_bin FROM documents),"
        # Corpus-unigram surprisal: integer Shannon code length per token
        # — floor(log2(total // freq)) via the binary printf, bit-exact
        # with the Ray kernel's bit_length loop.
        " toks AS (SELECT doc_id, w FROM (SELECT doc_id,"
        " unnest(string_split(text, ' ')) AS w FROM documents)"
        " WHERE w <> ''),"
        " ufreq AS (SELECT w, COUNT(*) AS f FROM toks GROUP BY w),"
        " utot AS (SELECT COUNT(*) AS t FROM toks),"
        " surp AS (SELECT toks.doc_id, COUNT(*) AS n_tokens,"
        " SUM(length(printf('%b', (SELECT t FROM utot) // ufreq.f)) - 1)"
        " AS surprisal_bits"
        " FROM toks JOIN ufreq ON toks.w = ufreq.w GROUP BY toks.doc_id),"
        # Bigram LM: P(w|c) code length = floor(log2(count(c,*)//
        # count(c,w))), summed per doc over adjacent non-empty tokens —
        # mirrors web.bigram_code_lengths/bigram_surprisal_batch.
        " otoks AS (SELECT doc_id, w, ord FROM (SELECT doc_id,"
        " unnest(string_split(text, ' ')) AS w,"
        " unnest(range(len(string_split(text, ' ')))) AS ord"
        " FROM documents) WHERE w <> ''),"
        " seq AS (SELECT doc_id, w, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY ord) AS r FROM otoks),"
        " big AS (SELECT doc_id, w AS c, lead(w) OVER"
        " (PARTITION BY doc_id ORDER BY r) AS nx FROM seq"
        " QUALIFY nx IS NOT NULL),"
        " bgf AS (SELECT c, nx, COUNT(*) AS f FROM big GROUP BY c, nx),"
        " ctxf AS (SELECT c, COUNT(*) AS cf FROM big GROUP BY c),"
        " bsurp AS (SELECT big.doc_id, COUNT(*) AS n_bigrams,"
        " SUM(length(printf('%b', ctxf.cf // bgf.f)) - 1) AS bigram_bits"
        " FROM big JOIN bgf ON big.c = bgf.c AND big.nx = bgf.nx"
        " JOIN ctxf ON big.c = ctxf.c GROUP BY big.doc_id)"
        " SELECT r.doc_id, CAST(r.dup_bigram_x1000 AS BIGINT)"
        " AS dup_bigram_x1000, p.n_pii, p.scrubbed_chars,"
        " CAST(s.n_tokens AS BIGINT) AS n_tokens,"
        " CAST(s.surprisal_bits AS BIGINT) AS surprisal_bits,"
        " CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,"
        " CAST(COALESCE(b.bigram_bits, 0) AS BIGINT) AS bigram_bits,"
        " CAST(k.pack_bin AS BIGINT) AS pack_bin"
        " FROM rep r JOIN pii p ON r.doc_id = p.doc_id"
        " JOIN surp s ON r.doc_id = s.doc_id"
        " LEFT JOIN bsurp b ON r.doc_id = b.doc_id"
        " JOIN pack k ON r.doc_id = k.doc_id"
    )


SQL_WEBTEXT_QUALITY = _sql_webtext_quality()


def q_line_dedup(sf_dir: str):
    """CCNet-style corpus-level duplicated-line removal (E27): delete
    every line occurring ≥2 times across the corpus, keep the rest in
    order.  The synthetic documents are single-line word streams, so the
    query first derives a deterministic multi-line corpus by wrapping
    after every 8th word with ONE RE2 replace — the identical pattern the
    oracle applies in SQL (both engines are RE2; byte-identical, verified
    like q_text_identity's html derivation).  The operator itself is
    web.line_dedup: per-block pre-aggregated line-hash counts → one tiny
    groupby exchange → broadcast dup set → stateless strip pass."""
    from .functions.web import (
        LINE_WRAP_PATTERN,
        collapse_repeated_tokens_batch,
        line_dedup,
    )

    ds = _docs(sf_dir, ["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        t = pc.replace_substring_regex(
            batch["text"], pattern=LINE_WRAP_PATTERN, replacement="\\1\n"
        )
        ix = batch.schema.get_field_index("text")
        return batch.set_column(ix, "text", t)

    corpus = line_dedup(
        ds.map_batches(wrap, batch_format="pyarrow", batch_size=None),
        min_count=2,
    ).map_batches(
        lambda b: b.append_column(
            "variant", pa.array(np.repeat("corpus", b.num_rows))
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    # Second variant: intra-doc stutter removal over raw space tokens —
    # map-only, exact string adjacency compare (no corpus state).
    def collapse(batch: pa.Table) -> pa.Table:
        t, kept, dropped = collapse_repeated_tokens_batch(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": t,
                "n_lines_kept": kept,
                "n_lines_dropped": dropped,
                "variant": pa.array(np.repeat("collapse", batch.num_rows)),
            }
        )

    collapsed = ds.map_batches(
        collapse, batch_format="pyarrow", batch_size=None
    )

    # Third variant: exact duplicated-substring removal (Lee et al. span
    # dedup over word 6-gram windows) on the raw space-token stream.
    from .functions.dedup import duplicated_span_strip

    spans = duplicated_span_strip(ds, n=6, min_count=2).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "text": b["text"],
                "n_lines_kept": b["n_tok_kept"],
                "n_lines_dropped": b["n_tok_dropped"],
                "variant": pa.array(np.repeat("substring", b.num_rows)),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    cols = ["variant", "doc_id", "text", "n_lines_kept", "n_lines_dropped"]
    return (
        corpus.select_columns(cols)
        .union(collapsed.select_columns(cols))
        .union(spans.select_columns(cols))
    )


SQL_LINE_DEDUP = (
    "WITH d AS ("
    " SELECT doc_id, string_split(regexp_replace(text,"
    " '([^ ]+( [^ ]+){7}) ', '\\1' || chr(10), 'g'), chr(10)) AS ls"
    " FROM documents"
    "), lines AS ("
    " SELECT doc_id, unnest(ls) AS line, unnest(range(len(ls))) AS ord"
    " FROM d"
    "), dup AS ("
    " SELECT line, TRUE AS is_dup FROM lines GROUP BY line"
    " HAVING COUNT(*) >= 2"
    "), toks AS ("
    " SELECT doc_id, unnest(string_split(text, ' ')) AS line,"
    " unnest(range(len(string_split(text, ' ')))) AS ord FROM documents"
    "), coll AS ("
    " SELECT doc_id, line, ord, CASE WHEN lag(line) OVER"
    " (PARTITION BY doc_id ORDER BY ord) = line THEN 0 ELSE 1 END AS kp"
    " FROM toks"
    ") SELECT 'corpus' AS variant, l.doc_id,"
    " coalesce(string_agg(l.line, chr(10) ORDER BY l.ord)"
    "   FILTER (WHERE dup.is_dup IS NULL), '') AS text,"
    " CAST(COUNT(*) FILTER (WHERE dup.is_dup IS NULL) AS BIGINT)"
    "   AS n_lines_kept,"
    " CAST(COUNT(*) FILTER (WHERE dup.is_dup) AS BIGINT)"
    "   AS n_lines_dropped"
    " FROM lines l LEFT JOIN dup USING (line) GROUP BY l.doc_id"
    " UNION ALL"
    " SELECT 'collapse' AS variant, doc_id,"
    " coalesce(string_agg(line, ' ' ORDER BY ord)"
    "   FILTER (WHERE kp = 1), '') AS text,"
    " CAST(COUNT(*) FILTER (WHERE kp = 1) AS BIGINT) AS n_lines_kept,"
    " CAST(COUNT(*) FILTER (WHERE kp = 0) AS BIGINT) AS n_lines_dropped"
    " FROM coll GROUP BY doc_id"
    " UNION ALL"
    " SELECT 'substring' AS variant, doc_id,"
    " coalesce(string_agg(line, ' ' ORDER BY ord)"
    "   FILTER (WHERE covered = 0), '') AS text,"
    " CAST(COUNT(*) FILTER (WHERE covered = 0) AS BIGINT) AS n_lines_kept,"
    " CAST(COUNT(*) FILTER (WHERE covered = 1) AS BIGINT)"
    "   AS n_lines_dropped"
    " FROM ("
    "  SELECT doc_id, ord, line, MAX(isd) OVER (PARTITION BY doc_id"
    "   ORDER BY ord ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS covered"
    "  FROM ("
    "   SELECT g.doc_id, g.ord, g.line,"
    "    CASE WHEN dupg.gram IS NOT NULL THEN 1 ELSE 0 END AS isd"
    "   FROM ("
    "    SELECT doc_id, ord, line, CASE WHEN lead(line,5) OVER w IS NOT NULL"
    "     THEN line || ' ' || lead(line,1) OVER w || ' ' || lead(line,2) OVER w"
    "      || ' ' || lead(line,3) OVER w || ' ' || lead(line,4) OVER w"
    "      || ' ' || lead(line,5) OVER w END AS gram"
    "    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)"
    "   ) g LEFT JOIN ("
    "    SELECT gram FROM ("
    "     SELECT CASE WHEN lead(line,5) OVER w IS NOT NULL"
    "      THEN line || ' ' || lead(line,1) OVER w || ' ' || lead(line,2) OVER w"
    "       || ' ' || lead(line,3) OVER w || ' ' || lead(line,4) OVER w"
    "       || ' ' || lead(line,5) OVER w END AS gram"
    "     FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord))"
    "    WHERE gram IS NOT NULL GROUP BY gram HAVING COUNT(*) >= 2"
    "   ) dupg USING (gram)"
    " )) GROUP BY doc_id"
)


def q_native_join(sf_dir: str):
    """Ray Data's built-in hash join (Dataset.join, Ray 2.49) exercised
    end-to-end: orders ⋈ customer on custkey → per-segment count +
    total price (integer cents for exact compare)."""
    from ray.data.aggregate import Sum

    orders = _rd().read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = _rd().read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=16,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            _np(batch["o_totalprice"]) * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {"c_mktsegment": batch["c_mktsegment"], "cents": pa.array(cents)}
        )
        agg = t.group_by("c_mktsegment").aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        return pa.table(
            {
                "c_mktsegment": agg["c_mktsegment"],
                "n_orders": agg["count_all"],
                "total_cents": agg["cents_sum"],
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )


SQL_NATIVE_JOIN = (
    "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,"
    " CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)"
    " AS total_cents FROM orders o JOIN customer c"
    " ON o.o_custkey = c.c_custkey GROUP BY c_mktsegment"
)


def q_text_identity(sf_dir: str):
    """North-rule invariant, checked end-to-end: ``text`` must arrive
    byte-identical per url/doc.  Round 4 hardened this from a
    pass-through check to a real EXTRACTION check — the query reads the
    ``html`` column only and recovers the text with the vectorized
    HTML→text extractor (web.html_text_batch: RE2 tag strip + entity
    decode), then rides it through the geocode map stage; the driver
    hash-compares every byte against the raw documents table."""
    from .functions.web import html_text_batch

    ds = read_pages(sf_dir, columns=["url", "html", "doc_id"])

    def extract(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": batch["url"],
                "text": html_text_batch(batch["html"]),
            }
        )

    ds = ds.map_batches(extract, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["doc_id", "url", "text"])


SQL_TEXT_IDENTITY = (
    "SELECT doc_id, 'https://' || source || '.example/' ||"
    " CAST(doc_id AS VARCHAR) AS url, text FROM documents"
)


def q_top_orders_per_cust(sf_dir: str):
    """Windowed rank (partitioned top-k): top-3 orders per customer by
    (o_totalprice DESC, o_orderkey ASC). Rows shuffle on a customer-hash
    bucket (data-proportional count); inside a bucket one lexsort ranks
    every customer at once — the distributed ROW_NUMBER() OVER pattern.
    """
    from .functions._buckets import derive_buckets

    ds = _rd().read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )
    n_buckets = derive_buckets(ds.count())

    from .functions._buckets import hash_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = hash_buckets(batch["o_custkey"].to_numpy(), n_buckets)
        return batch.append_column("_cb", pa.array(b))

    def rank_bucket(group: pa.Table) -> pa.Table:
        cust = group["o_custkey"].to_numpy()
        okey = group["o_orderkey"].to_numpy()
        price = group["o_totalprice"].to_numpy()
        order = np.lexsort((okey, -price, cust))
        cust_s = cust[order]
        new_seg = np.concatenate([[True], cust_s[1:] != cust_s[:-1]])
        seg_start = np.repeat(
            np.nonzero(new_seg)[0], np.diff(np.append(np.nonzero(new_seg)[0], len(cust_s)))
        )
        rnk = np.arange(len(cust_s)) - seg_start + 1
        keep = rnk <= 3
        sel = order[keep]
        return pa.table(
            {
                "o_custkey": pa.array(cust[sel]),
                "rnk": pa.array(rnk[keep].astype(np.int64)),
                "o_orderkey": pa.array(okey[sel]),
                "o_totalprice": pa.array(price[sel]),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_cb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


SQL_TOP_ORDERS_PER_CUST = (
    "SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM ("
    " SELECT o_custkey, o_orderkey, o_totalprice,"
    " CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey"
    " ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk"
    " FROM orders) WHERE rnk <= 3"
)


def q_quantiles(sf_dir: str):
    """ALL THREE exact distributed-quantile kernels in one long-format
    entry (variant, q, value):

    - 'int_hist': bounded-integer column (lineitem.l_quantity) via
      per-block bincount partials → tiny groupby → read off the merged
      cumulative histogram.
    - 'fixed_point': continuous events.value through the ×100-cents
      fixed-point grid (sparse value_counts partials, groupby-sum merge
      — driver state bounded by the grid domain, never row count).
    - 'bracket': the fully general continuous path — min/max pass,
      iterative histogram bracket narrowing, exact gather of only the
      surviving bracket rows (small gather_cap deliberately forces the
      histogram passes even at test scale). Returns the ORIGINAL stored
      doubles, bit-comparable with the oracle.

    All values cast to float64 (exact for these magnitudes). Consolidates
    the former q_quantiles / q_quantiles_float / q_quantiles_bracket
    registry rows."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity"]
    )
    max_q = 64

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["l_quantity"].to_numpy().astype(np.int64)
        if len(v) and (v.min() < 0 or v.max() > max_q):
            raise ValueError(
                f"l_quantity outside histogram domain [0, {max_q}]: "
                f"[{v.min()}, {v.max()}] — raise max_q"
            )
        hist = np.bincount(v, minlength=max_q + 1)
        return pa.table(
            {
                "v": pa.array(np.arange(max_q + 1, dtype=np.int64)),
                "n": pa.array(hist.astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    hist = np.zeros(max_q + 1, dtype=np.int64)
    for r in rows:
        hist[int(r["v"])] = int(r["n"])
    cum = np.cumsum(hist)
    n = int(cum[-1])
    qs = [25, 50, 75, 90, 99]
    vals = []
    for q in qs:
        k = int(np.floor(q / 100.0 * (n - 1)))
        vals.append(int(np.searchsorted(cum, k + 1, side="left")))
    int_tbl = pa.table(
        {
            "q": pa.array(qs, pa.int64()),
            "value": pa.array(vals, pa.int64()),
        }
    )

    from .functions.quantiles import exact_float_quantiles, fixed_point_quantiles

    ds_ev = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    fixed_tbl = fixed_point_quantiles(ds_ev, "value", qs, scale=100)
    ds_ev2 = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    # bins/passes sized for skew: events.value is heavy-tailed, so a
    # bracket does NOT shrink uniformly per pass (sf0.1 left ~11k
    # residuals after 2 passes of 512). Extra passes only refine
    # brackets before the exact gather — the order statistics (and the
    # oracle hash) are pass-count invariant.
    bracket_tbl = exact_float_quantiles(
        ds_ev2, "value", qs, bins=512, max_passes=4, gather_cap=200_000
    )

    def tagged(tbl: pa.Table, name: str, vcol: str) -> pa.Table:
        return pa.table(
            {
                "variant": pa.array([name] * len(tbl), pa.string()),
                "q": tbl["q"],
                "value": pc.cast(tbl[vcol], pa.float64()),
            }
        )

    # PER-GROUP leg (l_quantity by l_returnflag; consolidates the former
    # q_quantiles_by_group registry row): sparse (group, value, count)
    # partials via np.unique per block → tiny groupby-sum → per-group
    # cumulative pick; one row per (group, q) with variant
    # 'group_<flag>'.  Driver state is bounded by distinct (group,
    # value) combos, never row count.
    ds_grp = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    gqs = [25, 50, 75, 99]
    gpartial = _grouped_value_counts("l_returnflag", "l_quantity")
    grows = (
        ds_grp.map_batches(gpartial, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    from collections import defaultdict

    per_group: dict = defaultdict(list)
    for r in grows:
        per_group[r["l_returnflag"]].append((int(r["v"]), int(r["n"])))
    gv, gq, gval = [], [], []
    for flag in sorted(per_group):
        for q in gqs:
            gv.append(f"group_{flag}")
            gq.append(q)
            gval.append(_order_stat(per_group[flag], q / 100.0))
    group_tbl = pa.table(
        {
            "variant": pa.array(gv, pa.string()),
            "q": pa.array(gq, pa.int64()),
            "value": pa.array([float(v) for v in gval], pa.float64()),
        }
    )

    return pa.concat_tables(
        [
            tagged(int_tbl, "int_hist", "value"),
            tagged(fixed_tbl, "fixed_point", "value_cents"),
            tagged(bracket_tbl, "bracket", "value"),
            group_tbl,
        ]
    )


_SQL_QUANTILES_INT = (
    "WITH s AS (SELECT l_quantity,"
    " ROW_NUMBER() OVER (ORDER BY l_quantity) - 1 AS r FROM lineitem),"
    " n AS (SELECT COUNT(*) AS c FROM lineitem)"
    " SELECT CAST(v.q AS BIGINT) AS q, CAST(s.l_quantity AS BIGINT) AS value"
    " FROM (VALUES (25),(50),(75),(90),(99)) AS v(q) JOIN s ON s.r ="
    " CAST(floor(v.q / 100.0 * ((SELECT c FROM n) - 1)) AS BIGINT)"
)


def q_ngram_jaccard(sf_dir: str):
    """Exact word-bigram Jaccard similarity join (threshold 0.5) via
    distributed prefix filtering + native-join verification — the
    guaranteed-complete dedup path (vs probabilistic MinHash-LSH), fully
    oracle-checked. See functions/dedup.py ngram_jaccard_pairs for the
    prefix-bound proof and scale notes."""
    from .functions.dedup import ngram_jaccard_pairs

    ds = _docs(sf_dir, ["doc_id", "text"])
    # Trigram t=0.8 (the crawl-realistic config, same as the bench
    # headline): the former bigram/0.5 config is degenerate above sf0.01
    # on the synthetic corpus (tiny vocabulary => ~all pairs survive
    # prefix filtering and the candidate guards fire, correctly) — this
    # config is exact AND non-empty at every testdata scale.
    return ngram_jaccard_pairs(
        ds, n=3, threshold=0.8, num_rows=ds.count()
    )


SQL_NGRAM_JACCARD = (
    "WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws"
    " FROM documents),"
    " grams AS (SELECT DISTINCT doc_id,"
    " list_extract(ws, i) || ' ' || list_extract(ws, i + 1) || ' ' ||"
    " list_extract(ws, i + 2) AS g"
    " FROM words, unnest(range(1, len(ws) - 1)) AS t(i)),"
    " sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),"
    " inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
    " COUNT(*) AS inter_n FROM grams a"
    " JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)"
    " SELECT id_a, id_b, inter_n,"
    " sa.n + sb.n - inter_n AS union_n,"
    " CAST(1000 * inter_n // (sa.n + sb.n - inter_n) AS BIGINT) AS jac_x1000"
    " FROM inter JOIN sizes sa ON sa.doc_id = id_a"
    " JOIN sizes sb ON sb.doc_id = id_b"
    " WHERE inter_n * 1000 >= 800 * (sa.n + sb.n - inter_n)"
)


def q_dedup_clusters(sf_dir: str):
    """Cluster-based near-dup grouping: distributed connected components
    (functions/cc.py — alternating large-star/small-star, shuffle-only,
    O(log² n) rounds over the compact pair stream) over the exact
    word-trigram Jaccard edges (threshold 0.8, the crawl-realistic
    config — exact at every testdata scale).  Output: every non-isolated
    doc mapped to its cluster's minimum doc_id — the keep-one-per-cluster
    primitive consumers use to drop whole duplicate groups rather than
    single pair losers.  Oracle: DuckDB recursive-CTE transitive closure
    over the identical edge SQL."""
    from .functions.cc import connected_components
    from .functions.dedup import ngram_jaccard_pairs

    ds = _docs(sf_dir, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, n=3, threshold=0.8, num_rows=ds.count())
    edges = pairs.select_columns(["id_a", "id_b"])
    return connected_components(edges).rename_columns(["doc_id", "component"])


SQL_DEDUP_CLUSTERS = (
    "WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ("
    + SQL_NGRAM_JACCARD
    + ")), und AS (SELECT id_a AS u, id_b AS v FROM pairs"
    " UNION SELECT id_b, id_a FROM pairs),"
    " reach(u, v) AS (SELECT u, v FROM und"
    " UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)"
    " SELECT u AS doc_id, least(u, min(v)) AS component"
    " FROM reach GROUP BY u"
)


def golden_sketch_docs() -> pa.Table:
    """Fixed 64-doc corpus for the sketch golden — generated in code from
    a seeded vocabulary, independent of ``sf_dir`` so one frozen golden
    serves every scale factor (same pattern as golden_cover_regions)."""
    rng = np.random.default_rng(20260817)
    vocab = np.array(
        [f"tok{i}" for i in range(300)] + ["the", "and", "data", "ray"]
    )
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(5, 60))))
        for _ in range(60)
    ]
    # edge rows: empty, single token, repeated token, unicode-ish
    texts += ["", "one", "dup dup dup dup", "café touché naïve"]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def q_sketch_golden(sf_dir: str):
    """CORRECTNESS row for the sketch kernels that SQL cannot express
    (minhash signature, simhash, rolling-hash fingerprint): computed over
    the fixed in-code corpus through the real Ray stages, compared to a
    frozen parquet golden (regression anchor, not an independent
    derivation — regenerate via tools/make_sketch_golden.py only on an
    intentional semantic change)."""
    from .functions.dedup import MinHashStage, simhash_batch
    from .functions.text import fingerprint_batch

    docs = golden_sketch_docs()
    ds = _rd().from_arrow(docs).repartition(4)

    def sketch(batch: pa.Table) -> pa.Table:
        sigs = MinHashStage(num_hashes=16, shingle_n=3)(batch)
        sh = simhash_batch(batch)["simhash"].to_numpy().view(np.int64)
        fp = fingerprint_batch(batch)["fingerprint"].to_numpy().view(np.int64)
        sig = sigs["minhash"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        heads = (
            sig.flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(-1, 16)[:, 0]
            .copy()
            .view(np.int64)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "minhash_head": pa.array(heads),
                "simhash": pa.array(sh),
                "fingerprint": pa.array(fp),
            }
        )

    return ds.map_batches(sketch, batch_format="pyarrow", batch_size=None)


_SKETCH_GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "sketch_golden.parquet",
)
SQL_SKETCH_GOLDEN = (
    "SELECT doc_id, minhash_head, simhash, fingerprint"
    f" FROM read_parquet('{_SKETCH_GOLDEN_PATH}')"
)


def q_heavy_hitters(sf_dir: str):
    """Exact φ-frequent users (count·128 ≥ n of events) via the two-pass
    bounded-memory heavy-hitter operator (functions/sketch.frequent_items)
    — per-block top-capacity summaries generate candidates, an exact
    broadcast recount finalizes; never a full-cardinality groupby."""
    from .functions.sketch import frequent_items

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    out = frequent_items(ds, "user_id", phi_denom=128, num_rows=ds.count())
    return out.rename_columns(["user_id", "n_events"])


SQL_HEAVY_HITTERS = (
    "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id"
    " HAVING COUNT(*) * 128 >= (SELECT COUNT(*) FROM events)"
)


def q_decontaminate(sf_dir: str):
    """Test-set decontamination: flag documents sharing any word bigram
    with a deterministic probe set (docs with doc_id % 100 == 7 stand in
    for the benchmark corpus). Probe gram hashes broadcast once; the
    corpus side is one shuffle-free vectorized map pass
    (functions/dedup.decontaminate)."""
    import pyarrow.parquet as pq

    from .functions.dedup import decontaminate

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    probe_mask = pa.array(docs["doc_id"].to_numpy() % 100 == 7)
    probe_texts = docs.filter(probe_mask)["text"].to_pylist()
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = decontaminate(ds, probe_texts, n=2, mode="flag")
    return out.select_columns(["doc_id", "contaminated", "n_hits"])


SQL_DECONTAMINATE = (
    "WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws"
    " FROM documents),"
    " grams AS (SELECT DISTINCT doc_id,"
    " list_extract(ws, i) || ' ' || list_extract(ws, i + 1) AS g"
    " FROM words, unnest(range(1, len(ws))) AS t(i)),"
    " probe AS (SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 7),"
    " hits AS (SELECT g.doc_id, COUNT(DISTINCT g.g) AS n_hits"
    " FROM grams g JOIN probe p ON g.g = p.g GROUP BY 1)"
    " SELECT d.doc_id, COALESCE(h.n_hits, 0) > 0 AS contaminated,"
    " CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits"
    " FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id"
)


SQL_QUANTILES_FLOAT = (
    "WITH s AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c"
    " FROM events),"
    " o AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) - 1 AS r FROM s),"
    " n AS (SELECT COUNT(*) AS cnt FROM events)"
    " SELECT CAST(v.q AS BIGINT) AS q, o.c AS value_cents"
    " FROM (VALUES (25),(50),(75),(90),(99)) AS v(q) JOIN o ON o.r ="
    " CAST(floor(v.q / 100.0 * ((SELECT cnt FROM n) - 1)) AS BIGINT)"
)


SQL_QUANTILES_BRACKET = (
    "WITH o AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value) - 1 AS r"
    " FROM events),"
    " n AS (SELECT COUNT(*) AS cnt FROM events)"
    " SELECT CAST(v.q AS BIGINT) AS q, o.value AS value"
    " FROM (VALUES (25),(50),(75),(90),(99)) AS v(q) JOIN o ON o.r ="
    " CAST(floor(v.q / 100.0 * ((SELECT cnt FROM n) - 1)) AS BIGINT)"
)

SQL_QUANTILES_BY_GROUP = (
    "WITH s AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v"
    " FROM lineitem),"
    " o AS (SELECT l_returnflag, v, ROW_NUMBER() OVER"
    " (PARTITION BY l_returnflag ORDER BY v) - 1 AS r FROM s),"
    " n AS (SELECT l_returnflag, COUNT(*) AS cnt FROM s GROUP BY 1)"
    " SELECT o.l_returnflag, CAST(q.q AS BIGINT) AS q, o.v AS value"
    " FROM (VALUES (25),(50),(75),(99)) AS q(q)"
    " JOIN n ON true JOIN o ON o.l_returnflag = n.l_returnflag"
    " AND o.r = CAST(floor(q.q / 100.0 * (n.cnt - 1)) AS BIGINT)"
)

SQL_QUANTILES = (
    "SELECT 'int_hist' AS variant, q, CAST(value AS DOUBLE) AS value"
    f" FROM ({_SQL_QUANTILES_INT})"
    " UNION ALL SELECT 'fixed_point', q, CAST(value_cents AS DOUBLE)"
    f" FROM ({SQL_QUANTILES_FLOAT})"
    f" UNION ALL SELECT 'bracket', q, value FROM ({SQL_QUANTILES_BRACKET})"
    " UNION ALL SELECT 'group_' || l_returnflag, q, CAST(value AS DOUBLE)"
    f" FROM ({SQL_QUANTILES_BY_GROUP})"
)


def _grouped_value_counts(group_col: str, value_col: str):
    """Per-block sparse (group, value, count) partial via one np.unique on
    a packed key — ONE definition shared by the grouped-quantile and
    median-filter queries (the pack constant and domain guard must never
    drift between call sites)."""

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        codes = groups.dictionary_encode()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy().astype(np.int64)
        if len(v) and (v.min() < 0 or v.max() >= 1_000_000):
            raise ValueError(
                f"_grouped_value_counts: {value_col} outside the pack"
                f" domain [0, 1e6): [{v.min()}, {v.max()}]"
            )
        key = idx * 1_000_000 + v
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                group_col: codes.dictionary.take(pa.array(u // 1_000_000)),
                "v": pa.array((u % 1_000_000).astype(np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    return partial


def _order_stat(pairs: list, q: float) -> int:
    """Lower order statistic at fraction q from sorted (value, count)
    pairs — the one shared rank convention (floor(q*(n-1)))."""
    pairs = sorted(pairs)
    vals = np.array([p[0] for p in pairs], dtype=np.int64)
    cum = np.cumsum([p[1] for p in pairs])
    k = int(np.floor(q * (int(cum[-1]) - 1)))
    return int(vals[np.searchsorted(cum, k + 1, side="left")])


def q_semi_join_customers(sf_dir: str):
    """Relational SEMI-join (EXISTS): customers with at least one order
    above 400k cents·10³ — Ray's native left_semi join type, so the
    probe side streams through the hash exchange and only matching build
    keys survive (no row multiplication, no dedup needed)."""
    cust = _rd().read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = _rd().read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def big(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["o_totalprice"], 400_000.0)
        return pa.table({"o_custkey": batch.filter(keep)["o_custkey"]})

    big_orders = orders.map_batches(big, batch_format="pyarrow", batch_size=None)
    # The filter can empty whole blocks; a 0-row FIRST block on a native
    # join input suppresses Ray's one-shot schema broadcast (see
    # functions/_schema.py). The filtered key stream is compact — heal it.
    from .functions._schema import stabilize_schema

    big_orders = stabilize_schema(
        big_orders, pa.schema([("o_custkey", pa.int64())])
    )
    from .functions._buckets import _cluster_cpus
    import math

    parts = max(
        2, min(_cluster_cpus() // 2, math.ceil(orders.count() / 250_000))
    )
    return cust.join(
        big_orders,
        join_type="left_semi",
        num_partitions=parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


SQL_SEMI_JOIN = (
    "SELECT c_custkey, c_mktsegment FROM customer c"
    " WHERE EXISTS (SELECT 1 FROM orders o"
    " WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)"
)


def q_outer_join_counts(sf_dir: str):
    """LEFT OUTER join: per-customer order count INCLUDING zero-order
    customers (the rows an inner join silently drops) — Ray's native
    left_outer join, then a count of non-null order keys per customer."""
    cust = _rd().read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    orders = _rd().read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )
    from .functions._buckets import _cluster_cpus
    import math

    parts = max(
        2, min(_cluster_cpus() // 2, math.ceil(orders.count() / 250_000))
    )
    joined = cust.join(
        orders,
        join_type="left_outer",
        num_partitions=parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = batch["o_orderkey"]
        if isinstance(ok, pa.ChunkedArray):
            ok = ok.combine_chunks()
        has = pc.is_valid(ok).to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(key, return_inverse=True)
        n = np.zeros(len(u), dtype=np.int64)
        np.add.at(n, inv, has)
        return pa.table(
            {"c_custkey": pa.array(u), "n_orders": pa.array(n)}
        )

    from .functions._buckets import bucketed_sum

    # customer-cardinality exchange — hash-bucketed, not key-sorted
    return bucketed_sum(
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["c_custkey"],
        ["n_orders"],
        pa.schema([("c_custkey", pa.int64()), ("n_orders", pa.int64())]),
    )


SQL_OUTER_JOIN_COUNTS = (
    "SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders"
    " FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey"
    " GROUP BY c.c_custkey"
)


def q_latest_event_per_user(sf_dir: str):
    """CDC-style compaction: the latest event row per user (argmax by
    (ts, event_id)). Per-block partials reduce each block to at most one
    row per user (vectorized lexsort + last-of-run), so the shuffle
    carries ≤ users-per-block rows; a hash-bucketed groupby applies the
    same reduction once more for the global answer."""
    ds = _rd().read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    from .functions._buckets import derive_buckets, hash_buckets

    n_buckets = derive_buckets(ds.count())

    def _argmax_take(uid, ts, eid):
        # last-of-run per uid after lexsort by (uid, ts, eid): the ONE
        # tie-break definition shared by the block partial and the
        # global reduce (divergence would silently disagree).
        order = np.lexsort((eid, ts, uid))
        last = np.ones(len(order), dtype=bool)
        su = uid[order]
        last[:-1] = su[1:] != su[:-1]
        return pa.array(order[last])

    def argmax_rows(batch: pa.Table) -> pa.Table:
        take = _argmax_take(
            batch["user_id"].to_numpy().astype(np.int64),
            batch["ts"].cast(pa.timestamp("us")).to_numpy().astype(np.int64),
            batch["event_id"].to_numpy().astype(np.int64),
        )
        out = batch.take(take)
        return pa.table(
            {
                "user_id": out["user_id"],
                "last_ts": out["ts"].cast(pa.timestamp("us")),
                "last_event_id": out["event_id"],
                "last_event_type": out["event_type"],
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_cb",
            pa.array(hash_buckets(batch["user_id"].to_numpy(), n_buckets)),
        )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        take = _argmax_take(
            group["user_id"].to_numpy().astype(np.int64),
            group["last_ts"].to_numpy().astype(np.int64),
            group["last_event_id"].to_numpy().astype(np.int64),
        )
        return group.take(take).drop_columns(["_cb"])

    return (
        ds.map_batches(argmax_rows, batch_format="pyarrow", batch_size=None)
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_cb")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


SQL_LATEST_EVENT = (
    "SELECT user_id, ts AS last_ts, event_id AS last_event_id,"
    " event_type AS last_event_type FROM ("
    " SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id"
    " ORDER BY ts DESC, event_id DESC) AS rn FROM events)"
    " WHERE rn = 1"
)


def build_domain_link_graph(docs, n_docs: int, num_partitions: int | None = None):
    """Deterministic domain link graph → (src, dst) edge Dataset: every
    document links its source to the source of the document whose id is
    its sampling hash mod ``n_docs`` — a self-join the SQL oracle
    replays verbatim (see ``_sql_pagerank_leg``). Shared by
    q_distinct_counts' pagerank leg and the bench so the measured graph
    and the oracle-checked graph cannot drift. Both join inputs are
    schema-healed: the native hash join never sees a schema-less first
    block (the round-3 failure class)."""
    import math

    from .functions._buckets import _cluster_cpus
    from .functions._schema import stabilize_schema

    def link_left(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.int64)
        tgt = ((d % 1000000007) * 2654435761) % 1000000007 % n_docs
        return pa.table({"src": batch["source"], "tgt": pa.array(tgt)})

    def link_right(batch: pa.Table) -> pa.Table:
        return pa.table({"tdoc": batch["doc_id"], "dst": batch["source"]})

    lhs = stabilize_schema(
        docs.map_batches(link_left, batch_format="pyarrow", batch_size=None),
        pa.schema([("src", pa.string()), ("tgt", pa.int64())]),
    )
    rhs = stabilize_schema(
        docs.map_batches(link_right, batch_format="pyarrow", batch_size=None),
        pa.schema([("tdoc", pa.int64()), ("dst", pa.string())]),
    )
    if num_partitions is None:
        num_partitions = max(
            2, min(_cluster_cpus() // 2, math.ceil(n_docs / 250_000))
        )
    return lhs.join(
        rhs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("tgt",),
        right_on=("tdoc",),
    ).select_columns(["src", "dst"])


def q_distinct_counts(sf_dir: str):
    """Exact distributed aggregates, three variants in one long-format
    entry (variant, dkey, n):

    - 'users_by_type': exact COUNT(DISTINCT user_id) per event_type,
      two-level — per-block distinct (event_type, user_id) pairs
      (np.unique on a packed key; the shuffle carries distinct pairs,
      not rows), groupby-dedup across blocks, then a tiny per-type
      count. Exchange volume is bounded by the true distinct-pair
      cardinality.
    - 'sources': distinct document sources (E14-adjacent unique op;
      Dataset.unique returns a plain list, so the distinct is expressed
      as a groupby), n pinned to 1.
    - 'moments': per-returnflag Σqty, Σprice_cents and Σ(qty·cents) —
      the sufficient statistics for mean/variance/covariance — as
      per-block int64 partials (bit-exact, no float folding order),
      melted to (flag ':' stat, value) rows.
    - 'pagerank': exact-integer PageRank (functions/cc.pagerank, 4
      power iterations, int64 milli-free arithmetic — bit-equal to the
      oracle's unrolled CTEs) over a deterministic domain link graph:
      every document links its source to the source of the document
      whose id equals its sampling hash mod COUNT(*) — a self-join the
      SQL replays verbatim, giving realistic skew without external
      data.

    Consolidates the former q_distinct_users_by_type /
    q_distinct_sources / q_moment_stats registry rows."""
    from ray.data.aggregate import Count

    ds = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    from .functions._buckets import derive_buckets, hash_buckets

    n_buckets = derive_buckets(ds.count())

    def pairs(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy().astype(np.int64)
        if len(uid) and (uid.min() < 0 or uid.max() >= (1 << 40)):
            raise ValueError(
                "q_distinct_counts: user_id outside the pack domain"
                f" [0, 2^40): [{uid.min()}, {uid.max()}]"
            )
        key = idx * (1 << 40) + uid
        u = np.unique(key)
        return pa.table(
            {
                "event_type": codes.dictionary.take(pa.array(u >> 40)),
                "user_id": pa.array((u & ((1 << 40) - 1)).astype(np.int64)),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_cb",
            pa.array(hash_buckets(batch["user_id"].to_numpy(), n_buckets)),
        )

    def dedup_count(group: pa.Table) -> pa.Table:
        # vectorized cross-block dedup + per-type count within the bucket
        # (one numpy pass per bucket — no per-pair Python dispatch)
        et = group["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = group["user_id"].to_numpy().astype(np.int64)
        u = np.unique(idx * (1 << 40) + uid)
        tcode = (u >> 40).astype(np.int64)
        k = int(tcode.max()) + 1 if len(tcode) else 0
        return pa.table(
            {
                "event_type": codes.dictionary.take(
                    pa.array(np.arange(k, dtype=np.int64))
                ),
                "n_users": pa.array(
                    np.bincount(tcode, minlength=k).astype(np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    users = (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_cb")
        .map_groups(dedup_count, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def users_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dkey": pc.cast(batch["event_type"], pa.string()),
                "n": pc.cast(batch["n_users"], pa.int64()),
            }
        )

    sources = _docs(sf_dir, ["source"]).groupby("source").count()

    def source_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dkey": pc.cast(batch["source"], pa.string()),
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    def melt_moments(batch: pa.Table) -> pa.Table:
        # ≤ |distinct returnflags| rows reach this melt — the bounded
        # Python loop is over the four stat NAMES, not data rows.
        flags = pc.cast(batch["l_returnflag"], pa.string())
        if isinstance(flags, pa.ChunkedArray):
            flags = flags.combine_chunks()
        keys, vals = [], []
        for stat in ("n_rows", "sum_qty", "sum_cents", "sum_qty_cents"):
            keys.append(
                pc.binary_join_element_wise(
                    flags, pa.array([stat] * len(flags)), ":"
                )
            )
            vals.append(pc.cast(batch[stat], pa.int64()))
        return pa.table(
            {
                "dkey": pa.concat_arrays(
                    [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in keys]
                ),
                "n": pa.concat_arrays(
                    [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in vals]
                ),
            }
        )

    moments = _moment_stats_ds(sf_dir).map_batches(
        melt_moments, batch_format="pyarrow", batch_size=None
    )

    # 'pagerank' leg: deterministic domain link graph (doc → the doc at
    # its sampling-hash index, projected to sources) via a native
    # self-join, then the exact-integer power iteration.
    from .functions.cc import pagerank

    docs = _docs(sf_dir, ["doc_id", "source"])
    edges = build_domain_link_graph(docs, docs.count())
    pr = pagerank(edges, num_iters=4)
    pr_rows = _rd().from_arrow(
        pa.table(
            {
                "dkey": pr["node"],
                "n": pr["rank"],
            }
        )
    )

    return (
        _tag_ds(
            users.map_batches(users_rows, batch_format="pyarrow"),
            "variant",
            "users_by_type",
        )
        .union(
            _tag_ds(
                sources.map_batches(source_rows, batch_format="pyarrow"),
                "variant",
                "sources",
            )
        )
        .union(_tag_ds(moments, "variant", "moments"))
        .union(_tag_ds(pr_rows, "variant", "pagerank"))
    )


_SQL_MOMENTS_LEG = (
    " UNION ALL SELECT 'moments' AS variant,"
    " l_returnflag || ':n_rows' AS dkey,"
    " CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag"
    " UNION ALL SELECT 'moments', l_returnflag || ':sum_qty',"
    " CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS BIGINT)"
    " FROM lineitem GROUP BY l_returnflag"
    " UNION ALL SELECT 'moments', l_returnflag || ':sum_cents',"
    " CAST(CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))"
    " AS HUGEINT) AS BIGINT) FROM lineitem GROUP BY l_returnflag"
    " UNION ALL SELECT 'moments', l_returnflag || ':sum_qty_cents',"
    " CAST(CAST(SUM(CAST(l_quantity AS BIGINT) *"
    " CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS HUGEINT)"
    " AS BIGINT) FROM lineitem GROUP BY l_returnflag"
)


def _sql_pagerank_leg(iters: int = 4) -> str:
    """Unrolled power-iteration CTEs replaying functions/cc.pagerank
    bit-for-bit: nonnegative BIGINT ``//`` floor-division matches numpy,
    and SUM order cannot matter because int64 addition commutes exactly
    (the engine asserts the no-overflow bound)."""
    ctes = [
        "pr_edges AS (SELECT a.source AS src, b.source AS dst"
        " FROM documents a JOIN documents b"
        " ON ((a.doc_id % 1000000007) * 2654435761) % 1000000007"
        " % (SELECT COUNT(*) FROM documents) = b.doc_id)",
        "pr_nodes AS (SELECT src AS node FROM pr_edges"
        " UNION SELECT dst FROM pr_edges)",
        "pr_deg AS (SELECT src, COUNT(*) AS d FROM pr_edges GROUP BY src)",
        "pr_r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r"
        " FROM pr_nodes)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"pr_r{k} AS (SELECT n.node,"
            " CAST(150000000 + 85 * COALESCE(c.s, 0) // 100 AS BIGINT)"
            " AS r FROM pr_nodes n LEFT JOIN ("
            "SELECT e.dst AS node, CAST(SUM(p.r // o.d) AS BIGINT) AS s"
            f" FROM pr_edges e JOIN pr_r{k - 1} p ON p.node = e.src"
            " JOIN pr_deg o ON o.src = e.src GROUP BY e.dst) c"
            " ON c.node = n.node)"
        )
    return (
        " UNION ALL SELECT 'pagerank' AS variant, node AS dkey, r AS n"
        " FROM (WITH " + ", ".join(ctes) + f" SELECT node, r FROM pr_r{iters})"
    )


SQL_DISTINCT_COUNTS = (
    "SELECT 'users_by_type' AS variant, event_type AS dkey,"
    " CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n"
    " FROM events GROUP BY event_type"
    " UNION ALL SELECT 'sources', source, CAST(1 AS BIGINT)"
    " FROM (SELECT DISTINCT source FROM documents)"
    + _SQL_MOMENTS_LEG
    + _sql_pagerank_leg()
)


def _moment_stats_ds(sf_dir: str):
    """Multi-moment aggregate with integer-exact compare: per returnflag
    Σqty, Σprice_cents and Σ(qty·price_cents) — the sufficient statistics
    for mean/variance/covariance — as per-block partials. All sums are
    int64, so engine and oracle match bit-for-bit (no float folding
    order issues). Registered as the 'moments' variant of
    q_distinct_counts (round-4 registry consolidation)."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        flags = batch["l_returnflag"]
        if isinstance(flags, pa.ChunkedArray):
            flags = flags.combine_chunks()
        codes = flags.dictionary_encode()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        qty = batch["l_quantity"].to_numpy().astype(np.int64)
        cents = np.floor(
            _np(batch["l_extendedprice"]) * 100.0 + 0.5
        ).astype(np.int64)
        k = int(idx.max()) + 1 if len(idx) else 0

        def isum(vals: np.ndarray) -> np.ndarray:
            # int64 scatter-add: np.bincount's float64 weights would lose
            # exactness past 2^53 on large blocks.
            acc = np.zeros(k, dtype=np.int64)
            np.add.at(acc, idx, vals)
            return acc

        return pa.table(
            {
                "l_returnflag": codes.dictionary.take(
                    pa.array(np.arange(k, dtype=np.int64))
                ),
                "n_rows": pa.array(np.bincount(idx, minlength=k).astype(np.int64)),
                "sum_qty": pa.array(isum(qty)),
                "sum_cents": pa.array(isum(cents)),
                "sum_qty_cents": pa.array(isum(qty * cents)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
        )
    )




def q_events_pivot(sf_dir: str):
    """Wide (pivoted) aggregate: events per day × event_type as columns —
    per-block (day, type) count partials via one np.unique on a packed
    key, tiny groupby merge, then the pivot itself is a driver-side
    reshape of the (days × types) result (bounded by the date range, not
    the row count). Pivot columns are PINNED to the testdata event_type
    domain (_EVENT_TYPES) so engine and oracle schemas agree at every
    scale factor; a type outside the pinned set would need a new column
    on both sides."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        day = pc.cast(pc.floor_temporal(ts, unit="day"), pa.date32())
        days = day.to_numpy(zero_copy_only=False).astype(
            "datetime64[D]"
        ).astype(np.int64)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        if len(codes.dictionary) >= 64:
            raise ValueError(
                "q_events_pivot: more than 63 distinct event types in one"
                " batch — widen the day*64 pack"
            )
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = days * 64 + idx
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "day": pa.array((u // 64).astype(np.int32)).cast(pa.date32()),
                "event_type": codes.dictionary.take(pa.array(u % 64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    days = sorted({r["day"] for r in rows})
    # Pivot columns are PINNED (testdata event_type domain), not derived
    # from the data — a type absent at some scale factor must still
    # produce its zero column so engine and oracle schemas agree.
    types = _EVENT_TYPES
    counts = {(r["day"], r["event_type"]): int(r["n"]) for r in rows}
    # day as ISO string: the driver's value-hash compare is dtype-exact,
    # and date32 vs DuckDB's DATE->timestamp round-trip differently
    # through pandas.
    cols: dict = {"day": pa.array([d.isoformat() for d in days], pa.string())}
    for t in types:
        cols[f"n_{t}"] = pa.array(
            [counts.get((d, t), 0) for d in days], pa.int64()
        )
    return pa.table(cols)


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _sql_events_pivot() -> str:
    # Pivot columns pinned to the testdata event_type domain (verified
    # identical at sf0.001/0.01/0.1), mirrored by the engine side.
    cols = ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
        f" AS n_{t}"
        for t in _EVENT_TYPES
    )
    return (
        f"SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,"
        f" {cols} FROM events GROUP BY 1"
    )


def q_median_filter(sf_dir: str):
    """Composite curation pattern: keep documents whose token count is at
    or above their LANGUAGE's median — a per-group quantile (sparse
    (lang, n_tokens) count partials → tiny merge → lower-order-statistic
    medians) broadcast into a stateless filter pass. The per-lang median
    table is O(languages), so the only exchange is the tiny count
    merge; the corpus streams through twice (count pass + filter pass)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    counted = ds.map_batches(token_count_batch, batch_format="pyarrow")

    partial = _grouped_value_counts("lang", "n_tokens")

    rows = (
        counted.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    from collections import defaultdict

    per_lang: dict = defaultdict(list)
    for r in rows:
        per_lang[r["lang"]].append((int(r["v"]), int(r["n"])))
    medians = {
        lang: _order_stat(pairs, 0.5) for lang, pairs in per_lang.items()
    }

    def keep(batch: pa.Table) -> pa.Table:
        langs = batch["lang"]
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        codes = langs.dictionary_encode()
        # per-dictionary-entry threshold (languages are few), then one
        # vectorized compare — no per-row Python
        med_by_code = np.array(
            [medians.get(d, 0) for d in codes.dictionary.to_pylist()],
            dtype=np.int64,
        )
        n = batch["n_tokens"].to_numpy().astype(np.int64)
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        mask = pa.array(n >= med_by_code[idx])
        out = batch.filter(mask)
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "lang": out["lang"],
                "n_tokens": pc.cast(out["n_tokens"], pa.int64()),
            }
        )

    return counted.map_batches(keep, batch_format="pyarrow", batch_size=None)


SQL_MEDIAN_FILTER = (
    "WITH t AS (SELECT doc_id, lang,"
    " CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens"
    " FROM documents),"
    " m AS (SELECT lang, n_tokens AS n,"
    " ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens) - 1 AS r,"
    " COUNT(*) OVER (PARTITION BY lang) AS c FROM t),"
    " med AS (SELECT lang, n AS median_tokens FROM m"
    " WHERE r = CAST(floor(0.5 * (c - 1)) AS BIGINT))"
    " SELECT t.doc_id, t.lang, t.n_tokens FROM t"
    " JOIN med ON t.lang = med.lang WHERE t.n_tokens >= med.median_tokens"
)


def q_label_centroids(sf_dir: str):
    """Vector aggregation suite over the embeddings table, two variants
    in exact integer milli-unit arithmetic (floor(v·1000)) so every
    float-summation-order hazard is gone and the oracle compare is
    exact:

    * ``label_centroid`` — per-label embedding sum (one reduceat per
      label group per batch; the shuffle moves (label, dim, partial)
      rows only);
    * ``kmeans`` — distributed Lloyd's k-means (k=8, 3 iterations,
      deterministic smallest-id init; sim.kmeans_milli), each iteration
      one streaming pass with broadcast centroids and a tiny
      (cluster, dim) partial-sum exchange.  The oracle replays the same
      iterations as expanded CTEs (assignment = ROW_NUMBER over exact
      integer d², update = floor(sum/count), empty clusters keep their
      centroid)."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        from .functions.sim import _emb_matrix

        mat = _emb_matrix(batch).astype(np.float64)
        milli = np.floor(mat * 1000.0).astype(np.int64)
        labels = batch["label"].to_numpy().astype(np.int64)
        order = np.argsort(labels, kind="stable")
        milli = milli[order]
        labels_s = labels[order]
        uniq, starts, counts = np.unique(
            labels_s, return_index=True, return_counts=True
        )
        sums = np.add.reduceat(milli, starts, axis=0)  # (L, D)
        dim = milli.shape[1] if milli.size else 0
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim)),
                "dim": pa.array(
                    np.tile(np.arange(dim, dtype=np.int64), len(uniq))
                ),
                "sum_milli": pa.array(sums.reshape(-1)),
                "n_vecs": pa.array(
                    np.repeat(counts.astype(np.int64), dim)
                ),
            }
        )

    cents = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["label", "dim"])
        .aggregate(
            Sum("sum_milli", alias_name="sum_milli"),
            Sum("n_vecs", alias_name="n_vecs"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "variant": pa.array(
                        np.repeat("label_centroid", b.num_rows)
                    ),
                    "gid": b["label"].cast(pa.int64())
                    if b.num_rows
                    else pa.array([], pa.int64()),
                    "dim": b["dim"],
                    "val_milli": b["sum_milli"],
                    "n_vecs": b["n_vecs"],
                }
            )
            if b.num_columns
            else _EMPTY_VECAGG,
            batch_format="pyarrow",
            batch_size=None,
        )
    )

    from .functions.sim import kmeans_milli

    km = kmeans_milli(
        _rd().read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        k=8,
        iters=3,
    )
    km_tbl = pa.table(
        {
            "variant": pa.array(np.repeat("kmeans", km.num_rows)),
            "gid": km["cluster"],
            "dim": km["dim"],
            "val_milli": km["centroid_milli"],
            "n_vecs": km["n_vecs"],
        }
    )
    return cents.union(_rd().from_arrow(km_tbl))


_EMPTY_VECAGG = pa.table(
    {
        "variant": pa.array([], pa.string()),
        "gid": pa.array([], pa.int64()),
        "dim": pa.array([], pa.int64()),
        "val_milli": pa.array([], pa.int64()),
        "n_vecs": pa.array([], pa.int64()),
    }
)


def _sql_kmeans(
    k: int = 8,
    iters: int = 3,
    scale: int = 1000,
    src: str = "embeddings",
    final_select: bool = True,
) -> str:
    """Expanded-CTE replay of sim.kmeans_milli (no recursion — the
    iteration count is a fixed hyperparameter on both sides).  With
    ``final_select=False`` returns only the CTE chain (ke … kc{iters},
    ka{iters}) for callers that keep deriving (e.g. semdedup)."""
    parts = [
        "ke AS (SELECT CAST(vec_id AS BIGINT) AS vid,"
        " CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,"
        f" CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale})"
        f" AS BIGINT) AS m FROM {src})",
        f"kinit AS (SELECT vid, CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1"
        f" AS BIGINT) AS c FROM (SELECT DISTINCT vid FROM ke ORDER BY vid"
        f" LIMIT {k}))",
        "kc0 AS (SELECT i.c, ke.dim, ke.m AS val"
        " FROM kinit i JOIN ke USING (vid))",
    ]
    for i in range(1, iters + 1):
        p = f"kc{i - 1}"
        parts.append(
            f"kd{i} AS (SELECT ke.vid, p.c,"
            f" SUM((ke.m - p.val) * (ke.m - p.val)) AS d2"
            f" FROM ke JOIN {p} p USING (dim) GROUP BY ke.vid, p.c)"
        )
        parts.append(
            f"ka{i} AS (SELECT vid, c FROM (SELECT vid, c,"
            f" ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, c) AS rn"
            f" FROM kd{i}) WHERE rn = 1)"
        )
        parts.append(
            f"ks{i} AS (SELECT a.c, ke.dim,"
            f" CAST(floor(CAST(SUM(ke.m) AS DOUBLE) / COUNT(*)) AS BIGINT)"
            f" AS val, CAST(COUNT(*) AS BIGINT) AS n"
            f" FROM ke JOIN ka{i} a USING (vid) GROUP BY a.c, ke.dim)"
        )
        parts.append(
            f"kc{i} AS (SELECT p.c, p.dim, COALESCE(s.val, p.val) AS val"
            f" FROM {p} p LEFT JOIN ks{i} s"
            f" ON p.c = s.c AND p.dim = s.dim)"
        )
    if not final_select:
        return ", ".join(parts)
    final = (
        f"SELECT 'kmeans' AS variant, c.c AS gid, c.dim,"
        f" c.val AS val_milli, CAST(COALESCE(n.n, 0) AS BIGINT) AS n_vecs"
        f" FROM kc{iters} c LEFT JOIN (SELECT c, CAST(COUNT(*) AS BIGINT)"
        f" AS n FROM ka{iters} GROUP BY c) n ON c.c = n.c"
    )
    return ", ".join(parts) + " " + final


SQL_LABEL_CENTROIDS = (
    "WITH e AS (SELECT CAST(label AS BIGINT) AS label,"
    " unnest(embedding) AS v, generate_subscripts(embedding, 1) AS ord"
    " FROM embeddings), "
    + _sql_kmeans(8, 3)
    + " UNION ALL"
    " SELECT 'label_centroid' AS variant, label AS gid,"
    " CAST(ord - 1 AS BIGINT) AS dim,"
    " CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT)"
    " AS val_milli, CAST(COUNT(*) AS BIGINT) AS n_vecs"
    " FROM e GROUP BY label, dim"
)


def q_classifier(sf_dir: str):
    """Model-in-the-loop curation: train a one-vs-rest batch-perceptron
    quality/topic probe on the labeled embeddings (target label 0,
    3 full passes), then score every vector with the trained weights —
    the distributed classifier-training primitive of LLM data curation
    (fastText-style quality filters).  Exact int64 milli-unit
    arithmetic end to end (functions/classifier.perceptron_milli), so
    the weights/scores/predictions are bit-reproducible across block
    layouts and the oracle replays the identical passes as unrolled
    CTEs.  Each pass streams the compact quantized working set once
    with the weight vector broadcast via ray.put and exchanges only
    (dim, partial-update) rows."""
    from .functions.classifier import perceptron_milli

    ds = _rd().read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label", "embedding"],
    )
    return perceptron_milli(ds, target_label=0, iters=3)


def _sql_perceptron(
    target: int = 0,
    iters: int = 3,
    scale: int = 1000,
    src: str = "embeddings",
) -> str:
    """Expanded-CTE replay of classifier.perceptron_milli (no recursion
    — the pass count is a fixed hyperparameter on both sides): quantize
    → iters × (score join, misclassified-update aggregate, weight
    update) → final scoring pass."""
    parts = [
        "pe AS (SELECT CAST(vec_id AS BIGINT) AS vid,"
        " CAST(label AS BIGINT) AS label,"
        f" CAST(CASE WHEN label = {target} THEN 1 ELSE -1 END AS BIGINT)"
        " AS y,"
        " CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,"
        f" CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale})"
        f" AS BIGINT) AS m FROM {src})",
        "pw0 AS (SELECT DISTINCT dim, CAST(0 AS BIGINT) AS w FROM pe)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"ps{i} AS (SELECT pe.vid, MIN(pe.y) AS y,"
            f" CAST(SUM(pe.m * w.w) AS BIGINT) AS s"
            f" FROM pe JOIN pw{i - 1} w USING (dim) GROUP BY pe.vid)"
        )
        parts.append(
            f"pu{i} AS (SELECT pe.dim,"
            f" CAST(SUM(pe.y * pe.m) AS BIGINT) AS u"
            f" FROM pe JOIN ps{i} s ON pe.vid = s.vid AND s.y * s.s <= 0"
            f" GROUP BY pe.dim)"
        )
        parts.append(
            f"pw{i} AS (SELECT w.dim,"
            f" CAST(w.w + COALESCE(u.u, 0) AS BIGINT) AS w"
            f" FROM pw{i - 1} w LEFT JOIN pu{i} u USING (dim))"
        )
    parts.append(
        f"psf AS (SELECT pe.vid, MIN(pe.label) AS label, MIN(pe.y) AS y,"
        f" CAST(SUM(pe.m * w.w) AS BIGINT) AS s"
        f" FROM pe JOIN pw{iters} w USING (dim) GROUP BY pe.vid)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT vid AS vec_id, label, y, s AS score,"
        " CAST(CASE WHEN s > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred"
        " FROM psf"
    )


SQL_CLASSIFIER = _sql_perceptron(0, 3)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Exactly 50 entries — the driver's correctness window evaluates at most
# 50 queries in registration order (VERDICT r3 #3), so the registry is
# consolidated to fit: same-oracle kernel variants share one entry with a
# variant/method/strategy label column (q_encode_suite, q_join_rect,
# q_knn, q_tile_counts_l8, q_text_stats (former token_count/quality
# rows, merged late round 4), q_corpus_histograms (former
# lang/langid/domain rows), q_neardup_pairs, q_simsearch, q_media,
# q_quantiles (absorbed the by-group row in round 4), q_distinct_counts,
# q_cover_regions_golden), and the standalone q_simhash / q_fingerprint
# rows were dropped as redundant with the hash-exact q_sketch_golden.
# Round 4 used the freed slots for the web-curation ops q_url_dedup and
# q_webtext_quality.
# Every kernel that was registered in round 3 is still exercised.
QUERIES = {
    "q_encode_suite": q_encode_suite,
    "q_cover_regions_golden": q_cover_regions_golden,
    "q_join_rect": q_join_rect,
    "q_join_cap": q_join_cap,
    "q_join_anti": q_join_anti,
    "q_join_poly": q_join_poly,
    "q_knn": q_knn,
    "q_tile_counts_l8": q_tile_counts_l8,
    "q_write_tiles_roundtrip": q_write_tiles_roundtrip,
    "q_hilbert_order": q_hilbert_order,
    "q_dedup_exact": q_dedup_exact,
    "q_text_stats": q_text_stats,
    "q_corpus_histograms": q_corpus_histograms,
    "q_neardup_pairs": q_neardup_pairs,
    "q_simsearch": q_simsearch,
    "q_media": q_media,
    "q_pricing_summary": q_pricing_summary,
    "q_orders_by_segment": q_orders_by_segment,
    "q_events_hourly": q_events_hourly,
    "q_sessions": q_sessions,
    "q_embed_neardup": q_embed_neardup,
    "q_cellset_ops": q_cellset_ops,
    "q_curation": q_curation,
    "q_curation_export": q_curation_export,
    "q_neighbors_l8": q_neighbors_l8,
    "q_asof_orders": q_asof_orders,
    "q_band_join": q_band_join,
    "q_events_sliding": q_events_sliding,
    "q_sample_hash": q_sample_hash,
    "q_distinct_hll": q_distinct_hll,
    "q_url_dedup": q_url_dedup,
    "q_webtext_quality": q_webtext_quality,
    "q_line_dedup": q_line_dedup,
    "q_native_join": q_native_join,
    "q_text_identity": q_text_identity,
    "q_top_orders_per_cust": q_top_orders_per_cust,
    "q_quantiles": q_quantiles,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_dedup_clusters": q_dedup_clusters,
    "q_decontaminate": q_decontaminate,
    "q_heavy_hitters": q_heavy_hitters,
    "q_sketch_golden": q_sketch_golden,
    "q_events_pivot": q_events_pivot,
    "q_semi_join_customers": q_semi_join_customers,
    "q_outer_join_counts": q_outer_join_counts,
    "q_latest_event_per_user": q_latest_event_per_user,
    "q_distinct_counts": q_distinct_counts,
    "q_median_filter": q_median_filter,
    "q_label_centroids": q_label_centroids,
    "q_classifier": q_classifier,
}

from .functions.asof import (  # noqa: E402
    ASOF_SQL as SQL_ASOF,
    BAND_JOIN_SQL as SQL_BAND_JOIN,
    SLIDING_SQL as SQL_SLIDING,
)

_SQL_TILE_COUNTS_ONE = (
    "SELECT cell_token AS tile_token, COUNT(*) AS n_rows FROM ("
    + _sql_cell_tokens(8)
    + ") GROUP BY cell_token"
)

ORACLE_SQL = {
    "q_encode_suite": SQL_ENCODE_SUITE,
    "q_tile_counts_l8": (
        f"SELECT tile_token, n_rows, 'all' AS variant"
        f" FROM ({_SQL_TILE_COUNTS_ONE})"
        " UNION ALL SELECT tile_token, n_rows, 'top20' FROM ("
        f"{_SQL_TILE_COUNTS_ONE}"
        " ORDER BY n_rows DESC, tile_token LIMIT 20)"
    ),
    "q_write_tiles_roundtrip": _SQL_TILE_COUNTS_ONE,
    "q_hilbert_order": (
        "SELECT doc_id, cell_token FROM ("
        + _sql_cell_tokens(30, with_order_key=True)
        + ") ORDER BY n, doc_id LIMIT 100"
    ),
    "q_join_rect": SQL_JOIN_RECT,
    "q_join_cap": SQL_JOIN_CAP,
    "q_join_anti": SQL_JOIN_ANTI,
    "q_knn": SQL_KNN,
    "q_join_poly": SQL_JOIN_POLY_ALL,
    "q_dedup_exact": SQL_DEDUP_EXACT,
    "q_text_stats": SQL_TEXT_STATS,
    # "q_corpus_histograms" is appended below — its SQL composes the
    # declared/guessed/domain legs, and the guessed leg's CTE chain is
    # defined after this dict for readability.
    "q_simsearch": SQL_SIMSEARCH,
    "q_pricing_summary": SQL_PRICING,
    "q_orders_by_segment": SQL_ORDERS_SEG,
    "q_events_hourly": SQL_EVENTS_HOURLY,
    "q_sessions": SQL_SESSIONS,
    "q_curation": SQL_CURATION,
    "q_asof_orders": SQL_ASOF,
    "q_band_join": SQL_BAND_JOIN,
    "q_events_sliding": SQL_SLIDING,
    "q_sample_hash": SQL_SAMPLE_HASH,
    "q_url_dedup": SQL_URL_DEDUP,
    "q_webtext_quality": SQL_WEBTEXT_QUALITY,
    "q_line_dedup": SQL_LINE_DEDUP,
    "q_native_join": SQL_NATIVE_JOIN,
    "q_text_identity": SQL_TEXT_IDENTITY,
    "q_top_orders_per_cust": SQL_TOP_ORDERS_PER_CUST,
    "q_quantiles": SQL_QUANTILES,
    "q_ngram_jaccard": SQL_NGRAM_JACCARD,
    "q_dedup_clusters": SQL_DEDUP_CLUSTERS,
    "q_decontaminate": SQL_DECONTAMINATE,
    "q_heavy_hitters": SQL_HEAVY_HITTERS,
    # Frozen self-golden for non-SQL sketch kernels (see q_sketch_golden)
    "q_sketch_golden": SQL_SKETCH_GOLDEN,
    "q_events_pivot": _sql_events_pivot(),
    "q_semi_join_customers": SQL_SEMI_JOIN,
    "q_outer_join_counts": SQL_OUTER_JOIN_COUNTS,
    "q_latest_event_per_user": SQL_LATEST_EVENT,
    "q_distinct_counts": SQL_DISTINCT_COUNTS,
    "q_median_filter": SQL_MEDIAN_FILTER,
    "q_label_centroids": SQL_LABEL_CENTROIDS,
    "q_classifier": SQL_CLASSIFIER,
    # Frozen self-golden: pins the coverer's exact exterior AND interior
    # output (content+order); not an independent derivation — see
    # q_cover_regions_golden docstring.
    "q_cover_regions_golden": SQL_COVER_GOLDEN,
    # Full in-SQL edge-neighbor derivation: encode → inverse-Hilbert
    # decode (LOOKUP_IJ joins) → ±size ij algebra incl. the cross-face
    # linear-projection wrap → re-encode → token.  Exact-IEEE mul/div
    # only past the shared encode, so DuckDB matches numpy bit-for-bit
    # (upgrades this query from rows-only; wrap branch additionally
    # stress-tested in tests/test_oracle_sql.py).
    "q_neighbors_l8": None,  # bound below (needs oracle_sql import)
    # Injected duplicates are the only pairs ≥ 0.99 (natural max sim ≈ 0.2),
    # and identical vectors always share an LSH bucket → output is exactly
    # the injected set.
    "q_embed_neardup": (
        "WITH aug AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding"
        " FROM embeddings UNION ALL"
        " SELECT CAST(vec_id + 100000 AS BIGINT), embedding"
        " FROM embeddings WHERE vec_id % 50 = 0), "
        + _sql_kmeans(8, 3, scale=100, src="aug", final_select=False)
        + ", kd4 AS (SELECT ke.vid, p.c,"
        " SUM((ke.m - p.val) * (ke.m - p.val)) AS d2"
        " FROM ke JOIN kc3 p USING (dim) GROUP BY ke.vid, p.c),"
        " ka4 AS (SELECT vid, c FROM (SELECT vid, c,"
        " ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, c) AS rn"
        " FROM kd4) WHERE rn = 1),"
        " nrm AS (SELECT vid, SUM(m * m) AS n2 FROM ke GROUP BY vid),"
        " vv AS (SELECT ke.vid, a.c, ke.dim, ke.m"
        " FROM ke JOIN ka4 a USING (vid)),"
        " dots AS (SELECT a.vid AS ia, b.vid AS ib, SUM(a.m * b.m) AS dp"
        " FROM vv a JOIN vv b ON a.c = b.c AND a.dim = b.dim"
        " AND b.vid < a.vid GROUP BY a.vid, b.vid),"
        " drops AS (SELECT ia AS id_a, MIN(ib) AS id_b FROM dots"
        " JOIN nrm na ON na.vid = dots.ia JOIN nrm nb ON nb.vid = dots.ib"
        " WHERE dp > 0 AND 10000 * dp * dp >= 9801 * na.n2 * nb.n2"
        " GROUP BY ia)"
        " SELECT 'lsh_pairs' AS variant, CAST(vec_id AS BIGINT) AS id_a,"
        " CAST(vec_id + 100000 AS BIGINT) AS id_b FROM embeddings"
        " WHERE vec_id % 50 = 0"
        " UNION ALL SELECT 'semdedup' AS variant, id_a,"
        " CAST(id_b AS BIGINT) AS id_b FROM drops"
    ),
}

_SQL_LANG_GUESSED = (
        "WITH toks AS (SELECT doc_id, text,"
        " list_distinct(string_split(lower(text), ' ')) AS tl FROM documents),"
        " sc AS (SELECT doc_id, text,"
        " len(list_filter(tl, x -> x IN ('the','and','of','is','was'))) AS se,"
        " len(list_filter(tl, x -> x IN ('el','la','de','que','los'))) AS ss,"
        " len(list_filter(tl, x -> x IN ('der','die','und','das','ist'))) AS sd,"
        " len(list_filter(tl, x -> x IN ('le','la','les','des','est'))) AS sf"
        " FROM toks),"
        " pick AS (SELECT doc_id, text,"
        " CASE WHEN greatest(se, ss, sd, sf) = 0 THEN 'und'"
        " WHEN sd = greatest(se, ss, sd, sf) THEN 'de'"
        " WHEN se = greatest(se, ss, sd, sf) THEN 'en'"
        " WHEN ss = greatest(se, ss, sd, sf) THEN 'es'"
        " ELSE 'fr' END AS lang0 FROM sc),"
        " final AS (SELECT doc_id, CASE WHEN"
        " regexp_matches(substr(text, 1, 200), '[一-鿿]')"
        " THEN 'zh' ELSE lang0 END AS lang_guess FROM pick)"
        " SELECT lang_guess, COUNT(*) AS n_docs FROM final GROUP BY lang_guess"
)

def _sql_bpe_leg() -> str:
    from .oracle_sql import bpe_leg_sql

    return bpe_leg_sql(num_merges=8)


SQL_CORPUS_HISTOGRAMS = (
    f"SELECT lang, n_docs, 'declared' AS variant FROM ({_SQL_LANG_DECLARED})"
    " UNION ALL SELECT lang_guess, n_docs, 'guessed'"
    f" FROM ({_SQL_LANG_GUESSED})"
    f" UNION ALL SELECT lang, n_docs, 'domain' FROM ({SQL_DOMAIN_COUNTS})"
    f" UNION ALL SELECT lang, n_docs, 'bpe' FROM ({_sql_bpe_leg()})"
)
ORACLE_SQL["q_corpus_histograms"] = SQL_CORPUS_HISTOGRAMS


def _sql_bloom_leg() -> str:
    from .oracle_sql import bloom_flag_sql

    return bloom_flag_sql(_SQL_DIRTY_URL, m_bits=1 << 13, k=5, ref_mod=3)


ORACLE_SQL["q_sample_hash"] = (
    SQL_SAMPLE_HASH
    + " UNION ALL SELECT 'bloom_dup' AS variant, doc_id, lang FROM ("
    + _sql_bloom_leg()
    + ")"
)


def _sql_neighbors_l8() -> str:
    from .oracle_sql import s2_neighbors_sql

    return s2_neighbors_sql(8, SQL_GEOCODE)


ORACLE_SQL["q_neighbors_l8"] = _sql_neighbors_l8()


def _sql_neardup_pairs() -> str:
    from .oracle_sql import neardup_pairs_sql

    return neardup_pairs_sql()


ORACLE_SQL["q_neardup_pairs"] = _sql_neardup_pairs()


def _sql_curation_export() -> str:
    from .oracle_sql import curation_export_sql

    return curation_export_sql()


ORACLE_SQL["q_curation_export"] = _sql_curation_export()


def _sql_distinct_hll() -> str:
    from .oracle_sql import hll_distinct_sql

    return hll_distinct_sql()


ORACLE_SQL["q_distinct_hll"] = _sql_distinct_hll()


def _sql_cellset_ops() -> str:
    from .oracle_sql import cellset_ops_sql

    return cellset_ops_sql(SQL_GEOCODE)


ORACLE_SQL["q_cellset_ops"] = _sql_cellset_ops()

_MEDIA_GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "media_golden.parquet",
)
ORACLE_SQL["q_media"] = (
    "SELECT media_id, idx, val, variant"
    f" FROM read_parquet('{_MEDIA_GOLDEN_PATH}')"
)
