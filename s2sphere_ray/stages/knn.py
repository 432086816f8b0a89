"""E11 — k-nearest-neighbors of query points over the points dataset.

Exact kNN with a broadcast query side (queries ≪ corpus, the practical
case): each corpus batch computes haversine distances to all queries
(vectorized (B,Q) trig), keeps a per-query partial top-k (``argpartition``),
and a tiny ``groupby(query_id)`` merges partials into the global top-k.
Shuffle volume is O(Q·k·#batches) partial rows — never the corpus.

Tie rule (FIXTURES.md §6): order by (distance, point id asc). The distance
expression mirrors the oracle SQL op-for-op (stages/join.py
``_haversine_oracle``).

The cell-ring expansion variant (start cell → E10 neighbor rings until the
k-th candidate distance is covered by the guaranteed ring radius) is the
scale path when Q grows large; ``knn_cell_candidates`` provides the ring
pruning used there.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cells as ck
from .join import _haversine_oracle
from .encode import _np


def knn_points(
    points_ds,
    queries: pa.Table,
    k: int,
    point_id_col: str = "doc_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    query_id_col: str = "query_id",
):
    """→ Dataset(query_id, rank, <point_id_col>, dist_rad); exact."""
    import ray

    q_id = queries[query_id_col].to_numpy()
    q_lat = queries["lat"].to_numpy()
    q_lng = queries["lng"].to_numpy()
    q_ref = ray.put((q_id, q_lat, q_lng))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qid, qlat, qlng = ray.get(q_ref)
        lat = _np(batch[lat_col])
        lng = _np(batch[lng_col])
        pid = _np(batch[point_id_col])
        # (B, Q) distances; Q is small so this stays cache-friendly.
        d = _haversine_oracle(
            lat[:, None], lng[:, None], qlat[None, :], qlng[None, :]
        )
        kk = min(k, len(lat))
        out_q, out_p, out_d = [], [], []
        for c in range(len(qid)):
            col = d[:, c]
            if kk < len(col):
                part = np.argpartition(col, kk - 1)[:kk]
            else:
                part = np.arange(len(col))
            out_q.append(np.full(len(part), qid[c]))
            out_p.append(pid[part])
            out_d.append(col[part])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                point_id_col: pa.array(np.concatenate(out_p)),
                "dist_rad": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )

    partials = points_ds.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=None
    )

    def merge_topk(group: pa.Table) -> pa.Table:
        d = group["dist_rad"].to_numpy()
        pid = group[point_id_col].to_numpy()
        order = np.lexsort((pid, d))[:k]  # (dist, id asc) tie rule
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                point_id_col: group[point_id_col].take(pa.array(order)),
                "dist_rad": group["dist_rad"].take(pa.array(order)),
            }
        )

    return partials.groupby("query_id").map_groups(
        merge_topk, batch_format="pyarrow"
    )


def knn_points_pruned(
    points_ds,
    queries: pa.Table,
    k: int,
    level: int,
    point_id_col: str = "doc_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    query_id_col: str = "query_id",
):
    """E11 scale path: cell-ring-pruned exact kNN.

    Candidate cells = each query's level-``level`` cell + its 8 neighbors
    (E10 ring); the corpus is filtered to candidates before the distance
    pass, so the per-batch work is O(|batch ∩ rings| · Q) instead of
    O(|batch| · Q). Exactness guarantee: the 3×3 block covers at least a
    disc of radius MIN_WIDTH(level) around the query, so a query whose
    k-th candidate distance exceeds that bound (or with < k candidates)
    falls back to the brute pass — the result always equals
    :func:`knn_points`.
    """
    import ray

    from .. import geometry as g

    q_id = queries[query_id_col].to_numpy()
    q_lat = queries["lat"].to_numpy()
    q_lng = queries["lng"].to_numpy()
    cand_cells = np.unique(knn_cell_candidates(q_lat, q_lng, level).reshape(-1))
    guarantee_rad = g.MIN_WIDTH.get_value(level)
    cand_ref = ray.put((cand_cells, q_id, q_lat, q_lng))

    def partial_topk(batch: pa.Table) -> pa.Table:
        cells, qids, qlat, qlng = ray.get(cand_ref)
        lat = _np(batch[lat_col])
        lng = _np(batch[lng_col])
        pid = _np(batch[point_id_col])
        anc = ck.parent(ck.cell_id_from_latlng(lat, lng), level)
        # cells is sorted-unique (np.unique): shared searchsorted
        # membership, no per-batch hash/sort build
        from ..functions._buckets import sorted_lookup

        keep, _ = sorted_lookup(anc, cells)
        lat, lng, pid = lat[keep], lng[keep], pid[keep]
        if not len(lat):
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    point_id_col: pa.array([], pa.int64()),
                    "dist_rad": pa.array([], pa.float64()),
                }
            )
        d = _haversine_oracle(
            lat[:, None], lng[:, None], qlat[None, :], qlng[None, :]
        )
        kk = min(k, len(lat))
        out_q, out_p, out_d = [], [], []
        for c in range(len(qids)):
            col = d[:, c]
            part = (
                np.argpartition(col, kk - 1)[:kk]
                if kk < len(col)
                else np.arange(len(col))
            )
            out_q.append(np.full(len(part), qids[c]))
            out_p.append(pid[part])
            out_d.append(col[part])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                point_id_col: pa.array(np.concatenate(out_p)),
                "dist_rad": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )

    partials = points_ds.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=None
    )

    def merge_topk(group: pa.Table) -> pa.Table:
        dd = group["dist_rad"].to_numpy()
        pid = group[point_id_col].to_numpy()
        order = np.lexsort((pid, dd))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                point_id_col: group[point_id_col].take(pa.array(order)),
                "dist_rad": group["dist_rad"].take(pa.array(order)),
            }
        )

    # The pruned result stays in the object store; only a |Q|-row summary
    # (count + max distance per query) comes back to the driver for the
    # exactness check. Queries whose k-th candidate falls outside the
    # guaranteed disc (or with < k candidates) re-run through the brute
    # pass, and the final plan is filter(ok) ∪ brute(failed).
    pruned = partials.groupby("query_id").map_groups(
        merge_topk, batch_format="pyarrow"
    ).materialize()

    def summarize(group: pa.Table) -> pa.Table:
        d = group["dist_rad"].to_numpy()
        return pa.table(
            {
                "query_id": group["query_id"].slice(0, 1),
                "n": pa.array([len(d)], pa.int64()),
                "max_d": pa.array([float(d.max())], pa.float64()),
            }
        )

    summary = {
        int(r["query_id"]): (int(r["n"]), float(r["max_d"]))
        for r in pruned.groupby("query_id")
        .map_groups(summarize, batch_format="pyarrow")
        .take_all()
    }
    failed = [
        int(q)
        for q in q_id
        if int(q) not in summary
        or summary[int(q)][0] < k
        or summary[int(q)][1] > guarantee_rad
    ]
    if not failed:
        return pruned
    failed_arr = np.array(failed, dtype=np.int64)

    def keep_ok(batch: pa.Table) -> pa.Table:
        m = ~np.isin(batch["query_id"].to_numpy(), failed_arr)
        return batch.filter(pa.array(m))

    ok_ds = pruned.map_batches(keep_ok, batch_format="pyarrow")
    fmask = np.isin(q_id, failed_arr)
    fallback_queries = pa.table(
        {
            query_id_col: pa.array(q_id[fmask]),
            "lat": pa.array(q_lat[fmask]),
            "lng": pa.array(q_lng[fmask]),
        }
    )
    brute = knn_points(
        points_ds,
        fallback_queries,
        k,
        point_id_col=point_id_col,
        lat_col=lat_col,
        lng_col=lng_col,
        query_id_col=query_id_col,
    )
    return ok_ds.union(brute)


def within_radius_join(
    points_ds,
    queries: pa.Table,
    radius_rad: float,
    k: int,
    point_id_col: str = "doc_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    query_id_col: str = "query_id",
    level: int | None = None,
    strategy: str = "broadcast",
):
    """E11b — within-radius distance join (the classic spatial θ-join):
    every corpus point within ``radius_rad`` of each query point, ranked
    by (distance, point id asc) and capped at ``k`` rows per query.
    → Dataset(query_id, rank, <point_id_col>, dist_rad); exact.

    Exactness by construction (no fallback needed, unlike the kNN ring
    heuristic): each query disc is covered by a fixed-``level``
    ``RegionCoverer.get_simple_covering`` of its Cap — a covering
    CONTAINS its region, so a corpus point whose level-``level`` ancestor
    is outside the union of covers is provably outside every disc.  Per
    corpus batch: one vectorized ancestor + sorted-membership filter,
    one (B′,Q) haversine (same op order as the oracle SQL), pairs
    emitted where d ≤ radius.  A tiny ``groupby(query_id)`` ranks and
    caps — shuffle volume is the hit pairs only, never the corpus.
    When the candidate set covers most of the level (dense benchmark
    query sets), the filter is skipped — it can't prune.

    Scale: ``strategy="broadcast"`` (default) broadcasts the queries
    once via ``ray.put`` (the same Q ≪ corpus assumption as
    :func:`knn_points`).  ``strategy="shuffle"`` is the both-sides-large
    path: each side emits candidate-cell keys (queries: their cover
    cells; points: their unique level-``level`` ancestor) and ONE
    ``groupby(cell)`` computes in-cell distances — a pair meets in
    exactly one cell, so no pair dedup is needed and per-group memory is
    O(points-in-cell × queries-covering-cell).  Hot cells (dense cities
    × many overlapping discs) are split by using a finer ``level`` —
    coverings keep any level exact.  ``level`` defaults to the
    MIN_WIDTH guarantee bound for ``radius_rad`` (broadcast) / two
    below it (shuffle, smaller groups); the covering keeps the result
    exact for ANY level, the default just balances covering cost
    against selectivity.
    """
    import ray

    from .. import geometry as g

    if strategy == "shuffle":
        return _within_radius_shuffle(
            points_ds,
            queries,
            radius_rad,
            k,
            point_id_col=point_id_col,
            lat_col=lat_col,
            lng_col=lng_col,
            query_id_col=query_id_col,
            level=(
                level
                if level is not None
                else min(
                    g.MAX_LEVEL, g.MIN_WIDTH.get_max_level(radius_rad) + 2
                )
            ),
        )
    if strategy != "broadcast":
        raise ValueError(f"unknown strategy: {strategy!r}")
    if level is None:
        level = g.MIN_WIDTH.get_max_level(radius_rad)
    q_id = queries[query_id_col].to_numpy()
    q_lat = queries["lat"].to_numpy()
    q_lng = queries["lng"].to_numpy()
    cand: set = set()
    for la, ln in zip(q_lat, q_lng):
        axis = g.LatLng.from_degrees(float(la), float(ln)).to_point()
        cap = g.Cap.from_axis_angle(axis, radius_rad)
        cand.update(
            c.id for c in g.RegionCoverer.get_simple_covering(cap, axis, level)
        )
    cand_cells = np.fromiter(cand, dtype=np.uint64, count=len(cand))
    cand_cells.sort()
    # A candidate set spanning most of the level can't prune — skip the
    # per-batch membership test entirely (empty sentinel = no filter).
    if len(cand_cells) > 0.5 * 6 * 4**level:
        cand_cells = np.zeros(0, np.uint64)
    ref = ray.put((cand_cells, q_id, q_lat, q_lng))
    radius = float(radius_rad)

    def partial_pairs(batch: pa.Table) -> pa.Table:
        cells, qids, qlat, qlng = ray.get(ref)
        lat = _np(batch[lat_col])
        lng = _np(batch[lng_col])
        pid = _np(batch[point_id_col])
        if len(cells):
            anc = ck.parent(ck.cell_id_from_latlng(lat, lng), level)
            from ..functions._buckets import sorted_lookup

            keep, _ = sorted_lookup(anc, cells)
            lat, lng, pid = lat[keep], lng[keep], pid[keep]
        if not len(lat):
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    point_id_col: pa.array([], pa.int64()),
                    "dist_rad": pa.array([], pa.float64()),
                }
            )
        d = _haversine_oracle(
            lat[:, None], lng[:, None], qlat[None, :], qlng[None, :]
        )
        bi, qi = np.nonzero(d <= radius)
        return pa.table(
            {
                "query_id": pa.array(qids[qi], pa.int64()),
                point_id_col: pa.array(pid[bi]),
                "dist_rad": pa.array(d[bi, qi], pa.float64()),
            }
        )

    partials = points_ds.map_batches(
        partial_pairs, batch_format="pyarrow", batch_size=None
    )
    return _rank_cap_groupby(partials, k, point_id_col)


def _rank_cap_groupby(partials, k: int, point_id_col: str):
    """(query_id, id, dist_rad) hit pairs → per-query (dist, id asc)
    rank, capped at ``k`` — the shared merge of both E11b strategies."""

    def rank_cap(group: pa.Table) -> pa.Table:
        dd = group["dist_rad"].to_numpy()
        pid = group[point_id_col].to_numpy()
        order = np.lexsort((pid, dd))[:k]  # (dist, id asc) tie rule
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)
                ),
                point_id_col: group[point_id_col].take(pa.array(order)),
                "dist_rad": group["dist_rad"].take(pa.array(order)),
            }
        )

    return partials.groupby("query_id").map_groups(
        rank_cap, batch_format="pyarrow"
    )


def _within_radius_shuffle(
    points_ds,
    queries: pa.Table,
    radius_rad: float,
    k: int,
    *,
    point_id_col: str,
    lat_col: str,
    lng_col: str,
    query_id_col: str,
    level: int,
):
    """E11b shuffle strategy — both sides large.  Queries emit one row
    per cover cell (small side, built driver-side), points one row per
    unique level-``level`` ancestor; a single ``groupby(cell)`` computes
    in-cell distances.  A matching pair meets in EXACTLY one cell (the
    point's ancestor is unique and, because the cover contains the disc,
    it is among the query's cover cells whenever d ≤ r), so no pair
    dedup is needed.  Integer point/query ids (cast to int64 on the
    wire) — the two sides share one union schema."""
    import ray.data as rd

    from .. import geometry as g

    q_id = queries[query_id_col].to_numpy().astype(np.int64)
    q_lat = queries["lat"].to_numpy().astype(np.float64)
    q_lng = queries["lng"].to_numpy().astype(np.float64)
    cells_per_q = []
    for la, ln in zip(q_lat, q_lng):
        axis = g.LatLng.from_degrees(float(la), float(ln)).to_point()
        cap = g.Cap.from_axis_angle(axis, radius_rad)
        cells_per_q.append(
            np.fromiter(
                (
                    c.id
                    for c in g.RegionCoverer.get_simple_covering(
                        cap, axis, level
                    )
                ),
                dtype=np.uint64,
            )
        )
    counts = np.array([len(c) for c in cells_per_q], dtype=np.int64)
    cell_flat = (
        np.concatenate(cells_per_q)
        if cells_per_q
        else np.zeros(0, np.uint64)
    )
    rep = np.repeat(np.arange(len(q_id)), counts)
    q_side = pa.table(
        {
            "cell": pa.array(cell_flat.view(np.int64), pa.int64()),
            "side": pa.array(np.ones(len(rep), np.int8)),
            "gid": pa.array(q_id[rep], pa.int64()),
            "lat": pa.array(q_lat[rep], pa.float64()),
            "lng": pa.array(q_lng[rep], pa.float64()),
        }
    )
    radius = float(radius_rad)

    def emit_points(batch: pa.Table) -> pa.Table:
        lat = _np(batch[lat_col]).astype(np.float64)
        lng = _np(batch[lng_col]).astype(np.float64)
        pid = _np(batch[point_id_col]).astype(np.int64)
        anc = ck.parent(ck.cell_id_from_latlng(lat, lng), level)
        return pa.table(
            {
                "cell": pa.array(anc.view(np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(pid), np.int8)),
                "gid": pa.array(pid, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lng": pa.array(lng, pa.float64()),
            }
        )

    both = points_ds.map_batches(
        emit_points, batch_format="pyarrow", batch_size=None
    ).union(rd.from_arrow(q_side))

    def group_pairs(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        lat = group["lat"].to_numpy(zero_copy_only=False)
        lng = group["lng"].to_numpy(zero_copy_only=False)
        gid = group["gid"].to_numpy(zero_copy_only=False)
        pm = side == 0
        qm = ~pm
        if not pm.any() or not qm.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    point_id_col: pa.array([], pa.int64()),
                    "dist_rad": pa.array([], pa.float64()),
                }
            )
        d = _haversine_oracle(
            lat[pm][:, None], lng[pm][:, None],
            lat[qm][None, :], lng[qm][None, :],
        )
        bi, qi = np.nonzero(d <= radius)
        return pa.table(
            {
                "query_id": pa.array(gid[qm][qi], pa.int64()),
                point_id_col: pa.array(gid[pm][bi], pa.int64()),
                "dist_rad": pa.array(d[bi, qi], pa.float64()),
            }
        )

    partials = both.groupby("cell").map_groups(
        group_pairs, batch_format="pyarrow"
    )
    return _rank_cap_groupby(partials, k, point_id_col)


def knn_cell_candidates(
    query_lat: np.ndarray, query_lng: np.ndarray, level: int, rings: int = 1
) -> np.ndarray:
    """Candidate cell ids at ``level`` within ``rings`` neighbor rings of each
    query (E10 expansion) — the pruning set for the cell-based kNN variant.

    Returns (Q, ≤1+8·rings) uint64 (duplicates possible at face corners).
    """
    start = ck.parent(ck.cell_id_from_latlng(query_lat, query_lng), level)
    frontier = start[:, None]
    layers = [frontier]
    seen = frontier
    for _ in range(rings):
        nbrs = ck.all_neighbors(seen.reshape(-1)).reshape(seen.shape[0], -1)
        layers.append(nbrs)
        seen = np.concatenate([seen, nbrs], axis=1)
    return np.concatenate(layers, axis=1)
