"""E13–E15, E18 — tiling, tile aggregates, hilbert sort, resumable sink.

Tile aggregation follows the pre-aggregate pattern (SURVEY §4, ray_guide):
partial per-batch combine inside ``map_batches`` (one row per tile per
batch) before the small ``groupby`` — the all-to-all shuffle moves partials,
not rows.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import cells as ck
from .encode import _np, tile_assign


def add_tile_column(
    ds, level: int, lat_col="lat", lng_col="lng", leaf_col="cell_id"
):
    """Append ``tile_id``/``tile_token`` at ``level`` (reusing an existing
    leaf-cell column, else encoding on the fly)."""

    def _assign(batch: pa.Table) -> pa.Table:
        if leaf_col and leaf_col in batch.column_names:
            leaf = _np(batch[leaf_col])
        else:
            leaf = ck.cell_id_from_latlng(_np(batch[lat_col]), _np(batch[lng_col]))
            if "cell_id" not in batch.column_names:
                batch = batch.append_column(
                    "cell_id", pa.array(leaf, pa.uint64())
                )
        tiles = ck.parent(leaf, level)
        batch = batch.append_column("tile_id", pa.array(tiles, pa.uint64()))
        return batch.append_column(
            "tile_token", ck.token_array_from_cell_id(tiles)
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


# Hint-estimated partial rows under which the tile merge gathers the
# partials and finishes driver-side (~16 B/row × 4M ≈ 64 MB) — the
# budgeted in-process-tail gate; above it the distributed merge runs.
TILE_GATHER_ROWS = 4_000_000
# ...and the floor below which it does NOT: with only ~10⁵ partial rows
# the fused streaming plan already merges in one tiny op, and the
# gather's driver sync costs more than it saves (interleaved probe:
# 0.56-0.66 s streaming vs 0.62-0.72 s gathered at 5k rows; the 4M-row
# flagship reads 0.97 the other way).
TILE_GATHER_FLOOR = 500_000


def tile_counts(
    ds,
    level: int,
    lat_col="lat",
    lng_col="lng",
    leaf_col: str | None = "cell_id",
    sum_cols=(),
    tree_reduce_max_level: int = 8,
    num_rows: int | None = None,
    final_combine_rows: int = 100_000_000,
):
    """E13: per-tile row counts (+ optional sums), partial-aggregated.

    Partial combine runs per block inside ``map_batches`` (one row per tile
    per block), so the exchange moves partials, not rows. The final merge
    is a single coalesce+combine when BOTH (a) the group cardinality is
    bounded (level ≤ ``tree_reduce_max_level``: ≤ 6·4^8 ≈ 393k tiles) and
    (b) the estimated partial-row total — ``est_blocks × min(block_rows,
    cardinality)`` from the ``num_rows`` hint — fits one task
    (``final_combine_rows``, default 100M rows ≈ 1.6 GB — a measured
    single-task linear combine of ~32M partial rows costs seconds);
    otherwise the hash groupby shuffle does the merge. Callers at scale should pass ``num_rows`` (parquet metadata
    count is free); without a hint the coalesce path is used for bounded
    levels, which is correct at any scale but single-task-bound above
    ~10⁴ blocks.

    Returns a Dataset with columns ``tile_token, n_rows[, sum_<col>…]``.
    """
    sum_cols = list(sum_cols)
    value_cols = ["n_rows"] + [f"sum_{c}" for c in sum_cols]

    def partial(batch: pa.Table) -> pa.Table:
        if leaf_col and leaf_col in batch.column_names:
            leaf = _np(batch[leaf_col])  # reuse upstream encode (no re-trig)
        else:
            leaf = ck.cell_id_from_latlng(
                _np(batch[lat_col]), _np(batch[lng_col])
            )
        tiles = ck.parent(leaf, level)
        order = np.argsort(tiles, kind="stable")
        tiles_sorted = tiles[order]
        uniq, starts, counts = np.unique(
            tiles_sorted, return_index=True, return_counts=True
        )
        cols = {
            "tile_id": pa.array(uniq.view(np.int64), pa.int64()),
            "n_rows": pa.array(counts.astype(np.int64)),
        }
        for c in sum_cols:
            vals = _np(batch[c])[order]
            sums = np.add.reduceat(vals.astype(np.float64), starts)
            cols[f"sum_{c}"] = pa.array(sums)
        return pa.table(cols)

    shift = np.uint64(2 * (30 - level) + 1)
    card = 6 * (4 ** level)

    def combine(batch: pa.Table) -> pa.Table:
        t = batch["tile_id"].to_numpy()
        if not sum_cols:
            # Count-only merge on the DENSE level-L index (level-L ids are
            # odd multiples of lsb, so id >> (2(30-L)+1) is a bijection
            # onto [0, 6·4^L)): one scatter-add replaces the multi-million-
            # row argsort the coalesced single task otherwise pays (~0.4 s
            # at the 4M-row bench). Accumulate in int64, not bincount's
            # float64 weights — per-tile counts above 2^53 would round
            # (round-4 review).
            idx = (t.view(np.uint64) >> shift).astype(np.int64)
            counts = np.zeros(card, np.int64)
            np.add.at(counts, idx, _np(batch["n_rows"]).astype(np.int64))
            nz = np.nonzero(counts)[0]
            ids = (
                (2 * nz.astype(np.uint64) + np.uint64(1))
                << (shift - np.uint64(1))
            ).view(np.int64)
            # Keep the argsort branch's int64-ascending row order (faces
            # 4-5 sort negative-first) so output order is identical across
            # both branches and prior versions.
            order = np.argsort(ids, kind="stable")
            return pa.table(
                {
                    "tile_id": pa.array(ids[order], pa.int64()),
                    "n_rows": pa.array(counts[nz][order].astype(np.int64)),
                }
            )
        # Float sum columns: keep the sorted-segment reduceat so the
        # summation order (and hence the low bits) is unchanged.
        order = np.argsort(t, kind="stable")
        t = t[order]
        uniq, starts = np.unique(t, return_index=True)
        cols = {"tile_id": pa.array(uniq, pa.int64())}
        for c in value_cols:
            v = _np(batch[c])[order]
            cols[c] = pa.array(np.add.reduceat(v, starts))
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    if num_rows is not None:
        # Conservative rows-per-block guess (upstream stages commonly emit
        # ~50-100k-row blocks, far below the 128 MiB target): OVERestimate
        # the block count so the single-task path is never admitted with
        # more partial rows than it can hold.
        est_blocks = max(1, num_rows // 100_000)
        est_partial = est_blocks * min(
            card, max(1, num_rows // est_blocks)
        )
        coalesce_ok = est_partial <= final_combine_rows
    else:
        est_partial = None
        coalesce_ok = True
    if (
        level <= tree_reduce_max_level
        and est_partial is not None
        and TILE_GATHER_FLOOR <= est_partial <= TILE_GATHER_ROWS
    ):
        # Budgeted in-process tail (the repo's budgeted-sum idiom): the
        # partial rows are hint-bounded (≤16 B/row × TILE_GATHER_ROWS ≈
        # 64 MB), so gather them ONCE and run the SAME combine+tokenize
        # kernels driver-side — this removes the repartition exchange,
        # the single remote combine task and the tokenize operator from
        # the plan (each costs ~0.5-2 s of fixed streaming overhead at
        # bench scale while the kernels run in ms).  Bit-identical by
        # construction (same kernels, same coalesced input); the forced-
        # path pytest pins it against the distributed merge.
        import ray.data as rd

        from ..functions._schema import concat_blocks

        gathered = concat_blocks(
            partials,
            pa.schema(
                [("tile_id", pa.int64())]
                + [(c, pa.float64() if c != "n_rows" else pa.int64())
                   for c in value_cols]
            ),
        )
        merged = combine(gathered)
        merged = merged.append_column(
            "tile_token",
            ck.token_array_from_cell_id(
                merged["tile_id"].to_numpy().view(np.uint64)
            ),
        ).drop_columns(["tile_id"])
        return rd.from_arrow(merged)
    if level <= tree_reduce_max_level and coalesce_ok:
        out = partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    else:
        from ray.data.aggregate import Sum

        out = partials.groupby("tile_id").aggregate(
            *[Sum(c, alias_name=c) for c in value_cols]
        )

    def tokenize(batch: pa.Table) -> pa.Table:
        tiles = batch["tile_id"].to_numpy().view(np.uint64)
        batch = batch.append_column(
            "tile_token", ck.token_array_from_cell_id(tiles)
        )
        return batch.drop_columns(["tile_id"])

    return out.map_batches(tokenize, batch_format="pyarrow")


def hilbert_sort(ds, id_col: str = "cell_id", tiebreak_cols=()):
    """E14: global sort in Hilbert (cell id) order.

    Cell ids for faces 4-5 set bit 63 (face << 61), so a plain int64
    reinterpretation misorders them; XOR with 2^63 is the order-preserving
    uint64 -> int64 map.
    """

    def _widen(batch: pa.Table) -> pa.Table:
        ids = (_np(batch[id_col]) ^ np.uint64(1 << 63)).view(np.int64)
        return batch.append_column("_sort_key", pa.array(ids, pa.int64()))

    keys = ["_sort_key", *tiebreak_cols]
    return ds.map_batches(_widen, batch_format="pyarrow").sort(keys)


def top_k_tiles(
    ds, level: int, k: int, lat_col="lat", lng_col="lng", num_rows=None
):
    """E14: densest k tiles = tile_counts → sort desc → limit.

    Deterministic tie rule: (n_rows desc, tile_token asc)."""
    counts = tile_counts(
        ds, level, lat_col=lat_col, lng_col=lng_col, num_rows=num_rows
    )
    return counts.sort(["n_rows", "tile_token"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# E18 — resumable partitioned parquet sink with per-partition manifests
# ---------------------------------------------------------------------------


def write_tiles(
    ds,
    out_dir: str,
    level: int,
    lat_col="lat",
    lng_col="lng",
    fingerprint: str = "",
    tile_prefix_len: int | None = None,
    num_rows: int | None = None,
):
    """Write pages partitioned by tile-token prefix with lineage manifests.

    Layout: ``{out_dir}/tile={prefix}/part-*.parquet`` plus
    ``{out_dir}/_manifests/{prefix}.json`` holding
    ``{partition, rows, op_fingerprint, wall_ms, written_at}``. A rerun with
    the same fingerprint skips partitions whose manifest already exists —
    that is the checkpoint/resume contract (SURVEY §4).

    Partitioning by token *prefix* bounds the directory count while
    keeping restart granularity useful.  The prefix length is
    data-proportional (the ``derive_buckets`` idiom): from the
    ``num_rows`` hint (parquet metadata count — free) it targets
    ~100k rows/partition clamped to [16, 4096] partitions — a fixed
    length over-partitions small inputs ~3800 directories of ~13 rows
    at sf0.1 (filesystem-metadata-bound writes) while a crawl-scale
    input saturates the cap exactly as before.  Without a hint the
    scale-safe length 4 is used.  The length chosen by the FIRST run is
    persisted in ``_manifests/_meta.json`` and reused by every rerun,
    so the resume skip-set always matches the on-disk layout even if a
    later caller passes a different hint.
    """
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    meta_path = os.path.join(out_dir, "_manifests", "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            tile_prefix_len = int(json.load(fh)["tile_prefix_len"])
    elif tile_prefix_len is None:
        if num_rows is not None and num_rows > 0:
            import math

            p_target = min(4096, max(16, math.ceil(num_rows / 100_000)))
            tile_prefix_len = max(1, math.ceil(math.log(p_target) / math.log(16)))
        else:
            tile_prefix_len = 4
    with open(meta_path, "w") as fh:
        json.dump({"tile_prefix_len": int(tile_prefix_len)}, fh)
    done = {
        f[: -len(".json")]
        for f in os.listdir(os.path.join(out_dir, "_manifests"))
        if f.endswith(".json") and not f.startswith("_")
    }
    # Input lineage: the source files feeding this write (resolvable from
    # the logical plan for file-based sources; empty for synthetic inputs).
    try:
        input_files = sorted(ds.input_files() or [])
    except Exception:
        input_files = []

    ds = add_tile_column(ds, level, lat_col=lat_col, lng_col=lng_col)

    def add_prefix(batch: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(batch["tile_token"], 0, tile_prefix_len)
        return batch.append_column("tile_prefix", pref)

    ds = ds.map_batches(add_prefix, batch_format="pyarrow")
    if done:
        done_list = sorted(done)

        def _skip(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch["tile_prefix"], pa.array(done_list)))
            return batch.filter(mask)

        ds = ds.map_batches(_skip, batch_format="pyarrow")

    t0 = time.time()
    ds.write_parquet(out_dir, partition_cols=["tile_prefix"])
    wall_ms = int((time.time() - t0) * 1000)

    # Manifest pass: per-partition row counts from the written file footers,
    # fanned out as Ray tasks (serial footer reads dominate otherwise).
    import ray

    @ray.remote(num_cpus=0.25)
    def _partition_manifest(part_dir: str) -> tuple[int, int, list[str]]:
        import pyarrow.parquet as pq

        rows = 0
        bytes_ = 0
        frags = []
        for f in os.listdir(part_dir):
            if f.endswith(".parquet"):
                p = os.path.join(part_dir, f)
                rows += pq.read_metadata(p).num_rows
                bytes_ += os.path.getsize(p)
                frags.append(f)
        return rows, bytes_, sorted(frags)

    todo = []
    for entry in sorted(os.listdir(out_dir)):
        if not entry.startswith("tile_prefix="):
            continue
        prefix = entry.split("=", 1)[1]
        if prefix in done:
            continue
        todo.append((prefix, os.path.join(out_dir, entry)))
    results = ray.get([_partition_manifest.remote(d) for _, d in todo])
    for (prefix, _), (rows, bytes_, frags) in zip(todo, results):
        manifest = {
            "partition": prefix,
            "rows": rows,
            "bytes": bytes_,
            "fragments": frags,
            "inputs": input_files,
            "op_fingerprint": fingerprint,
            "wall_ms": wall_ms,
            "written_at": time.time(),
        }
        with open(
            os.path.join(out_dir, "_manifests", f"{prefix}.json"), "w"
        ) as fh:
            json.dump(manifest, fh)
    return out_dir


def read_manifests(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifests")
    out = []
    if not os.path.isdir(mdir):
        return out
    for f in sorted(os.listdir(mdir)):
        # "_meta.json" holds the layout choice, not a partition manifest
        if f.endswith(".json") and not f.startswith("_"):
            with open(os.path.join(mdir, f)) as fh:
                out.append(json.load(fh))
    return out
