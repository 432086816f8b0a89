"""Data-proportional shuffle bucket sizing.

Round-1 used fixed bucket counts (64/256/1024) for the hash-bucketed
``groupby().map_groups`` shuffles (sessionize, as-of join, exact dedup,
LSH band pairs).  A fixed group count means per-group size grows linearly
with the input — at 100 TB one ``map_groups`` task would have to hold
~1/64 of the table.  Instead the bucket count is derived from the input
size so the expected rows-per-bucket stays bounded, with a floor of
4 x cluster CPUs so small inputs still parallelise.
"""

from __future__ import annotations

import math


def derive_buckets(
    num_rows: int | None = None,
    *,
    target_rows: int = 250_000,
    floor: int | None = None,
    cap: int = 1 << 20,
) -> int:
    """Bucket count for a hash-bucketed shuffle.

    ``max(4 * cluster CPUs, ceil(num_rows / target_rows))`` capped at
    ``cap``.  ``num_rows`` is a hint (parquet metadata count is cheap);
    when unknown the CPU floor alone is used.
    """
    if floor is None:
        floor = 4 * _cluster_cpus()
    n = floor
    if num_rows is not None and num_rows > 0:
        n = max(n, math.ceil(num_rows / target_rows))
    return max(1, min(n, cap))


def derive_concurrency(
    frac: float = 1.0, *, lo: int = 1, cap: int | None = None
) -> tuple:
    """Autoscaling actor-pool ``(min, max)`` derived from cluster CPUs —
    the actor-pool analogue of ``derive_buckets``'s floor logic. Round-2
    pinned ``(1, 4)``/``(1, 8)`` constants at several stages, which
    under-parallelises any cluster bigger than the dev box; ``frac``
    scales the upper bound (1.0 for CPU-bound per-row stages like the
    coverer, 0.5 for light stages sharing the node with shuffles)."""
    hi = max(lo, math.ceil(frac * _cluster_cpus()))
    if cap is not None:
        hi = min(hi, cap)
    return (lo, hi)


def hash_buckets(keys, n_buckets: int):
    """int64/uint64 key array → int32 bucket ids via a full-width
    multiplicative mix then modulo (the one shared definition — round 1's
    bucket-cap bug came from this snippet being copy-pasted per call
    site)."""
    import numpy as np

    u = np.asarray(keys).astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        b = (
            (u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        ).astype(np.int64) % n_buckets
    return b.astype(np.int32)


def budgeted_sum_single_key(make_partials, key, val, *, cap=2_000_000):
    """Budget-gated final sum over (int64 key, int64 count) partials —
    the driver half of the ``_find_hot_keys`` idiom, shared so every
    bounded-cardinality counting pre-pass skips its exchange.

    Streams ``make_partials()`` under ``cap`` rows and hash-sums
    driver-side (``np.unique`` + int64 ``np.add.at`` — both Ray
    final-sum flavors pay seconds of fixed machinery where this is ms).
    Returns ``(keys, sums)`` (key-sorted), or ``None`` past the cap —
    the caller then runs its exchange path, re-executing the narrow
    upstream once (the documented trade; at crawl cardinality the
    exchange is the right shape anyway)."""
    import numpy as np
    import pyarrow as pa

    got, rows = [], 0
    for b in make_partials().iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        got.append(b)
        rows += b.num_rows
        if rows > cap:
            return None
    if not got:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    t = pa.concat_tables(got)
    k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t[val].to_numpy(zero_copy_only=False).astype(np.int64)
    uk, inv = np.unique(k, return_inverse=True)
    sums = np.zeros(len(uk), dtype=np.int64)
    np.add.at(sums, inv, n)  # int64, not bincount's float64 weights
    return uk, sums


def sorted_lookup(values, sorted_arr):
    """(hit mask, clipped positions) of ``values`` in sorted-unique
    ``sorted_arr`` via ONE ``np.searchsorted`` — the shared
    ``np.isin``-replacement (use the mask) and broadcast-index probe
    (use the positions where the mask is true).  O(n log m) with no
    per-call hash build; empty inputs yield all-false / zeros."""
    import numpy as np

    values = np.asarray(values)
    if len(sorted_arr) == 0 or len(values) == 0:
        return (
            np.zeros(len(values), dtype=bool),
            np.zeros(len(values), dtype=np.int64),
        )
    pos = np.searchsorted(sorted_arr, values).clip(0, len(sorted_arr) - 1)
    return sorted_arr[pos] == values, pos


def _cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    import os

    return os.cpu_count() or 8

# --------------------------------------------------------------------------
# Bucketed high-cardinality aggregation (the round-5 exchange idiom)
# --------------------------------------------------------------------------
#
# Ray's native ``groupby(key).aggregate(Sum(...))`` sort-shuffles the
# whole exchange BY KEY — measured ~15x slower than a hash-bucketed
# ``groupby(bucket).map_groups(Arrow C++ hash agg)`` at 4M distinct keys
# (BASELINE.md round 5, the PageRank deg exchange rework).  The helpers
# below are the one shared definition of that idiom for the
# vocabulary-scale exchanges (token/bigram/word/pair histograms,
# candidate-pair dedup): same all-to-all volume, but the reduce is a
# C++ hash aggregation over ~target_rows-sized buckets instead of a
# global sort.


def _key_mix(batch, keys):
    """Combined uint64 hash over one or more key columns (int-typed
    columns are used full-width; string/binary via poly_hash_strings)."""
    import numpy as np
    import pyarrow as pa

    mix = None
    for k in keys:
        col = batch[k]
        if (
            pa.types.is_string(col.type)
            or pa.types.is_large_string(col.type)
            or pa.types.is_binary(col.type)
            or pa.types.is_large_binary(col.type)
        ):
            from .dedup import poly_hash_strings  # lazy: import cycle

            h = poly_hash_strings(col).astype(np.uint64, copy=False)
        else:
            h = (
                col.to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .view(np.uint64)
            )
        with np.errstate(over="ignore"):
            mix = h if mix is None else mix * np.uint64(0x100000001B3) + h
    return mix


def bucketed_sum(ds, keys, vals, schema, *, n_buckets=None, num_rows=None):
    """``groupby(keys).sum(vals)`` as ONE hash-bucketed exchange +
    per-bucket Arrow C++ hash aggregation.

    Input blocks must already be (keys + vals) partials (callers
    pre-aggregate per block, so the exchange carries distinct-key
    partials, not occurrences).  ``schema`` is the output block schema
    (keys then vals) — empty buckets emit a typed empty table so the
    block schema stays stable.  Output rows are NOT key-sorted (unlike
    Ray's native sort-groupby); every consumer in this repo re-sorts or
    re-shards after the gather.
    """
    import pyarrow as pa

    keys, vals = list(keys), list(vals)
    if n_buckets is None:
        n_buckets = derive_buckets(num_rows)
    aggs = [(v, "sum") for v in vals]

    def add_bucket(batch: "pa.Table") -> "pa.Table":
        if batch.num_rows == 0:
            return schema.empty_table().append_column(
                "_kb", pa.array([], pa.int32())
            )
        return batch.select(keys + vals).append_column(
            "_kb", pa.array(hash_buckets(_key_mix(batch, keys), n_buckets))
        )

    def combine(group: "pa.Table") -> "pa.Table":
        if group.num_rows == 0 or keys[0] not in group.column_names:
            return schema.empty_table()
        t = group.select(keys + vals).group_by(keys).aggregate(aggs)
        return t.rename_columns(keys + vals).cast(schema)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_kb")
        .map_groups(combine, batch_format="pyarrow")
    )


def distinct_pairs(ds, extra_cols=(), *, n_buckets=None, num_rows=None):
    """Distinct ``(id_a, id_b)`` rows of a candidate-pair stream —
    bucketed by the pair hash, per-bucket Arrow C++ hash-distinct.

    Replaces ``groupby(["id_a","id_b"]).map_groups(slice(0,1))``, which
    sort-shuffles every candidate pair by the composite key.  Any
    ``extra_cols`` must be FUNCTIONS of the pair (e.g. a hamming
    distance) — the representative kept is their min, which equals the
    unique value.  Output is NOT pair-sorted.
    """
    import pyarrow as pa

    extra_cols = list(extra_cols)
    keys = ["id_a", "id_b"]
    schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64())]
        + [(c, pa.int64()) for c in extra_cols]
    )
    if n_buckets is None:
        n_buckets = derive_buckets(num_rows)
    aggs = [(c, "min") for c in extra_cols]

    def add_bucket(batch: "pa.Table") -> "pa.Table":
        if batch.num_rows == 0:
            return schema.empty_table().append_column(
                "_pb", pa.array([], pa.int32())
            )
        return batch.select(keys + extra_cols).append_column(
            "_pb", pa.array(hash_buckets(_key_mix(batch, keys), n_buckets))
        )

    def combine(group: "pa.Table") -> "pa.Table":
        if group.num_rows == 0 or "id_a" not in group.column_names:
            return schema.empty_table()
        t = group.select(keys + extra_cols).group_by(keys).aggregate(aggs)
        return t.rename_columns(keys + extra_cols).cast(schema)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_pb")
        .map_groups(combine, batch_format="pyarrow")
    )
