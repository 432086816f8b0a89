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


def _cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    import os

    return os.cpu_count() or 8
