"""Cardinality sketches: HyperLogLog distinct count.

The at-scale replacement for exact ``COUNT(DISTINCT)`` (whose groupby
must shuffle every distinct key): per-block register partials (fixed
2^p × 1 B) merge by max — the exchange carries registers, never keys.
Deterministic: the estimate is a pure function of the data (splitmix /
polynomial hashing, no RNG), so reruns agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash_column(col) -> np.ndarray:
    """64-bit hash of any column: strings/binary via the polynomial value
    -buffer hash, integers via splitmix64."""
    from .dedup import poly_hash_strings

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_binary(col.type) or pa.types.is_large_string(col.type):
        return poly_hash_strings(col)
    x = col.to_numpy(zero_copy_only=False)
    if x.dtype.kind == "f":
        # Hash the raw IEEE bit pattern — truncating floats to ints would
        # conflate distinct values (1.2 and 1.9 -> 1).
        x = x.astype(np.float64).view(np.uint64)
    else:
        x = x.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _rho(w: np.ndarray, bits: int) -> np.ndarray:
    """Position of the leftmost 1-bit of ``w`` within ``bits`` bits (1-based;
    bits+1 when w == 0) — EXACT vectorized bit length.

    A bare float64 frexp is wrong for w ≥ 2^53: any w within half an ulp
    below 2^k rounds UP to 2^k and reports bit length k+1 (found by the
    round-4 code review; only p ≤ 10 registers were exposed).  Split into
    32-bit halves so every frexp input is < 2^32 and therefore exact."""
    w = np.asarray(w, dtype=np.uint64)
    out = np.full(len(w), bits + 1, dtype=np.int64)
    nz = w != 0
    if nz.any():
        hi = (w[nz] >> np.uint64(32)).astype(np.float64)
        lo = (w[nz] & np.uint64(0xFFFFFFFF)).astype(np.float64)
        bl_hi = np.frexp(hi)[1]  # exact: hi < 2^32 < 2^53
        bl_lo = np.frexp(lo)[1]
        top = np.where(hi > 0, 32 + bl_hi, bl_lo)  # exact bit length
        out[nz] = bits - top + 1
    return out


def hll_register_partials(batch: pa.Table, col: str, p: int = 12) -> pa.Table:
    """Per-block HLL register partial: (register, max_rho) rows (≤ 2^p)."""
    h = _hash_column(batch[col])
    if not len(h):
        return pa.table(
            {"reg": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
        )
    m = 1 << p
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rho = _rho(w, 64 - p)
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, reg, rho)
    used = np.nonzero(regs)[0]
    return pa.table(
        {"reg": pa.array(used), "rho": pa.array(regs[used])}
    )


def hll_estimate(registers: np.ndarray, p: int = 12) -> float:
    """Standard HLL estimate with small-range (linear counting) and
    large-range corrections (Flajolet et al. 2007)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.sum(registers == 0))
        if zeros:
            est = m * np.log(m / zeros)
    elif est > (1 << 32) / 30.0:
        est = -(1 << 32) * np.log(1.0 - est / (1 << 32))
    return float(est)


def hll_distinct(ds, col: str, p: int = 12):
    """Approximate COUNT(DISTINCT col) → pa.Table(n_distinct_est:int64).

    map_batches register partials → groupby(reg).max (≤ 2^p rows cross
    the exchange) → driver-side estimate from the 2^p merged registers.
    """
    from ray.data.aggregate import Max

    rows = (
        ds.map_batches(
            lambda b: hll_register_partials(b, col, p),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho"))
        .take_all()
    )
    registers = np.zeros(1 << p, dtype=np.int64)
    for r in rows:
        registers[int(r["reg"])] = int(r["rho"])
    est = hll_estimate(registers, p)
    return pa.table(
        {"n_distinct_est": pa.array([int(round(est))], pa.int64())}
    )


def frequent_items(
    ds,
    col: str,
    phi_denom: int = 128,
    capacity: int | None = None,
    num_rows: int | None = None,
) -> pa.Table:
    """EXACT φ-frequent items (heavy hitters): every value with
    ``count * phi_denom >= n`` and its exact count — in two bounded-memory
    passes, never a full-cardinality groupby.

    Pass 1 (candidate generation): each block keeps only its ``capacity``
    most frequent values with their in-block counts (space-bounded
    summary, vectorized ``np.unique`` + ``argpartition``). An evicted
    value's in-block count is at most ``n_block/(capacity+1)`` (the
    (capacity+1)-th largest count cannot exceed it — otherwise capacity+1
    values would sum past the block), so after the tiny groupby-sum merge
    every value's estimate satisfies ``est >= true - n/capacity``. With
    ``capacity = 4 * phi_denom`` (default), every qualifying value has
    ``est >= n/phi_denom - n/capacity``, an integer-exact candidate
    threshold; the candidate set is at most ``~capacity`` values.

    Pass 2 (exact recount): the candidate set is broadcast and each block
    emits exact candidate counts (searchsorted membership + bincount);
    the final filter ``count * phi_denom >= n`` is exact regardless of
    sketch parameters — the sketch only bounds WHO gets recounted.

    Driver/exchange state: pass-1 partials are ``blocks × capacity``
    rows; pass-2 partials are ``blocks × |candidates|``; neither depends
    on the column's cardinality. Integer columns only (the item value is
    returned verbatim).
    """
    import ray
    from ray.data.aggregate import Sum

    if capacity is None:
        capacity = 4 * phi_denom
    if capacity <= phi_denom:
        raise ValueError("capacity must exceed phi_denom for the bound")
    n = num_rows if num_rows is not None else ds.count()

    def summary(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        if len(u) > capacity:
            keep = np.argpartition(c, -capacity)[-capacity:]
            u, c = u[keep], c[keep]
        return pa.table(
            {"item": pa.array(u), "est": pa.array(c.astype(np.int64))}
        )

    ests = (
        ds.map_batches(summary, batch_format="pyarrow", batch_size=None)
        .groupby("item")
        .aggregate(Sum("est", alias_name="est"))
        .take_all()
    )
    # est*phi_denom*capacity >= n*(capacity - phi_denom)  <=>
    # est >= n/phi_denom - n/capacity, in exact integer arithmetic.
    cand = np.sort(
        np.array(
            [
                r["item"]
                for r in ests
                if r["est"] * phi_denom * capacity
                >= n * (capacity - phi_denom)
            ],
            dtype=np.int64,
        )
    )
    if not len(cand):
        return pa.table(
            {"item": pa.array([], pa.int64()), "n_rows": pa.array([], pa.int64())}
        )
    cand_ref = ray.put(cand)

    def exact(batch: pa.Table) -> pa.Table:
        from .dedup import _get_broadcast

        cd = _get_broadcast(cand_ref)
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(cd, v)
        hit = (pos < len(cd)) & (cd[np.minimum(pos, len(cd) - 1)] == v)
        cnt = np.bincount(pos[hit], minlength=len(cd))
        present = cnt > 0
        return pa.table(
            {
                "item": pa.array(cd[present]),
                "n_rows": pa.array(cnt[present].astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(exact, batch_format="pyarrow", batch_size=None)
        .groupby("item")
        .aggregate(Sum("n_rows", alias_name="n_rows"))
        .take_all()
    )
    items = [r["item"] for r in rows if r["n_rows"] * phi_denom >= n]
    counts = [r["n_rows"] for r in rows if r["n_rows"] * phi_denom >= n]
    order = np.argsort(np.array(items, dtype=np.int64))
    return pa.table(
        {
            "item": pa.array(np.array(items, dtype=np.int64)[order]),
            "n_rows": pa.array(np.array(counts, dtype=np.int64)[order]),
        }
    )
