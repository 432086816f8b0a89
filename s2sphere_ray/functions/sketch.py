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
    bits+1 when w == 0) — vectorized via a float-exponent trick."""
    out = np.full(len(w), bits + 1, dtype=np.int64)
    nz = w != 0
    if nz.any():
        # floor(log2(w)) via the IEEE-754 exponent; safe for w < 2^63.
        top = np.frexp(w[nz].astype(np.float64))[1]  # bit length
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
