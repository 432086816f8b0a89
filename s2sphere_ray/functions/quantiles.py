"""Distributed exact quantiles for continuous (float) columns.

The bounded-int ``q_quantiles`` path (queries.py, bincount partials) only
works when the domain is small integers. Training-data pipelines need
quantiles of continuous columns (loss, quality score, price); this module
supplies two scale-safe EXACT strategies (VERDICT round-2 item 6):

1. ``fixed_point_quantiles`` — for data that is fixed-point decimal in
   disguise (money, 2-decimal scores): map to an integer grid (×scale),
   per-block sparse ``np.unique`` count partials (only *distinct* grid
   values travel, never a dense histogram), tiny groupby-sum merge,
   quantile read off the merged cumulative counts. Exact by construction;
   the driver-side state is bounded by the number of distinct grid values
   (≤ domain_width × scale), independent of row count.

2. ``exact_float_quantiles`` — fully general doubles: iterative histogram
   bracketing. Pass 0 computes global min/max; each subsequent pass
   histograms only the still-needed bracket ranges (``bins`` fixed-size
   int64 partials per block → groupby-free tiny reduce), narrowing each
   quantile's bracket by ``bins``× per pass; a final filter pass gathers
   just the rows inside the surviving brackets (expected ≈ q·n/bins^passes
   rows) and picks the order statistic exactly. Returns the *original*
   stored doubles, so results are bit-comparable with a SQL oracle reading
   the same parquet. Every pass is a column-pruned streaming scan; driver
   state is O(bins + gathered), never O(n).

Quantile definition (both functions, matching the SQL oracle): the value
at sorted index ``floor(q/100 · (n-1))`` — the "lower" order statistic,
no interpolation, so the answer is always a datum that exists.

Scale notes: at 10¹² rows the bracketing path does 1 + passes + 1
column-pruned scans; with bins=65536 and passes=2 the expected gather is
n/4·10⁹ rows per quantile — driver-safe. Degenerate mass (all rows one
value) collapses the bracket to width 0, which is detected and answered
without gathering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _rd():
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return rd


def _quantile_indices(qs, n: int) -> np.ndarray:
    """Sorted-order index for each percentile q: floor(q/100 * (n-1))."""
    qs = np.asarray(qs, dtype=np.float64)
    return np.floor(qs / 100.0 * (n - 1)).astype(np.int64)


# ---------------------------------------------------------------------------
# Strategy 1: fixed-point grid (exact for decimal-valued doubles)
# ---------------------------------------------------------------------------


def fixed_point_quantiles(ds, col: str, qs, scale: int = 100) -> pa.Table:
    """Exact quantiles of a fixed-point-decimal double column.

    ``v`` is mapped to the integer grid ``floor(v*scale + 0.5)`` (half-away
    rounding, the repo-wide float→int convention shared with the DuckDB
    oracles). Per-block partials emit (grid_value, count) pairs via
    ``np.unique`` — sparse, so a block with 1e6 rows but 5e4 distinct
    cents emits 5e4 rows. Merge = groupby-sum on grid value; the merged
    distinct set is bounded by the grid domain, not the row count.

    Returns columns ``q:int64, value_cents:int64`` (cents = grid units),
    integer-exact on both engine and oracle sides.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # Nulls are dropped (SQL quantile semantics); without this a null
        # becomes NaN -> INT64_MIN on the grid and silently shifts every
        # quantile.
        col_arr = batch[col]
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        v = col_arr.drop_null().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        g = np.floor(v * scale + 0.5).astype(np.int64)
        u, c = np.unique(g, return_counts=True)
        return pa.table({"v": pa.array(u), "n": pa.array(c.astype(np.int64))})

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["n"] for r in rows], dtype=np.int64)
    if not len(vals):
        raise ValueError("fixed_point_quantiles: empty input")
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    ks = _quantile_indices(qs, n)
    picked = vals[np.searchsorted(cum, ks + 1, side="left")]
    return pa.table(
        {
            "q": pa.array(np.asarray(qs, dtype=np.int64)),
            "value_cents": pa.array(picked.astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# Strategy 2: iterative histogram bracketing (exact for arbitrary doubles)
# ---------------------------------------------------------------------------


def _bracket_histogram(ds, col: str, lo: float, hi: float, bins: int):
    """One histogram pass over [lo, hi]: fixed-size int64 count partials
    (values outside the range are counted in the flanking under/over
    slots so cumulative ranks stay global), merged driver-side.

    Returns (below, counts[bins]) where ``below`` is the number of rows
    strictly left of ``lo``'s bin range.
    """
    width = (hi - lo) / bins

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((v - lo) / width).astype(np.int64)
        # Under-range rows go ONLY to the `below` slot — clipping them
        # into bin 0 as well would double-count and corrupt every
        # cumulative rank on passes after the first (where lo > global
        # min). Over-range rows clip into the last bin on purpose; the
        # gather mirrors both conventions.
        under = int(np.count_nonzero(b < 0))
        b = np.minimum(b[b >= 0], bins - 1)
        hist = np.bincount(b, minlength=bins)
        return pa.table(
            {
                "slot": pa.array(np.arange(-1, bins, dtype=np.int64)),
                "n": pa.array(
                    np.concatenate([[under], hist]).astype(np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("slot")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    counts = np.zeros(bins, dtype=np.int64)
    below = 0
    for r in rows:
        if r["slot"] < 0:
            below = int(r["n"])
        else:
            counts[int(r["slot"])] = int(r["n"])
    return below, counts


def exact_float_quantiles(
    ds,
    col: str,
    qs,
    bins: int = 4096,
    max_passes: int = 3,
    gather_cap: int = 2_000_000,
) -> pa.Table:
    """Exact order-statistic quantiles of an arbitrary double column via
    iterative histogram bracketing (see module docstring).

    Each quantile q tracks a bracket ``[lo, hi]`` known to contain its
    order statistic plus the rank ``below`` of rows left of the bracket.
    A pass histograms each active bracket; the bin holding rank k becomes
    the next bracket. Brackets stop refining when their row count is
    ≤ ``gather_cap``/len(qs) or their float width collapses. The final
    pass filters rows into the surviving brackets and picks exactly.
    """
    from ray.data.aggregate import Count, Max, Min

    # Drop nulls up front (SQL quantile semantics) — otherwise a null
    # becomes NaN -> INT64_MIN bin on every histogram pass, inflating
    # `below`, while Count() includes the null rows in n: every rank
    # shifts silently (the same failure class fixed in
    # fixed_point_quantiles).
    def _drop_null(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return pa.table({col: c.drop_null()})

    ds = ds.map_batches(_drop_null, batch_format="pyarrow", batch_size=None)
    agg = ds.aggregate(Min(col), Max(col), Count())
    glo, ghi = float(agg[f"min({col})"]), float(agg[f"max({col})"])
    n = int(agg["count()"])
    if n == 0:
        raise ValueError("exact_float_quantiles: empty input")
    ks = _quantile_indices(qs, n)
    per_cap = max(1, gather_cap // max(1, len(ks)))

    # One bracket per quantile. Membership MUST be defined by the exact
    # binning formula of the pass that produced it (``floor((v-lo)/width)
    # == j`` with the same floats), not a value-range compare — a row
    # within 1 ulp of a bin edge can round across the boundary and shift
    # the order statistic by one otherwise.
    brackets = [
        {
            "k": int(k),
            "below": 0,
            "count": n,
            "resolved": glo if glo == ghi else None,
            # membership: mode "range" (initial) or "bin" (from a pass)
            "mode": "range",
            "lo": glo,
            "hi": ghi,
            "width": 0.0,
            "j": 0,
        }
        for k in ks
    ]

    for _ in range(max_passes):
        active = [
            b
            for b in brackets
            if b["resolved"] is None
            and not b.get("collapsed")
            and b["count"] > per_cap
        ]
        if not active:
            break
        # Histogram the union bracket once per pass (one scan serves all
        # quantiles); per-quantile ranks are read off the same histogram.
        lo = min(b["lo"] for b in active)
        hi = max(
            b["hi"] if b["mode"] == "range" else b["lo"] + b["width"]
            for b in active
        )
        if not (hi > lo):
            break
        below, counts = _bracket_histogram(ds, col, lo, hi, bins)
        cum = below + np.cumsum(counts)
        width = (hi - lo) / bins
        for b in active:
            k = b["k"]
            j = min(int(np.searchsorted(cum, k + 1, side="left")), bins - 1)
            b_lo = lo + j * width
            b.update(
                below=int(cum[j] - counts[j]),
                count=max(int(counts[j]), 1),
                mode="bin",
                lo=b_lo,
                hi=b_lo + width,
                width=width,
                j=j,
            )
            # Remember the pass frame so the gather can reproduce the
            # binning bit-for-bit.
            b["pass_lo"], b["pass_width"] = lo, width
            if np.nextafter(b_lo, np.inf) >= b_lo + width:
                # Bin narrower than float resolution: it cannot refine
                # further — but do NOT shortcut to ``b_lo`` (ADVICE r3):
                # the one-distinct-double assumption fails at edges (a
                # value 1 ulp below ``b_lo`` can floor-round into bin j,
                # and over-range rows deliberately clip into the LAST
                # bin), so mark it terminal and resolve it through the
                # same exact gather path as every other bracket. The
                # gather's membership formula mirrors the histogram
                # (clip included), so rank arithmetic stays consistent.
                b["collapsed"] = True

    # Final exact gather over the union of unresolved brackets.
    unresolved = [b for b in brackets if b["resolved"] is None]
    if unresolved:
        def _spec(b):
            return (
                b["mode"],
                b.get("pass_lo", b["lo"]),
                b.get("pass_width", 0.0),
                b["j"],
                b["lo"],
                b["hi"],
            )

        # Multiple quantiles often land in the SAME bin (degenerate mass);
        # dedup so shared brackets are counted and gathered once.
        specs = sorted({_spec(b) for b in unresolved})
        total = sum(
            b["count"]
            for spec in specs
            for b in [next(x for x in unresolved if _spec(x) == spec)]
        )

        def in_brackets(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            mask = np.zeros(len(v), dtype=bool)
            for mode, plo, pwidth, j, blo, bhi in specs:
                if mode == "range":
                    mask |= (v >= blo) & (v <= bhi)
                else:
                    bj = np.floor((v - plo) / pwidth).astype(np.int64)
                    # mirror the histogram: under-range (bj<0) is NOT a
                    # member of bin 0; over-range clips into the last bin
                    mask |= (np.minimum(bj, bins - 1) == j) & (bj >= 0)
            return pa.table({col: pa.array(v[mask])})

        if total <= gather_cap:
            # Diffuse residue: raw row gather is small, one filter scan.
            got = ds.map_batches(
                in_brackets, batch_format="pyarrow", batch_size=None
            ).take_all()
            vals = np.array([r[col] for r in got], dtype=np.float64)
            cnts = np.ones(len(vals), dtype=np.int64)
        else:
            # Concentrated mass: the bracket holds many rows but few
            # DISTINCT doubles (a histogram bin only narrows ~bins× per
            # pass, far slower than mass concentrates). Gather unique
            # (value, count) pairs instead — per-block np.unique partials,
            # distributed groupby-sum merge, driver state = distinct
            # values only.
            from ray.data.aggregate import Sum

            def uniq(batch: pa.Table) -> pa.Table:
                t = in_brackets(batch)
                u, c = np.unique(
                    t[col].to_numpy(zero_copy_only=False), return_counts=True
                )
                return pa.table(
                    {"v": pa.array(u), "n": pa.array(c.astype(np.int64))}
                )

            got = (
                ds.map_batches(uniq, batch_format="pyarrow", batch_size=None)
                .groupby("v")
                .aggregate(Sum("n", alias_name="n"))
                .take_all()
            )
            if len(got) > gather_cap:
                raise ValueError(
                    f"exact_float_quantiles: {len(got)} distinct residual "
                    f"values exceed gather_cap={gather_cap}; raise "
                    "max_passes or bins"
                )
            vals = np.array([r["v"] for r in got], dtype=np.float64)
            cnts = np.array([r["n"] for r in got], dtype=np.int64)

        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        for b in unresolved:
            mode, plo, pwidth, j, blo, bhi = _spec(b)
            if mode == "range":
                mask = (vals >= blo) & (vals <= bhi)
            else:
                bj = np.floor((vals - plo) / pwidth).astype(np.int64)
                # mirror the histogram: under-range is not in bin 0
                mask = (np.minimum(bj, bins - 1) == j) & (bj >= 0)
            mv, mc = vals[mask], cnts[mask]
            # Rank is relative to this bracket's own exclusive-below count.
            cum = np.cumsum(mc)
            b["resolved"] = float(
                mv[np.searchsorted(cum, b["k"] - b["below"] + 1, side="left")]
            )

    return pa.table(
        {
            "q": pa.array(np.asarray(qs, dtype=np.int64)),
            "value": pa.array(
                [float(b["resolved"]) for b in brackets], pa.float64()
            ),
        }
    )
