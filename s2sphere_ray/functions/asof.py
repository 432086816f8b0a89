"""As-of and range/band joins (ray_guide patterns: per-key-bucket
backward search; broadcast band lookup)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._buckets import derive_buckets, hash_buckets  # noqa: F401

_ASOF_SCHEMA = pa.schema(
    [("o_orderkey", pa.int64()), ("last_event_ts", pa.timestamp("us"))]
)


def asof_last_event(orders_ds, events_ds, num_rows: int | None = None):
    """For every order, the latest event of the same user at or before the
    order date: (o_orderkey, last_event_ts).

    Both sides are keyed by user, unioned, and hash-bucketed; inside a
    bucket a fully vectorized numpy backward search resolves every user at
    once — the engine equivalent of DuckDB's ``ASOF LEFT JOIN``.  Output is
    Arrow with an explicit ``timestamp[us]`` column (NULL when the user has
    no event at or before the order date).
    """

    def order_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["o_custkey"].cast(pa.int64()),
                "ts": batch["o_orderdate"],
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                "is_order": pa.array(
                    np.ones(batch.num_rows, dtype=bool)
                ),
            }
        )

    def event_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "ts": batch["ts"],
                "o_orderkey": pa.nulls(batch.num_rows, pa.int64()),
                "is_order": pa.array(np.zeros(batch.num_rows, dtype=bool)),
            }
        )

    o = orders_ds.map_batches(order_rows, batch_format="pyarrow")
    e = events_ds.map_batches(event_rows, batch_format="pyarrow")
    both = o.union(e)

    # Bucket on a user hash; bucket count scales with input size so
    # rows-per-bucket stays bounded at any corpus scale.
    n_buckets = derive_buckets(num_rows)

    from ._buckets import hash_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = hash_buckets(batch["user_id"].to_numpy(), n_buckets)
        return batch.append_column("_ub", pa.array(b))

    def per_bucket(group: pa.Table) -> pa.Table:
        user = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").view(np.int64)
        is_order = group["is_order"].to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        okey = pc.fill_null(group["o_orderkey"], 0).to_numpy(
            zero_copy_only=False
        )
        n = len(user)
        if not n or not is_order.any():
            return _ASOF_SCHEMA.empty_table()
        # Sort by (user, ts, is_order): at equal ts events precede the
        # order so an exact-timestamp event counts (allow_exact_matches).
        order = np.lexsort((is_order, ts, user))
        user = user[order]
        ts = ts[order]
        is_order = is_order[order]
        okey = okey[order]
        # Last event index at-or-before each row: running max of event
        # positions.  Sorted by user, so if the winning event belongs to a
        # different user the current user has no prior event -> NULL.
        idx = np.arange(n, dtype=np.int64)
        ev_idx = np.where(is_order, np.int64(-1), idx)
        last = np.maximum.accumulate(ev_idx)
        o_mask = is_order
        last_o = last[o_mask]
        valid = last_o >= 0
        same_user = np.zeros(int(o_mask.sum()), dtype=bool)
        same_user[valid] = user[last_o[valid]] == user[o_mask][valid]
        out_ts = np.zeros(int(o_mask.sum()), dtype=np.int64)
        out_ts[same_user] = ts[last_o[same_user]]
        return pa.Table.from_arrays(
            [
                pa.array(okey[o_mask].astype(np.int64)),
                pa.array(out_ts, type=pa.timestamp("us"), mask=~same_user),
            ],
            schema=_ASOF_SCHEMA,
        )

    return (
        both.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_ub")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


ASOF_SQL = (
    "SELECT o.o_orderkey, e.ts AS last_event_ts FROM orders o"
    " ASOF LEFT JOIN events e"
    " ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate"
)


def band_join_counts(lineitem_ds, part_table: pa.Table, band: int = 2):
    """Range/band join: lineitems whose quantity is within ±band of a
    part's size, aggregated to (p_brand, n_matches).

    The part side is tiny → broadcast; per batch a quantity histogram is
    combined with each part's band window (no row explosion)."""
    import ray

    sizes = part_table["p_size"].to_numpy().astype(np.int64)
    brands = part_table["p_brand"].to_pylist()
    ref = ray.put((sizes, brands))
    max_qty = 64

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy().astype(np.int64)
        if len(qty) and (qty.min() < 0 or qty.max() > max_qty):
            raise ValueError(
                f"l_quantity outside band histogram domain [0, {max_qty}]:"
                f" [{qty.min()}, {qty.max()}] — raise max_qty"
            )
        hist = np.bincount(qty, minlength=max_qty + 1)
        return pa.table(
            {
                "q": pa.array(np.arange(max_qty + 1, dtype=np.int64)),
                "n": pa.array(hist.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    hist_ds = (
        lineitem_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("q")
        .aggregate(Sum("n", alias_name="n"))
    )
    hist_rows = hist_ds.take_all()
    hist = np.zeros(max_qty + 1, dtype=np.int64)
    for r in hist_rows:
        hist[int(r["q"])] = int(r["n"])
    sizes_, brands_ = ray.get(ref)
    csum = np.concatenate([[0], np.cumsum(hist)])
    out: dict[str, int] = {}
    for s, b in zip(sizes_, brands_):
        lo = max(0, s - band)
        hi = min(max_qty, s + band)
        cnt = int(csum[hi + 1] - csum[lo])
        out[b] = out.get(b, 0) + cnt
    return pa.table(
        {
            "p_brand": pa.array(sorted(out), pa.string()),
            "n_matches": pa.array(
                [out[b] for b in sorted(out)], pa.int64()
            ),
        }
    )


BAND_JOIN_SQL = (
    "SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_matches"
    " FROM part p JOIN lineitem l"
    " ON l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2"
    " GROUP BY p.p_brand"
)


def sliding_window_counts(events_ds, width_min: int = 60, slide_min: int = 30):
    """Sliding windows: count events per (event_type, window_start) where
    windows are ``width_min`` wide every ``slide_min`` minutes. Each event
    lands in width/slide windows (emitted per batch, then aggregated)."""
    n_windows = width_min // slide_min

    def expand(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = batch["ts"]
        base = pc.floor_temporal(ts, multiple=slide_min, unit="minute")
        parts = []
        for k in range(n_windows):
            shift = pa.scalar(k * slide_min * 60_000_000, pa.duration("us"))
            ws = pc.subtract(base, shift)
            parts.append(
                pa.table(
                    {
                        "event_type": batch["event_type"],
                        "window_start": ws,
                        "n": pa.array(
                            np.ones(batch.num_rows, dtype=np.int64)
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    from ray.data.aggregate import Sum

    return (
        events_ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n_events"))
    )


SLIDING_SQL = (
    "SELECT event_type, window_start, COUNT(*) AS n_events FROM ("
    " SELECT event_type, time_bucket(INTERVAL 30 MINUTE, ts) AS window_start"
    " FROM events UNION ALL SELECT event_type,"
    " time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE FROM events)"
    " GROUP BY event_type, window_start"
)
