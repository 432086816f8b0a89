"""Streaming-shaped windows over the events log (ray_guide pattern:
ordered partitioned log → ``groupby(key).map_groups`` with in-group
ordering). Session windows: a new session starts after a gap >
``gap_minutes`` between consecutive events of the same user.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(
    events_ds,
    gap_minutes: int = 30,
    n_buckets: int | None = None,
    num_rows: int | None = None,
):
    """→ Dataset(user_id, session_start, n_events).

    Ordering contract: events within a user are ordered by (ts, event_id)
    — the same total order the oracle SQL's window uses. Rows shuffle on a
    user-hash bucket (bucket count derived from input size so per-group
    rows stay bounded); inside a bucket one vectorized pandas pass
    sessionizes every user at once (a session break is a user change or a
    gap > ``gap_minutes``).
    """
    import pyarrow as pa

    from ._buckets import derive_buckets

    if n_buckets is None:
        n_buckets = derive_buckets(num_rows)
    gap = pd.Timedelta(minutes=gap_minutes)

    from ._buckets import hash_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = hash_buckets(batch["user_id"].to_numpy(), n_buckets)
        return batch.append_column("_ub", pa.array(b))

    def sess_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = new_user | (g["ts"].diff() > gap)
        sid = brk.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("ts", "size"),
        )
        return out.reset_index(drop=True)

    return (
        events_ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_ub")
        .map_groups(sess_bucket, batch_format="pandas")
    )


SESSIONS_SQL = (
    "WITH o AS (SELECT user_id, ts, event_id, lag(ts) OVER"
    " (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),"
    " m AS (SELECT user_id, ts, event_id, CASE WHEN prev IS NULL OR"
    " ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM o),"
    " s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id"
    " ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m)"
    " SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events"
    " FROM s GROUP BY user_id, sid"
)
