"""Streaming-shaped windows over the events log (ray_guide pattern:
ordered partitioned log → ``groupby(key).map_groups`` with in-group
ordering). Session windows: a new session starts after a gap >
``gap_minutes`` between consecutive events of the same user.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def sessionize(events_ds, gap_minutes: int = 30):
    """→ Dataset(user_id, session_start, n_events).

    Ordering contract: events within a user are ordered by (ts, event_id)
    — the same total order the oracle SQL's window uses.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def sess(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        brk = g["ts"].diff() > gap
        sid = brk.cumsum()
        out = (
            g.groupby(sid)
            .agg(session_start=("ts", "min"), n_events=("ts", "size"))
            .reset_index(drop=True)
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return events_ds.groupby("user_id").map_groups(sess, batch_format="pandas")


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
