"""Streaming-shaped windows over the events log (ray_guide pattern:
ordered partitioned log → ``groupby(key).map_groups`` with in-group
ordering). Session windows: a new session starts after a gap >
``gap_minutes`` between consecutive events of the same user.
"""

from __future__ import annotations

import numpy as np
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
    rows stay bounded); inside a bucket one vectorized numpy pass
    (lexsort + diff — no pandas copy, VERDICT r3 #7) sessionizes every
    user at once (a session break is a user change or a gap >
    ``gap_minutes``).
    """
    from ._buckets import derive_buckets, hash_buckets

    if n_buckets is None:
        n_buckets = derive_buckets(num_rows)
    gap_us = np.int64(gap_minutes) * 60_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = hash_buckets(batch["user_id"].to_numpy(), n_buckets)
        return batch.append_column("_ub", pa.array(b))

    def sess_bucket(group: pa.Table) -> pa.Table:
        ts = group["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        uid = group["user_id"].to_numpy()
        # timestamp[us] → int64 microseconds (zero-copy view)
        tsv = (
            ts.to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        if not len(uid):
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], ts.type),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        eid = group["event_id"].to_numpy()
        order = np.lexsort((eid, tsv, uid))
        uid_s, ts_s = uid[order], tsv[order]
        brk = np.empty(len(uid_s), dtype=bool)
        brk[0] = True
        brk[1:] = (uid_s[1:] != uid_s[:-1]) | (
            ts_s[1:] - ts_s[:-1] > gap_us
        )
        starts = np.flatnonzero(brk)
        n = np.diff(np.append(starts, len(uid_s)))
        # session_start = first ts of the session in (ts, event_id)
        # order; take() off the ORIGINAL Arrow array keeps the exact
        # timestamp type (no datetime round-trip).
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts].astype(np.int64)),
                "session_start": ts.take(pa.array(order[starts])),
                "n_events": pa.array(n.astype(np.int64)),
            }
        )

    return (
        events_ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_ub")
        .map_groups(sess_bucket, batch_format="pyarrow")
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
