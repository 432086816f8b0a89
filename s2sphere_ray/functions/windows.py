"""Keyed ordered window functions (the SQL ``OVER (PARTITION BY k
ORDER BY ts)`` family) as ONE bucketed exchange + a vectorized
per-bucket kernel — the engine equivalent of ROW_NUMBER / LAG / LEAD /
running SUM, the per-event feature-engineering primitives of an events
log.

Same ordering contract as ``sessions.sessionize``: rows within a key
are totally ordered by (ts, id), rows shuffle once on a key-hash bucket
(bucket count derived from the input-size hint so per-group rows stay
bounded at any scale), and inside a bucket one lexsort resolves every
key at once — no per-key Python.

Values enter exact integer milli-units (``floor(v·1000 + 0.5)``, the
repo's price-cents idiom) so the running sum is bit-reproducible in any
association order and the oracle replays it exactly — float window sums
are association-order-defined and would hash-mismatch DuckDB's
segment-tree evaluation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_WINDOW_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("event_id", pa.int64()),
        ("rn", pa.int64()),
        ("lag_milli", pa.int64()),
        ("lead_milli", pa.int64()),
        ("runsum_milli", pa.int64()),
        ("rank_milli", pa.int64()),
        ("dense_rank_milli", pa.int64()),
        ("movsum3_milli", pa.int64()),
    ]
)


def keyed_window(
    events_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_rows: int | None = None,
):
    """→ Dataset(user_id, event_id, rn, lag_milli, lead_milli,
    runsum_milli): per-key ordered window features, one row per event.

    ``rn`` is 1-based within the key; ``lag_milli`` / ``lead_milli`` are
    NULL at the first / last event of a key; ``runsum_milli`` is the
    inclusive running sum of the milli-quantized value.
    """
    from ._buckets import derive_buckets, hash_buckets

    n_buckets = derive_buckets(num_rows)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = hash_buckets(batch[key_col].to_numpy(), n_buckets)
        return batch.append_column("_ub", pa.array(b))

    def per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _WINDOW_SCHEMA.empty_table()
        key = group[key_col].to_numpy().astype(np.int64)
        ts = group[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = (
            ts.to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = group[id_col].to_numpy().astype(np.int64)
        milli = np.floor(
            group[value_col].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        order = np.lexsort((eid, tsv, key))
        key, eid, milli = key[order], eid[order], milli[order]
        n = len(key)
        idx = np.arange(n, dtype=np.int64)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        # index of each row's segment start, broadcast per row
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rn = idx - start + 1
        lag = np.empty(n, dtype=np.int64)
        lag[1:] = milli[:-1]
        lag[0] = 0
        lag_ok = ~new
        lead = np.empty(n, dtype=np.int64)
        lead[:-1] = milli[1:]
        lead[-1] = 0
        lead_ok = np.empty(n, dtype=bool)
        lead_ok[:-1] = ~new[1:]
        lead_ok[-1] = False
        cs = np.cumsum(milli)
        runsum = cs - cs[start] + milli[start]
        # moving 3-row sum (ROWS 2 PRECEDING), clipped at the key start:
        # cs[i] - cs[lo-1] with lo = max(start, i-2); cs[-1] ≡ 0.
        lo = np.maximum(start, idx - 2)
        movsum3 = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        # RANK / DENSE_RANK of the value within the key (ties share a
        # rank): a second lexsort by (key, value) over the SAME rows,
        # run-start arithmetic on that view, scattered back through the
        # permutation.
        p2 = np.lexsort((milli, key))
        k2, m2 = key[p2], milli[p2]
        newk2 = np.empty(n, dtype=bool)
        newk2[0] = True
        newk2[1:] = k2[1:] != k2[:-1]
        start2 = np.maximum.accumulate(np.where(newk2, idx, 0))
        newv2 = newk2.copy()
        newv2[1:] |= m2[1:] != m2[:-1]
        run_start2 = np.maximum.accumulate(np.where(newv2, idx, 0))
        rank2 = run_start2 - start2 + 1
        c2 = np.cumsum(newv2)
        dense2 = c2 - c2[start2] + 1
        rank = np.empty(n, dtype=np.int64)
        dense = np.empty(n, dtype=np.int64)
        rank[p2] = rank2
        dense[p2] = dense2
        return pa.Table.from_arrays(
            [
                pa.array(key),
                pa.array(eid),
                pa.array(rn),
                pa.array(lag, mask=~lag_ok),
                pa.array(lead, mask=~lead_ok),
                pa.array(runsum),
                pa.array(rank),
                pa.array(dense),
                pa.array(movsum3),
            ],
            schema=_WINDOW_SCHEMA,
        )

    return (
        events_ds.map_batches(
            add_bucket, batch_format="pyarrow", batch_size=None
        )
        .groupby("_ub")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


WINDOW_SQL_CTE = (
    "wbase AS (SELECT user_id, ts, event_id,"
    " CAST(floor(value * 1000 + 0.5) AS BIGINT) AS milli FROM events),"
    " wfun AS (SELECT user_id, event_id,"
    " ROW_NUMBER() OVER win AS rn,"
    " LAG(milli) OVER win AS lag_milli,"
    " LEAD(milli) OVER win AS lead_milli,"
    " SUM(milli) OVER (PARTITION BY user_id ORDER BY ts, event_id"
    " ROWS UNBOUNDED PRECEDING) AS runsum_milli,"
    " RANK() OVER vwin AS rank_milli,"
    " DENSE_RANK() OVER vwin AS dense_rank_milli,"
    " SUM(milli) OVER (PARTITION BY user_id ORDER BY ts, event_id"
    " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS movsum3_milli"
    " FROM wbase WINDOW win AS"
    " (PARTITION BY user_id ORDER BY ts, event_id),"
    " vwin AS (PARTITION BY user_id ORDER BY milli))"
)
