"""Deterministic sampling operators for corpus balancing.

Random sampling is wrong at crawl scale: a rerun after a partial failure
must pick the SAME rows, and the pick must not depend on block layout.
Both operators key off arithmetic over a stable integer id, so results
are reproducible across reruns, partitionings and cluster sizes — and
SQL-expressible, so the oracle checks them exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Knuth multiplicative constant + a large prime modulus; both fit BIGINT
# arithmetic identically in numpy int64 and DuckDB, so the sort key is
# bit-equal between the engine and the oracle.
SAMPLE_MULT = 2654435761
SAMPLE_MOD = 1000000007


def stratified_sample(ds, key_col: str, id_col: str, k: int, num_rows=None):
    """Quota sampling: keep at most ``k`` rows per ``key_col`` value
    (domain, language, source …), chosen deterministically as the rows
    with the smallest ``(id * SAMPLE_MULT) % SAMPLE_MOD`` (ties broken by
    id) — i.e. ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY hash, id)
    <= k`` — so the quota is a uniform-ish, rerun-stable draw rather than
    "whatever k rows arrived first".

    Scale shape: rows exchange ONCE on a hash bucket of ``key_col``
    (data-proportional bucket count, so a hot key's bucket stays bounded
    relative to block size only when keys are many; a single key holding
    most of the corpus degenerates to that key's full row set in one
    group — for that regime pre-filter with a per-block local top-k
    first, which this operator applies automatically: each block keeps
    at most ``k`` rows per key before the exchange, making the shuffled
    volume ≤ k · keys_per_block · blocks, independent of row count).
    Inside a bucket one lexsort ranks every key at once.
    """
    from ._buckets import derive_buckets, hash_buckets

    if num_rows is None:
        num_rows = ds.count()
    n_buckets = derive_buckets(num_rows)

    def local_topk(batch: pa.Table) -> pa.Table:
        key, ids, order = _rank_arrays(batch, key_col, id_col)
        keep = _rank_leq_k(key, order, k)
        out = batch.take(pa.array(np.nonzero(keep)[0]))
        kc = out[key_col]
        if pa.types.is_string(kc.type) or pa.types.is_binary(kc.type):
            from .dedup import poly_hash_strings

            kv = poly_hash_strings(kc).view(np.int64)
        else:
            kv = kc.to_numpy(zero_copy_only=False)
        return out.append_column(
            "_sb", pa.array(hash_buckets(kv, n_buckets))
        )

    def rank_bucket(group: pa.Table) -> pa.Table:
        key, ids, order = _rank_arrays(group, key_col, id_col)
        keep = _rank_leq_k(key, order, k)
        return group.drop_columns(["_sb"]).take(
            pa.array(np.nonzero(keep)[0])
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow", batch_size=None)
        .groupby("_sb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def _rank_arrays(batch: pa.Table, key_col: str, id_col: str):
    key = batch[key_col]
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    codes = key.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h = (ids * SAMPLE_MULT) % SAMPLE_MOD
    order = np.lexsort((ids, h, codes))
    return codes.astype(np.int64), ids, order


def _rank_leq_k(key_codes: np.ndarray, order: np.ndarray, k: int):
    """Boolean keep-mask (original row order): rank within key ≤ k."""
    ks = key_codes[order]
    new_seg = np.ones(len(ks), dtype=bool)
    new_seg[1:] = ks[1:] != ks[:-1]
    seg_ix = np.flatnonzero(new_seg)
    seg_start = np.repeat(seg_ix, np.diff(np.append(seg_ix, len(ks))))
    rnk = np.arange(len(ks)) - seg_start
    keep = np.zeros(len(ks), dtype=bool)
    keep[order[rnk < k]] = True
    return keep
