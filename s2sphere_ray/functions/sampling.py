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
# Independent multiplier for train/valid/test assignment, so the split
# is uncorrelated with the sampling hash (a row's split must not predict
# whether hash-rate sampling keeps it).  (SAMPLE_MOD % SPLIT_MULT and
# SAMPLE_MOD * SPLIT_MULT both fit int64: 1e9 · 2.25e9 < 2^63.)
SPLIT_MULT = 2246822519


def split_assign(
    ds,
    id_col: str = "doc_id",
    valid_pct: int = 5,
    test_pct: int = 5,
):
    """Deterministic train/valid/test assignment — the hold-out split
    every training-data pipeline needs before packing shards.

    Map-only (zero exchanges, resumable by construction): each row gets
    ``split`` ∈ {train, valid, test} from
    ``((id % SAMPLE_MOD) * SPLIT_MULT) % SAMPLE_MOD % 100`` — buckets
    ``< 100-valid-test`` train, the next ``valid_pct`` valid, the rest
    test.  The reduce-first product stays < 2^63 for any nonnegative
    int64 id, and the bucket is bit-equal in numpy and DuckDB
    (``CASE WHEN b < .. THEN 'train' ..``), so the oracle checks the
    assignment exactly.  A different multiplier than the rate/quota
    samplers keeps membership independent of sampling decisions; reruns,
    repartitions and cluster sizes all see the same split.
    """
    if valid_pct < 0 or test_pct < 0:
        raise ValueError("valid_pct and test_pct must be nonnegative")
    train_hi = 100 - valid_pct - test_pct
    valid_hi = 100 - test_pct
    if not (0 < train_hi <= 100):
        raise ValueError("valid_pct + test_pct must be < 100")
    labels = np.array(["train", "valid", "test"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((ids % SAMPLE_MOD) * SPLIT_MULT) % SAMPLE_MOD % 100
        code = (b >= train_hi).astype(np.int64) + (b >= valid_hi)
        return batch.append_column("split", pa.array(labels[code]))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def stratified_sample(ds, key_col: str, id_col: str, k: int, num_rows=None):
    """Quota sampling: keep at most ``k`` rows per ``key_col`` value
    (domain, language, source …), chosen deterministically as the rows
    with the smallest ``((id %% SAMPLE_MOD) * SAMPLE_MULT) %% SAMPLE_MOD``
    (reduce-first: the product stays < 2^63 for any nonnegative int64
    id, where the bare multiply wraps in numpy and errors in DuckDB;
    identical values for ids < SAMPLE_MOD) (ties broken by
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


def temperature_sample(
    ds, key_col: str, id_col: str, budget: int, num_rows=None
):
    """Temperature-tilted domain downsampling — the data-mixing
    primitive of multilingual/multi-source LLM corpora (sample sources
    ∝ n^α with α = 1/2 instead of ∝ n, so head domains shrink and tail
    domains keep representation).  Deterministic and SQL-checkable:

    1. per-key counts: per-block ``value_counts`` pre-aggregation →
       one tiny groupby-sum (one row per key);
    2. driver computes integer quotas
       ``t_key = budget · floor(sqrt(n_key)) // Σ floor(sqrt(n))``
       (floor(sqrt) on doubles — identical in numpy and DuckDB; exact
       for counts ≪ 2⁵²);
    3. the stratified-rank machinery selects each key's ``t_key``
       smallest-hash rows — same per-block local pre-filter (bounding
       the exchange by Σ t over keys-per-block) + one bucketed exact
       rank pass, with the fixed ``k`` generalized to a per-key quota
       looked up through the batch's dictionary codes (O(unique keys)
       per block, not O(rows)).

    The quota dict is closed over (one row per key — tiny by
    construction; a 100 M-domain corpus would ``ray.put`` it instead).
    """
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    from ._buckets import derive_buckets, hash_buckets

    def kcounts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[key_col])
        return pa.table(
            {
                "k": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    rows = (
        ds.map_batches(kcounts, batch_format="pyarrow", batch_size=None)
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    w = {
        r["k"]: int(np.floor(np.sqrt(float(r["n"])))) for r in rows
    }
    tot = sum(w.values())
    quota = (
        {k: (budget * v) // tot for k, v in w.items()} if tot else {}
    )
    if num_rows is None:
        # The per-key counts just computed sum to the row count — never
        # re-execute the upstream pipeline for it (round-4 review).
        num_rows = sum(int(r["n"]) for r in rows)
    n_buckets = derive_buckets(num_rows)

    def _code_quota(key: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        enc = key.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        per_code = np.array(
            [quota.get(v.as_py(), 0) for v in enc.dictionary],
            dtype=np.int64,
        )
        return codes, per_code

    def _keep(batch: pa.Table) -> np.ndarray:
        key = batch[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        codes, per_code = _code_quota(key)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids % SAMPLE_MOD) * SAMPLE_MULT) % SAMPLE_MOD
        order = np.lexsort((ids, h, codes))
        return _rank_leq_k(codes, order, per_code[codes])

    def local_pre(batch: pa.Table) -> pa.Table:
        out = batch.take(pa.array(np.nonzero(_keep(batch))[0]))
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
        group = group.drop_columns(["_sb"])
        return group.take(pa.array(np.nonzero(_keep(group))[0]))

    return (
        ds.map_batches(local_pre, batch_format="pyarrow", batch_size=None)
        .groupby("_sb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def _rank_arrays(batch: pa.Table, key_col: str, id_col: str):
    key = batch[key_col]
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    codes = key.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h = ((ids % SAMPLE_MOD) * SAMPLE_MULT) % SAMPLE_MOD
    order = np.lexsort((ids, h, codes))
    return codes.astype(np.int64), ids, order


def _rank_leq_k(key_codes: np.ndarray, order: np.ndarray, k):
    """Boolean keep-mask (original row order): rank within key ≤ k.
    ``k`` is a scalar quota or a per-row quota array (original order —
    constant within a key by construction)."""
    ks = key_codes[order]
    new_seg = np.ones(len(ks), dtype=bool)
    new_seg[1:] = ks[1:] != ks[:-1]
    seg_ix = np.flatnonzero(new_seg)
    seg_start = np.repeat(seg_ix, np.diff(np.append(seg_ix, len(ks))))
    rnk = np.arange(len(ks)) - seg_start
    kk = k[order] if isinstance(k, np.ndarray) else k
    keep = np.zeros(len(ks), dtype=bool)
    keep[order[rnk < kk]] = True
    return keep
