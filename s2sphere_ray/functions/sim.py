"""Similarity search over the embeddings table (``vec_id, embedding, label``).

* Brute-force cosine top-k: the query matrix is broadcast (``ray.put``
  once), each batch computes a (B, Q) float64 matmul and emits per-query
  partial top-k rows; a tiny groupby merges them. Exact; mirrors the
  DuckDB oracle's double-precision cosine.
* IVF-style bucketed variant: vectors are assigned to coarse buckets
  (sign-LSH of a few random hyperplanes built once per actor); queries
  probe only their nearest buckets. Approximate scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._buckets import derive_concurrency


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(-1, dim)


def cosine_topk(
    embeddings_ds,
    queries: pa.Table,
    k: int,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
):
    """→ Dataset(query_id, rank, vec_id, sim) — exact brute-force cosine.

    Ties broken by vec_id asc; similarities accumulated in float64 to match
    the DuckDB oracle.
    """
    import ray

    q = _emb_matrix(queries).astype(np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ids = queries[query_id_col].to_numpy()
    q_ref = ray.put((q_ids, qn))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        e = _emb_matrix(batch).astype(np.float64)
        norms = np.linalg.norm(e, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        en = e / norms
        sims = en @ qmat.T  # (B, Q)
        ids = batch[id_col].to_numpy()
        kk = min(k, len(ids))
        out_q, out_i, out_s = [], [], []
        for c in range(len(qids)):
            col = sims[:, c]
            part = (
                np.argpartition(-col, kk - 1)[:kk]
                if kk < len(col)
                else np.arange(len(col))
            )
            out_q.append(np.full(len(part), qids[c]))
            out_i.append(ids[part])
            out_s.append(col[part])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_i)),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(partial, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        s = group["sim"].to_numpy()
        ids = group[id_col].to_numpy()
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                id_col: group[id_col].take(pa.array(order)),
                "sim": group["sim"].take(pa.array(order)),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def embedding_neardup_pairs(
    embeddings_ds,
    threshold: float = 0.99,
    n_planes: int = 12,
    dim: int | None = None,
    id_col: str = "vec_id",
    num_rows: int | None = None,
    max_bucket_rows: int = 4096,
    matmul_block: int = 2048,
):
    """Embedding-cosine near-duplicate pairs via sign-LSH bucketing.

    bucket (actor stage, hyperplanes built once) → groupby bucket →
    within-bucket exact float64 cosine ≥ threshold → (id_a, id_b) pairs,
    id_a < id_b. Exact for duplicates (identical vectors share every sign
    bit at every level); approximate recall for merely-similar pairs.

    Scale design: ``n_planes`` grows with log2 of the corpus (so expected
    bucket size stays bounded as N grows); within a bucket the all-pairs
    similarity is computed in ``matmul_block``² tiles (O(block²) memory,
    never O(n²)); and any bucket still larger than ``max_bucket_rows`` is
    recursively re-split on extra deterministic hyperplanes before the
    pairwise pass — one oversized group never owns an unbounded matmul.
    """
    import numpy as np

    if dim is None:
        first = embeddings_ds.take(1)[0]["embedding"]
        dim = len(first)
    if num_rows:
        import math

        # Expected bucket size N / 2^planes ≈ max_bucket_rows / 4.
        n_planes = max(
            n_planes,
            math.ceil(math.log2(max(2, num_rows / (max_bucket_rows / 4)))),
        )
    bucketed = embeddings_ds.map_batches(
        LSHBucketStage,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes),
        batch_format="pyarrow",
        concurrency=derive_concurrency(0.5),
        num_cpus=1,
    )
    split_rng = np.random.default_rng(20240817)
    split_planes = split_rng.standard_normal((dim, 32))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if group.num_rows < 2:
            return empty
        e = _emb_matrix(group).astype(np.float64)
        norms = np.linalg.norm(e, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        en = e / norms
        ids = group[id_col].to_numpy()
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []

        def all_pairs(idx: np.ndarray):
            n = len(idx)
            sub = en[idx]
            sub_ids = ids[idx]
            for i0 in range(0, n, matmul_block):
                a = sub[i0 : i0 + matmul_block]
                for j0 in range(i0, n, matmul_block):
                    b = sub[j0 : j0 + matmul_block]
                    s = a @ b.T
                    hit = s >= threshold
                    if i0 == j0:
                        hit = np.triu(hit, 1)
                    ai, bj = np.nonzero(hit)
                    if len(ai):
                        va = sub_ids[i0 + ai]
                        vb = sub_ids[j0 + bj]
                        out_a.append(np.minimum(va, vb))
                        out_b.append(np.maximum(va, vb))

        # Iterative re-split of oversized buckets on extra sign planes.
        stack: list[tuple[np.ndarray, int]] = [
            (np.arange(group.num_rows), 0)
        ]
        while stack:
            idx, depth = stack.pop()
            if len(idx) <= max_bucket_rows or depth >= split_planes.shape[1]:
                if len(idx) >= 2:
                    all_pairs(idx)
                continue
            side = en[idx] @ split_planes[:, depth] > 0
            stack.append((idx[side], depth + 1))
            stack.append((idx[~side], depth + 1))
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    pairs = bucketed.groupby("lsh_bucket").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    from ._buckets import distinct_pairs

    return distinct_pairs(pairs)


def train_ivf_centroids(
    sample: np.ndarray, n_centroids: int = 16, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Deterministic mini k-means (fixed seed/iterations) for IVF coarse
    quantization; trained driver-side on a sample, broadcast to workers."""
    rng = np.random.default_rng(seed)
    x = sample.astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(
    embeddings_ds,
    queries: pa.Table,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    train_sample: int = 4096,
):
    """IVF approximate top-k: vectors are assigned to their nearest coarse
    centroid; each query scans only the ``nprobe`` closest inverted lists.

    The centroid table is trained once driver-side on a sample and
    broadcast; per batch the assignment is one matmul. Scale path
    complement to :func:`cosine_topk_lsh` (recall grows with nprobe)."""
    import ray

    # Deterministic training sample: the ``train_sample`` SMALLEST-id
    # rows.  A bare ``ds.limit(k)`` returns whichever read blocks finish
    # first (measured: three different row sets in four identical runs),
    # which made the trained centroids — and with them every
    # nprobe-bounded result — run-dependent.  Per-block k-smallest
    # partials (each ≤ k rows) feed a small distributed sort whose
    # limit(k) IS deterministic (limit-after-sort), so the sample is a
    # pure function of the table at any block layout.
    def _block_smallest(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        if len(ids) > train_sample:
            sel = np.argpartition(ids, train_sample)[:train_sample]
            b = b.take(pa.array(np.sort(sel)))
        return b

    sample_rows = (
        embeddings_ds.select_columns([id_col, "embedding"])
        .map_batches(_block_smallest, batch_format="pyarrow")
        .sort(id_col)
        .limit(train_sample)
        .take_all()
    )
    sample = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    cent = train_ivf_centroids(sample, n_centroids=n_centroids)
    q = _emb_matrix(queries).astype(np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probe_lists = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    probe_set = set(int(c) for c in probe_lists.reshape(-1))
    cent_ref = ray.put((cent, sorted(probe_set)))

    def keep_probed(batch: pa.Table) -> pa.Table:
        centroids, probed = ray.get(cent_ref)
        e = _emb_matrix(batch).astype(np.float64)
        norms = np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        assign = ((e / norms) @ centroids.T).argmax(axis=1)
        return batch.filter(pa.array(np.isin(assign, probed)))

    pruned = embeddings_ds.map_batches(
        keep_probed, batch_format="pyarrow", batch_size=None
    )
    return cosine_topk(
        pruned, queries, k, id_col=id_col, query_id_col=query_id_col
    )


class LSHBucketStage:
    """Sign-LSH coarse bucketing: ``bucket = bits(sign(E @ H))`` with the
    hyperplane matrix H built once per actor (seeded)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, n_planes))
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _emb_matrix(batch).astype(np.float64)
        bits = (e @ self.h) > 0
        bucket = bits @ self.weights
        return batch.append_column("lsh_bucket", pa.array(bucket, pa.int64()))


def cosine_topk_lsh(
    embeddings_ds,
    queries: pa.Table,
    k: int,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    concurrency=None,
):
    """Approximate top-k: probe only vectors sharing the query's LSH bucket
    (scale path; recall depends on n_planes)."""
    if concurrency is None:
        concurrency = derive_concurrency(0.5)
    bucketed = embeddings_ds.map_batches(
        LSHBucketStage,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    stage = LSHBucketStage(dim=dim, n_planes=n_planes)
    q_bucketed = stage(queries)
    q_buckets = set(q_bucketed["lsh_bucket"].to_numpy().tolist())

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            np.isin(batch["lsh_bucket"].to_numpy(), list(q_buckets))
        )
        return batch.filter(mask)

    pruned = bucketed.map_batches(keep, batch_format="pyarrow")
    return cosine_topk(pruned, queries, k, id_col=id_col, query_id_col=query_id_col)



# rows × dim cells below which kmeans iterates in-process (the
# budgeted-sum idiom); 2M int64 cells = 16 MB driver-side.
_KM_GATHER_CELLS = 2_000_000

def kmeans_milli(
    ds,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    col: str = "embedding",
    scale: int = 1000,
) -> pa.Table:
    """Distributed Lloyd's k-means over an embedding column, run
    entirely in exact integer milli-unit arithmetic so the result is
    bit-reproducible AND SQL-checkable (the semantic-clustering
    primitive of embedding-based corpus curation, e.g. cluster-balanced
    sampling / SemDeDup-style pruning).

    Determinism contract (mirrored line for line by the iterated-CTE
    oracle in queries.SQL_LABEL_CENTROIDS):

    * vectors are quantized once: ``m = floor(v * scale)`` as int64
      (scale=1000 default);
    * init = the ``k`` globally smallest ``id_col`` vectors, cluster
      index assigned in id order;
    * assignment = argmin of the EXACT integer squared distance, ties
      to the lowest cluster index (numpy argmin first-hit == SQL
      ``ROW_NUMBER() ... ORDER BY d2, c``);
    * update = elementwise ``floor(sum / count)``; empty clusters keep
      their previous centroid.

    Each iteration is one streaming pass: centroids are broadcast via
    ``ray.put``; per-batch partials (argmin over a float64 matmul —
    exact, since |Σ m·c| ≤ D·10⁶ ≪ 2⁵³ — then one reduceat per
    cluster) shuffle only (cluster, dim, sum, n) rows through a tiny
    groupby.  The quantized working set is materialized once so the
    ``iters`` passes re-read the compact int64 matrix, not the source
    parquet; at crawl scale this is the standard cached-working-set
    trade of any iterative algorithm (or drop the materialize and pay a
    re-read per pass).

    Returns a k×D pyarrow table (cluster, dim, centroid_milli, n_vecs)
    with n_vecs from the final assignment.
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    def quantize(batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, col).astype(np.float64)
        milli = np.floor(mat * float(scale)).astype(np.int64)
        dim = milli.shape[1] if milli.size else 0
        return pa.table(
            {
                "vid": batch[id_col].cast(pa.int64()),
                "m": pa.FixedSizeListArray.from_arrays(
                    pa.array(milli.reshape(-1), pa.int64()), dim
                ),
            }
        )

    q = ds.map_batches(
        quantize, batch_format="pyarrow", batch_size=None
    ).materialize()

    # Init: per-block k smallest ids -> driver merge (k rows per block).
    def seed_partial(batch: pa.Table) -> pa.Table:
        vid = batch["vid"].to_numpy()
        take = np.argsort(vid, kind="stable")[:k]
        return batch.take(pa.array(np.sort(take)))

    seed_rows = q.map_batches(
        seed_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    seed_rows.sort(key=lambda r: r["vid"])
    seed_rows = seed_rows[:k]
    cent = np.array([r["m"] for r in seed_rows], dtype=np.int64)
    dim = cent.shape[1] if cent.size else 0
    k_eff = len(cent)

    counts = np.zeros(k_eff, dtype=np.int64)

    if q.count() * max(dim, 1) <= _KM_GATHER_CELLS:
        # In-process Lloyd iterations when the quantized matrix fits one
        # gather (the budgeted-sum idiom): each distributed iteration is
        # a dataset execution + a (c, dim)-keyed exchange of pure fixed
        # overhead at small n.  The global argmin/segment-sum is the
        # identical exact-int math the per-block partials sum to
        # (commutative int64), so the result is bit-identical (pinned
        # by the forced-path pytest).
        from ._schema import concat_blocks

        qt = concat_blocks(
            q,
            pa.schema(
                [("vid", pa.int64()), ("m", pa.list_(pa.int64(), dim))]
            ),
        )
        m_all = (
            qt["m"]
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(-1, dim)
            .astype(np.int64)
        )
        for _ in range(iters):
            cross = (
                m_all.astype(np.float64) @ cent.T.astype(np.float64)
            ).astype(np.int64)
            d2 = (
                (m_all * m_all).sum(axis=1)[:, None]
                + (cent * cent).sum(axis=1)[None, :]
                - 2 * cross
            )
            assign = d2.argmin(axis=1)
            counts = np.zeros(k_eff, dtype=np.int64)
            new_cent = cent.copy()
            uniq, starts, cnt = np.unique(
                np.sort(assign, kind="stable"),
                return_index=True,
                return_counts=True,
            )
            o = np.argsort(assign, kind="stable")
            sums = np.add.reduceat(m_all[o], starts, axis=0)
            for i, ci in enumerate(uniq):
                new_cent[int(ci)] = sums[i] // cnt[i]
                counts[int(ci)] = cnt[i]
            cent = new_cent
        return pa.table(
            {
                "cluster": pa.array(
                    np.repeat(np.arange(k_eff, dtype=np.int64), dim)
                ),
                "dim": pa.array(
                    np.tile(np.arange(dim, dtype=np.int64), k_eff)
                ),
                "centroid_milli": pa.array(cent.reshape(-1)),
                "n_vecs": pa.array(np.repeat(counts, dim)),
            }
        )

    for _ in range(iters):
        cent_ref = _ray.put(cent)

        def partial(batch: pa.Table, _ref=cent_ref) -> pa.Table:
            from .dedup import _get_broadcast

            c = _get_broadcast(_ref)
            m = (
                batch["m"]
                .combine_chunks()
                .flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(-1, c.shape[1])
                .astype(np.int64)
            )
            # Exact: every term bounded by D·10⁶ ≪ 2⁵³.
            cross = (m.astype(np.float64) @ c.T.astype(np.float64)).astype(
                np.int64
            )
            d2 = (
                (m * m).sum(axis=1)[:, None]
                + (c * c).sum(axis=1)[None, :]
                - 2 * cross
            )
            assign = d2.argmin(axis=1)
            o = np.argsort(assign, kind="stable")
            ms, asg = m[o], assign[o]
            uniq, starts, cnt = np.unique(
                asg, return_index=True, return_counts=True
            )
            sums = np.add.reduceat(ms, starts, axis=0)
            d = m.shape[1]
            return pa.table(
                {
                    "c": pa.array(np.repeat(uniq.astype(np.int64), d)),
                    "dim": pa.array(
                        np.tile(np.arange(d, dtype=np.int64), len(uniq))
                    ),
                    "s": pa.array(sums.reshape(-1)),
                    "n": pa.array(np.repeat(cnt.astype(np.int64), d)),
                }
            )

        rows = (
            q.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["c", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all()
        )
        counts = np.zeros(k_eff, dtype=np.int64)
        new_cent = cent.copy()
        for r in rows:
            c, d = int(r["c"]), int(r["dim"])
            new_cent[c, d] = r["s"] // r["n"]
            counts[c] = r["n"]
        cent = new_cent

    return pa.table(
        {
            "cluster": pa.array(
                np.repeat(np.arange(k_eff, dtype=np.int64), dim)
            ),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k_eff)),
            "centroid_milli": pa.array(cent.reshape(-1)),
            "n_vecs": pa.array(np.repeat(counts, dim)),
        }
    )


def semdedup(
    ds,
    k: int = 8,
    iters: int = 3,
    thr_num: int = 99,
    thr_den: int = 100,
    scale: int = 100,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): bucket
    the corpus with k-means, then drop every vector that has a
    same-cluster neighbor with smaller id and cosine ≥ thr_num/thr_den.
    Returns the drop list as (id_a = dropped id, id_b = smallest id of a
    qualifying neighbor).

    Every comparison is EXACT integer arithmetic so the whole pipeline —
    clustering, assignment, pruning — replays bit-for-bit in SQL:
    vectors quantize once to ``m = floor(v·scale)``; clustering/
    assignment run on integer squared distances (``kmeans_milli``); the
    cosine gate is the cross-multiplied square
    ``thr_den²·(m·m')² ≥ thr_num²·|m|²·|m'|²  AND  m·m' > 0``
    (no division, no sqrt, no float accumulation — the dot products are
    float64 matmuls whose terms are bounded ≪ 2⁵³, cast back exact).

    Scale shape: clustering bounds the pairwise work — each cluster is
    one ``map_groups`` group with an O(|cluster|²·D) matmul, so ``k``
    must grow ∝ N to hold |cluster| steady (SemDeDup uses ~10⁵ clusters
    at crawl scale); the exchange moves (vid, cluster, m) rows once.
    An int64-overflow guard rejects scale/dim combinations whose gate
    products could exceed 2⁶².
    """
    import ray as _ray
    import ray.data as rd

    from .dedup import _get_broadcast

    cent_tbl = kmeans_milli(
        ds, k=k, iters=iters, id_col=id_col, col=col, scale=scale
    )
    if cent_tbl.num_rows == 0:
        from ._schema import PAIR_SCHEMA

        return rd.from_arrow(PAIR_SCHEMA.empty_table())
    import pyarrow.compute as pc

    dim = int(pc.max(cent_tbl["dim"]).as_py()) + 1
    k_eff = cent_tbl.num_rows // dim
    cent = np.array(cent_tbl["centroid_milli"], dtype=np.int64).reshape(
        k_eff, dim
    )
    cent_ref = _ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = _get_broadcast(cent_ref)
        mat = _emb_matrix(batch, col).astype(np.float64)
        m = np.floor(mat * float(scale)).astype(np.int64)
        cross = (m.astype(np.float64) @ c.T.astype(np.float64)).astype(
            np.int64
        )
        d2 = (
            (m * m).sum(axis=1)[:, None]
            + (c * c).sum(axis=1)[None, :]
            - 2 * cross
        )
        return pa.table(
            {
                "vid": batch[id_col].cast(pa.int64()),
                "c": pa.array(d2.argmin(axis=1).astype(np.int64)),
                "m": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1), pa.int64()), m.shape[1]
                ),
            }
        )

    tn2, td2 = thr_num * thr_num, thr_den * thr_den

    def prune(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        m = (
            group["m"]
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(group.num_rows, -1)
            .astype(np.int64)
        )
        ids = group["vid"].to_numpy().astype(np.int64)
        n2 = (m * m).sum(axis=1)
        if len(n2) and td2 * int(n2.max()) ** 2 >= 1 << 62:
            raise ValueError(
                "semdedup: integer cosine gate would overflow int64 — "
                "lower `scale` or normalize the embeddings"
            )
        dot = (m.astype(np.float64) @ m.T.astype(np.float64)).astype(
            np.int64
        )
        qual = (
            (dot > 0)
            & (td2 * dot * dot >= tn2 * np.outer(n2, n2))
            & (ids[None, :] < ids[:, None])
        )
        has = qual.any(axis=1)
        if not has.any():
            return empty
        big = np.iinfo(np.int64).max
        nb = np.where(qual, ids[None, :], big).min(axis=1)
        return pa.table(
            {
                "id_a": pa.array(ids[has]),
                "id_b": pa.array(nb[has]),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
        .groupby("c")
        .map_groups(prune, batch_format="pyarrow")
    )

