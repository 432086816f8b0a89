"""Deduplication operators over the documents/pages tables.

* exact: hash-partition on content → keep min-id per group (E17).
* MinHash+LSH: shingle → minhash signature → band buckets → groupby
  (band, hash) → candidate pairs → Jaccard verify.
* SimHash: 64-bit hyperplane-ish signature from token hashes.
* n-gram Jaccard verify kernel.

All per-batch bodies are vectorized (numpy / Arrow); signatures are
data-parallel; the only shuffles are the final small groupbys.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_M61 = (1 << 61) - 1


def _token_hashes(text: str) -> np.ndarray:
    """Whitespace-token 64-bit FNV-1a hashes for one document."""
    out = np.empty(len(tokens := text.split()), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(14695981039346656037)
        for b in t.encode():
            h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv_over_offsets(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """FNV-1a of ``lens[i]`` bytes at ``data[starts[i]:]`` for every i —
    vectorized over the batch (one masked pass per byte position)."""
    h = np.full(len(starts), _FNV_OFFSET)
    maxlen = int(lens.max()) if len(lens) else 0
    for c in range(maxlen):
        live = lens > c
        idx = starts[live] + c
        h[live] = (h[live] ^ data[idx].astype(np.uint64)) * _FNV_PRIME
    return h


_POLY_R = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64
_POLY_RINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def poly_hash_strings(col) -> np.ndarray:
    """64-bit polynomial rolling hash of every string/binary in an Arrow
    column — O(total bytes) with a constant number of numpy passes.

    Each value's bytes are packed into zero-padded little-endian uint64
    words; the hash is Σ wordⱼ·r^(k−1−j) (mod 2⁶⁴) computed for ALL docs
    at once via an inverse-power prefix sum (r odd ⇒ invertible mod 2⁶⁴:
    per-doc sum = (P[end]−P[start])·r^(start+k−1)), XOR-mixed with the
    byte length so zero-padding ties cannot collide. Unlike
    :func:`fnv_over_offsets` (one masked pass per byte position — fine
    for short tokens, quadratic-ish for long documents), cost does not
    depend on the longest value in the batch.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.binary())
    n = len(arr)
    if not n:
        return np.zeros(0, dtype=np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1]
    lens = np.diff(offsets)
    total = int(lens.sum())
    # Re-pack every doc to an 8-byte-aligned start in one fancy-index copy.
    kwords = (lens + 7) >> 3
    word_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kwords, out=word_starts[1:])
    padded = np.zeros(int(word_starts[-1]) * 8, dtype=np.uint8)
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        padded[np.repeat(word_starts[:-1] * 8, lens) + within] = data[
            np.repeat(starts, lens) + within
        ]
    words = padded.view("<u8")
    tw = len(words)
    # Prefix of w·r⁻ᵍ, then per-doc sum re-scaled by r^(start+k−1).
    rinv_pow = np.empty(tw, dtype=np.uint64)
    if tw:
        rinv_pow[0] = np.uint64(1)
        np.cumprod(np.full(tw, _POLY_RINV, dtype=np.uint64), out=rinv_pow)
        rinv_pow = np.roll(rinv_pow, 1)
        rinv_pow[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        pref = np.zeros(tw + 1, dtype=np.uint64)
        np.cumsum(words * rinv_pow, out=pref[1:])
        doc_sum = pref[word_starts[1:]] - pref[word_starts[:-1]]
        # r^(start+k−1) per doc, via cumulative powers at word positions.
        exps = (word_starts[1:] - 1).clip(min=0).astype(np.int64)
        # r^e for arbitrary e: reuse the global power table r^g = inverse
        # of rinv^g — recompute directly (one more cumprod).
        r_pow = np.empty(tw if tw else 1, dtype=np.uint64)
        r_pow[0] = np.uint64(1)
        if tw > 1:
            np.cumprod(np.full(tw, _POLY_R, dtype=np.uint64), out=r_pow)
            r_pow = np.roll(r_pow, 1)
            r_pow[0] = np.uint64(1)
        h = doc_sum * r_pow[exps]
    # Mix in the byte length (separates zero-padding ties), then a
    # splitmix64 finalizer for diffusion.
    with np.errstate(over="ignore"):
        z = h ^ lens.astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _token_hash_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch tokenizer+hasher: FNV-1a per whitespace token for a
    whole batch at once (no per-row Python). Accepts a list[str] or an
    Arrow string array/chunked array.

    Returns (token_hashes uint64 over all docs concatenated,
    doc_offsets int64[n_docs+1]). Matches :func:`_token_hashes` per doc.
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = pc.fill_null(texts, "")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
    else:
        arr = pa.array([t or "" for t in texts], pa.string())
    toks = pc.utf8_split_whitespace(arr)
    flat = pc.list_flatten(toks).cast(pa.string())
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    n_tok = len(flat)
    if n_tok:
        str_offsets = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
            flat.offset : flat.offset + n_tok + 1
        ].astype(np.int64)
        data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
        lengths = np.diff(str_offsets)
    else:
        str_offsets = np.zeros(1, dtype=np.int64)
        data = np.zeros(0, dtype=np.uint8)
        lengths = np.zeros(0, dtype=np.int64)
    # Python str.split() drops empty tokens; utf8_split_whitespace can emit
    # them at string edges — filter and adjust per-doc counts.
    keep = lengths > 0
    doc_of = np.repeat(np.arange(len(texts)), counts)
    counts = np.bincount(doc_of[keep], minlength=len(texts)).astype(np.int64)
    starts = str_offsets[:-1][keep]
    lens = lengths[keep]
    h = fnv_over_offsets(data, starts, lens)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return h, offsets


def _unique_per_doc(
    sh: np.ndarray, offs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-document sorted-unique values of a concatenated segment array
    in ONE vectorized pass (lexsort by (doc, value) + first-occurrence
    mask) — no per-doc ``np.unique`` Python loop.  Returns
    (flat uint64, int64 offsets[n_docs+1])."""
    n_docs = len(offs) - 1
    counts = np.diff(offs)
    if not len(sh):
        return sh, np.zeros(n_docs + 1, dtype=np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    order = np.lexsort((sh, doc_of))
    d_s, v_s = doc_of[order], sh[order]
    keep = np.ones(len(v_s), dtype=bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
    kept_per = np.bincount(d_s[keep], minlength=n_docs)
    new_offs = np.concatenate([[0], np.cumsum(kept_per)]).astype(np.int64)
    return v_s[keep], new_offs


def _shingle_batch(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-n-gram shingle hashes for a whole batch; accepts
    a list[str] or an Arrow string array/chunked array (pass the Arrow
    column straight through — no ``to_pylist()`` materialization).

    Returns (shingles uint64 concatenated, offsets int64[n_docs+1]);
    per-doc shingle multisets match :func:`_shingle_hashes` up to
    within-doc dedup (min-hashing is dedup-invariant)."""
    th, toff = _token_hash_batch(texts)
    counts = np.diff(toff)
    n_docs = len(texts)
    doc_of = np.repeat(np.arange(n_docs), counts)
    if len(th) >= n:
        acc = th[: len(th) - n + 1].copy()
        for k in range(1, n):
            acc = acc * _FNV_PRIME + th[k : len(th) - n + 1 + k]
        valid = doc_of[: len(th) - n + 1] == doc_of[n - 1 :]
    else:
        acc = np.zeros(0, dtype=np.uint64)
        valid = np.zeros(0, dtype=bool)
    sh_counts = np.maximum(counts - n + 1, 0)
    # Docs with fewer than n tokens fall back to their token hashes
    # (empty docs contribute the sentinel 0), matching the scalar path.
    short = counts < n
    parts = [acc[valid]]
    part_counts = sh_counts.copy()
    if short.any():
        # Rare path: assemble short-doc contributions.
        extra = []
        for d in np.nonzero(short)[0]:
            seg = th[toff[d] : toff[d + 1]]
            if not len(seg):
                seg = np.array([0], dtype=np.uint64)
            extra.append(seg)
            part_counts[d] = len(seg)
        # Interleave in doc order: rebuild full array.
        out = np.empty(int(part_counts.sum()), dtype=np.uint64)
        offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(part_counts, out=offs[1:])
        main = acc[valid]
        moffs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(sh_counts * (~short), out=moffs[1:])
        ei = 0
        for d in range(n_docs):
            if short[d]:
                out[offs[d] : offs[d + 1]] = extra[ei]
                ei += 1
            else:
                out[offs[d] : offs[d + 1]] = main[moffs[d] : moffs[d + 1]]
        return out, offs
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(part_counts, out=offs[1:])
    return parts[0], offs


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles (vectorized rolling combine)."""
    toks = _token_hashes(text)
    if len(toks) < n:
        return toks if len(toks) else np.array([0], dtype=np.uint64)
    acc = toks[: len(toks) - n + 1].copy()
    mult = np.uint64(1099511628211)
    for k in range(1, n):
        acc = acc * mult + toks[k : len(toks) - n + 1 + k]
    return np.unique(acc)


def strict_ngram_hashes(texts, n: int):
    """(gram_hashes uint64, doc_of int64) for word n-grams of a whole
    batch: rolling _FNV_PRIME combine over token hashes, windows crossing
    a doc boundary dropped, and docs with fewer than n tokens contribute
    NO grams — the SQL-parity convention shared by ngram_jaccard_pairs
    and decontaminate (unlike _shingle_batch's short-doc fallback, which
    minhash keeps). ONE definition so the three consumers cannot drift."""
    th, toff = _token_hash_batch(texts)
    tcounts = np.diff(toff)
    n_docs = len(tcounts)
    if len(th) >= n:
        acc = th[: len(th) - n + 1].copy()
        for k in range(1, n):
            acc = acc * _FNV_PRIME + th[k : len(th) - n + 1 + k]
        doc_all = np.repeat(np.arange(n_docs), tcounts)
        valid = doc_all[: len(th) - n + 1] == doc_all[n - 1 :]
        return acc[valid], doc_all[: len(th) - n + 1][valid]
    return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)


def triu_run_indices(
    starts: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Global (i, j) position pairs (i < j, same run) for ALL unordered
    in-run pairs, vectorized by DISTINCT run length: one
    ``np.triu_indices`` call per length class broadcast over every run of
    that length, instead of one call per run.  (Profiled: the per-run
    loop was 1.4 s of a 4.7 s sf0.1 Jaccard join — 20k runs but only a
    handful of distinct lengths.)  Pair order is grouped by length class,
    NOT run order — every consumer dedups/sorts downstream."""
    sel = lens > 1
    if not sel.any():
        z = np.zeros(0, np.int64)
        return z, z
    starts = starts[sel].astype(np.int64)
    lens = lens[sel].astype(np.int64)
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    for k in np.unique(lens):
        ii, jj = np.triu_indices(int(k), k=1)
        o = starts[lens == k]
        a_parts.append((o[:, None] + ii[None, :]).reshape(-1))
        b_parts.append((o[:, None] + jj[None, :]).reshape(-1))
    return np.concatenate(a_parts), np.concatenate(b_parts)


def exact_dedup(
    ds,
    key_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    num_rows: int | None = None,
):
    """E17 exact dedup: one survivor (min id) per distinct key.

    Scale design: rows shuffle on a *bucket* of the content hash (bucket
    count derived from input size so rows-per-bucket stays bounded — one
    vectorized pandas dedup per bucket, never a Python call per key), and
    the in-bucket survivor is min-id per full key (collision-safe).  The
    bucket hash is a vectorized polynomial hash over the Arrow value
    buffer (O(total bytes), longest-doc independent).
    """
    from ._buckets import derive_buckets

    if n_buckets is None:
        n_buckets = derive_buckets(num_rows)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = poly_hash_strings(batch[key_col])
        b = (h % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("_hb", pa.array(b))

    def dedup_bucket(group: pa.Table) -> pa.Table:
        # Arrow-native: exact key grouping (collision-free, full-key
        # compare in C++; a NULL key forms its own group, matching SQL
        # GROUP BY), survivor = min id per key. Ids are unique, so
        # filtering the bucket by survivor ids returns exactly one full
        # row per distinct key — no pandas round-trip of the text column.
        agg = group.group_by(key_col).aggregate([(id_col, "min")])
        mask = pc.is_in(
            group[id_col], value_set=agg[f"{id_col}_min"].combine_chunks()
        )
        return group.filter(mask).drop_columns(["_hb"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_hb")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


import functools


@functools.lru_cache(maxsize=8)
def _mh_stage(num_hashes: int, shingle_n: int, seed: int = 42):
    """Per-worker-process cached MinHashStage — lets the signature pass
    run as a fused TASK map (trivial state; see minhash_lsh_pairs)."""
    return MinHashStage(
        num_hashes=num_hashes, shingle_n=shingle_n, seed=seed
    )


class MinHashStage:
    """Callable stage: per-doc minhash signatures (permutations built
    once).  Usable as an actor-pool class (pass ``concurrency``) or via
    the cached task path (:func:`_mh_stage`)."""

    def __init__(self, num_hashes: int = 64, shingle_n: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_hashes, dtype=np.uint64)
        self.n = shingle_n
        self.num = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.n).astype(np.uint64)
        # (S, H) permuted values via modular affine maps in uint64 (mod 2^61-1)
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_M61)
        return v.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"]  # Arrow column straight through (no pylist)
        # Vectorized across the whole batch: shingles for all docs at once,
        # permutations applied globally, per-doc mins via segment reduce.
        # One permutation column at a time: the 1-D (S,) intermediates stay
        # cache-resident — ~25x faster than the (S, H) 2-D broadcast whose
        # temporaries are memory-bandwidth bound. Output identical.
        sh, offs = _shingle_batch(texts, self.n)
        m = np.uint64(_M61)
        sigs = np.empty((len(offs) - 1, self.num), dtype=np.uint64)
        for j in range(self.num):
            v = (sh * self.a[j] + self.b[j]) % m
            sigs[:, j] = np.minimum.reduceat(v, offs[:-1])
        return batch.append_column(
            "minhash",
            pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), pa.uint64()), self.num
            ),
        )


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    concurrency=None,
    num_rows: int | None = None,
    verify: str = "exact",
    star_run_threshold: int = 10_000,
    gather_rows: int = 20_000_000,
):
    """Near-dup pairs via banded LSH, Jaccard-verified.

    Scale design: the band all-to-all carries ONLY ``(band_id, band_hash,
    id)`` — 20 B/row — never the corpus text or even the signature.

    Two verification modes:

    * ``verify="exact"`` (default; the oracle-matching path), itself
      BUDGET-GATED on ``gather_rows``: under the budget the candidate
      pair set is gathered to the driver (bounded by true near-dups +
      band collisions), candidate docs are semi-joined back against the
      input by broadcast id set, and exact shingle Jaccard decides.
      Past the budget (a near-duplicate-saturated crawl snapshot — the
      realistic worst case the dup-rate bound does not cover) nothing
      is gathered: pairs dedupe distributed and verification runs as
      two hash-bucketed exchanges (:func:`_lsh_exchange_verify` —
      pair-refs co-locate with per-doc shingle sets by doc id, then the
      two sides co-locate by pair key and the intersection counts
      vectorized).  Both verify paths produce identical pairs (pinned
      by tests/test_dedup.py's forced-budget test).
    * ``verify="none"`` (the 100-TB path): FULLY distributed — candidate
      pairs dedupe via a groupby and stream out as a Dataset(id_a, id_b)
      with no driver materialization and nothing but 20 B/row crossing
      any exchange. This matches production crawl-dedup practice
      (banded-LSH pipelines skip per-pair verification and choose
      bands/rows so P(collision | jaccard < τ) is negligible); any
      per-pair payload (text or even the 8·num_hashes-byte signature)
      would dominate the corpus bytes at 10¹² docs.

    signature → (band_id, band_hash, id) rows → groupby band bucket →
    candidate pairs → dedupe → verify (per mode). Returns
    Dataset(id_a, id_b, jaccard) with id_a < id_b, deduplicated
    (``verify="none"``: no jaccard column).
    """
    import ray
    import ray.data as rd

    from ._buckets import derive_buckets

    rows_per_band = num_hashes // bands
    if concurrency is None:
        # Task pool, not actors: MinHashStage's state is two 8·H-byte
        # seed arrays rebuilt in μs (cached per worker process by
        # _mh_stage), so an actor pool buys nothing and costs pool
        # spawn-up PLUS the fusion break between the read and the
        # signature map.  Pass an explicit ``concurrency`` to force the
        # actor pool (e.g. to cap parallelism).
        sigged = ds.map_batches(
            lambda b, _nh=num_hashes, _sn=shingle_n: _mh_stage(_nh, _sn)(b),
            batch_format="pyarrow",
        )
    else:
        sigged = ds.map_batches(
            MinHashStage,
            fn_constructor_kwargs=dict(
                num_hashes=num_hashes, shingle_n=shingle_n
            ),
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )

    def explode_bands(batch: pa.Table) -> pa.Table:
        sig = (
            batch["minhash"].combine_chunks().flatten().to_numpy().reshape(-1, num_hashes)
        )
        n = sig.shape[0]
        ids = batch[id_col].to_numpy()
        band_hash = np.empty((n, bands), dtype=np.int64)
        for bnd in range(bands):
            seg = sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + seg[:, c]
            band_hash[:, bnd] = h.view(np.int64)
        return pa.table(
            {
                "band_id": pa.array(
                    np.repeat(np.arange(bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(band_hash.T.reshape(-1)),
                id_col: pa.array(np.tile(ids, bands)),
            }
        )

    exploded = sigged.select_columns([id_col, "minhash"]).map_batches(
        explode_bands, batch_format="pyarrow"
    )

    # Shuffle on a derived bucket count (hash of the band key), not on raw
    # band keys — one vectorized group body per bucket; only genuine
    # collision runs (same band_id AND band_hash, ≥2 docs) emit pairs.
    n_buckets = derive_buckets(
        num_rows * bands if num_rows else None, target_rows=100_000
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        bid = batch["band_id"].to_numpy().astype(np.uint64)
        bh = batch["band_hash"].to_numpy().view(np.uint64)
        mixed = (bh ^ (bid * np.uint64(0x9E3779B97F4A7C15))) * np.uint64(
            0xBF58476D1CE4E5B9
        )
        return batch.append_column(
            "_cb", pa.array((mixed % np.uint64(n_buckets)).astype(np.int32))
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        bid = group["band_id"].to_numpy()
        bh = group["band_hash"].to_numpy()
        order = np.lexsort((ids, bh, bid))
        bid, bh, ids_s = bid[order], bh[order], ids[order]
        boundary = np.nonzero((np.diff(bid) != 0) | (np.diff(bh) != 0))[0] + 1
        starts = np.concatenate([[0], boundary]).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [len(ids_s)]]))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        # Normal runs: one vectorized expansion per DISTINCT run length
        # (ids ascend within a run after the lexsort, so a<b positionally).
        normal = lens <= star_run_threshold
        a_ix, b_ix = triu_run_indices(starts[normal], lens[normal])
        if len(a_ix):
            out_a.append(ids_s[a_ix])
            out_b.append(ids_s[b_ix])
        for s, k in zip(starts[~normal], lens[~normal]):
            # Degenerate run (e.g. millions of boilerplate-identical
            # docs share every band): all-pairs would be O(R^2) rows.
            # Emit the star min_id<->member instead (R-1 rows).
            # CAVEAT: the star preserves the connected component only
            # under verify="none" (pairs consumed unfiltered). Under
            # verify="exact" the Jaccard filter acts on the hub-spoke
            # pairs only, so two members that are near-dups of each
            # other but NOT of the hub lose their link — component
            # equivalence is NOT guaranteed in verify modes once a
            # run exceeds star_run_threshold (documented deviation;
            # dedup consumers should use verify="none", where it is
            # exact).
            va = ids_s[s : s + k]
            lo = va.min()
            rest = va[va != lo]
            out_a.append(np.full(len(rest), lo, dtype=np.int64))
            out_b.append(rest)
        flat_a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        flat_b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        return pa.table(
            {
                "id_a": pa.array(flat_a.astype(np.int64)),
                "id_b": pa.array(flat_b.astype(np.int64)),
            }
        )

    # Budget-gated candidate generation (the budgeted-sum idiom): the
    # exploded band table is EXACTLY num_rows × bands rows of 20 B, so
    # with a row-count hint the gate is decided up front — under the cap
    # gather the band rows once and run ``bucket_pairs`` IN-PROCESS over
    # the whole table (its boundaries are (band_id, band_hash) runs, so
    # one group ≡ the global answer), skipping the band exchange AND the
    # candidate-gather execution.  Without a hint or past the cap the
    # exchange chain runs unchanged (never a wasted signature pass).
    cand_tbl_direct = None
    if (
        verify != "none"
        and num_rows is not None
        and num_rows * bands <= min(gather_rows, 2_000_000)
    ):
        from ._schema import concat_blocks

        band_tbl = concat_blocks(
            exploded,
            pa.schema(
                [
                    ("band_id", pa.int32()),
                    ("band_hash", pa.int64()),
                    (id_col, pa.int64()),
                ]
            ),
        )
        cand_tbl_direct = bucket_pairs(band_tbl)
    else:
        cand = exploded.map_batches(
            add_bucket, batch_format="pyarrow", batch_size=None
        ).groupby("_cb").map_groups(bucket_pairs, batch_format="pyarrow")
    if verify == "none":
        # Distributed dedupe, streamed result — nothing reaches the driver.
        # The map_groups output MUST be schema-stabilized: empty hash
        # partitions emit schema-less blocks that break any downstream
        # native join on id_a/id_b (observed at num_cpus=32).
        from ._buckets import distinct_pairs
        from ._schema import PAIR_SCHEMA, stabilize_schema

        return stabilize_schema(distinct_pairs(cand), PAIR_SCHEMA)
    # verify="exact": STREAM the candidate gather under a hard row cap —
    # the original single-pass gather (a materialize+count pre-gate cost
    # the sf0.1 minhash micro ~1.25×), aborted the moment the budget is
    # exceeded.  Past the cap — dup-saturated corpora — the banding
    # pipeline re-executes once into the fully distributed exchange
    # verify (the recompute only ever taxes the saturated path).
    # Under the cap, candidate pairs are driver-materialized: bounded by
    # genuine near-dups + band collisions, orders of magnitude smaller
    # than the corpus (the text NEVER is). The same pair surfaces from
    # several bands — dedupe with one np.unique over the gathered pairs
    # instead of paying a second distributed shuffle.
    cand_batches = []
    gathered = 0
    over_budget = False
    if cand_tbl_direct is not None:
        if cand_tbl_direct.num_rows > gather_rows:
            # dup-saturated pair blowup: dedupe the (already
            # materialized) pairs and hand them to the exchange verify,
            # matching the streamed path's abort semantics
            from ._schema import PAIR_SCHEMA

            pair_mat = np.unique(
                np.stack(
                    [
                        cand_tbl_direct["id_a"].to_numpy(),
                        cand_tbl_direct["id_b"].to_numpy(),
                    ],
                    axis=1,
                ),
                axis=0,
            )
            cand_dd = rd.from_arrow(
                pa.table(
                    {
                        "id_a": pa.array(pair_mat[:, 0], pa.int64()),
                        "id_b": pa.array(pair_mat[:, 1], pa.int64()),
                    }
                ).cast(PAIR_SCHEMA)
            )
            return _lsh_exchange_verify(
                ds, cand_dd, id_col, shingle_n, jaccard_threshold, num_rows
            )
        if cand_tbl_direct.num_rows:
            cand_batches = [cand_tbl_direct]
    else:
        for b in cand.iter_batches(batch_format="pyarrow"):
            if not b.num_rows:
                continue
            cand_batches.append(b)
            gathered += b.num_rows
            if gathered > gather_rows:
                over_budget = True
                cand_batches = []
                break
    if over_budget:
        from ._buckets import distinct_pairs
        from ._schema import PAIR_SCHEMA, stabilize_schema

        cand_dd = stabilize_schema(distinct_pairs(cand), PAIR_SCHEMA)
        return _lsh_exchange_verify(
            ds, cand_dd, id_col, shingle_n, jaccard_threshold, num_rows
        )
    cand_tbl = (
        pa.concat_tables(cand_batches, promote_options="default")
        if cand_batches
        else pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
    )
    if cand_tbl.num_rows:
        pair_mat = np.unique(
            np.stack(
                [cand_tbl["id_a"].to_numpy(), cand_tbl["id_b"].to_numpy()],
                axis=1,
            ),
            axis=0,
        )
        cand_tbl = pa.table(
            {
                "id_a": pa.array(pair_mat[:, 0], pa.int64()),
                "id_b": pa.array(pair_mat[:, 1], pa.int64()),
            }
        )
    if cand_tbl.num_rows == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    need_ids = np.unique(
        np.concatenate(
            [cand_tbl["id_a"].to_numpy(), cand_tbl["id_b"].to_numpy()]
        )
    )
    # Exact verification: semi-join the candidate ids back against the
    # input (broadcast the sorted id array once via ray.put), compute each
    # candidate doc's shingle set where the text lives, and ship only the
    # (id, shingles) map — not the text — to the verify stage.
    ids_ref = ray.put(need_ids)

    def shingle_candidates(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        # need_ids is sorted-unique: shared searchsorted membership (no
        # per-batch hash build) and the broadcast deserializes once per
        # worker process, not per batch.
        from ._buckets import sorted_lookup

        need = _get_broadcast(ids_ref)
        wanted, _ = sorted_lookup(ids, need)
        if not wanted.any():
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "shingles": pa.array([], pa.list_(pa.uint64())),
                }
            )
        sub = batch.filter(pa.array(wanted))
        sh, offs = _shingle_batch(sub["text"], shingle_n)
        # Per-doc sorted-unique shingle sets (Jaccard is a set measure) —
        # one vectorized lexsort pass, no per-doc Python loop.
        flat, new_offs = _unique_per_doc(sh, offs)
        return pa.table(
            {
                "id": pa.array(
                    sub[id_col].to_numpy().astype(np.int64), pa.int64()
                ),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(new_offs, pa.int32()),
                    pa.array(flat, pa.uint64()),
                ),
            }
        )

    # Gather the bounded (id, shingles) map as typed Arrow blocks and
    # broadcast it as a CSR triple (sorted ids, int64 offsets, flat
    # values) — the per-pair python loop over a dict of arrays
    # (np.intersect1d per pair) re-sorted both sets for every pair and
    # was the last row-at-a-time kernel on the under-budget path.
    from ._schema import concat_blocks

    sh_tbl = concat_blocks(
        ds.map_batches(shingle_candidates, batch_format="pyarrow"),
        pa.schema([("id", pa.int64()), ("shingles", pa.list_(pa.uint64()))]),
    )
    sid = sh_tbl["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sid)
    sid = sid[order]
    sets = sh_tbl["shingles"]
    if isinstance(sets, pa.ChunkedArray):
        sets = sets.combine_chunks()
    sets = sets.take(pa.array(order, pa.int64()))
    lens = (
        pc.list_value_length(sets)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat = sets.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    sh_ref = ray.put((sid, offs, flat))

    def _range_gather(pos, offs, flat):
        # rows pos of a CSR → (concatenated values, per-row lengths)
        lens = offs[pos + 1] - offs[pos]
        total = int(lens.sum())
        starts = np.repeat(offs[pos], lens)
        excl = (
            np.concatenate(([0], np.cumsum(lens)[:-1]))
            if len(lens)
            else np.zeros(0, np.int64)
        )
        intra = np.arange(total, dtype=np.int64) - np.repeat(excl, lens)
        return flat[starts + intra], lens

    def verify(batch: pa.Table) -> pa.Table:
        from ._buckets import sorted_lookup

        csid, coffs, cflat = _get_broadcast(sh_ref)
        ia = batch["id_a"].to_numpy().astype(np.int64)
        ib = batch["id_b"].to_numpy().astype(np.int64)
        hit_a, pos_a = sorted_lookup(ia, csid)
        hit_b, pos_b = sorted_lookup(ib, csid)
        if not (hit_a.all() and hit_b.all()):
            raise ValueError(
                "lsh verify: candidate id missing from the corpus"
            )
        n = len(ia)
        va, la = _range_gather(pos_a, coffs, cflat)
        vb, lb = _range_gather(pos_b, coffs, cflat)
        # run-of-2 intersection count over the pair-tagged sorted-unique
        # sets — the same kernel as the exchange verify's verify_group
        pcode = np.concatenate(
            [
                np.repeat(np.arange(n, dtype=np.int64), la),
                np.repeat(np.arange(n, dtype=np.int64), lb),
            ]
        )
        vals = np.concatenate([va, vb])
        vorder = np.lexsort((vals, pcode))
        vals, pcode = vals[vorder], pcode[vorder]
        inter = np.zeros(n, np.int64)
        if len(vals) > 1:
            dup = (pcode[1:] == pcode[:-1]) & (vals[1:] == vals[:-1])
            np.add.at(inter, pcode[1:][dup], 1)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = jac >= jaccard_threshold
        return pa.table(
            {
                "id_a": pa.array(ia[keep]),
                "id_b": pa.array(ib[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return rd.from_arrow(cand_tbl).map_batches(
        verify, batch_format="pyarrow"
    )


# Wire schema of the past-budget LSH exact verify: kind 1 rows carry a
# doc's sorted-unique shingle set (did, sh), kind 0 rows are pair refs /
# pair sides (did = the side's doc, a/b = the canonical pair).
_LSHV_WIRE = pa.schema(
    [
        ("_sh", pa.int32()),
        ("kind", pa.int8()),
        ("did", pa.int64()),
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("sh", pa.large_list(pa.uint64())),
    ]
)

_LSHV_OUT = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
)


def _lsh_exchange_verify(
    ds, cand_dd, id_col, shingle_n, jaccard_threshold, num_rows
):
    """Fully distributed exact-Jaccard verification of LSH candidate
    pairs — no driver gather of pairs, ids or shingle maps.  Exchange 1
    co-locates pair refs with per-doc shingle sets by doc-id hash (the
    corpus pays one honest shingling pass + a doc-keyed set exchange);
    exchange 2 co-locates each pair's two sides by pair hash and counts
    the true intersection with the run-of-2 kernel over sorted-unique
    sets.  Identical output to the driver verify path."""
    from ._buckets import derive_buckets, hash_buckets
    from ._schema import stabilize_schema

    n_b = derive_buckets(num_rows)

    def doc_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            return _LSHV_WIRE.empty_table()
        ids = batch[id_col].to_numpy().astype(np.int64)
        sh, offs = _shingle_batch(batch["text"], shingle_n)
        flat, new_offs = _unique_per_doc(sh, offs)
        n = len(ids)
        return pa.Table.from_arrays(
            [
                pa.array(hash_buckets(ids, n_b)),
                pa.array(np.ones(n, np.int8)),
                pa.array(ids),
                pa.array(np.zeros(n, np.int64)),
                pa.array(np.zeros(n, np.int64)),
                pa.LargeListArray.from_arrays(
                    pa.array(new_offs, pa.int64()),
                    pa.array(flat, pa.uint64()),
                ),
            ],
            schema=_LSHV_WIRE,
        )

    def ref_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id_a" not in batch.column_names:
            return _LSHV_WIRE.empty_table()
        aa = batch["id_a"].to_numpy().astype(np.int64)
        bb = batch["id_b"].to_numpy().astype(np.int64)
        did = np.concatenate([aa, bb])
        a2 = np.concatenate([aa, aa])
        b2 = np.concatenate([bb, bb])
        n = len(did)
        return pa.Table.from_arrays(
            [
                pa.array(hash_buckets(did, n_b)),
                pa.array(np.zeros(n, np.int8)),
                pa.array(did),
                pa.array(a2),
                pa.array(b2),
                pa.nulls(n, pa.large_list(pa.uint64())),
            ],
            schema=_LSHV_WIRE,
        )

    docs_w = ds.map_batches(doc_rows, batch_format="pyarrow")
    refs_w = cand_dd.map_batches(
        ref_rows, batch_format="pyarrow", batch_size=None
    )

    def _pair_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (
                a.astype(np.uint64) * np.uint64(0x100000001B3)
                + b.astype(np.uint64)
            )

    def attach_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "kind" not in group.column_names:
            return _LSHV_WIRE.empty_table()
        kind = group["kind"].to_numpy(zero_copy_only=False)
        rm = kind == 0
        if not rm.any():
            return _LSHV_WIRE.empty_table()
        did = group["did"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh_col = group["sh"]
        if isinstance(sh_col, pa.ChunkedArray):
            sh_col = sh_col.combine_chunks()
        ddid = did[~rm]
        dorder = np.argsort(ddid)
        doc_take = np.flatnonzero(~rm)[dorder]
        ddid = ddid[dorder]
        rdid = did[rm]
        from ._buckets import sorted_lookup

        # every candidate id exists in the corpus; missing → empty set
        hit, pos = sorted_lookup(rdid, ddid)
        take_idx = np.where(hit, doc_take[pos], -1)
        sets = sh_col.take(
            pa.array(np.where(take_idx >= 0, take_idx, 0), pa.int64())
        )
        lens = pc.list_value_length(sets).to_numpy(zero_copy_only=False)
        flat = sets.flatten()
        # zero out sets for misses (keep offsets consistent): misses get
        # the row-0 doc's set otherwise — rebuild with masked lengths
        if (~hit).any():
            keep = np.repeat(hit, lens)
            flat = flat.filter(pa.array(keep))
            lens = np.where(hit, lens, 0)
        a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)[rm]
        b = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)[rm]
        off = np.concatenate(([0], np.cumsum(lens.astype(np.int64))))
        out_sets = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), flat.cast(pa.uint64())
        )
        n = len(a)
        return pa.Table.from_arrays(
            [
                pa.array(hash_buckets(_pair_hash(a, b), n_b)),
                pa.array(np.zeros(n, np.int8)),
                pa.array(rdid),
                pa.array(a),
                pa.array(b),
                out_sets,
            ],
            schema=_LSHV_WIRE,
        )

    sided = stabilize_schema(
        docs_w.union(refs_w)
        .groupby("_sh")
        .map_groups(attach_group, batch_format="pyarrow"),
        _LSHV_WIRE,
    )

    def verify_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "a" not in group.column_names:
            return _LSHV_OUT.empty_table()
        a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh_col = group["sh"]
        if isinstance(sh_col, pa.ChunkedArray):
            sh_col = sh_col.combine_chunks()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        sh_col = sh_col.take(pa.array(order, pa.int64()))
        new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        pair_of_row = np.cumsum(new) - 1
        n_pairs = int(pair_of_row[-1]) + 1 if len(a) else 0
        lens = (
            pc.list_value_length(sh_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        vals = sh_col.flatten().to_numpy(zero_copy_only=False)
        pcode = np.repeat(pair_of_row, lens)
        vorder = np.lexsort((vals, pcode))
        vals, pcode = vals[vorder], pcode[vorder]
        inter = np.zeros(n_pairs, np.int64)
        if len(vals) > 1:
            dup = (pcode[1:] == pcode[:-1]) & (vals[1:] == vals[:-1])
            np.add.at(inter, pcode[1:][dup], 1)
        tot = np.zeros(n_pairs, np.int64)
        np.add.at(tot, pair_of_row, lens)
        union = tot - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep_p = jac >= jaccard_threshold
        firsts = np.flatnonzero(new)
        return pa.Table.from_arrays(
            [
                pa.array(a[firsts][keep_p]),
                pa.array(b[firsts][keep_p]),
                pa.array(jac[keep_p]),
            ],
            schema=_LSHV_OUT,
        )

    return stabilize_schema(
        sided.groupby("_sh").map_groups(
            verify_group, batch_format="pyarrow"
        ),
        _LSHV_OUT,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per document (token-hash bit voting), vectorized:
    all token hashes for the batch at once, per-doc votes via segment sum."""
    texts = batch[text_col]  # Arrow column straight through (no pylist)
    n = len(texts)
    bitcols = np.uint64(1) << np.arange(64, dtype=np.uint64)
    th, offs = _token_hash_batch(texts)
    counts = np.diff(offs)
    out = np.zeros(n, dtype=np.uint64)
    if len(th):
        bits = (th[:, None] & bitcols[None, :]) != 0  # (T, 64)
        starts = np.minimum(offs[:-1], len(th) - 1)
        votes = np.add.reduceat(bits, starts, axis=0)
        # reduceat artifacts for empty segments are masked out below.
        nonempty = counts > 0
        maj = (votes * 2 - counts[:, None]) > 0
        maj &= nonempty[:, None]
        out = (maj * bitcols[None, :]).sum(axis=1).astype(np.uint64)
    return batch.append_column("simhash", pa.array(out, pa.uint64()))


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity (verification kernel)."""
    a = _shingle_hashes(text_a, n)
    b = _shingle_hashes(text_b, n)
    inter = np.intersect1d(a, b).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def simhash_neardup_pairs(
    ds,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_rows: int | None = None,
    as_dataset: bool = False,
    star_run_threshold: int = 10_000,
):
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: the 64-bit signature splits into ``max_hamming+1``
    contiguous blocks; two signatures within the distance budget must agree
    exactly on at least one block, so candidates are generated by a
    groupby on (block_id, block_value) — the all-to-all carries only
    (block_id, block_bits, id, simhash) = 28 B/row × blocks, never text.
    Candidates verify by popcount of the XOR (vectorized), pairs dedupe in
    the driver (bounded by true near-dups + band collisions).

    Returns pa.Table(id_a, id_b, hamming) with id_a < id_b.
    """
    import ray.data as rd

    from ._buckets import derive_buckets

    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    sigged = ds.map_batches(
        simhash_batch, batch_format="pyarrow", batch_size=None
    )

    def explode(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy()
        ids = batch[id_col].to_numpy()
        n = len(sig)
        parts = {
            "block_id": np.repeat(
                np.arange(n_blocks, dtype=np.int32), n
            ),
            "block_bits": np.empty(n * n_blocks, dtype=np.int64),
            id_col: np.tile(ids, n_blocks),
            "simhash": np.tile(sig.view(np.int64), n_blocks),
        }
        mask = np.uint64((1 << width) - 1)
        for b in range(n_blocks):
            sh = np.uint64(b * width)
            parts["block_bits"][b * n : (b + 1) * n] = (
                (sig >> sh) & mask
            ).view(np.int64)
        return pa.table(
            {k: pa.array(v) for k, v in parts.items()}
        )

    n_buckets = derive_buckets(
        num_rows * n_blocks if num_rows else None, target_rows=100_000
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        bid = batch["block_id"].to_numpy().astype(np.uint64)
        bb = batch["block_bits"].to_numpy().view(np.uint64)
        mixed = (bb ^ (bid * np.uint64(0x9E3779B97F4A7C15))) * np.uint64(
            0xBF58476D1CE4E5B9
        )
        return batch.append_column(
            "_sb", pa.array((mixed % np.uint64(n_buckets)).astype(np.int32))
        )

    _POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def popcount64(x: np.ndarray) -> np.ndarray:
        return _POP[x.view(np.uint8).reshape(len(x), 8)].sum(
            axis=1
        ).astype(np.int64)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        bid = group["block_id"].to_numpy()
        bb = group["block_bits"].to_numpy()
        sig = group["simhash"].to_numpy().view(np.uint64)
        order = np.lexsort((ids, bb, bid))
        bid, bb, ids_s, sig_s = bid[order], bb[order], ids[order], sig[order]
        boundary = np.nonzero((np.diff(bid) != 0) | (np.diff(bb) != 0))[0] + 1
        starts = np.concatenate([[0], boundary]).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [len(ids_s)]]))
        out = []
        # Normal runs: one vectorized expansion per DISTINCT run length,
        # hamming computed across ALL candidate pairs in one popcount.
        normal = lens <= star_run_threshold
        a_ix, b_ix = triu_run_indices(starts[normal], lens[normal])
        if len(a_ix):
            ham = popcount64(sig_s[a_ix] ^ sig_s[b_ix])
            keep = ham <= max_hamming
            if keep.any():
                va, vb = ids_s[a_ix[keep]], ids_s[b_ix[keep]]
                out.append(
                    np.stack(
                        [np.minimum(va, vb), np.maximum(va, vb), ham[keep]],
                        axis=1,
                    )
                )
        for s, k in zip(starts[~normal], lens[~normal]):
            # Degenerate run: star against the min id (R-1 rows
            # instead of O(R^2)). CAVEAT: hamming-filtering the
            # hub-spoke pairs means two members within max_hamming
            # of each other but not of the hub lose their link —
            # component equivalence holds only if the pairs are
            # consumed unfiltered (see the minhash analogue above).
            va = ids_s[s : s + k]
            sv = sig_s[s : s + k]
            lo_pos = int(np.argmin(va))
            rest = np.ones(int(k), dtype=bool)
            rest[lo_pos] = False
            ham = popcount64(sv[rest] ^ sv[lo_pos])
            keep = ham <= max_hamming
            if keep.any():
                vb = va[rest][keep]
                out.append(
                    np.stack(
                        [
                            np.minimum(va[lo_pos], vb),
                            np.maximum(va[lo_pos], vb),
                            ham[keep],
                        ],
                        axis=1,
                    )
                )
        mat = (
            np.concatenate(out) if out else np.zeros((0, 3), dtype=np.int64)
        )
        return pa.table(
            {
                "id_a": pa.array(mat[:, 0].astype(np.int64)),
                "id_b": pa.array(mat[:, 1].astype(np.int64)),
                "hamming": pa.array(mat[:, 2].astype(np.int64)),
            }
        )

    pairs_ds = (
        sigged.select_columns([id_col, "simhash"])
        .map_batches(explode, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_sb")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    if as_dataset:
        # Crawl-scale mode: distributed dedupe, streamed result — the
        # pair set never reaches the driver.
        from ._buckets import distinct_pairs

        return distinct_pairs(pairs_ds, ["hamming"])
    got = list(pairs_ds.iter_batches(batch_format="pyarrow"))
    tbl = (
        pa.concat_tables(got, promote_options="default")
        if got
        else pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
    )
    if tbl.num_rows:
        mat = np.unique(
            np.stack(
                [
                    tbl["id_a"].to_numpy(),
                    tbl["id_b"].to_numpy(),
                    tbl["hamming"].to_numpy(),
                ],
                axis=1,
            ),
            axis=0,
        )
        tbl = pa.table(
            {
                "id_a": pa.array(mat[:, 0], pa.int64()),
                "id_b": pa.array(mat[:, 1], pa.int64()),
                "hamming": pa.array(mat[:, 2], pa.int64()),
            }
        )
    return tbl


def _verify_pairs_csr(
    docs: np.ndarray,
    offs: np.ndarray,
    grams_v: np.ndarray,
    aa: np.ndarray,
    bb: np.ndarray,
    t_x1000: int,
) -> pa.Table:
    """Exact Jaccard verification of pair batch (aa, bb) against a CSR
    doc→sorted-grams index — the ONE shared count kernel behind both the
    broadcast in-task verify and the local in-process verify.  Same
    run-of-2 intersection math as the exchange path's count_pairs
    (per-doc grams are DISTINCT, so a (pair, gram) run of length 2 IS
    one intersection element); any change to that assumption must land
    in ALL kernels — the 8-combo brute-force pin test enforces
    agreement.  Returns rows passing ``1000·inter ≥ t_x1000·union``."""
    from ._buckets import sorted_lookup

    _, ia = sorted_lookup(aa, docs)
    _, ib = sorted_lookup(bb, docs)
    ca = offs[ia + 1] - offs[ia]
    cb = offs[ib + 1] - offs[ib]
    npair = len(aa)

    def gather(starts: np.ndarray, cnt: np.ndarray) -> np.ndarray:
        total = int(cnt.sum())
        if not total:
            return np.zeros(0, grams_v.dtype)
        base = np.repeat(starts, cnt)
        run0 = np.repeat(np.cumsum(cnt) - cnt, cnt)
        return grams_v[base + (np.arange(total) - run0)]

    pidx = np.concatenate(
        [np.repeat(np.arange(npair), ca), np.repeat(np.arange(npair), cb)]
    )
    gvals = np.concatenate([gather(offs[ia], ca), gather(offs[ib], cb)])
    sort_ix = np.lexsort((gvals, pidx))
    p_s, g_s = pidx[sort_ix], gvals[sort_ix]
    new_run = np.ones(len(p_s), dtype=bool)
    new_run[1:] = (p_s[1:] != p_s[:-1]) | (g_s[1:] != g_s[:-1])
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id) if len(run_id) else np.zeros(0, np.int64)
    first_p = p_s[new_run] if len(p_s) else np.zeros(0, np.int64)
    inter = np.bincount(first_p[run_len == 2], minlength=npair).astype(
        np.int64
    )
    total = (ca + cb).astype(np.int64)
    union = total - inter
    keep = inter * 1000 >= t_x1000 * union
    jac = np.zeros(npair, dtype=np.int64)
    nz = union > 0
    jac[nz] = (1000 * inter[nz]) // union[nz]
    return pa.table(
        {
            "id_a": pa.array(aa[keep].astype(np.int64)),
            "id_b": pa.array(bb[keep].astype(np.int64)),
            "inter_n": pa.array(inter[keep]),
            "union_n": pa.array(union[keep]),
            "jac_x1000": pa.array(jac[keep]),
        }
    )


def ngram_jaccard_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
    order: str = "freq",
    num_rows: int | None = None,
    max_candidates: int = 1_000_000,
    max_gram_run: int = 2_000,
    local_rows: int = 2_000_000,
    # Broadcast-CSR verify pays a DRIVER-side gather + lexsort of the
    # candidate docs' gram rows; measured at 9.1M rows it loses to the
    # distributed exchange verify at every parallelism level (54 vs 22 s
    # at 16 CPUs, 60 vs 40 s at 4 — round-5 scaling legs), while at
    # ≤200k rows it wins 5-7x (round-4 sf0.1 bench).  2M is the
    # conservative crossover.
    verify_broadcast_rows: int = 2_000_000,
):
    """EXACT word-n-gram Jaccard similarity join via distributed prefix
    filtering (AllPairs/PPJoin family) — the guaranteed-complete companion
    to the probabilistic MinHash-LSH path.

    Pipeline (every step a streaming Ray Data op, no driver gather):

    1. gram sets: one tokenize pass (``_shingle_batch`` rolling hashes off
       Arrow buffers) → DISTINCT (doc, gram_hash) rows + per-doc set size.
    2. global gram frequencies (``order="freq"``): ONE gram-bucketed
       exchange — all rows of a gram co-locate, so the in-bucket count
       is the global document frequency, appended in place (no separate
       aggregate + join). Frequency-ascending prefix order keeps prefix
       posting lists short (the classic AllPairs trick — rare grams
       first), which is what bounds candidate blowup at crawl scale.
       ``order="hash"`` skips the exchange and uses hash order (correct
       but hot-gram-prone; test/compat path).
    3. prefix marking: hash-bucketed per-doc pass sorts each doc's grams
       by the global order and keeps the first
       ``l(X) = |X| - ceil(t/(1+t)·|X|) + 1`` as the prefix.
       Correctness of this prefix-vs-prefix bound: if J(A,B) ≥ t then
       ``|A∩B| ≥ t/(1+t)·(|A|+|B|)``; if the prefixes shared no common
       element, every common element would sit outside P(A) or outside
       P(B), giving ``|A∩B| ≤ (⌈u|A|⌉-1) + (⌈u|B|⌉-1) < u(|A|+|B|)``
       with ``u = t/(1+t)`` — contradiction. So candidate generation by
       "prefixes share ≥1 gram" misses nothing.
    4. candidates: groupby(prefix gram) emits in-group pairs
       (vectorized run expansion); the bounded gather below dedupes them
       driver-side (np.unique) instead of paying a distinct exchange.
    5. exact verify, two modes picked by estimated state size:

       * **broadcast-CSR (default under ``verify_broadcast_rows``)**:
         the candidate docs' DISTINCT gram rows (replication-free,
         bounded by the gram table) are gathered once, a CSR
         doc→sorted-grams index is ``ray.put``, and candidate-pair
         batches verify IN-TASK — each pair's full gram sets come from
         the broadcast, so groups are complete by construction and no
         exchange runs at all.  This removed the dominant cost at the
         sf0.1 bench: the exchange mode's (pair, gram) expansion was
         60M rows / ~45 s of sort; broadcast verify is ~1 s.
       * **exchange (above the budget — crawl-scale candidate sets)**:
         a doc → pair-slot index is broadcast; a stateless map expands
         each candidate doc's gram rows to bare (pair, gram) rows —
         16 B each, no side flag or set size, because per-doc grams are
         distinct so a (pair, gram) run of length 2 IS an intersection
         element and a pair's total rows are |A|+|B| — and a single
         pk-bucketed groupby counts intersections vectorized.

       Both modes share the count math and the integer-exact threshold
       test ``1000·inter ≥ 1000·t·union`` (no float boundary); equality
       is pinned in tests/test_stages.py across all 8 path combinations.

    Returns (id_a, id_b, inter_n, union_n, jac_x1000), id_a < id_b.

    Hybrid small-state path: when the distinct-gram table holds ≤
    ``local_rows`` rows (known from the materialize), the whole table is
    gathered ONCE and steps 2–4 run IN-PROCESS on the driver — the same
    pure Table→Table kernels the distributed chain maps, called
    directly.  When the broadcast verify is also admitted and the pair
    set is small (≤50k), step 5 runs in-process too, so the entire join
    costs exactly ONE dataset execution (the grams materialize): each
    Ray execution carries ~0.5–2 s of fixed streaming overhead at test
    scale while the kernels need ~10 ms (round-5 measurement — the full
    sf0.1 tokenize is 68 ms single-threaded).  The EXCHANGE verify is
    never fused into a map (Ray splits oversized map outputs into
    multiple blocks, so a fused whole-batch count would see partial
    pair groups — the round-4 regression the 8-combo pin test guards);
    above ``local_rows`` the fully distributed chain runs unchanged.
    """
    from ._buckets import derive_buckets, hash_buckets

    t_x1000 = int(round(threshold * 1000))
    n_buckets = derive_buckets(num_rows)

    def gram_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = batch[id_col].to_numpy()
        h, doc_of = strict_ngram_hashes(texts, n)
        # Per-doc DISTINCT grams: lexsort by (doc, hash), drop adjacent dups.
        order_ix = np.lexsort((h, doc_of))
        hs, ds_ = h[order_ix], doc_of[order_ix]
        keep = np.ones(len(hs), dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        hs, ds_ = hs[keep], ds_[keep]
        set_sz = np.bincount(ds_, minlength=len(ids)).astype(np.int64)
        return pa.table(
            {
                "did": pa.array(ids[ds_].astype(np.int64)),
                "gram": pa.array(hs.view(np.int64)),
                "set_sz": pa.array(set_sz[ds_]),
            }
        )

    grams = ds.map_batches(gram_rows, batch_format="pyarrow", batch_size=None)
    # Two consumers read `grams` (the candidate-generation chain and the
    # verify expansion); without checkpointing, Ray re-derives the
    # tokenize lineage for each. The distinct (doc, gram) table is ~1.5x
    # the text size and spills via the object store, so one materialize
    # beats recomputes — the ONE deliberate mid-pipeline materialization
    # in this operator.
    grams = grams.materialize()
    # Coalesce when the input produced far more blocks than the gram-row
    # count warrants (small inputs get split to ~2 blocks/CPU by the
    # read).  Every sort-based groupby exchange below pays wall-time
    # roughly proportional to block count, NOT row count — at sf0.01 the
    # 64-block 26k-row gram table cost 10-25 s PER SORT before this
    # coalesce and <1 s after.  At crawl scale ceil(rows/250k) exceeds
    # the read's block count and this is a no-op.
    g_rows = grams.count()
    # Hybrid small-state path (same pattern as connected_components'
    # single-task finisher): when the whole distinct-gram table fits one
    # comfortable block, every groupby below would group by a bucket of
    # a SINGLE co-located block — so run the freq/prefix/pair kernels
    # (and the verify count) as plain whole-block map_batches with ZERO
    # sort exchanges.  Each sort costs seconds of fixed overhead at high
    # parallelism; at sf0.01 this path cuts the operator from ~10 s to
    # ~3 s.  Above the threshold the distributed chain is unchanged.
    local = g_rows <= local_rows
    if local:
        if grams.num_blocks() > 1:
            grams = grams.repartition(1).materialize()
    else:
        want_blk = max(1, math.ceil(g_rows / 250_000))
        if grams.num_blocks() > 4 * want_blk:
            grams = grams.repartition(want_blk).materialize()
    grams_raw = grams

    # Global doc-frequency per gram in ONE gram-bucketed exchange: all
    # (doc, gram) rows of a gram land in the same bucket, so the
    # in-bucket count IS the global frequency — this replaces the
    # round-3 plan's separate count-aggregate + native hash join (which
    # re-shuffled the full gram table AND was exposed to the
    # 0-row-first-block schema-broadcast bug, see functions/_schema.py).
    # In the local path the "bucket" is the whole single block, so the
    # same kernel computes the same global frequency with no exchange.
    def add_freq_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_fb",
            pa.array(hash_buckets(batch["gram"].to_numpy(), n_buckets)),
        )

    def attach_freq(group: pa.Table) -> pa.Table:
        gram = group["gram"].to_numpy()
        _, inv, cnt = np.unique(
            gram, return_inverse=True, return_counts=True
        )
        return group.drop_columns(["_fb"]).append_column(
            "gfreq", pa.array(cnt[inv].astype(np.int64))
        )

    def zero_freq(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "gfreq", pa.array(np.zeros(batch.num_rows, dtype=np.int64))
        )

    if not local:
        if order == "freq":
            grams = (
                grams.map_batches(
                    add_freq_bucket, batch_format="pyarrow", batch_size=None
                )
                .groupby("_fb")
                .map_groups(attach_freq, batch_format="pyarrow")
            )
        else:
            grams = grams.map_batches(
                zero_freq, batch_format="pyarrow", batch_size=None
            )

    u = threshold / (1.0 + threshold)

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_cb", pa.array(hash_buckets(batch["did"].to_numpy(), n_buckets))
        )

    def mark_prefix(group: pa.Table) -> pa.Table:
        did = group["did"].to_numpy()
        gfreq = group["gfreq"].to_numpy()
        gram = group["gram"].to_numpy()
        sz = group["set_sz"].to_numpy()
        order_ix = np.lexsort((gram, gfreq, did))
        did, gfreq, gram, sz = (
            did[order_ix], gfreq[order_ix], gram[order_ix], sz[order_ix]
        )
        # rank within doc (docs are contiguous after the lexsort)
        starts = np.ones(len(did), dtype=bool)
        starts[1:] = did[1:] != did[:-1]
        run_start = np.maximum.accumulate(
            np.where(starts, np.arange(len(did)), 0)
        )
        rank = np.arange(len(did)) - run_start
        pref_len = sz - np.ceil(u * sz).astype(np.int64) + 1
        keep = rank < pref_len
        return pa.table(
            {
                "did": pa.array(did[keep]),
                "gram": pa.array(gram[keep]),
                "gfreq": pa.array(gfreq[keep]),
            }
        )

    if not local:
        prefixes = (
            grams.map_batches(
                add_doc_bucket, batch_format="pyarrow", batch_size=None
            )
            .groupby("_cb")
            .map_groups(mark_prefix, batch_format="pyarrow")
        )

    def add_gram_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_gb", pa.array(hash_buckets(batch["gram"].to_numpy(), n_buckets))
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        gram = group["gram"].to_numpy()
        did = group["did"].to_numpy()
        order_ix = np.lexsort((did, gram))
        gram, did = gram[order_ix], did[order_ix]
        starts = np.ones(len(gram), dtype=bool)
        starts[1:] = gram[1:] != gram[:-1]
        run_id = np.cumsum(starts) - 1
        run_len = np.bincount(run_id)
        if len(run_len) and run_len.max() > max_gram_run:
            # A prefix gram shared by k docs emits k(k-1)/2 pairs IN THIS
            # TASK (np.triu_indices allocates them all at once), so this
            # guard must fire BEFORE expansion: any k > ~sqrt(2 *
            # max_candidates) already guarantees the candidate cap fails
            # later, and k in the tens of thousands OOMs the task first.
            # Default 2000 => at most ~2M pairs per run pre-guard. Fail
            # actionably: raise the threshold, increase n, or use the
            # probabilistic minhash_lsh_pairs path.
            raise ValueError(
                f"ngram_jaccard_pairs: a prefix gram is shared by "
                f"{int(run_len.max())} docs (> max_gram_run="
                f"{max_gram_run}); corpus too self-similar for an exact "
                "threshold join — raise threshold/n or use MinHash-LSH"
            )
        # All unordered pairs within each gram run, vectorized by length
        # class: for a run of length k emit k*(k-1)/2 (a<b by position =
        # by did after sort).
        run_off = np.concatenate([[0], np.cumsum(run_len)])
        a_ix, b_ix = triu_run_indices(run_off[:-1], run_len)
        if not len(a_ix):
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {"id_a": pa.array(did[a_ix]), "id_b": pa.array(did[b_ix])}
        )

    from ._schema import PAIR_SCHEMA, concat_blocks, stabilize_schema

    gt_all: pa.Table | None = None
    if local:
        # Single-block state: the three kernels are bucket-agnostic
        # whole-group reductions, AND the whole gram table is bounded by
        # ``local_rows`` — so gather it ONCE and run the candidate chain
        # driver-side in the same numpy space.  Each Ray dataset
        # execution costs ~0.5-2 s of fixed streaming overhead at test
        # scale while the kernels run in ~10 ms (measured: the full
        # sf0.1 tokenize is 68 ms single-threaded); the driver path
        # removes the candidate execution, the pick_rows execution and
        # (with the broadcast verify) the verify execution.
        gt_all = concat_blocks(
            grams_raw,
            pa.schema(
                [
                    ("did", pa.int64()),
                    ("gram", pa.int64()),
                    ("set_sz", pa.int64()),
                ]
            ),
        )
        if order == "freq":
            t = attach_freq(
                gt_all.append_column(
                    "_fb",
                    pa.array(np.zeros(gt_all.num_rows, dtype=np.int32)),
                )
            )
        else:
            t = zero_freq(gt_all)
        cand_raw = emit_pairs(mark_prefix(t))
        cand_batches = [cand_raw] if cand_raw.num_rows else []
    else:
        cand = stabilize_schema(
            prefixes.map_batches(
                add_gram_bucket, batch_format="pyarrow", batch_size=None
            )
            .groupby("_gb")
            .map_groups(emit_pairs, batch_format="pyarrow"),
            PAIR_SCHEMA,
        )
        # Guard before the verify expansion: candidates x set-size rows
        # flow through the pair-gram exchange, so a degenerate candidate
        # set (low-diversity corpus, low threshold => nearly all pairs
        # survive prefix filtering) must fail loudly here, not grind
        # through an O(n^2) exchange.  The raw stream may carry the same
        # pair once per shared prefix gram (dup factor <= prefix
        # length); deduping at the driver with np.unique replaces a
        # whole hash-bucketed exchange (round-4: one of five sorts
        # removed), at the cost of an 8x-cap raw gather bound (16 B/row
        # => <=128 MB driver-side at the default cap) — which is also
        # what licenses the driver-side pair index below.
        cand_batches = [
            b for b in cand.iter_batches(batch_format="pyarrow") if b.num_rows
        ]
    raw_rows = sum(b.num_rows for b in cand_batches)
    if raw_rows > 8 * max_candidates:
        raise ValueError(
            f"ngram_jaccard_pairs: {raw_rows} pre-dedup candidate rows "
            f"exceed 8*max_candidates={8 * max_candidates}; the corpus "
            "is too self-similar for an exact threshold join at "
            f"threshold={threshold} — raise threshold/n or use "
            "MinHash-LSH"
        )
    if cand_batches:
        raw_tbl = pa.concat_tables(cand_batches)
        mat = np.unique(
            np.stack(
                [
                    raw_tbl["id_a"].to_numpy().astype(np.int64),
                    raw_tbl["id_b"].to_numpy().astype(np.int64),
                ],
                axis=1,
            ),
            axis=0,
        )
        cand_tbl = pa.table(
            {"id_a": pa.array(mat[:, 0]), "id_b": pa.array(mat[:, 1])}
        )
    else:
        cand_tbl = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
    n_cand = cand_tbl.num_rows
    if n_cand > max_candidates:
        raise ValueError(
            f"ngram_jaccard_pairs: {n_cand} candidate pairs exceed "
            f"max_candidates={max_candidates}; the corpus is too "
            "self-similar for an exact threshold join at "
            f"threshold={threshold} — raise threshold/n or use "
            "MinHash-LSH"
        )
    if n_cand == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "inter_n": pa.array([], pa.int64()),
                    "union_n": pa.array([], pa.int64()),
                    "jac_x1000": pa.array([], pa.int64()),
                }
            )
        )

    # Exact verify, ONE exchange (round-4 rewrite; the previous two
    # native Dataset.joins shuffled the FULL gram table twice and paid
    # ~25 s of fixed join cost at sf0.01 — and native joins crash when a
    # 0-row first block suppresses Ray's one-shot schema broadcast, see
    # functions/_schema.py). Instead: broadcast a doc -> pair-slot index
    # built from the capped candidate set, expand each candidate doc's
    # gram rows to (pair, gram, side, set_sz) in one stateless map (docs
    # NOT in any candidate pair never leave their block), then a single
    # bucketed exchange co-locates each pair's rows and counts the true
    # intersection vectorized.
    import ray as _ray

    a_ids = cand_tbl["id_a"].to_numpy().astype(np.int64)
    b_ids = cand_tbl["id_b"].to_numpy().astype(np.int64)
    all_did = np.concatenate([a_ids, b_ids])
    all_pk = np.concatenate([np.arange(n_cand), np.arange(n_cand)])
    order_ix = np.argsort(all_did, kind="stable")
    did_sorted = all_did[order_ix]
    uniq_docs, first_ix = np.unique(did_sorted, return_index=True)
    slot_offs = np.append(first_ix, len(did_sorted)).astype(np.int64)

    # --- broadcast-index verify (round-4, the preferred path): the
    # exchange verify below replicates every candidate doc's gram rows
    # once PER PAIR SLOT (≈ 2·n_cand·avg_set rows — 60M at the sf0.1
    # bench, and its sort dominated the operator at ~45 of 52 s).  When
    # the candidate docs' DISTINCT gram rows (≤ |cand docs|·avg_set —
    # replication-free, bounded by the gram table itself) fit a plasma
    # broadcast, gather just those rows, ``ray.put`` one CSR doc→grams
    # index, and verify candidate-pair batches in-task: each pair's full
    # gram sets come from the broadcast, so groups are complete by
    # construction (the hazard that forbids fusing the EXCHANGE count —
    # Ray splitting oversized map outputs — cannot arise) and the count
    # kernel is the same lexsort/run-of-2 math.  Above the budget (e.g.
    # crawl-scale: 1M pairs × 200-gram docs ⇒ 400M rows) the exchange
    # path below runs unchanged.
    avg_set = g_rows / max(1, num_rows) if num_rows else 64.0
    est_cand_gram_rows = int(len(uniq_docs) * max(1.0, avg_set))
    use_broadcast = est_cand_gram_rows <= verify_broadcast_rows
    if use_broadcast and gt_all is not None:
        # Local path: the whole gram table is already driver-side
        # (bounded by ``local_rows``) — filter the candidate docs' rows
        # in-process instead of paying a pick_rows dataset execution.
        from ._buckets import sorted_lookup

        did_v = gt_all["did"].to_numpy()
        valid, _ = sorted_lookup(did_v, uniq_docs)
        picked = (
            [
                pa.table(
                    {
                        "did": pa.array(did_v[valid]),
                        "gram": pa.array(gt_all["gram"].to_numpy()[valid]),
                    }
                )
            ]
            if valid.any()
            else []
        )
    elif use_broadcast:
        docs_ref = _ray.put(uniq_docs)

        def pick_rows(batch: pa.Table) -> pa.Table:
            from ._buckets import sorted_lookup

            uniq = _get_broadcast(docs_ref)
            did = batch["did"].to_numpy()
            valid, _ = sorted_lookup(did, uniq)
            return pa.table(
                {
                    "did": pa.array(did[valid]),
                    "gram": pa.array(batch["gram"].to_numpy()[valid]),
                }
            )

        # The gate above is an ESTIMATE from the corpus-wide average set
        # size; candidate docs can be arbitrarily longer than average
        # (review finding: short-doc corpus, boilerplate candidates).
        # Stream the gather with a hard row cap and abort to the
        # exchange path the moment it is exceeded — never materialize an
        # unbounded table on the driver.
        cap = 2 * verify_broadcast_rows
        picked: list[pa.Table] = []
        picked_rows = 0
        for b in grams_raw.map_batches(
            pick_rows, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            if not b.num_rows:
                continue
            picked.append(b)
            picked_rows += b.num_rows
            if picked_rows > cap:
                use_broadcast = False
                picked = []
                break
    if use_broadcast:
        if picked:
            gt = pa.concat_tables(picked)
            did_all = gt["did"].to_numpy()
            gram_all = gt["gram"].to_numpy()
            gorder = np.lexsort((gram_all, did_all))
            did_all, gram_all = did_all[gorder], gram_all[gorder]
        else:
            did_all = np.zeros(0, np.int64)
            gram_all = np.zeros(0, np.int64)
        csr_offs = np.append(
            np.searchsorted(did_all, uniq_docs), len(did_all)
        ).astype(np.int64)

        import ray.data as _rd

        if gt_all is not None and n_cand <= 50_000:
            # Local + small pair set: verify ALL pairs in-process — the
            # whole jaccard join then costs exactly ONE dataset
            # execution (the grams materialize).  Past 50k pairs the
            # task pool below parallelizes the expansion instead.
            return _rd.from_arrow(
                _verify_pairs_csr(
                    uniq_docs, csr_offs, gram_all, a_ids, b_ids, t_x1000
                )
            )
        csr_ref = _ray.put((uniq_docs, csr_offs, gram_all))

        pairs_ds = _rd.from_arrow(cand_tbl)
        blocks = max(1, min(256, math.ceil(n_cand / 50_000)))
        if blocks > 1:
            pairs_ds = pairs_ds.repartition(blocks)

        def verify_batch(batch: pa.Table) -> pa.Table:
            docs, offs, grams_v = _get_broadcast(csr_ref)
            return _verify_pairs_csr(
                docs,
                offs,
                grams_v,
                batch["id_a"].to_numpy(),
                batch["id_b"].to_numpy(),
                t_x1000,
            )

        return pairs_ds.map_batches(
            verify_batch, batch_format="pyarrow", batch_size=8192
        )

    index_ref = _ray.put((uniq_docs, slot_offs, all_pk[order_ix]))

    # The expansion carries ONLY (pk, gram) — 16 B/row.  Neither a side
    # flag nor the set size is needed: per-doc grams are DISTINCT (the
    # tokenize pass dedups), so a (pk, gram) run has at most one row per
    # side — run length 2 ⟺ intersection element — and the total rows
    # of a pair are exactly |A| + |B|, giving union = rows − inter.
    def emit_pair_grams(batch: pa.Table) -> pa.Table:
        from ._buckets import sorted_lookup

        uniq, offs, pk_arr = _ray.get(index_ref)
        did = batch["did"].to_numpy()
        valid, pos = sorted_lookup(did, uniq)
        if not valid.any():
            return pa.table(
                {
                    "pk": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.int64()),
                }
            )
        pos = pos[valid]
        cnt = offs[pos + 1] - offs[pos]  # pair slots per gram row
        total = int(cnt.sum())
        # slot index for every replicated row: offs[pos] + within-run rank
        starts = np.repeat(offs[pos], cnt)
        run0 = np.repeat(np.cumsum(cnt) - cnt, cnt)
        slot = starts + (np.arange(total) - run0)
        return pa.table(
            {
                "pk": pa.array(pk_arr[slot].astype(np.int64)),
                "gram": pa.array(
                    np.repeat(batch["gram"].to_numpy()[valid], cnt)
                ),
            }
        )

    def add_pk_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_kb", pa.array(hash_buckets(batch["pk"].to_numpy(), n_buckets))
        )

    def count_pairs(group: pa.Table) -> pa.Table:
        pk = group["pk"].to_numpy()
        gram = group["gram"].to_numpy()
        order_ix = np.lexsort((gram, pk))
        pk, gram = pk[order_ix], gram[order_ix]
        # runs of identical (pk, gram): length 2 ⟺ both sides hold the
        # gram (per-doc grams are distinct) ⟺ one intersection element.
        new_run = np.ones(len(pk), dtype=bool)
        new_run[1:] = (pk[1:] != pk[:-1]) | (gram[1:] != gram[:-1])
        run_id = np.cumsum(new_run) - 1
        n_runs = int(run_id[-1]) + 1 if len(run_id) else 0
        run_len = np.bincount(run_id, minlength=n_runs)
        upk, pk_local = np.unique(pk, return_inverse=True)
        upk_of_run = pk_local[new_run]
        inter = np.bincount(
            upk_of_run[run_len == 2], minlength=len(upk)
        ).astype(np.int64)
        total = np.bincount(pk_local, minlength=len(upk)).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(upk),
                "inter_n": pa.array(inter),
                # total rows per pair = |A| + |B| ⇒ union = total − inter
                "union_n": pa.array(total - inter),
            }
        )

    # Verify reads the RAW materialized gram table — it needs only
    # (did, gram, set_sz), so consuming the freq-attached stream here
    # would re-run the whole freq-order sort exchange a second time
    # (round-4 fix: the verify execution's plan previously re-derived
    # attach_freq from the materialized grams).
    # The expansion multiplies each candidate doc's gram rows by its
    # pair-slot count — on dense candidate sets it is the largest table
    # in the operator (≈ 2 · n_cand · avg_set_size rows), so (a) its
    # input must have enough blocks to expand in parallel (the local
    # candidate path coalesced grams to ONE block, which would serialize
    # it), and (b) the pair-bucket exchange is NOT skippable even on a
    # single input block: Ray splits oversized map outputs into multiple
    # blocks mid-stream, so a fused whole-batch count would see partial
    # pair groups and undercount intersections (observed: 25 → 12 rows).
    exp_rows = int(2 * n_cand * max(1.0, avg_set))  # avg_set from the fork above
    verify_blk = max(1, min(1024, math.ceil(exp_rows / 500_000)))
    verify_src = grams_raw
    nb = grams_raw.num_blocks()
    if verify_blk > 2 * nb or 2 * verify_blk < nb:
        verify_src = grams_raw.repartition(verify_blk)
    counted = (
        verify_src.map_batches(
            emit_pair_grams, batch_format="pyarrow", batch_size=None
        )
        .map_batches(add_pk_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_kb")
        .map_groups(count_pairs, batch_format="pyarrow")
    )
    ids_ref = _ray.put((a_ids, b_ids))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "inter_n": pa.array([], pa.int64()),
                    "union_n": pa.array([], pa.int64()),
                    "jac_x1000": pa.array([], pa.int64()),
                }
            )
        aa, bb = _ray.get(ids_ref)
        pk = batch["pk"].to_numpy()
        inter = batch["inter_n"].to_numpy().astype(np.int64)
        union = batch["union_n"].to_numpy().astype(np.int64)
        keep = inter * 1000 >= t_x1000 * union
        jac = np.zeros(len(inter), dtype=np.int64)
        nz = union > 0
        jac[nz] = (1000 * inter[nz]) // union[nz]
        return pa.table(
            {
                "id_a": pa.array(aa[pk[keep]]),
                "id_b": pa.array(bb[pk[keep]]),
                "inter_n": pa.array(inter[keep]),
                "union_n": pa.array(union[keep]),
                "jac_x1000": pa.array(jac[keep]),
            }
        )

    out = counted.map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )
    # The bucketed exchange leaves 0-row schema-less blocks for empty
    # partitions, and map_batches never calls ``finish`` on them (see
    # functions/_schema.py) — heal so downstream joins/writes are safe.
    # The pairs stream is compact (≤ max_candidates rows) by construction.
    return stabilize_schema(
        out,
        pa.schema(
            [
                ("id_a", pa.int64()),
                ("id_b", pa.int64()),
                ("inter_n", pa.int64()),
                ("union_n", pa.int64()),
                ("jac_x1000", pa.int64()),
            ]
        ),
    )


def decontaminate(
    ds,
    probe_texts,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    mode: str = "flag",
):
    """Test-set decontamination: mark (or drop) documents sharing any word
    n-gram with a probe/benchmark corpus — the standard leakage guard in
    front of LLM training data.

    Scale shape: the probe side is small by definition (benchmarks are
    KBs–MBs); its distinct gram hashes are computed driver-side, sorted,
    and broadcast once via ``ray.put`` (read zero-copy per worker). The
    corpus side is one stateless ``map_batches`` pass — vectorized
    shingle hashing off Arrow buffers + ``np.searchsorted`` membership —
    with NO shuffle. 10¹² docs stream through at map speed.

    ``mode="flag"`` appends ``contaminated: bool`` + ``n_hits: int64``
    (matched distinct grams); ``mode="drop"`` keeps only clean rows.
    """
    import ray

    # Strict grams on the probe side too: a probe shorter than n tokens
    # contributes nothing (matching the corpus convention and the SQL
    # oracle) instead of _shingle_hashes' token-hash fallback.
    ph, _pd = strict_ngram_hashes(list(probe_texts), n)
    probes = np.unique(ph)
    probes_ref = ray.put(probes)

    def check(batch: pa.Table) -> pa.Table:
        pr = _get_broadcast(probes_ref)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = batch.num_rows
        g, doc_of = strict_ngram_hashes(texts, n)
        # membership via searchsorted on the sorted broadcast set
        if len(pr) and len(g):
            pos = np.searchsorted(pr, g)
            hit = (pos < len(pr)) & (pr[np.minimum(pos, len(pr) - 1)] == g)
        else:
            hit = np.zeros(len(g), dtype=bool)
        # distinct matched grams per doc
        if hit.any():
            hg, hd = g[hit], doc_of[hit]
            order = np.lexsort((hg, hd))
            hg, hd = hg[order], hd[order]
            first = np.ones(len(hg), dtype=bool)
            first[1:] = (hg[1:] != hg[:-1]) | (hd[1:] != hd[:-1])
            n_hits = np.bincount(hd[first], minlength=n_docs).astype(np.int64)
        else:
            n_hits = np.zeros(n_docs, dtype=np.int64)
        if mode == "drop":
            take = pa.array(np.nonzero(n_hits == 0)[0].astype(np.int64))
            return batch.take(take)
        batch = batch.append_column(
            "contaminated", pa.array(n_hits > 0)
        )
        return batch.append_column("n_hits", pa.array(n_hits))

    return ds.map_batches(check, batch_format="pyarrow", batch_size=None)


def _get_broadcast(ref):
    """Per-process cache for ray.put broadcasts (fetch once per worker).

    FIFO-bounded: iterative operators (pagerank, classifier) put a fresh
    node-sized array per pass, and an unbounded cache would retain every
    pass's array in every worker for the process lifetime. Hits stay a
    single dict get (no recency bookkeeping on the per-batch hot path);
    insertion-order eviction matches the sequential-refs access pattern,
    and an evicted ref just re-fetches from the object store."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _BROADCAST_CACHE.get(key)
    if hit is None:
        import ray

        hit = ray.get(ref)
        _BROADCAST_CACHE[key] = hit
        while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    return hit


_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_MAX = 8


# --- incremental (snapshot) dedup via a distributed Bloom filter -----------


def bloom_build(ds, key_col: str = "text", m_bits: int = 1 << 26, k: int = 7):
    """Build a Bloom filter over ``key_col`` of a reference corpus — the
    bounded-memory side of incremental dedup (dedupe THIS crawl against
    LAST crawl without ever reshuffling the old corpus).

    Distributed shape: one stateless map hashes each block's keys
    (``poly_hash_strings``), derives the k probe-bit positions by double
    hashing (h2 forced odd so every probe stride is invertible mod the
    power-of-two ``m_bits``), and pre-aggregates with ``np.unique`` so
    the exchange carries DISTINCT bit positions per block, never one row
    per key occurrence.  Positions then hash-range-bucket into
    ``groupby().map_groups`` slice builders: each group OR-builds its
    fixed 512 KiB slice of the bitmap, and the driver gathers exactly
    ``m_bits/8`` bytes total (plus empty-slice zero fill) regardless of
    corpus size.  Returns a ``np.uint64[m_bits/64]`` bitmap.

    Memory bound is the point: the broadcast is always ``m_bits/8``
    bytes, unlike ``decontaminate``'s exact hash-set broadcast which
    grows with the reference's distinct cardinality.  (Sibling:
    ``state.BloomFilter`` is the DRIVER-side build for small key sets
    already gathered — the shuffle-join semi-join pushdown; this
    function is the distributed build that never gathers keys.)  The trade is a
    false-positive rate of ``(1 - e^(-k·n/m))^k`` — size ``m_bits`` to
    ~10 bits/key for ~1% FP and pick ``mode='flag'`` downstream when a
    human gate reviews drops.
    """
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    slice_bits = min(m_bits, 1 << 22)
    n_slices = m_bits // slice_bits

    def positions(batch: pa.Table) -> pa.Table:
        h = poly_hash_strings(batch[key_col])
        pos = _bloom_positions(h, m_bits, k)
        u = np.unique(pos)
        return pa.table(
            {
                "_sl": pa.array((u // slice_bits).astype(np.int64)),
                "pos": pa.array(u.astype(np.int64)),
            }
        )

    def build_slice(group: pa.Table) -> pa.Table:
        sl = int(group["_sl"][0].as_py())
        rel = group["pos"].to_numpy() - sl * slice_bits
        words = np.zeros(slice_bits // 64, dtype=np.uint64)
        np.bitwise_or.at(
            words, rel >> 6, np.uint64(1) << (rel & 63).astype(np.uint64)
        )
        return pa.table(
            {"_sl": pa.array([sl], pa.int64()),
             "bits": pa.array([words.tobytes()], pa.binary())}
        )

    rows = (
        ds.map_batches(positions, batch_format="pyarrow", batch_size=None)
        .groupby("_sl")
        .map_groups(build_slice, batch_format="pyarrow")
        .take_all()
    )
    bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
    wps = slice_bits // 64
    for r in rows:
        sl = r["_sl"]
        bitmap[sl * wps : (sl + 1) * wps] = np.frombuffer(
            r["bits"], dtype=np.uint64
        )
    return bitmap


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k probe-bit positions per hash, double hashing, shape (len(h)*k,)."""
    h = h.astype(np.uint64)
    with np.errstate(over="ignore"):
        h2 = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h2 |= np.uint64(1)  # odd stride: all k probes distinct mod 2^b
        i = np.arange(k, dtype=np.uint64)
        pos = (h[:, None] + i[None, :] * h2[:, None]) & np.uint64(m_bits - 1)
    return pos.reshape(-1)


def bloom_dedup_against(
    ds_new,
    bitmap: np.ndarray,
    key_col: str = "text",
    k: int = 7,
    mode: str = "flag",
):
    """Filter (or flag) rows of a NEW shard whose key is (probably)
    already present in the reference corpus summarized by ``bitmap``
    (from :func:`bloom_build`).  One stateless map — the bitmap is
    ``ray.put`` once and fetched once per worker process
    (``_get_broadcast``); membership is k vectorized gathers + an
    AND-reduce, no shuffle, no contact with the old corpus.

    Bloom guarantees NO false negatives: every true duplicate is caught.
    False positives drop/flag a fresh row at the documented rate;
    ``mode='flag'`` appends ``maybe_dup: bool`` instead of dropping so a
    downstream exact check (or a human gate) can arbitrate.
    """
    import ray as _ray

    m_bits = len(bitmap) * 64
    assert m_bits & (m_bits - 1) == 0
    ref = _ray.put(bitmap)

    def check(batch: pa.Table) -> pa.Table:
        bm = _get_broadcast(ref)
        h = poly_hash_strings(batch[key_col])
        if not len(h):
            hit_all = np.zeros(0, dtype=bool)
        else:
            pos = _bloom_positions(h, m_bits, k).reshape(len(h), k)
            bits = (bm[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
            hit_all = bits.all(axis=1)
        if mode == "drop":
            return batch.filter(pa.array(~hit_all))
        return batch.append_column("maybe_dup", pa.array(hit_all))

    return ds_new.map_batches(check, batch_format="pyarrow", batch_size=None)


# --- exact duplicated-substring (window-span) removal -----------------------

_SPAN_MULT = np.uint64(0x100000001B3)  # FNV prime as rolling combiner


def _space_window_hashes(txt, n: int):
    """Shared kernel for duplicated-span dedup: split on single spaces
    (string_split SQL parity — empty tokens kept), hash every token with
    ``poly_hash_strings``, and roll an n-token window combine.  Returns
    (token_list_array, rel_offsets, flat_tokens, window_hashes,
    window_start_global_ix) with windows never crossing a doc boundary.
    """
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lists = pc.split_pattern(txt, " ")
    offs = lists.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    flat = lists.flatten()
    th = poly_hash_strings(flat)
    m = len(th)
    per_row = np.diff(offs)
    doc_of = np.repeat(np.arange(len(txt)), per_row)
    if m >= n:
        with np.errstate(over="ignore"):
            acc = th[: m - n + 1].copy()
            for k in range(1, n):
                acc = acc * _SPAN_MULT + th[k : m - n + 1 + k]
        valid = doc_of[: m - n + 1] == doc_of[n - 1 :]
        wh = acc[valid]
        wstart = np.arange(m - n + 1, dtype=np.int64)[valid]
    else:
        wh = np.zeros(0, dtype=np.uint64)
        wstart = np.zeros(0, dtype=np.int64)
    return lists, offs, flat, wh, wstart


def duplicated_span_strip(
    ds, text_col: str = "text", n: int = 6, min_count: int = 2
):
    """Exact duplicated-substring removal (the corpus-level span dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", 2022 — re-expressed over word windows instead of a suffix
    array): delete every token covered by ANY word n-gram window that
    occurs ≥ ``min_count`` times across the corpus, keep the rest in
    order.

    Same two-pass shape as ``web.line_dedup`` but at window granularity:

    1. count: per-block window hashes (one ``poly_hash_strings`` pass +
       n−1 vectorized rolling combines), per-block ``np.unique``
       pre-aggregation, one tiny groupby-sum exchange; hashes with a
       global count ≥ ``min_count`` are gathered sorted and broadcast.
       Unlike line counts, window counts barely compress per block (most
       windows are unique), so the exchange is O(tokens) rows of 16 B —
       the honest cost of exact substring dedup; the suffix-array
       original pays O(total bytes × ~8) of single-node RAM instead.
       At crawl scale, shard pass 1 by window-hash range (run R
       independent count+strip passes, each over hashes ≡ r mod R) to
       bound both the exchange and the broadcast.
    2. strip: a stateless map recomputes each doc's window hashes, marks
       duplicated window STARTS via ``np.searchsorted`` against the
       broadcast set, expands starts to covered token spans with one
       ±1-delta cumsum (spans never cross docs, so the deltas cancel at
       boundaries), and rebuilds the surviving tokens through the shared
       ListArray/binary_join path.

    64-bit window hashing: a collision cuts an innocent span (same
    documented trade as ``line_dedup``).  Appends ``n_tok_kept`` /
    ``n_tok_dropped`` and replaces ``text_col``.
    """
    import ray as _ray

    def counts(batch: pa.Table) -> pa.Table:
        _, _, _, wh, _ = _space_window_hashes(batch[text_col], n)
        uniq, cnt = np.unique(wh, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq.view(np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    from ._buckets import bucketed_sum, budgeted_sum_single_key

    # Budget-gated final sum (the _find_hot_keys idiom): under the cap
    # the global window count is a driver np.unique/np.add.at; past it
    # (distinct windows ≈ corpus token count at crawl scale) one
    # hash-bucketed exchange runs, re-executing the count pass once.
    res = budgeted_sum_single_key(
        lambda: ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
        "h",
        "c",
    )
    if res is not None:
        uk, sums = res
        dup = uk[sums >= min_count]  # np.unique output is sorted
    else:
        agg = bucketed_sum(
            ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
            ["h"],
            ["c"],
            pa.schema([("h", pa.int64()), ("c", pa.int64())]),
        )

        def only_dups(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({"h": pa.array([], pa.int64())})
            return pa.table(
                {
                    "h": batch["h"].filter(
                        pc.greater_equal(batch["c"], min_count)
                    )
                }
            )

        from ._schema import concat_blocks

        dup_tbl = concat_blocks(
            agg.map_batches(only_dups, batch_format="pyarrow", batch_size=None),
            pa.schema([("h", pa.int64())]),
        )
        dup = np.sort(
            dup_tbl["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
    dup_ref = _ray.put(dup)

    def strip(batch: pa.Table) -> pa.Table:
        dup_s = _get_broadcast(dup_ref)
        lists, offs, flat, wh, wstart = _space_window_hashes(
            batch[text_col], n
        )
        m = len(flat)
        whs = wh.view(np.int64)
        from ._buckets import sorted_lookup

        is_dup, _ = sorted_lookup(whs, dup_s)
        starts = wstart[is_dup]
        delta = np.zeros(m + 1, dtype=np.int64)
        np.add.at(delta, starts, 1)
        np.add.at(delta, starts + n, -1)
        keep = np.cumsum(delta[:-1]) == 0
        n_rows = batch.num_rows
        per_row = np.diff(offs)
        row_of = np.repeat(np.arange(n_rows), per_row)
        kept_per = np.bincount(row_of[keep], minlength=n_rows)
        new_offs = np.concatenate([[0], np.cumsum(kept_per)]).astype(
            np.int32
        )
        new_list = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep))
        )
        ix = batch.schema.get_field_index(text_col)
        out = batch.set_column(ix, text_col, pc.binary_join(new_list, " "))
        out = out.append_column(
            "n_tok_kept", pa.array(kept_per.astype(np.int64))
        )
        return out.append_column(
            "n_tok_dropped",
            pa.array((per_row - kept_per).astype(np.int64)),
        )

    return ds.map_batches(strip, batch_format="pyarrow", batch_size=None)
