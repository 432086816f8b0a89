"""Web-corpus curation operators: URL canonicalization/dedup, PII
scrubbing, intra-document repetition scoring, and deterministic sequence
packing.

These are the crawl-side companions to the corpus-level dedup family in
``dedup.py`` — the operators a Common-Crawl-style pages pipeline runs
BEFORE (url dedup, PII) and AFTER (repetition gates, packing) content
dedup.  Reference corpus (empty at survey time — SURVEY.md §0) has no
web operators; these are LLM-data-pipeline additions with DuckDB oracle
parity: every kernel is an RE2/arithmetic transformation expressible
identically in SQL, so the whole module is oracle-checked end to end
(queries.q_url_dedup / q_webtext_quality).

Tokenizer-parity scope: the Arrow kernels split on ANY whitespace
(``utf8_split_whitespace``), the SQL oracles on single spaces
(``string_split(text, ' ')``) — identical exactly on single-spaced
text, which the driver's synthetic corpus is by construction; a canary
test (tests/test_oracle_sql.py::test_testdata_is_single_spaced) fails
loudly if that assumption ever stops holding, at which point the
oracles must switch to ``regexp_split_to_array(text, '\\s+')`` with
empty-token filtering (the pattern oracle_sql.neardup_pairs_sql already
uses).

Scale notes:

- URL canonicalization is map-only (Arrow RE2 kernels, zero Python per
  row).  URL dedup is ONE hash-bucketed exchange over
  (canonical_url, id) — the same derived-bucket pattern as exact_dedup.
- PII scrub/count is map-only (count_substring_regex +
  replace_substring_regex on the Arrow string buffers).
- Repetition scoring is map-only: one pass of the shared word-n-gram
  rolling hasher per batch, per-doc distinct counting via lexsort.
- Sequence packing is a windowed cumulative sum (bin = running corpus
  size before the doc, within its language, divided by the budget).  A
  per-language group would be unboundedly skewed at crawl scale (one
  lang can be most of the corpus), so it runs as the standard two-phase
  distributed prefix sum: (1) tiny per-(lang, id-chunk) partial sums are
  gathered driver-side (one row per chunk, NOT per doc) and turned into
  chunk prefix offsets; (2) one hash-bucketed exchange co-locates each
  (lang, chunk) — bounded by chunk_rows — and a vectorized kernel adds
  the broadcast offset to the in-chunk cumsum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# One (pattern, replacement) chain applied IN ORDER to the lowercased
# URL.  Kept to RE2 features that Arrow's replace_substring_regex and
# DuckDB's regexp_replace(..., 'g') execute identically — this list is
# the single source of truth; queries.SQL_URL_DEDUP re-emits it as SQL.
URL_CANON_RULES: tuple[tuple[str, str], ...] = (
    (r"^http://", "https://"),          # protocol-relative duplicates
    (r"://www\.", "://"),               # www. host alias
    (r"#.*$", ""),                      # fragment never reaches a server
    (r"([?&])(utm_[a-z]+|fbclid|ref)=[^&]*", r"\1"),  # tracking params
    (r"\?&+", "?"),                     # separator cleanup after removal
    (r"&&+", "&"),
    (r"[?&]$", ""),
    (r"/$", ""),                        # trailing slash
)


def canonicalize_urls(url: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized URL canonicalization (Arrow RE2, no Python per row)."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    out = pc.utf8_lower(url)
    for pat, rep in URL_CANON_RULES:
        out = pc.replace_substring_regex(out, pat, rep)
    return out


def url_dedup(ds, url_col: str = "url", id_col: str = "doc_id",
              num_rows: int | None = None):
    """Keep ONE row per canonical URL — the max ``id_col`` (latest crawl
    wins under monotonic ids) — plus the duplicate count.

    Returns (url, {id_col}, n_dups).  One hash-bucketed exchange over
    (canonical_url, id); the canonicalization itself fuses into the
    upstream map.
    """
    from ._buckets import derive_buckets, hash_buckets
    from .dedup import poly_hash_strings

    n_buckets = derive_buckets(num_rows)

    def canon(batch: pa.Table) -> pa.Table:
        url = canonicalize_urls(batch[url_col])
        t = pa.table(
            {"url": url, id_col: batch[id_col]}
        )
        return t.append_column(
            "_ub", pa.array(hash_buckets(poly_hash_strings(url), n_buckets))
        )

    def keep_latest(group: pa.Table) -> pa.Table:
        # Arrow-native exact grouping (collision-free full-key compare in
        # C++, same idiom as exact_dedup); select aggregate columns by
        # their deterministic generated names, never by position.
        agg = group.group_by("url").aggregate(
            [(id_col, "max"), ([], "count_all")]
        )
        return pa.table(
            {
                "url": agg["url"],
                id_col: pc.cast(agg[f"{id_col}_max"], pa.int64()),
                "n_dups": pc.cast(agg["count_all"], pa.int64()),
            }
        )

    return (
        ds.map_batches(canon, batch_format="pyarrow", batch_size=None)
        .groupby("_ub")
        .map_groups(keep_latest, batch_format="pyarrow")
    )


# RE2 patterns shared verbatim with the SQL oracle.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_scrub_batch(
    texts: pa.ChunkedArray | pa.Array, replacement: str = "[PII]"
) -> tuple[pa.Array, pa.Array, pa.Array]:
    """(n_emails, n_phones, scrubbed_text) per row — all Arrow RE2."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_email = pc.count_substring_regex(texts, EMAIL_RE)
    n_phone = pc.count_substring_regex(texts, PHONE_RE)
    scrubbed = pc.replace_substring_regex(
        pc.replace_substring_regex(texts, EMAIL_RE, replacement),
        PHONE_RE,
        replacement,
    )
    return (
        pc.cast(n_email, pa.int64()),
        pc.cast(n_phone, pa.int64()),
        scrubbed,
    )


def repetition_x1000_batch(
    texts: pa.ChunkedArray | pa.Array, n: int = 2
) -> pa.Array:
    """Per-doc duplicate word-n-gram fraction ×1000 (Gopher-style
    repetition gate): 1000·(total − distinct)//total, 0 when a doc has
    no n-gram.  One pass of the shared rolling hasher, distinct counted
    via lexsort — no Python loop over rows or grams."""
    from .dedup import strict_ngram_hashes

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    h, doc_of = strict_ngram_hashes(texts, n)
    total = np.bincount(doc_of, minlength=len(texts)).astype(np.int64)
    order = np.lexsort((h, doc_of))
    hs, ds_ = h[order], doc_of[order]
    first = np.ones(len(hs), dtype=bool)
    first[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
    distinct = np.bincount(ds_[first], minlength=len(texts)).astype(np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    nz = total > 0
    out[nz] = 1000 * (total[nz] - distinct[nz]) // total[nz]
    return pa.array(out, pa.int64())


# Minimal main-content extraction: strip tags, then unescape the basic
# entities.  Order matters — entities must be decoded AFTER tag removal
# so '&lt;p&gt;' in content cannot create a phantom tag.
_HTML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&amp;", "&"))


def html_text_batch(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """HTML → text extraction (crawl E1 inverse): one RE2 tag-strip pass
    plus fixed entity substitutions, all Arrow C++ kernels.  The sandbox
    corpus wraps text losslessly, so extraction must be byte-exact; a
    real-crawl extractor would add boilerplate heuristics on top of this
    same vectorized skeleton."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        html = html.cast(pa.string())
    out = pc.replace_substring_regex(html, r"<[^>]*>", "")
    for ent, ch in _HTML_ENTITIES:
        out = pc.replace_substring(out, ent, ch)
    return out


def _floor_log2(ratio: np.ndarray) -> np.ndarray:
    """Exact vectorized floor(log2(k)) for k >= 1 — integer shift loop
    (bit_length - 1); a float-exponent path would round k within
    half-ulp below 2^j up.  ONE definition shared by the unigram and
    bigram Shannon-code kernels so the SQL parity cannot drift
    (round-4 review)."""
    code_len = np.zeros(len(ratio), dtype=np.int64)
    r = np.asarray(ratio).copy()
    while np.any(r > 1):
        big = r > 1
        r[big] >>= 1
        code_len[big] += 1
    return code_len


def unigram_code_lengths(ds, text_col: str = "text", model_ds=None):
    """Corpus-derived unigram "language model" for quality scoring:
    returns ``(vocab_hashes_sorted, code_len, total_tokens)`` where
    ``code_len[i] = floor(log2(total_tokens / freq_i))`` — the integer
    Shannon code length of token i under the corpus unigram
    distribution.  Computed exactly with integer division + bit_length,
    so Ray and the SQL oracle (``printf('%b', ...)``) agree bit for bit
    (no float log anywhere).

    One counting pass (per-block token-hash value counts) + a tiny
    groupby-sum; the merged vocabulary is gathered driver-side for
    broadcast AS ARROW BLOCKS (column concat — never ``take_all()``
    row dicts).  At crawl scale a natural-language vocabulary is
    O(100M) entries (~1.6 GB as two int64 arrays) — large but broadcast-
    viable via ray.put; beyond that, the budget-gated sharded scorer
    (:func:`unigram_bits_sharded`) keeps the vocab distributed and
    never gathers it.
    """
    from ._schema import concat_blocks

    if model_ds is None:
        model_ds = unigram_model_ds(ds, text_col)
    tbl = concat_blocks(model_ds, _UNI_MODEL_SCHEMA)
    vocab = tbl["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    freq = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vocab)
    vocab, freq = vocab[order], freq[order]
    total = int(freq.sum())
    ratio = total // freq  # >= 1
    return vocab, _floor_log2(ratio), total


_UNI_MODEL_SCHEMA = pa.schema([("h", pa.int64()), ("n", pa.int64())])
_BG_MODEL_SCHEMA = pa.schema(
    [("bg", pa.int64()), ("ctx", pa.int64()), ("n", pa.int64())]
)


def unigram_model_ds(ds, text_col: str = "text"):
    """Distributed unigram model: materialized Dataset (h, n) of token
    hash → corpus frequency — per-block value-count partials + ONE
    hash-keyed groupby-sum.  Shared by the broadcast gather
    (:func:`unigram_code_lengths`) and the sharded scorer.  The
    vocabulary-scale exchange is hash-bucketed (``bucketed_sum``) — a
    native key-sorted groupby over a crawl-scale vocab pays the ~15x
    sort constant the round-5 PageRank rework measured."""
    from ._buckets import bucketed_sum
    from .dedup import _token_hash_batch

    def counts(batch: pa.Table) -> pa.Table:
        h, _ = _token_hash_batch(batch[text_col])
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq.view(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    return bucketed_sum(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
        ["h"],
        ["n"],
        _UNI_MODEL_SCHEMA,
    ).materialize()


def surprisal_batch(
    texts: pa.ChunkedArray | pa.Array,
    vocab: np.ndarray,
    code_len: np.ndarray,
) -> tuple[pa.Array, pa.Array]:
    """(n_tokens, surprisal_bits) per row: sum of the broadcast unigram
    code lengths over the doc's tokens.  Tokens absent from the vocab
    (never happens when the model was built on the same corpus) count 0
    bits."""
    from .dedup import _token_hash_batch

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    h, offsets = _token_hash_batch(texts)
    n_tok = np.diff(offsets).astype(np.int64)
    doc_of = np.repeat(np.arange(len(texts)), n_tok)
    pos = np.searchsorted(vocab, h.view(np.int64))
    pos[pos >= len(vocab)] = 0
    hit = vocab[pos] == h.view(np.int64) if len(vocab) else np.zeros(
        len(h), bool
    )
    bits = np.zeros(len(h), dtype=np.int64)
    bits[hit] = code_len[pos[hit]]
    out = np.zeros(len(texts), dtype=np.int64)
    np.add.at(out, doc_of, bits)
    return pa.array(n_tok, pa.int64()), pa.array(out, pa.int64())


# Odd multiplier (FNV-64 prime) combining adjacent token hashes into a
# bigram key — shared with dedup's window roller so collision analysis
# covers both.
_BIGRAM_MULT = np.uint64(0x100000001B3)


def _bigram_hashes_batch(
    texts: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ctx_hash, bigram_hash, doc_of) over every in-document adjacent
    token pair of the batch — the bigram stream both the counting pass
    and the scoring pass share.  Token stream and hashes come from the
    same ``_token_hash_batch`` the unigram model uses (whitespace split,
    empty tokens dropped), so the two models see identical tokens."""
    from .dedup import _token_hash_batch

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    h, offsets = _token_hash_batch(texts)
    n_tok = np.diff(offsets).astype(np.int64)
    doc_of = np.repeat(np.arange(len(texts)), n_tok)
    if len(h) < 2:
        z = np.zeros(0, dtype=np.uint64)
        return z, z.copy(), np.zeros(0, dtype=np.int64)
    valid = doc_of[:-1] == doc_of[1:]
    ctx = h[:-1][valid]
    with np.errstate(over="ignore"):
        bg = ctx * _BIGRAM_MULT + h[1:][valid]
    return ctx, bg, doc_of[:-1][valid]


def bigram_code_lengths(ds, text_col: str = "text", model_ds=None):
    """Corpus bigram "language model" for perplexity-style quality
    scoring (the CCNet/KenLM filter idea one order up from
    :func:`unigram_code_lengths`): for each adjacent token pair (c, w)
    the integer Shannon code length of P(w|c) is
    ``floor(log2(count(c,·) // count(c,w)))`` — context occurrences
    over pair occurrences, exact integer division + bit_length, so the
    Ray kernel and the SQL oracle (``printf('%b')``) agree bit for bit.

    One counting pass: per-block ``np.unique`` over the bigram keys
    (each unique bigram determines its context, so the context hash
    rides along via the unique index), ONE small
    ``groupby(bg).sum`` exchange, then context totals are a numpy
    re-aggregation over the merged rows driver-side — no second
    exchange.  Returns ``(bigram_hashes_sorted, code_len)`` ready for
    broadcast; the gather is Arrow block concat, never ``take_all()``
    row dicts.  At crawl scale the bigram vocabulary is ~10× the
    unigram one — past the broadcast budget use
    :func:`bigram_bits_sharded`, which keeps the model distributed."""
    from ._schema import concat_blocks

    if model_ds is None:
        model_ds = bigram_model_ds(ds, text_col)
    tbl = concat_blocks(model_ds, _BG_MODEL_SCHEMA)
    bg = tbl["bg"].to_numpy(zero_copy_only=False).astype(np.int64)
    ctx = tbl["ctx"].to_numpy(zero_copy_only=False).astype(np.int64)
    f = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(bg)
    bg, ctx, f = bg[order], ctx[order], f[order]
    # Context totals: numpy re-aggregation over the merged vocabulary —
    # count(c,·) = Σ over bigrams sharing the context.
    cu, cinv = np.unique(ctx, return_inverse=True)
    cf = np.zeros(len(cu), dtype=np.int64)
    np.add.at(cf, cinv, f)
    ratio = cf[cinv] // f  # >= 1 by construction
    return bg, _floor_log2(ratio)


def bigram_model_ds(ds, text_col: str = "text"):
    """Distributed bigram model: materialized Dataset (bg, ctx, n).
    Grouped by the PAIR: ctx is functionally determined by bg (one
    bigram key = one (c, w) pair up to 64-bit collision — the same
    documented trade as every hash-keyed operator here), so grouping
    by (bg, ctx) is the same partition as bg alone but carries the
    context through the exchange for free.  Bucketed exchange, same
    rationale as :func:`unigram_model_ds` (bigram vocab is ~10x the
    unigram one)."""
    from ._buckets import bucketed_sum

    def counts(batch: pa.Table) -> pa.Table:
        ctx, bg, _ = _bigram_hashes_batch(batch[text_col])
        uniq, ix, cnt = np.unique(bg, return_index=True, return_counts=True)
        return pa.table(
            {
                "bg": pa.array(uniq.view(np.int64)),
                "ctx": pa.array(ctx[ix].view(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    return bucketed_sum(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
        ["bg", "ctx"],
        ["n"],
        _BG_MODEL_SCHEMA,
    ).materialize()


_LM_WIRE_SCHEMA = pa.schema(
    [
        ("k", pa.int8()),
        ("key", pa.int64()),
        ("ctx", pa.int64()),
        ("n", pa.int64()),
    ]
)


def lm_models_ds(ds, text_col: str = "text"):
    """Both LM models — unigram ``(h, n)`` and bigram ``(bg, ctx, n)``
    — from ONE tokenize pass and ONE bucketed exchange.

    :func:`unigram_model_ds` and :func:`bigram_model_ds` each tokenize
    the corpus in their own pass (two full text reads + two exchanges);
    since the bigram stream is derived from the same
    ``_token_hash_batch`` token hashes, one fused partial emits both
    models' rows, tagged by ``k`` and keyed ``(k, key, ctx)`` — ``ctx``
    rides the key because it is functionally determined by the bigram
    key and fixed 0 for unigram rows.  The combined model-sized result
    materializes once and splits by tag.  Row-equal to the two separate
    builders (pinned by tests/test_web.py); heavy-scale (240k docs):
    4.0 s + 1.6 s separate → one ~bigram-cost pass.
    """
    from ._buckets import bucketed_sum
    from .dedup import _token_hash_batch

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h, offsets = _token_hash_batch(texts)
        uh, ucnt = np.unique(h, return_counts=True)
        n_tok = np.diff(offsets).astype(np.int64)
        doc_of = np.repeat(np.arange(len(texts)), n_tok)
        if len(h) >= 2:
            valid = doc_of[:-1] == doc_of[1:]
            ctx = h[:-1][valid]
            with np.errstate(over="ignore"):
                bg = ctx * _BIGRAM_MULT + h[1:][valid]
            bu, bix, bcnt = np.unique(bg, return_index=True, return_counts=True)
            bctx = ctx[bix]
        else:
            bu = np.zeros(0, dtype=np.uint64)
            bcnt = np.zeros(0, dtype=np.int64)
            bctx = np.zeros(0, dtype=np.uint64)
        return pa.table(
            {
                "k": pa.array(
                    np.concatenate(
                        [np.zeros(len(uh), np.int8), np.ones(len(bu), np.int8)]
                    )
                ),
                "key": pa.array(
                    np.concatenate([uh, bu]).view(np.int64)
                ),
                "ctx": pa.array(
                    np.concatenate(
                        [np.zeros(len(uh), np.uint64), bctx]
                    ).view(np.int64)
                ),
                "n": pa.array(
                    np.concatenate(
                        [ucnt.astype(np.int64), bcnt.astype(np.int64)]
                    )
                ),
            }
        )

    combined = bucketed_sum(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
        ["k", "key", "ctx"],
        ["n"],
        _LM_WIRE_SCHEMA,
    ).materialize()

    def split_uni(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["k"], 0))
        return pa.table({"h": t["key"], "n": t["n"]}).cast(_UNI_MODEL_SCHEMA)

    def split_bg(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["k"], 1))
        return pa.table(
            {"bg": t["key"], "ctx": t["ctx"], "n": t["n"]}
        ).cast(_BG_MODEL_SCHEMA)

    # materialize each split so consumers (budget-gate counts, gathers,
    # sharded scorers) don't re-run the split map per use — same
    # contract as the separate builders, which returned materialized
    uni = combined.map_batches(
        split_uni, batch_format="pyarrow", batch_size=None
    ).materialize()
    bg = combined.map_batches(
        split_bg, batch_format="pyarrow", batch_size=None
    ).materialize()
    return uni, bg


def bigram_surprisal_batch(
    texts: pa.ChunkedArray | pa.Array,
    bg_vocab: np.ndarray,
    bg_code_len: np.ndarray,
) -> tuple[pa.Array, pa.Array]:
    """(n_bigrams, bigram_bits) per row: sum of the broadcast bigram
    code lengths over the doc's adjacent token pairs.  Pairs absent
    from the model (never happens when it was built on the same
    corpus) count 0 bits; docs with < 2 tokens score (0, 0)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    _, bg, doc_of = _bigram_hashes_batch(texts)
    bgs = bg.view(np.int64)
    n_bg = np.bincount(doc_of, minlength=len(texts)).astype(np.int64)
    bits_per = np.zeros(len(bgs), dtype=np.int64)
    if len(bg_vocab) and len(bgs):
        pos = np.searchsorted(bg_vocab, bgs)
        pos[pos >= len(bg_vocab)] = 0
        hit = bg_vocab[pos] == bgs
        bits_per[hit] = bg_code_len[pos[hit]]
    out = np.zeros(len(texts), dtype=np.int64)
    np.add.at(out, doc_of, bits_per)
    return pa.array(n_bg, pa.int64()), pa.array(out, pa.int64())


# ---------------------------------------------------------------------------
# Past-broadcast-budget surprisal scoring: the model stays DISTRIBUTED.
# ---------------------------------------------------------------------------

# Above this many model rows the (hashes, code_len) arrays stop
# broadcasting via ray.put and scoring switches to the hash-sharded
# exchange below.  8M rows ≈ 128 MB as two int64 arrays — the same
# budget class as dedup's verify_broadcast_rows.
VOCAB_BROADCAST_BUDGET = 8_000_000

# Wire schema of the sharded scoring exchange: kind 0 rows are corpus
# key occurrences (k=token/bigram hash, did=doc id, v=multiplicity),
# kind 1 rows are model entries (k=hash, v=integer code length).
_SC_WIRE = pa.schema(
    [
        ("_sh", pa.int32()),
        ("kind", pa.int8()),
        ("k", pa.int64()),
        ("did", pa.int64()),
        ("v", pa.int64()),
    ]
)

_BITS_PARTIAL_SCHEMA = pa.schema([("did", pa.int64()), ("v", pa.int64())])


def _score_bits_sharded(ds, id_col, keyer, model_wire, n_shards, out_col):
    """Shared engine of the sharded scorers: co-partition corpus key
    occurrences with the distributed model by key hash, score inside
    each shard with vectorized searchsorted, pre-aggregate bits per doc,
    then ONE doc-keyed groupby-sum.  Per-shard memory is
    O(model/shards + distinct-keys-per-shard); nothing model- or
    corpus-sized ever reaches the driver."""
    from ._buckets import hash_buckets
    from ._schema import stabilize_schema

    def occ_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            return _SC_WIRE.empty_table()
        keys, doc_of = keyer(batch)
        if not len(keys):
            return _SC_WIRE.empty_table()
        did = (
            batch[id_col]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[doc_of]
        )
        k = keys.view(np.int64)
        order = np.lexsort((did, k))
        k, did = k[order], did[order]
        new = np.r_[True, (k[1:] != k[:-1]) | (did[1:] != did[:-1])]
        starts = np.flatnonzero(new)
        m = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        ku = k[starts]
        return pa.Table.from_arrays(
            [
                pa.array(hash_buckets(ku, n_shards)),
                pa.array(np.zeros(len(ku), np.int8)),
                pa.array(ku),
                pa.array(did[starts]),
                pa.array(m),
            ],
            schema=_SC_WIRE,
        )

    occ = stabilize_schema(
        ds.map_batches(occ_rows, batch_format="pyarrow", batch_size=None),
        _SC_WIRE,
    )

    def score_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "kind" not in group.column_names:
            return _BITS_PARTIAL_SCHEMA.empty_table()
        kind = group["kind"].to_numpy(zero_copy_only=False)
        om = kind == 0
        if not om.any():
            return _BITS_PARTIAL_SCHEMA.empty_table()
        k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        mk, mv = k[~om], v[~om]
        morder = np.argsort(mk)
        mk, mv = mk[morder], mv[morder]
        ok, odid, omult = k[om], group["did"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)[om], v[om]
        bits = np.zeros(len(ok), np.int64)
        if len(mk):
            pos = np.searchsorted(mk, ok)
            pos[pos >= len(mk)] = 0
            hit = mk[pos] == ok
            bits[hit] = omult[hit] * mv[pos[hit]]
        order = np.argsort(odid, kind="stable")
        dids = odid[order]
        starts = np.flatnonzero(np.r_[True, dids[1:] != dids[:-1]])
        sums = np.add.reduceat(bits[order], starts).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(dids[starts]), pa.array(sums)],
            schema=_BITS_PARTIAL_SCHEMA,
        )

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "did" not in batch.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.int64()),
                }
            )
        return pa.table({id_col: batch["did"], out_col: batch["v"]})

    from ._buckets import bucketed_sum

    # doc-cardinality exchange (billions of rows at crawl scale) —
    # bucketed, not key-sorted
    return bucketed_sum(
        occ.union(model_wire)
        .groupby("_sh")
        .map_groups(score_group, batch_format="pyarrow"),
        ["did"],
        ["v"],
        _BITS_PARTIAL_SCHEMA,
    ).map_batches(rename, batch_format="pyarrow", batch_size=None)


def unigram_bits_sharded(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_ds=None,
    n_shards: int | None = None,
):
    """Per-doc unigram surprisal bits with the model kept DISTRIBUTED —
    the past-:data:`VOCAB_BROADCAST_BUDGET` path.  → Dataset
    (id_col, surprisal_bits); docs with zero tokens are absent (score
    0).  Bit-for-bit equal to broadcast :func:`surprisal_batch` scoring
    (both compute multiplicity × integer Shannon code length)."""
    from ._buckets import derive_buckets, hash_buckets
    from ._schema import stabilize_schema
    from .dedup import _token_hash_batch

    if model_ds is None:
        model_ds = unigram_model_ds(ds, text_col)
    if n_shards is None:
        n_shards = derive_buckets(model_ds.count())
    # total tokens: tiny distributed aggregate, no vocab gather
    total = int(model_ds.sum("n"))

    def model_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "h" not in batch.column_names:
            return _SC_WIRE.empty_table()
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = _floor_log2(total // n)
        return pa.Table.from_arrays(
            [
                pa.array(hash_buckets(h, n_shards)),
                pa.array(np.ones(len(h), np.int8)),
                pa.array(h),
                pa.array(np.zeros(len(h), np.int64)),
                pa.array(cl),
            ],
            schema=_SC_WIRE,
        )

    model_wire = stabilize_schema(
        model_ds.map_batches(
            model_rows, batch_format="pyarrow", batch_size=None
        ),
        _SC_WIRE,
    )

    def keyer(batch: pa.Table):
        h, offsets = _token_hash_batch(batch[text_col])
        n_tok = np.diff(offsets).astype(np.int64)
        return h, np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)

    return _score_bits_sharded(
        ds, id_col, keyer, model_wire, n_shards, "surprisal_bits"
    )


def bigram_bits_sharded(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_ds=None,
    n_shards: int | None = None,
):
    """Per-doc bigram surprisal bits with the model kept DISTRIBUTED.
    Context totals count(c,·) are computed INSIDE a ctx-hash-sharded
    exchange (all bigrams of a context co-locate, so the total is a
    segment sum — no driver re-aggregation), which then re-emits the
    finished (bg, code_len) model rows sharded by bg for scoring."""
    from ._buckets import derive_buckets, hash_buckets
    from ._schema import stabilize_schema

    if model_ds is None:
        model_ds = bigram_model_ds(ds, text_col)
    if n_shards is None:
        n_shards = derive_buckets(model_ds.count())

    def ctx_shard_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bg" not in batch.column_names:
            return _SC_WIRE.empty_table()
        ctx = batch["ctx"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(hash_buckets(ctx, n_shards)),
                pa.array(np.ones(batch.num_rows, np.int8)),
                pa.array(ctx),
                batch["bg"].cast(pa.int64()),
                batch["n"].cast(pa.int64()),
            ],
            schema=_SC_WIRE,
        )

    def finish_model(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "k" not in group.column_names:
            return _SC_WIRE.empty_table()
        ctx = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        bg = group["did"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        cu, cinv = np.unique(ctx, return_inverse=True)
        cf = np.zeros(len(cu), np.int64)
        np.add.at(cf, cinv, f)
        cl = _floor_log2(cf[cinv] // f)
        return pa.Table.from_arrays(
            [
                pa.array(hash_buckets(bg, n_shards)),
                pa.array(np.ones(len(bg), np.int8)),
                pa.array(bg),
                pa.array(np.zeros(len(bg), np.int64)),
                pa.array(cl),
            ],
            schema=_SC_WIRE,
        )

    model_wire = stabilize_schema(
        model_ds.map_batches(
            ctx_shard_rows, batch_format="pyarrow", batch_size=None
        )
        .groupby("_sh")
        .map_groups(finish_model, batch_format="pyarrow"),
        _SC_WIRE,
    )

    def keyer(batch: pa.Table):
        _, bg, doc_of = _bigram_hashes_batch(batch[text_col])
        return bg, doc_of

    return _score_bits_sharded(
        ds, id_col, keyer, model_wire, n_shards, "bigram_bits"
    )


def overlay_id_columns(
    base,
    overlays,
    schema: pa.Schema,
    id_col: str = "doc_id",
    num_rows: int | None = None,
):
    """Overlay per-id int64 columns onto ``base`` — the join-free attach
    of the sharded quality path.  ``base`` must already carry every
    overlay column (as zeros); ``overlays`` is a list of
    ``(Dataset with columns [id_col, col], col)`` pairs.  ONE
    id-bucketed union+groupby exchange co-locates each id's base row
    with its overlay rows; ids absent from an overlay keep 0.
    ``schema`` is ``base``'s static output schema (passed explicitly so
    nothing triggers early execution)."""
    from ._buckets import derive_buckets, hash_buckets

    n_b = derive_buckets(num_rows)
    names = schema.names
    wire = schema.append(pa.field("_mk", pa.int8())).append(
        pa.field("_db", pa.int32())
    )
    cols = [c for _, c in overlays]

    def tag_base(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            return wire.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.Table.from_arrays(
            [_flat_col(batch[f.name].cast(f.type)) for f in schema],
            schema=schema,
        )
        n = batch.num_rows
        return t.append_column(
            "_mk", pa.array(np.zeros(n, np.int8))
        ).append_column("_db", pa.array(hash_buckets(ids, n_b)))

    tagged = [
        base.map_batches(tag_base, batch_format="pyarrow", batch_size=None)
    ]
    for mk, (ods, col) in enumerate(overlays, start=1):

        def tag_overlay(batch: pa.Table, _col=col, _mk=mk) -> pa.Table:
            if batch.num_rows == 0 or id_col not in batch.column_names:
                return wire.empty_table()
            n = batch.num_rows
            ids = batch[id_col].cast(pa.int64())
            arrays = []
            for f in schema:
                if f.name == id_col:
                    arrays.append(ids.combine_chunks() if isinstance(
                        ids, pa.ChunkedArray) else ids)
                elif f.name == _col:
                    arrays.append(_flat_col(batch[_col].cast(pa.int64())))
                else:
                    arrays.append(pa.nulls(n, f.type))
            arrays.append(pa.array(np.full(n, _mk, np.int8)))
            arrays.append(
                pa.array(
                    hash_buckets(
                        ids.to_numpy(zero_copy_only=False).astype(np.int64),
                        n_b,
                    )
                )
            )
            return pa.Table.from_arrays(arrays, schema=wire)

        tagged.append(
            ods.map_batches(
                tag_overlay, batch_format="pyarrow", batch_size=None
            )
        )

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "_mk" not in group.column_names:
            return schema.empty_table()
        mk = group["_mk"].to_numpy(zero_copy_only=False)
        bm = mk == 0
        if not bm.any():
            return schema.empty_table()
        out = group.filter(pa.array(bm)).select(names)
        bids = out[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(bids)
        out = out.take(pa.array(order))
        bids = bids[order]
        for mk_i, col in enumerate(cols, start=1):
            om = mk == mk_i
            if not om.any():
                continue
            sub = group.filter(pa.array(om))
            oid = sub[id_col].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            ov = sub[col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(bids, oid)
            pos[pos >= len(bids)] = 0
            hit = bids[pos] == oid
            vals = (
                out[col].to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .copy()
            )
            vals[pos[hit]] = ov[hit]
            out = out.set_column(
                out.schema.get_field_index(col), col, pa.array(vals)
            )
        return out

    both = tagged[0]
    for t in tagged[1:]:
        both = both.union(t)
    return both.groupby("_db").map_groups(merge, batch_format="pyarrow")


def _flat_col(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def pack_sequences(
    ds,
    size_col: str,
    part_col: str = "lang",
    id_col: str = "doc_id",
    budget: int = 4000,
    chunk_rows: int = 1 << 20,
    num_rows: int | None = None,
):
    """Deterministic sequence packing: append ``pack_bin`` =
    (running sum of ``size_col`` over all same-``part_col`` rows with a
    smaller ``id_col``) // ``budget``.

    This is the distributed two-phase prefix sum (see module docstring):
    per-(part, id//chunk_rows) partial sums are tiny (one row per chunk)
    and are combined into prefix offsets driver-side; the per-chunk
    cumsum then runs in one hash-bucketed exchange whose groups are
    bounded by ``chunk_rows`` regardless of partition skew.  All input
    columns are carried through, so per-row stats computed upstream ride
    along instead of needing a join back.
    """
    import ray

    from ._buckets import derive_buckets, hash_buckets
    from .dedup import poly_hash_strings

    n_buckets = derive_buckets(num_rows)

    def chunk_partials(batch: pa.Table) -> pa.Table:
        part_arr = batch[part_col]
        if isinstance(part_arr, pa.ChunkedArray):
            part_arr = part_arr.combine_chunks()
        codes = pc.dictionary_encode(part_arr).indices.to_numpy()
        part = part_arr.to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        size = batch[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = ids // chunk_rows
        # per (part, chunk) sums within this block
        order = np.lexsort((chunk, codes))
        p, c, s = part[order], chunk[order], size[order]
        cc = codes[order]
        starts = np.flatnonzero(np.r_[True, (cc[1:] != cc[:-1]) | (c[1:] != c[:-1])])
        sums = np.add.reduceat(s, starts) if len(s) else np.zeros(0, np.int64)
        return pa.table(
            {
                "part": pa.array(p[starts], pa.string()),
                "chunk": pa.array(c[starts], pa.int64()),
                "s": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    parts_tbl = (
        ds.select_columns([part_col, id_col, size_col])
        .map_batches(chunk_partials, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    # Driver state: one entry per (part, chunk) — corpus_size/chunk_rows
    # rows, NOT corpus rows.  Combine partials and build prefix offsets.
    sums: dict[tuple, int] = {}
    for r in parts_tbl:
        k = (r["part"], int(r["chunk"]))
        sums[k] = sums.get(k, 0) + int(r["s"])
    offsets: dict[tuple, int] = {}
    acc: dict[str, int] = {}
    for part, chunk in sorted(sums):
        offsets[(part, chunk)] = acc.get(part, 0)
        acc[part] = acc.get(part, 0) + sums[(part, chunk)]
    off_ref = ray.put(offsets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        chunk = ids // chunk_rows
        key = poly_hash_strings(batch[part_col])
        with np.errstate(over="ignore"):
            key = key + chunk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return batch.append_column(
            "_pb", pa.array(hash_buckets(key, n_buckets))
        )

    def cumsum_chunk(group: pa.Table) -> pa.Table:
        part_col_arr = group[part_col]
        if isinstance(part_col_arr, pa.ChunkedArray):
            part_col_arr = part_col_arr.combine_chunks()
        # Collision-free integer codes for sorting/run detection (object
        # lexsort would compare Python strings row by row).
        codes = pc.dictionary_encode(part_col_arr).indices.to_numpy()
        part = part_col_arr.to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        size = group[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        off_map = ray.get(off_ref)
        order = np.lexsort((ids, codes))
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        p, i, s = part[order], ids[order], size[order]
        pcodes = codes[order]
        chunk = i // chunk_rows
        starts = np.flatnonzero(
            np.r_[True, (pcodes[1:] != pcodes[:-1]) | (chunk[1:] != chunk[:-1])]
        )
        cum = np.cumsum(s) - s  # exclusive cumsum
        base = np.repeat(cum[starts], np.diff(np.r_[starts, len(s)]))
        run_off = np.array(
            [off_map.get((p[j], int(chunk[j])), 0) for j in starts],
            dtype=np.int64,
        )
        before = (cum - base) + np.repeat(
            run_off, np.diff(np.r_[starts, len(s)])
        )
        bins = before // budget
        out = group.drop_columns(["_pb"])
        return out.append_column("pack_bin", pa.array(bins[inv], pa.int64()))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_pb")
        .map_groups(cumsum_chunk, batch_format="pyarrow")
    )


# --- corpus-level line dedup (CCNet-style) ---------------------------------

# Wrap pattern used by queries.q_line_dedup to derive a multi-line corpus
# deterministically from the single-line synthetic documents: insert a
# newline after every 8th word.  RE2 leftmost non-overlapping semantics —
# identical in Arrow's replace_substring_regex and DuckDB's
# regexp_replace(..., 'g'), so the oracle re-derives the same bytes.
LINE_WRAP_PATTERN = r"([^ ]+( [^ ]+){7}) "


def line_dedup(ds, text_col: str = "text", min_count: int = 2):
    """Corpus-level duplicated-line removal — the CCNet/RefinedWeb gate
    that strips boilerplate (nav bars, cookie banners, footers) by
    deleting every line whose exact content occurs at least ``min_count``
    times across the corpus, preserving the remaining lines' order.

    Two passes, both stateless maps plus one tiny exchange:

    1. count: per-block partial value-counts of 64-bit line hashes
       (``poly_hash_strings`` over the flattened split-line values — one
       vectorized pass, O(total bytes)) are pre-aggregated BEFORE the
       ``groupby``, so the exchange carries one row per distinct line
       per block, not one per line occurrence.  Hashes with a global
       count ≥ ``min_count`` form the duplicated-line set.
    2. strip: the set is sorted and broadcast once via ``ray.put``; a
       stateless map splits each doc, tests membership with one
       ``np.searchsorted``, rebuilds the surviving lines into a
       ``ListArray`` and re-joins with ``binary_join`` — no Python per
       row, no second shuffle.

    Scale shape: the broadcast set holds only lines that are actually
    duplicated (boilerplate is a tiny fraction of distinct lines).  At
    crawl scale where even that outgrows a broadcast (O(100M) × 8 B is
    still viable; beyond it), shard the dup set by hash range and run
    one strip pass per shard, or swap pass 2's membership test for a
    hash-bucketed exchange of (line_hash → doc, ord) with a re-sort —
    the CCNet sharding.  64-bit hashing: a collision deletes an innocent
    line; at ~1e9 distinct lines the expected collision count is ~0.03
    (birthday bound), the standard trade CCNet itself makes.

    Appends ``n_lines_kept`` / ``n_lines_dropped`` (int64) and replaces
    ``text_col`` with the re-joined surviving lines ('' when every line
    was duplicated).  Assumes non-null text.
    """
    import ray as _ray

    from .dedup import poly_hash_strings

    def counts(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat = pc.split_pattern(txt, "\n").flatten()
        h = poly_hash_strings(flat)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq.view(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    from ._buckets import bucketed_sum, budgeted_sum_single_key

    # Budget-gated final sum (the _find_hot_keys idiom): distinct-line
    # partials are blocks × boilerplate-bounded line sets, so under the
    # cap the global count is a driver np.unique/np.add.at and the
    # exchange disappears; past it (crawl-scale distinct lines) one
    # bucketed exchange runs, re-executing the narrow count pass once.
    res = budgeted_sum_single_key(
        lambda: ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
        "h",
        "n",
    )
    if res is not None:
        uk, sums = res
        dup = uk[sums >= min_count]  # np.unique output is sorted
    else:
        agg = bucketed_sum(
            ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
            ["h"],
            ["n"],
            pa.schema([("h", pa.int64()), ("n", pa.int64())]),
        )

        def only_dups(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({"h": pa.array([], pa.int64())})
            keep = pc.greater_equal(batch["n"], min_count)
            return pa.table({"h": batch["h"].filter(keep)})

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
        from .dedup import _get_broadcast

        dup_s = _get_broadcast(dup_ref)
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lines = pc.split_pattern(txt, "\n")
        offs = lines.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        flat = lines.flatten()
        h = poly_hash_strings(flat).view(np.int64)
        from ._buckets import sorted_lookup

        is_dup, _ = sorted_lookup(h, dup_s)
        keep = ~is_dup
        n_rows = len(txt)
        per_row = np.diff(offs)
        row_of = np.repeat(np.arange(n_rows), per_row)
        kept_per = np.bincount(row_of[keep], minlength=n_rows)
        new_offs = np.concatenate(
            [[0], np.cumsum(kept_per)]
        ).astype(np.int32)
        new_list = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep))
        )
        new_text = pc.binary_join(new_list, "\n")
        ix = batch.schema.get_field_index(text_col)
        out = batch.set_column(ix, text_col, new_text)
        out = out.append_column(
            "n_lines_kept", pa.array(kept_per.astype(np.int64))
        )
        return out.append_column(
            "n_lines_dropped",
            pa.array((per_row - kept_per).astype(np.int64)),
        )

    return ds.map_batches(strip, batch_format="pyarrow", batch_size=None)


def chunk_documents(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 2048,
    overlap: int = 256,
):
    """Split every document into fixed-width character chunks with
    overlap — the context-window preparation step between curation and
    tokenization (each chunk becomes one training sequence; the overlap
    preserves cross-boundary context).

    Stateless one-to-many map, no shuffle: per batch, the chunk count
    per doc is ``ceil((len - overlap) / stride)`` (≥ 1), chunk starts
    are built by one ``np.repeat``/cumsum pass, and every chunk is
    sliced from the ORIGINAL Arrow value buffer with a zero-copy-build
    ``pa.StringArray.from_buffers`` — a new offsets array over shared
    byte data plus one gather for the chunk bytes, never a Python
    substring loop.  Emits (id, chunk_ix, n_chunks, chunk_text).

    Operates on bytes (== characters for ASCII corpora; for general
    UTF-8, boundaries may split a code point — chunk on a
    codepoint-offset column upstream if that matters).  Output order
    within a block is (doc, chunk_ix), globally as unordered as the
    input — downstream packing (pack_sequences) does not care.
    """
    assert 0 <= overlap < chunk_chars
    stride = chunk_chars - overlap

    def chunks(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        arr = txt.cast(pa.binary())
        n = len(arr)
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        lens = np.diff(offsets)
        n_chunks = np.maximum(
            1, -(-(lens - overlap) // stride)
        ).astype(np.int64)
        doc_of = np.repeat(np.arange(n), n_chunks)
        # chunk index within each doc: global arange minus each doc's base
        base = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        cix = np.arange(int(n_chunks.sum()), dtype=np.int64) - base[doc_of]
        starts = offsets[:-1][doc_of] + cix * stride
        ends = np.minimum(starts + chunk_chars, offsets[1:][doc_of])
        clen = ends - starts
        new_off64 = np.concatenate([[0], np.cumsum(clen)])
        # gather chunk bytes in one fancy-index pass
        total = int(clen.sum())
        if total:
            within = np.arange(total, dtype=np.int64) - np.repeat(
                new_off64[:-1], clen
            )
            flat = data[np.repeat(starts, clen) + within]
        else:
            flat = np.zeros(0, dtype=np.uint8)
        # Overlap EXPANDS the data (×chunk_chars/stride), so total chunk
        # bytes can legally exceed int32 offsets even when the input
        # batch fits them.  Always emit large_string — choosing per
        # batch would mix string/large_string block schemas within one
        # call and break downstream unification (round-4 review ×2).
        chunk_arr = pa.LargeStringArray.from_buffers(
            len(clen),
            pa.py_buffer(new_off64.astype(np.int64).tobytes()),
            pa.py_buffer(flat.tobytes()),
        )
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_of)),
                "chunk_ix": pa.array(cix),
                "n_chunks": pa.array(n_chunks[doc_of]),
                "chunk_text": chunk_arr,
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow", batch_size=None)


def collapse_repeated_tokens_batch(
    texts: pa.ChunkedArray | pa.Array, sep: str = " "
) -> tuple[pa.Array, pa.Array, pa.Array]:
    """Intra-document stutter removal: collapse every run of identical
    consecutive ``sep``-separated tokens to a single occurrence (the
    crawl artifact where templating repeats a word/line N times).
    Map-only and exact: adjacency is tested with ONE Arrow C++ string
    compare of the flattened token array against itself shifted by one
    (no hashing, so no collision can merge distinct tokens), and the
    survivors rebuild through the same ListArray/binary_join path as
    ``line_dedup``.  Returns (new_text, n_kept, n_dropped) arrays."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(texts, sep)
    offs = lists.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    flat = lists.flatten()
    n, m = len(texts), len(flat)
    eq_prev = np.zeros(m, dtype=bool)
    if m > 1:
        eq_prev[1:] = pc.equal(
            flat.slice(1), flat.slice(0, m - 1)
        ).to_numpy(zero_copy_only=False)
    first = np.zeros(m, dtype=bool)
    starts = offs[:-1]
    first[starts[starts < m]] = True
    keep = first | ~eq_prev
    per_row = np.diff(offs)
    row_of = np.repeat(np.arange(n), per_row)
    kept_per = np.bincount(row_of[keep], minlength=n)
    new_offs = np.concatenate([[0], np.cumsum(kept_per)]).astype(np.int32)
    new_list = pa.ListArray.from_arrays(
        pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep))
    )
    return (
        pc.binary_join(new_list, sep),
        pa.array(kept_per.astype(np.int64)),
        pa.array((per_row - kept_per).astype(np.int64)),
    )
