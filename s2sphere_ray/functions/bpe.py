"""Distributed BPE tokenizer-vocabulary training — the learned-vocab
counterpart of the whitespace/regex token counters in ``text.py`` and
the last tokenizer-side primitive of an LLM curation stack (train the
merge table on the corpus you just curated, then measure token budgets
with it; cf. Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units").

Standard two-tier physics, mirrored from every production trainer:

1. **Corpus → word histogram** (``word_histogram``): ONE corpus-scale
   exchange keyed by word; everything after runs on the histogram,
   which is vocab-sized (≈100 M distinct words for a full crawl),
   never the corpus.
2. **Merge training over the histogram** (``bpe_train``): per merge
   round, freq-weighted adjacent-symbol-pair counts as per-block
   partials → one distinct-pair exchange (bounded by Σ word lengths of
   the VOCAB) → per-block argmax partials → ≤ #blocks-row driver
   gather picks the best pair (deterministic tie-break: max count,
   then smallest packed ``(a << 32) | b`` key) → the 2-int merge rides
   into the next pass's closure.  When the histogram fits one task
   (``local_threshold`` rows) the whole loop collapses into a
   single-process numpy trainer using the SAME kernels — the
   jaccard/CC single-task-finisher pattern; pytest pins local ≡
   distributed ≡ a naive character-level reference.
3. **Scoring** (``bpe_token_counts``): the trained word → token-count
   map (vocab-sized) broadcasts once via ``ray.put`` and the corpus
   pass is map-only, with the lookup as one vectorized
   ``pc.index_in`` — identical movement to
   ``web.unigram_code_lengths`` (shard the vocab by hash range past
   broadcast size).

Everything is integer arithmetic (byte symbols, int64 counts), so the
merge table and every token count are bit-reproducible across block
layouts.  Words follow the repo convention: single-space fields
(``pc.split_pattern(text, ' ')``), matching the SQL oracles'
``string_split(text, ' ')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PACK = np.int64(1) << np.int64(32)
_PAIR_CNT_SCHEMA = pa.schema([("pair", pa.int64()), ("cnt", pa.int64())])


# --------------------------------------------------------------------------
# corpus → word histogram
# --------------------------------------------------------------------------


def word_histogram(ds, text_col: str = "text"):
    """(word, freq) Dataset: single-space fields of ``text_col``,
    pre-aggregated per block so the one corpus-scale exchange carries
    distinct-word partials, not token occurrences."""
    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(batch[text_col], " "))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        if len(words) == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "freq": pa.array([], pa.int64()),
                }
            )
        vc = words.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "freq": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    from ._buckets import bucketed_sum

    # vocabulary-cardinality exchange — hash-bucketed, not key-sorted
    return bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["word"],
        ["freq"],
        pa.schema([("word", pa.string()), ("freq", pa.int64())]),
    )


# --------------------------------------------------------------------------
# numpy kernels (shared by the distributed and local paths)
# --------------------------------------------------------------------------


def _word_bytes(words) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte symbols of each word, off the value buffer
    (the ``text._ascii_alpha_counts`` idiom): → (flat int32 symbols,
    int64 offsets)."""
    arr = (
        words.combine_chunks()
        if isinstance(words, pa.ChunkedArray)
        else words
    )
    arr = arr.cast(pa.binary())
    n = len(arr)
    if not n:
        return np.zeros(0, np.int32), np.zeros(1, np.int64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    flat = data[offsets[0] : offsets[-1]].astype(np.int32)
    return flat, offsets - offsets[0]


def _list_i32(col) -> tuple[np.ndarray, np.ndarray]:
    """(large_)list<int32> column → (flat int64 values, int64 offsets)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offsets - offsets[0]


def _syms_array(offsets: np.ndarray, flat: np.ndarray) -> pa.LargeListArray:
    """Token-id sequence column.  Always large_list<int32>: token
    expansion makes output larger than input, so a single large block
    can legally exceed int32 offsets even when its input fits them —
    and choosing per batch would mix list/large_list block schemas
    (round-4 review, the chunk_documents overflow class)."""
    return pa.LargeListArray.from_arrays(
        pa.array(offsets.astype(np.int64), pa.int64()),
        pa.array(flat.astype(np.int32), pa.int32()),
    )


def _pair_counts(
    flat: np.ndarray, offsets: np.ndarray, freq: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct packed adjacent pairs and their freq-weighted counts."""
    if len(flat) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    row_of = np.repeat(
        np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
    )
    valid = row_of[:-1] == row_of[1:]
    if not valid.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    f64 = flat.astype(np.int64)
    packed = (f64[:-1] * _PACK + f64[1:])[valid]
    w = freq[row_of[:-1][valid]]
    order = np.argsort(packed, kind="stable")
    packed, w = packed[order], w[order]
    starts = np.flatnonzero(np.r_[True, packed[1:] != packed[:-1]])
    sums = np.add.reduceat(w, starts)
    return packed[starts], sums.astype(np.int64)


def _apply_merge(
    flat: np.ndarray,
    offsets: np.ndarray,
    a: int,
    b: int,
    new_id: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Replace left-to-right non-overlapping (a, b) with ``new_id``.

    Within a run of consecutive matches (``aaa`` under merge (a, a))
    greedy left-to-right keeps every OTHER match starting from the
    first; runs longer than one only arise when ``a == b``.
    """
    if len(flat) < 2:
        return flat, offsets
    row_of = np.repeat(
        np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
    )
    m = (flat[:-1] == a) & (flat[1:] == b) & (row_of[:-1] == row_of[1:])
    idx = np.flatnonzero(m)
    if len(idx) == 0:
        return flat, offsets
    new_run = np.r_[True, np.diff(idx) != 1]
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    keep = ((np.arange(len(idx)) - run_start[run_id]) % 2) == 0
    idx = idx[keep]
    out = flat.copy()
    out[idx] = new_id
    drop = np.zeros(len(flat), dtype=bool)
    drop[idx + 1] = True
    out = out[~drop]
    dropped_per_row = np.bincount(
        row_of[idx + 1], minlength=len(offsets) - 1
    ).astype(np.int64)
    new_offsets = offsets - np.r_[0, np.cumsum(dropped_per_row)]
    return out, new_offsets


def _best_pair(pairs: np.ndarray, counts: np.ndarray):
    """(count desc, packed asc) argmax; None when there are no pairs."""
    if len(pairs) == 0:
        return None
    top = counts.max()
    return int(pairs[counts == top].min()), int(top)


def _unpack(packed: int) -> tuple[int, int]:
    return int(packed // int(_PACK)), int(packed % int(_PACK))


# --------------------------------------------------------------------------
# merge training
# --------------------------------------------------------------------------


def bpe_train(
    hist,
    num_merges: int = 32,
    local_threshold: int = 2_000_000,
    num_rows: int | None = None,
):
    """Learn ``num_merges`` BPE merges from a (word, freq) histogram
    Dataset.  Returns ``(merges, vocab)``: ``merges`` is a list of
    ``(a, b, new_id, count)`` tuples (the model — small by definition),
    ``vocab`` a pa.Table (word, freq, n_tokens, syms) with each
    histogram word's trained token count and token-id sequence
    (``syms``: list<int32> — what ``bpe_encode`` broadcasts to tokenize
    the corpus).

    Histograms at or under ``local_threshold`` rows train in one
    single-process pass with the same kernels; above it, each merge
    round is one distinct-pair exchange over the histogram Dataset
    (never the corpus) plus a ≤ #blocks-row driver gather.
    """
    rows = num_rows if num_rows is not None else hist.count()
    if rows <= local_threshold:
        tbl = _gather_table(hist, ("word", "freq"))
        return _train_local(tbl["word"], tbl["freq"], num_merges)
    return _train_distributed(hist, num_merges)


def _gather_table(ds, cols) -> pa.Table:
    import ray as _ray

    tables = [
        t.select(list(cols))
        for t in _ray.get(ds.to_arrow_refs())
        if t.num_rows
    ]
    if not tables:
        types = {
            "word": pa.string(),
            "syms": pa.large_list(pa.int32()),
        }
        return pa.table(
            {c: pa.array([], types.get(c, pa.int64())) for c in cols}
        )
    return pa.concat_tables(tables).combine_chunks()


def _train_local(words, freq, num_merges: int):
    words = (
        words.combine_chunks()
        if isinstance(words, pa.ChunkedArray)
        else words
    )
    flat, offsets = _word_bytes(words)
    fr = pc.cast(freq, pa.int64()).to_numpy()
    merges = []
    next_id = 256
    for _ in range(num_merges):
        pairs, counts = _pair_counts(flat, offsets, fr)
        best = _best_pair(pairs, counts)
        if best is None or best[1] <= 0:
            break
        a, b = _unpack(best[0])
        flat, offsets = _apply_merge(flat, offsets, a, b, next_id)
        merges.append((a, b, next_id, best[1]))
        next_id += 1
    vocab = pa.table(
        {
            "word": words,
            "freq": pa.array(fr),
            "n_tokens": pa.array(np.diff(offsets).astype(np.int64)),
            "syms": _syms_array(offsets, flat),
        }
    )
    return merges, vocab


def _train_distributed(hist, num_merges: int):
    from ._buckets import bucketed_sum

    def to_syms(batch: pa.Table) -> pa.Table:
        flat, offsets = _word_bytes(batch["word"])
        syms = _syms_array(offsets, flat)
        return pa.table(
            {
                "word": batch["word"],
                "freq": pc.cast(batch["freq"], pa.int64()),
                "syms": syms,
            }
        )

    # Materialized per round (the CC idiom): lazy re-execution of round
    # k would replay rounds 1..k-1. Working set is vocab-sized.
    work = hist.map_batches(
        to_syms, batch_format="pyarrow", batch_size=None
    ).materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = _list_i32(batch["syms"])
        pairs, counts = _pair_counts(
            flat, offsets, batch["freq"].to_numpy()
        )
        return pa.table({"pair": pa.array(pairs), "cnt": pa.array(counts)})

    def argmax_partial(batch: pa.Table) -> pa.Table:
        # the groupby can emit SCHEMA-LESS empty blocks at high
        # partition counts (round-3 hazard) — normalize before use
        if batch.num_rows == 0 or "pair" not in batch.column_names:
            best = None
        else:
            best = _best_pair(
                batch["pair"].to_numpy(), batch["cnt"].to_numpy()
            )
        if best is None:
            return pa.table(
                {
                    "pair": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "pair": pa.array([best[0]], pa.int64()),
                "cnt": pa.array([best[1]], pa.int64()),
            }
        )

    merges = []
    next_id = 256
    for _ in range(num_merges):
        cand = (
            bucketed_sum(
                work.map_batches(
                    pair_partial, batch_format="pyarrow", batch_size=None
                ),
                ["pair"],
                ["cnt"],
                _PAIR_CNT_SCHEMA,
            )
            .map_batches(
                argmax_partial, batch_format="pyarrow", batch_size=None
            )
            .take_all()
        )  # ≤ one row per post-exchange block
        cand = [r for r in cand if r["cnt"] is not None]
        if not cand:
            break
        best_cnt = max(int(r["cnt"]) for r in cand)
        if best_cnt <= 0:
            break
        packed = min(
            int(r["pair"]) for r in cand if int(r["cnt"]) == best_cnt
        )
        a, b = _unpack(packed)
        nid = next_id

        def apply(batch: pa.Table, _a=a, _b=b, _nid=nid) -> pa.Table:
            flat, offsets = _list_i32(batch["syms"])
            flat, offsets = _apply_merge(flat, offsets, _a, _b, _nid)
            syms = _syms_array(offsets, flat)
            return pa.table(
                {
                    "word": batch["word"],
                    "freq": batch["freq"],
                    "syms": syms,
                }
            )

        work = work.map_batches(
            apply, batch_format="pyarrow", batch_size=None
        ).materialize()
        merges.append((a, b, nid, best_cnt))
        next_id += 1

    def token_counts(batch: pa.Table) -> pa.Table:
        _, offsets = _list_i32(batch["syms"])
        return pa.table(
            {
                "word": batch["word"],
                "freq": batch["freq"],
                "n_tokens": pa.array(np.diff(offsets).astype(np.int64)),
                "syms": batch["syms"],
            }
        )

    vocab = _gather_table(
        work.map_batches(
            token_counts, batch_format="pyarrow", batch_size=None
        ),
        ("word", "freq", "n_tokens", "syms"),
    )
    return merges, vocab


# --------------------------------------------------------------------------
# corpus scoring with the trained vocab
# --------------------------------------------------------------------------


def bpe_token_counts(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 32,
    local_threshold: int = 2_000_000,
    model: tuple | None = None,
):
    """Train on ``ds``'s own histogram (or score with a precomputed
    ``model = (merges, vocab)`` from ``bpe_train``), then score every
    document: (id, n_words, n_bpe_tokens).  The trained word →
    token-count map broadcasts once via ``ray.put`` (vocab-sized — the
    unigram_code_lengths trade) and the lookup is one vectorized
    ``pc.index_in`` per batch."""
    import ray as _ray

    from .dedup import _get_broadcast

    if model is None:
        hist = word_histogram(ds, text_col)
        model = bpe_train(
            hist, num_merges=num_merges, local_threshold=local_threshold
        )
    _, vocab = model
    vocab_ref = _ray.put(
        (
            vocab["word"].combine_chunks(),
            vocab["n_tokens"].combine_chunks().to_numpy(),
        )
    )

    def score(batch: pa.Table, _ref=vocab_ref) -> pa.Table:
        vw, vn = _get_broadcast(_ref)
        lists = pc.split_pattern(batch[text_col], " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        counts = (
            pc.list_value_length(lists)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = len(counts)
        if len(flat) == 0 or len(vw) == 0:
            per_doc = np.zeros(n, np.int64)
        else:
            idx = pc.index_in(flat, value_set=vw)
            hit = ~np.asarray(idx.is_null())
            pos = idx.to_numpy(zero_copy_only=False)
            tok = np.zeros(len(flat), np.int64)
            # vocab is built from this corpus, so misses only occur
            # when scoring a different table than the training one
            tok[hit] = vn[pos[hit].astype(np.int64)]
            per_doc = np.zeros(n, np.int64)
            np.add.at(
                per_doc,
                np.repeat(np.arange(n, dtype=np.int64), counts),
                tok,
            )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(counts),
                "n_bpe_tokens": pa.array(per_doc),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def bpe_encode(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 32,
    local_threshold: int = 2_000_000,
    model: tuple | None = None,
):
    """Tokenize the corpus with its own trained BPE model →
    (id, n_tokens, tokens:list<int32>) — the actual tokenize-and-pack
    input of a training-data pipeline (feed ``tokens`` straight into
    ``web.pack_sequences`` token budgets).

    Movement mirrors ``bpe_token_counts``: the trained word → token-id
    SEQUENCE map broadcasts once via ``ray.put`` as three flat arrays
    (vocab words, int32 symbol buffer, offsets), and the corpus pass is
    map-only — ``pc.index_in`` per batch, then one vectorized range
    gather builds every document's token list with zero per-row Python.
    A document's tokens are the concatenation of its space-split words'
    sequences (the word boundary itself is not a token)."""
    import ray as _ray

    from .dedup import _get_broadcast

    if model is None:
        hist = word_histogram(ds, text_col)
        model = bpe_train(
            hist, num_merges=num_merges, local_threshold=local_threshold
        )
    _, vocab = model
    vflat, voff = _list_i32(vocab["syms"])
    vocab_ref = _ray.put(
        (
            vocab["word"].combine_chunks(),
            vflat.astype(np.int32),
            voff,  # int64 offsets into vflat
        )
    )

    def encode(batch: pa.Table, _ref=vocab_ref) -> pa.Table:
        vw, vflat, voff = _get_broadcast(_ref)
        wlen = np.diff(voff)
        lists = pc.split_pattern(batch[text_col], " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat_words = lists.flatten()
        words_per_doc = (
            pc.list_value_length(lists)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = len(words_per_doc)
        if len(flat_words) == 0 or len(vw) == 0:
            tok_flat = np.zeros(0, np.int32)
            toks_per_word = np.zeros(len(flat_words), np.int64)
        else:
            idx = pc.index_in(flat_words, value_set=vw)
            if idx.null_count:
                raise ValueError(
                    "bpe_encode: word not in the training vocabulary "
                    "(scored a different table than the training one?)"
                )
            pos = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            toks_per_word = wlen[pos]
            total = int(toks_per_word.sum())
            # range gather: word w contributes vflat[voff[pos]:voff[pos]+len]
            starts = np.repeat(voff[pos], toks_per_word)
            excl = np.concatenate(
                ([0], np.cumsum(toks_per_word)[:-1])
            ) if len(toks_per_word) else np.zeros(0, np.int64)
            intra = np.arange(total, dtype=np.int64) - np.repeat(
                excl, toks_per_word
            )
            tok_flat = vflat[starts + intra]
        # per-doc token counts = segment-sum of per-word counts
        doc_of_word = np.repeat(
            np.arange(n, dtype=np.int64), words_per_doc
        )
        per_doc = np.zeros(n, np.int64)
        np.add.at(per_doc, doc_of_word, toks_per_word)
        doc_off = np.concatenate(([0], np.cumsum(per_doc)))
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(per_doc),
                "tokens": _syms_array(doc_off, tok_flat),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=None)
