"""Text-analysis operators: token counting, quality scores, language-ID,
document fingerprinting. Vectorized with Arrow compute where the kernel
exists; oracle-matching definitions are kept deliberately simple so the
DuckDB SQL can reproduce them exactly (integer outputs preferred).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- token counting --------------------------------------------------------


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = count of single-space-separated fields (len(split(' ')));
    n_chars_obs = UTF-8 character count. Both mirror DuckDB
    len(string_split(text,' ')) / length(text) exactly."""
    toks = pc.list_value_length(pc.split_pattern(batch[text_col], " "))
    chars = pc.utf8_length(batch[text_col])
    batch = batch.append_column("n_tokens", pc.cast(toks, pa.int64()))
    return batch.append_column("n_chars_obs", pc.cast(chars, pa.int64()))


# --- quality scoring -------------------------------------------------------

_STOPWORDS = (
    "the of and to in is was for on that with as by at from are this be an or"
).split()


_ALPHA_LUT = np.zeros(256, dtype=np.int64)
_ALPHA_LUT[ord("a") : ord("z") + 1] = 1
_ALPHA_LUT[ord("A") : ord("Z") + 1] = 1


def _ascii_alpha_counts(txt: pa.Array) -> np.ndarray:
    """Per-string count of ASCII letters, off the UTF-8 value buffer."""
    arr = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) else txt
    arr = arr.cast(pa.binary())
    n = len(arr)
    if not n:
        return np.zeros(0, dtype=np.int64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    cs = np.concatenate([[0], np.cumsum(_ALPHA_LUT[data])])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: mean token length ×1000 (int),
    stopword hits, alpha ratio ×1000 (int). Integer outputs so the oracle
    compare is exact.

    Fully vectorized: Arrow compute for lengths/token counts/letter
    counts; stopword hits via FNV token hashes off the flattened split
    list (segment-summed per doc) — no per-row Python.
    """
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    txt = pc.fill_null(col, "")
    n = len(txt)
    chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
    toks_list = pc.split_pattern(txt, " ")
    n_toks = (
        pc.list_value_length(toks_list)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    # split(" ") separators are single spaces, so the summed token length
    # is exactly chars - (n_toks - 1); n_toks >= 1 always.
    total = chars - (n_toks - 1)
    mean_len = (total * 1000) // np.maximum(1, n_toks)
    # Stopword hits: one Arrow is_in over the flattened token list (exact
    # string compare in C++), segment-summed per document.
    flat = pc.list_flatten(toks_list)
    stop_hits = np.zeros(n, dtype=np.int64)
    if len(flat):
        hit = (
            pc.is_in(flat, value_set=pa.array(_STOPWORDS))
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        doc_of = np.repeat(np.arange(n), n_toks)
        stop_hits = np.bincount(doc_of[hit], minlength=n).astype(np.int64)
    # ASCII letters only — matches the oracle's regexp [A-Za-z].  Counted
    # at the byte level straight off the Arrow value buffer (ASCII bytes
    # never occur inside multi-byte UTF-8 sequences): per-string count is
    # a prefix-sum difference over a 256-entry lookup mask.
    na = _ascii_alpha_counts(txt)
    alpha_ratio = (na * 1000) // np.maximum(1, chars)
    batch = batch.append_column("mean_token_len_x1000", pa.array(mean_len))
    batch = batch.append_column("stopword_hits", pa.array(stop_hits))
    return batch.append_column("alpha_ratio_x1000", pa.array(alpha_ratio))


# --- language ID -----------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "was"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": (),
}


class LangIdStage:
    """Actor stage: stopword-marker language guess (marker hash tables
    compiled once per actor). Deterministic; falls back to 'und'.

    Vectorized: one whitespace tokenize + FNV hash pass per batch; the
    per-language score (number of DISTINCT marker words present) comes
    from per-marker segment-any reductions; the winner is the lex-smallest
    language among the argmax (matching the scalar tie-break), with a CJK
    override from an Arrow regex over the first 200 codepoints.
    """

    def __init__(self):
        self.langs = sorted(l for l, ws in _LANG_MARKERS.items() if ws)
        markers: list[str] = []
        lang_of: list[int] = []
        for li, lang in enumerate(self.langs):
            for w in _LANG_MARKERS[lang]:
                markers.append(w)
                lang_of.append(li)
        self.marker_set = pa.array(markers, pa.string())
        self.lang_of_marker = np.array(lang_of, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        txt = pc.fill_null(col, "")
        n = len(txt)
        toks_list = pc.utf8_split_whitespace(pc.utf8_lower(txt))
        counts = (
            pc.list_value_length(toks_list)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks_list)
        # One index_in kernel maps every token to its marker slot (or
        # null); distinct (doc, marker) pairs then score each language.
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(flat):
            idx = (
                pc.fill_null(
                    pc.index_in(flat, value_set=self.marker_set), -1
                )
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            doc_of = np.repeat(np.arange(n), counts)
            valid = idx >= 0
            nm = len(self.lang_of_marker)
            key = np.unique(doc_of[valid] * nm + idx[valid])
            np.add.at(
                scores,
                (key // nm, self.lang_of_marker[key % nm]),
                1,
            )
        best_idx = np.argmax(scores, axis=1)  # first max = lex smallest
        best_score = scores[np.arange(n), best_idx]
        names = np.array(self.langs, dtype=object)
        out = np.where(best_score > 0, names[best_idx], "und")
        cjk = (
            pc.match_substring_regex(
                pc.utf8_slice_codeunits(txt, 0, 200), "[一-鿿]"
            )
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        out[cjk] = "zh"
        return batch.append_column(
            "lang_guess", pa.array(out.tolist(), pa.string())
        )


# --- fingerprinting --------------------------------------------------------


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling-hash document fingerprint (word-polynomial over the
    UTF-8 bytes + splitmix finalizer), computed straight off the Arrow
    value buffer in O(total bytes) — zero per-row Python, and cost
    independent of the longest document in the batch."""
    from .dedup import poly_hash_strings

    h = poly_hash_strings(batch[text_col])
    return batch.append_column("fingerprint", pa.array(h, pa.uint64()))


# --- BPE-ish regex tokenizer ------------------------------------------------

# Letter runs | digit runs | single non-alnum non-space — a BPE-style
# pre-tokenization split. Both Arrow and DuckDB compile this with RE2, so
# counts agree exactly (verified in tests + the q_token_regex oracle).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_count_batch(
    batch: pa.Table, text_col: str = "text", pattern: str = BPE_TOKEN_PATTERN
) -> pa.Table:
    """n_bpe_tokens = number of non-overlapping matches of ``pattern``
    (one RE2 pass in Arrow C++; no per-row Python)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    txt = pc.fill_null(col, "")
    n = pc.count_substring_regex(txt, pattern)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def keyword_topk(
    ds,
    query_terms: dict[int, list[str]],
    k: int = 10,
    n_docs: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Sparse keyword retrieval: integer-idf TF-IDF top-k — the
    inverted-index complement to the dense ANN paths in
    ``functions/sim.py``.  ``score(doc, q) = Σ_{t ∈ distinct(q)}
    tf(doc, t) · (floor(log2(N/df_t)) + 1)`` — the same integer Shannon
    code-length idf as web.unigram_code_lengths (+1 so matches on
    corpus-common terms still count), computed with integer division +
    bit_length only, so the DuckDB oracle (``printf('%b')``) agrees bit
    for bit and the per-query ranking (score DESC, id ASC) is exact.

    Two passes, both pruned to the ≤ |Q|·|terms| query vocabulary:
    (1) df: per-block "docs containing term" partial counts against the
    broadcast sorted term-hash set (searchsorted — O(tokens·log|terms|))
    → one tiny groupby-sum; (2) score: per-block tf per (doc, term) via
    the same searchsorted + bincount, local per-query top-k
    pre-filter, then one ``groupby(query_id)`` merge — the exchange
    carries ≤ k·|Q| rows per block, never the corpus.
    """
    from ray.data.aggregate import Sum

    from .dedup import _token_hash_batch

    # Driver-side query vocabulary (≤ a handful of terms by contract).
    def _hash_terms(terms: list[str]) -> np.ndarray:
        arr = pa.array(terms, pa.string())
        h, _ = _token_hash_batch(arr)
        return h.view(np.int64)

    q_ids = sorted(query_terms)
    per_q: dict[int, np.ndarray] = {}
    vocab_list: list[int] = []
    for qid in q_ids:
        terms = list(dict.fromkeys(query_terms[qid]))  # distinct, ordered
        th = _hash_terms(terms)
        per_q[qid] = th
        vocab_list.extend(th.tolist())
    vocab = np.array(sorted(set(vocab_list)), dtype=np.int64)
    n_terms = len(vocab)
    if n_docs is None:
        n_docs = ds.count()

    def _term_tf(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, tf matrix rows×terms) for the batch."""
        h, offsets = _token_hash_batch(batch[text_col])
        hs = h.view(np.int64)
        n_tok = np.diff(offsets).astype(np.int64)
        doc_of = np.repeat(np.arange(batch.num_rows), n_tok)
        tf = np.zeros((batch.num_rows, n_terms), dtype=np.int64)
        if len(hs) and n_terms:
            pos = np.searchsorted(vocab, hs)
            pos[pos >= n_terms] = 0
            hit = vocab[pos] == hs
            np.add.at(tf, (doc_of[hit], pos[hit]), 1)
        return batch[id_col].to_numpy().astype(np.int64), tf

    def df_partial(batch: pa.Table) -> pa.Table:
        _, tf = _term_tf(batch)
        return pa.table(
            {
                "t": pa.array(np.arange(n_terms, dtype=np.int64)),
                "df": pa.array((tf > 0).sum(axis=0).astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("t")
        .aggregate(Sum("df", alias_name="df"))
        .take_all()
    )
    df = np.zeros(n_terms, dtype=np.int64)
    for r in rows:
        df[r["t"]] = r["df"]
    icl = np.zeros(n_terms, dtype=np.int64)
    present = df > 0
    ratio = np.ones(n_terms, dtype=np.int64)
    ratio[present] = n_docs // df[present]
    r = ratio.copy()
    while np.any(r > 1):
        big = r > 1
        r[big] >>= 1
        icl[big] += 1
    weight = icl + 1  # matches on common terms still count

    # Per-query weight vectors over the shared vocabulary.
    qw = np.zeros((len(q_ids), n_terms), dtype=np.int64)
    for i, qid in enumerate(q_ids):
        sel = np.searchsorted(vocab, np.sort(per_q[qid]))
        qw[i, sel] = weight[sel]
    q_arr = np.array(q_ids, dtype=np.int64)

    def score_partial(batch: pa.Table) -> pa.Table:
        ids, tf = _term_tf(batch)
        scores = tf @ qw.T  # (docs, queries) int64
        out_q, out_d, out_s = [], [], []
        for qi in range(len(q_arr)):
            s = scores[:, qi]
            nz = np.nonzero(s > 0)[0]
            if not len(nz):
                continue
            order = np.lexsort((ids[nz], -s[nz]))[:k]
            pick = nz[order]
            out_q.append(np.full(len(pick), q_arr[qi], dtype=np.int64))
            out_d.append(ids[pick])
            out_s.append(s[pick])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_d)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        s = group["score"].to_numpy()
        ids = group[id_col].to_numpy()
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)
                ),
                id_col: group[id_col].take(pa.array(order)),
                "score": group["score"].take(pa.array(order)),
            }
        )

    return (
        ds.map_batches(
            score_partial, batch_format="pyarrow", batch_size=None
        )
        .groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
    )
