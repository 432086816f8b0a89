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


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: mean token length ×1000 (int),
    stopword hits, alpha ratio ×1000 (int). Integer outputs so the oracle
    compare is exact."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    mean_len = np.zeros(n, dtype=np.int64)
    stop_hits = np.zeros(n, dtype=np.int64)
    alpha_ratio = np.zeros(n, dtype=np.int64)
    stops = set(_STOPWORDS)
    for i, t in enumerate(texts):
        t = t or ""
        toks = t.split(" ")
        total = sum(len(w) for w in toks)
        mean_len[i] = (total * 1000) // max(1, len(toks))
        stop_hits[i] = sum(1 for w in toks if w in stops)
        # ASCII letters only — matches the oracle's regexp [A-Za-z]
        # (str.isalpha would also count CJK etc.).
        na = sum(1 for ch in t if "a" <= ch <= "z" or "A" <= ch <= "Z")
        alpha_ratio[i] = (na * 1000) // max(1, len(t))
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
    """Actor stage: n-gram/stopword-marker language guess (tables compiled
    once per actor). Deterministic; falls back to 'und'."""

    def __init__(self):
        self.markers = {
            lang: set(ws) for lang, ws in _LANG_MARKERS.items() if ws
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = []
        for t in texts:
            toks = set((t or "").lower().split())
            best, score = "und", 0
            for lang, ws in self.markers.items():
                s = len(toks & ws)
                if s > score or (s == score and s > 0 and lang < best):
                    best, score = lang, s
            if any("一" <= ch <= "鿿" for ch in (t or "")[:200]):
                best = "zh"
            out.append(best)
        return batch.append_column("lang_guess", pa.array(out, pa.string()))


# --- fingerprinting --------------------------------------------------------


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling-hash document fingerprint (FNV-1a over UTF-8 bytes),
    computed straight off the Arrow value buffer — zero per-row Python."""
    from .dedup import fnv_over_offsets

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.binary())
    n = len(arr)
    if not n:
        return batch.append_column("fingerprint", pa.array([], pa.uint64()))
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    h = fnv_over_offsets(data, offsets[:-1], np.diff(offsets))
    return batch.append_column("fingerprint", pa.array(h, pa.uint64()))
