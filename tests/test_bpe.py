"""BPE vocabulary training (functions/bpe.py): the distributed trainer,
the local single-task trainer and a naive character-level reference must
produce the identical merge table, vocab token counts and per-document
scores, regardless of block layout."""

import numpy as np
import pyarrow as pa
import pytest

from s2sphere_ray.functions.bpe import (
    _apply_merge,
    bpe_token_counts,
    bpe_train,
    word_histogram,
)


def _naive_bpe(word_freq: dict, num_merges: int):
    """Reference trainer: dict-of-tuples symbol sequences, Python loops.
    Tie-break mirrors the engine: max count, then smallest
    (a << 32) | b packed key."""
    seqs = {w: tuple(w.encode("utf-8")) for w in word_freq}
    merges = []
    next_id = 256
    for _ in range(num_merges):
        counts = {}
        for w, s in seqs.items():
            f = word_freq[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best_cnt = max(counts.values())
        a, b = min(
            (p for p, c in counts.items() if c == best_cnt),
            key=lambda p: (p[0] << 32) | p[1],
        )
        if best_cnt <= 0:
            break
        for w, s in list(seqs.items()):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
        merges.append((a, b, next_id, best_cnt))
        next_id += 1
    return merges, {w: len(s) for w, s in seqs.items()}


CORPUS = [
    "the cat sat on the mat",
    "the cats sat",
    "a mat a cat a rat",
    "banana bandana ana",
    "aaaa aaa aa a",
    "the the the rat sat on that mat",
    "",
    "cat",
]


def _docs_table():
    return pa.table(
        {
            "doc_id": np.arange(len(CORPUS), dtype=np.int64),
            "text": pa.array(CORPUS, pa.string()),
        }
    )


def _expected(num_merges=12):
    freq = {}
    for doc in CORPUS:
        for w in doc.split(" "):
            freq[w] = freq.get(w, 0) + 1
    return _naive_bpe(freq, num_merges), freq


def test_bpe_train_local_matches_naive(ray_session):
    import ray.data as rd

    (exp_merges, exp_ntok), freq = _expected()
    hist = word_histogram(rd.from_arrow(_docs_table()).repartition(5))
    merges, vocab = bpe_train(hist, num_merges=12)  # local path
    assert merges == exp_merges
    got = dict(
        zip(vocab["word"].to_pylist(), vocab["n_tokens"].to_pylist())
    )
    assert got == exp_ntok
    fr = dict(zip(vocab["word"].to_pylist(), vocab["freq"].to_pylist()))
    assert fr == freq


def test_bpe_train_distributed_matches_local(ray_session):
    """local_threshold=0 forces the per-round-exchange path; the merge
    table and vocab must be bit-identical across 7-way partitioning."""
    import ray.data as rd

    (exp_merges, exp_ntok), _ = _expected()
    hist = word_histogram(
        rd.from_arrow(_docs_table()).repartition(7)
    ).repartition(7)
    merges, vocab = bpe_train(hist, num_merges=12, local_threshold=0)
    assert merges == exp_merges
    got = dict(
        zip(vocab["word"].to_pylist(), vocab["n_tokens"].to_pylist())
    )
    assert got == exp_ntok


def test_bpe_token_counts_matches_naive(ray_session):
    import ray.data as rd

    (_, exp_ntok), _ = _expected()
    out = (
        bpe_token_counts(
            rd.from_arrow(_docs_table()).repartition(3), num_merges=12
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp_words = [len(d.split(" ")) for d in CORPUS]
    exp_tokens = [
        sum(exp_ntok[w] for w in d.split(" ")) for d in CORPUS
    ]
    assert out["n_words"].tolist() == exp_words
    assert out["n_bpe_tokens"].tolist() == exp_tokens


def test_apply_merge_greedy_runs():
    """aaaa -> ZZ, aaa -> Za under merge (a,a): every other match in a
    run, exactly the left-to-right greedy."""
    a = ord("a")
    flat = np.array([a, a, a, a, a, a, a], dtype=np.int64)
    offsets = np.array([0, 4, 7], dtype=np.int64)  # "aaaa", "aaa"
    out, off = _apply_merge(flat, offsets, a, a, 256)
    assert out.tolist() == [256, 256, 256, a]
    assert off.tolist() == [0, 2, 4]


def test_apply_merge_never_crosses_words():
    a, b = ord("x"), ord("y")
    flat = np.array([a, b, a, b], dtype=np.int64)
    offsets = np.array([0, 1, 3, 4], dtype=np.int64)  # "x", "yx", "y"
    out, off = _apply_merge(flat, offsets, a, b, 300)
    assert out.tolist() == [a, b, a, b]  # the only (x,y) pairs straddle
    assert off.tolist() == [0, 1, 3, 4]


def _naive_encode(word_seqs: dict, doc: str) -> list:
    out = []
    for w in doc.split(" "):
        out.extend(word_seqs[w])
    return out


def test_bpe_encode_matches_naive(ray_session):
    """Per-document token-id lists: concatenation of each space-split
    word's trained sequence, identical to the naive reference and to
    bpe_token_counts' counts, at both trainer paths."""
    import ray.data as rd

    from s2sphere_ray.functions.bpe import bpe_encode

    freq = {}
    for doc in CORPUS:
        for w in doc.split(" "):
            freq[w] = freq.get(w, 0) + 1
    # naive trainer, but keep the full sequences this time
    seqs = {w: tuple(w.encode("utf-8")) for w in freq}
    merges, _ = _naive_bpe(freq, 12)
    for a, b, nid, _cnt in merges:
        for w, s in list(seqs.items()):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(nid)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)

    for thr in (2_000_000, 0):  # local and forced-distributed trainer
        got = (
            bpe_encode(
                rd.from_arrow(_docs_table()).repartition(4),
                num_merges=12,
                local_threshold=thr,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, doc in enumerate(CORPUS):
            exp = _naive_encode(seqs, doc)
            assert got["tokens"][i].tolist() == exp, (thr, i)
            assert got["n_tokens"][i] == len(exp)


def test_bpe_encode_empty_text_and_feeds_packing(ray_session):
    """Empty documents tokenize to empty lists, and the list<int32>
    output is directly consumable as a token-budget column."""
    import ray.data as rd

    from s2sphere_ray.functions.bpe import bpe_encode

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["", "ab ab", "ab"]),
        }
    )
    out = (
        bpe_encode(rd.from_arrow(tbl), num_merges=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "" splits to one empty word -> zero tokens; "ab" merges to 1 token
    assert out["tokens"][0].tolist() == []
    assert out["n_tokens"].tolist() == [0, 2, 1]
    assert out["tokens"][1].tolist() == out["tokens"][2].tolist() * 2
