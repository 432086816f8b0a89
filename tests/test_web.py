"""Web-corpus curation operators (functions/web.py): URL
canonicalization/dedup, PII scrub, repetition scoring, sequence packing.
The oracle harness checks the registered queries end-to-end; these tests
pin kernel semantics and the operators' distributed behavior on inputs
the sf tables don't cover (multi-chunk packing, collision partitions,
empty groups)."""

import numpy as np
import pyarrow as pa
import pytest


def test_canonicalize_urls_rules():
    from s2sphere_ray.functions.web import canonicalize_urls

    cases = {
        "https://www.Host.Example/a": "https://host.example/a",
        "http://host.example/a/": "https://host.example/a",
        "HTTPS://HOST.EXAMPLE/a?utm_source=x": "https://host.example/a",
        "https://host.example/a?id=1&utm_campaign=x#frag":
            "https://host.example/a?id=1",
        "https://host.example/a?utm_a=1&utm_b=2&fbclid=z":
            "https://host.example/a",
        "https://host.example/a?ref=r&id=2&q=3":
            "https://host.example/a?id=2&q=3",
        "https://host.example/": "https://host.example",
    }
    got = canonicalize_urls(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_pii_scrub_counts_and_replacement():
    from s2sphere_ray.functions.web import pii_scrub_batch

    t = pa.array(
        [
            "write a.b-c_9@mail.example now",
            "call +1-555-0042 or +1-555-9999",
            "nothing here",
            "both x@y.zz and +1-555-0000",
        ]
    )
    ne, nph, scrubbed = pii_scrub_batch(t)
    assert ne.to_pylist() == [1, 0, 0, 1]
    assert nph.to_pylist() == [0, 2, 0, 1]
    assert scrubbed.to_pylist() == [
        "write [PII] now",
        "call [PII] or [PII]",
        "nothing here",
        "both [PII] and [PII]",
    ]


def test_repetition_fraction():
    from s2sphere_ray.functions.web import repetition_x1000_batch

    out = repetition_x1000_batch(
        pa.array(["a b a b a b", "x y z w", "solo", "r r r r r"])
    ).to_pylist()
    # "a b a b a b": 5 bigrams, 2 distinct -> 600; unique text -> 0;
    # single word -> no bigram -> 0; "r r"x4: 4 bigrams 1 distinct -> 750
    assert out == [600, 0, 0, 750]


def test_html_text_extraction():
    from s2sphere_ray.functions.web import html_text_batch

    out = html_text_batch(
        pa.array(
            [
                "<html><body>plain words here</body></html>",
                "<div class='x'>a <b>bold</b> move</div>",
                "tagless",
                "<p>&lt;not a tag&gt; &amp; &quot;quoted&quot;</p>",
            ]
        )
    ).to_pylist()
    assert out == [
        "plain words here",
        "a bold move",
        "tagless",
        '<not a tag> & "quoted"',
    ]


def test_unigram_surprisal_exact(ray_session):
    import math

    import ray.data as rd
    from s2sphere_ray.functions.web import (
        surprisal_batch,
        unigram_code_lengths,
    )

    texts = ["a a a b", "b c", "a c c"]
    # freqs: a=4, b=2, c=3 -> total=9; code lens: a=floor(log2(9//4))=1,
    # b=floor(log2(9//2))=2, c=floor(log2(9//3))=1
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
    vocab, code_len, total = unigram_code_lengths(ds)
    assert total == 9 and len(vocab) == 3
    n_tok, bits = surprisal_batch(pa.array(texts), vocab, code_len)
    assert n_tok.to_pylist() == [4, 2, 3]
    # doc0: 3*a + 1*b = 3*1+2 = 5; doc1: b + c = 3; doc2: a + 2*c = 3
    assert bits.to_pylist() == [5, 3, 3]
    # cross-check the integer code length against float log2
    for v, cl in zip(vocab.tolist(), code_len.tolist()):
        f = {"a": 4, "b": 2, "c": 3}
        ratios = [9 // x for x in f.values()]
        assert cl in [int(math.floor(math.log2(r))) for r in ratios]


def test_bigram_surprisal_exact(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.web import (
        bigram_code_lengths,
        bigram_surprisal_batch,
    )

    texts = ["a a a b", "b c", "a c c", "x", ""]
    # Bigrams (in-doc adjacency): doc0 = (a,a)x2 (a,b); doc1 = (b,c);
    # doc2 = (a,c) (c,c); docs 3/4 have none.
    # ctx totals: a -> 4 [(a,a)x2, (a,b), (a,c)], b -> 1, c -> 1.
    # code lens: (a,a) floor(log2(4//2))=1; (a,b) floor(log2(4//1))=2;
    # (b,c) log2(1//1)=0; (a,c) 2; (c,c) 0.
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
    bgv, bgcl = bigram_code_lengths(ds)
    assert len(bgv) == 5
    n_bg, bits = bigram_surprisal_batch(pa.array(texts), bgv, bgcl)
    assert n_bg.to_pylist() == [3, 1, 2, 0, 0]
    # doc0: 1+1+2 = 4; doc1: 0; doc2: 2+0 = 2
    assert bits.to_pylist() == [4, 0, 2, 0, 0]


def test_bigram_model_naive_parity(ray_session):
    """Random corpus: model + scoring vs a per-doc dict reference."""
    import ray.data as rd
    from s2sphere_ray.functions.web import (
        bigram_code_lengths,
        bigram_surprisal_batch,
    )

    rng = np.random.default_rng(31)
    words = ["w%d" % i for i in range(17)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 24)))
        for _ in range(200)
    ]
    from collections import Counter

    pair, ctx = Counter(), Counter()
    for t in texts:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            pair[(a, b)] += 1
            ctx[a] += 1
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
    bgv, bgcl = bigram_code_lengths(ds)
    assert len(bgv) == len(pair)
    n_bg, bits = bigram_surprisal_batch(pa.array(texts), bgv, bgcl)
    for i, t in enumerate(texts):
        ws = t.split()
        want = sum(
            (ctx[a] // pair[(a, b)]).bit_length() - 1
            for a, b in zip(ws, ws[1:])
        )
        assert n_bg[i].as_py() == max(len(ws) - 1, 0)
        assert bits[i].as_py() == want, (i, t)


def _naive_pack(rows, budget):
    """Reference: bin = (sum of sizes of same-part rows with smaller id)
    // budget."""
    out = {}
    for part, i, s in rows:
        before = sum(s2 for p2, i2, s2 in rows if p2 == part and i2 < i)
        out[i] = before // budget
    return out


def test_pack_sequences_matches_naive(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.web import pack_sequences

    rng = np.random.default_rng(11)
    n = 400
    parts = rng.choice(["en", "de", "fr"], size=n)
    ids = rng.permutation(n * 3)[:n].astype(np.int64)  # sparse, shuffled
    sizes = rng.integers(1, 500, size=n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(parts.tolist(), pa.string()),
                "doc_id": pa.array(ids),
                "n_chars": pa.array(sizes),
                "extra": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    ).repartition(13)  # force rows of one (part, chunk) across blocks
    got = {
        r["doc_id"]: r["pack_bin"]
        for r in pack_sequences(
            ds, size_col="n_chars", part_col="lang", id_col="doc_id",
            budget=700, chunk_rows=256, num_rows=n,
        ).take_all()
    }
    want = _naive_pack(list(zip(parts.tolist(), ids, sizes)), 700)
    assert got == {int(k): int(v) for k, v in want.items()}


def test_pack_sequences_carries_columns(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.web import pack_sequences

    ds = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "de"], pa.string()),
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "n_chars": pa.array([10, 10, 10], pa.int64()),
                "payload": pa.array(["a", "b", "c"], pa.string()),
            }
        )
    )
    out = pack_sequences(
        ds, size_col="n_chars", part_col="lang", budget=15
    ).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["payload"] == "a" and by_id[1]["pack_bin"] == 0
    assert by_id[2]["pack_bin"] == 0  # 10 // 15
    assert by_id[3]["pack_bin"] == 0
    assert "_pb" not in out[0]


def test_url_dedup_keeps_latest(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.web import url_dedup

    ds = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [
                        "https://www.a.example/x",
                        "http://a.example/x/",
                        "https://a.example/x?utm_source=s",
                        "https://b.example/y",
                    ]
                ),
                "doc_id": pa.array([1, 7, 3, 2], pa.int64()),
            }
        )
    )
    rows = {r["url"]: r for r in url_dedup(ds, num_rows=4).take_all()}
    assert rows["https://a.example/x"]["doc_id"] == 7
    assert rows["https://a.example/x"]["n_dups"] == 3
    assert rows["https://b.example/y"]["n_dups"] == 1
    assert len(rows) == 2


def test_line_dedup_strips_corpus_duplicates(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.web import line_dedup

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "cookie banner\nunique alpha\nfooter",
                        "cookie banner\nunique beta",
                        "footer\nunique gamma\nfooter",
                        "cookie banner",  # all lines duplicated -> ''
                    ]
                ),
            }
        )
    )
    out = {r["doc_id"]: r for r in line_dedup(ds).take_all()}
    # 'cookie banner' x3 and 'footer' x3 (doc 3 has it twice) are dups.
    assert out[1]["text"] == "unique alpha"
    assert out[1]["n_lines_kept"] == 1 and out[1]["n_lines_dropped"] == 2
    assert out[2]["text"] == "unique beta"
    assert out[3]["text"] == "unique gamma"
    assert out[3]["n_lines_dropped"] == 2
    assert out[4]["text"] == "" and out[4]["n_lines_kept"] == 0


def test_line_dedup_min_count_and_order(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.web import line_dedup

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["b\na\nb\nc", "c\nz"]),
            }
        )
    )
    # min_count=3: only 'b' (2x in doc 1) + 'c' (2x total) stay under 3.
    out = {r["doc_id"]: r for r in line_dedup(ds, min_count=3).take_all()}
    assert out[1]["text"] == "b\na\nb\nc"  # order + multiplicity kept
    assert out[2]["text"] == "c\nz"
    out2 = {r["doc_id"]: r for r in line_dedup(ds, min_count=2).take_all()}
    assert out2[1]["text"] == "a"
    assert out2[2]["text"] == "z"


def test_chunk_documents_matches_naive(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.web import chunk_documents

    rng = np.random.default_rng(3)
    texts = [
        "x" * 0,
        "short",
        "a" * 100,
        "".join(chr(97 + c) for c in rng.integers(0, 26, 5000)),
        "".join(chr(97 + c) for c in rng.integers(0, 26, 2048)),
        "".join(chr(97 + c) for c in rng.integers(0, 26, 2049)),
    ]
    C, O = 2048, 256
    stride = C - O

    def naive(t):
        out, i = [], 0
        while True:
            out.append(t[i : i + C])
            if i + C >= len(t) or len(out) >= 1 + max(
                0, -(-(len(t) - O) // stride) - 1
            ):
                # same count formula as the operator
                pass
            i += stride
            if len(out) >= max(1, -(-(len(t) - O) // stride)):
                return out

    want = {}
    for d, t in enumerate(texts):
        for ix, ch in enumerate(naive(t)):
            want[(d, ix)] = ch
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(3)
    got = chunk_documents(ds, chunk_chars=C, overlap=O).take_all()
    assert {(r["doc_id"], r["chunk_ix"]): r["chunk_text"] for r in got} == want
    n_by_doc = {r["doc_id"]: r["n_chunks"] for r in got}
    assert n_by_doc[3] == -(-(5000 - O) // stride)
    assert n_by_doc[0] == 1 and n_by_doc[4] == 1 and n_by_doc[5] == 2
    # overlap invariant: consecutive chunks share O characters
    d3 = sorted(
        (r["chunk_ix"], r["chunk_text"]) for r in got if r["doc_id"] == 3
    )
    for (_, a), (_, b) in zip(d3, d3[1:]):
        assert a[stride : stride + O] == b[:O]


def test_collapse_repeated_tokens():
    from s2sphere_ray.functions.web import collapse_repeated_tokens_batch

    t, kept, dropped = collapse_repeated_tokens_batch(
        pa.array(["a a a b a", "x", "", "y y"])
    )
    assert t.to_pylist() == ["a b a", "x", "", "y"]
    assert kept.to_pylist() == [3, 1, 1, 1]
    assert dropped.to_pylist() == [2, 0, 0, 1]


def test_keyword_topk_matches_naive(ray_session):
    """Sparse integer-idf retrieval == a per-doc dict reference, ranking
    and weighting included; layout-independent."""
    import collections

    import ray.data as rd

    from s2sphere_ray.functions.text import keyword_topk

    rng = np.random.default_rng(5)
    words = ["common"] * 6 + ["w%d" % i for i in range(12)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 20)))
        for _ in range(150)
    ]
    queries = {7: ["common", "w3", "w3"], 9: ["w11"]}
    n = len(texts)
    df = collections.Counter()
    for t in texts:
        for w in set(t.split()):
            df[w] += 1
    expect = {}
    for qid, terms in queries.items():
        scores = []
        for i, t in enumerate(texts):
            cnt = collections.Counter(t.split())
            s = sum(
                cnt[w] * ((n // df[w]).bit_length() - 1 + 1)
                for w in dict.fromkeys(terms)
                if df[w]
            )
            if s > 0:
                scores.append((-s, i))
        expect[qid] = [i for _, i in sorted(scores)[:10]]
    for parts in (1, 5):
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(len(texts), dtype=np.int64)
                    ),
                    "text": pa.array(texts),
                }
            )
        ).repartition(parts)
        rows = keyword_topk(ds, queries, k=10).take_all()
        got = collections.defaultdict(list)
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            got[r["query_id"]].append(r["doc_id"])
        assert dict(got) == expect, f"parts={parts}"


def test_sharded_bits_match_broadcast_scoring(ray_session):
    """The hash-sharded surprisal scorers (model kept distributed) must
    reproduce the broadcast kernels bit-for-bit, at several layouts."""
    import ray.data as rd

    from s2sphere_ray.functions.web import (
        bigram_bits_sharded,
        bigram_code_lengths,
        bigram_surprisal_batch,
        surprisal_batch,
        unigram_bits_sharded,
        unigram_code_lengths,
    )

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 25)))
        for _ in range(200)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    arr = pa.array(texts)
    v, cl, _ = unigram_code_lengths(rd.from_arrow(tbl))
    _, exp_uni = surprisal_batch(arr, v, cl)
    bgv, bgcl = bigram_code_lengths(rd.from_arrow(tbl))
    _, exp_bg = bigram_surprisal_batch(arr, bgv, bgcl)
    for parts in (1, 9):
        ds = rd.from_arrow(tbl).repartition(parts)
        got_u = {
            r["doc_id"]: r["surprisal_bits"]
            for r in unigram_bits_sharded(ds).take_all()
        }
        got_b = {
            r["doc_id"]: r["bigram_bits"]
            for r in bigram_bits_sharded(ds).take_all()
        }
        for i in range(200):
            assert got_u.get(i, 0) == exp_uni[i].as_py(), f"uni doc {i}"
            assert got_b.get(i, 0) == exp_bg[i].as_py(), f"bg doc {i}"


def test_webtext_quality_sharded_path_matches_broadcast(ray_session):
    """q_webtext_quality forced past the vocab budget (sharded scorers +
    overlay exchange) must equal the default broadcast path exactly."""
    import pandas as pd

    from s2sphere_ray.queries import q_webtext_quality

    sf = "/root/testdata/sf0.001"
    a = (
        q_webtext_quality(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_webtext_quality(sf, _vocab_budget=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_lm_models_ds_equals_separate_builders(ray_session):
    """The fused one-pass model builder must be row-equal to the two
    separate builders (same tokens, same hashes, same counts)."""
    import ray.data as rd

    from s2sphere_ray.functions.web import (
        bigram_model_ds,
        lm_models_ds,
        unigram_model_ds,
    )

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 30)))
        for _ in range(300)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )

    def _sorted(ds, keys):
        t = pa.concat_tables(
            ds.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        return t.sort_by([(k, "ascending") for k in keys]).combine_chunks()

    for parts in (1, 7):
        src = rd.from_arrow(tbl).repartition(parts)
        uni_f, bg_f = lm_models_ds(src)
        uni_s = unigram_model_ds(rd.from_arrow(tbl).repartition(parts))
        bg_s = bigram_model_ds(rd.from_arrow(tbl).repartition(parts))
        assert _sorted(uni_f, ["h"]).equals(_sorted(uni_s, ["h"]))
        assert _sorted(bg_f, ["bg"]).equals(_sorted(bg_s, ["bg"]))


def test_line_and_span_dedup_exchange_fallback_equal(
    ray_session, monkeypatch
):
    """Forcing the budget-gated count sums past their driver cap (the
    bucketed-exchange fallback) must not change either dedup output."""
    import ray.data as rd

    from s2sphere_ray.functions.dedup import duplicated_span_strip
    from s2sphere_ray.functions.web import line_dedup

    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(8, 60)))
        for _ in range(120)
    ]
    texts += texts[:20]  # planted duplicates
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(
                [t.replace(" ", "\n", 3) for t in texts], pa.string()
            ),
        }
    )

    def run_both():
        a = (
            line_dedup(rd.from_arrow(tbl))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            duplicated_span_strip(rd.from_arrow(tbl), n=3, min_count=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return a, b

    a1, b1 = run_both()
    import s2sphere_ray.functions._buckets as bk

    monkeypatch.setattr(
        bk, "budgeted_sum_single_key", lambda *a, **k: None
    )
    a2, b2 = run_both()
    import pandas as pd

    pd.testing.assert_frame_equal(a1, a2)
    pd.testing.assert_frame_equal(b1, b2)
