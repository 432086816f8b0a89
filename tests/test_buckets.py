"""Pin the shared bucketed-exchange helpers against Ray's native
sort-groupby.

``bucketed_sum`` / ``distinct_pairs`` (``functions/_buckets.py``) are the
one shared definition of the round-5 exchange idiom: hash-bucket the key,
sort-shuffle only the low-cardinality bucket column, reduce each bucket
with an Arrow C++ hash aggregation.  Semantics must equal the native
``groupby(key).aggregate(Sum)`` / ``groupby(pair).map_groups(slice(0,1))``
they replaced in the vocabulary- and candidate-pair-scale exchanges
(unigram/bigram models, BPE histograms, line/window dedup, LSH pair
dedup) — these tests pin that equality on adversarial inputs: hash-skewed
keys, empty blocks, single-row buckets, and n_buckets far above the key
count (forcing many empty buckets).
"""

import numpy as np
import pyarrow as pa
import pytest


def _sum_rows(rows, keys, vals):
    return sorted(
        tuple(r[k] for k in keys) + tuple(r[v] for v in vals) for r in rows
    )


@pytest.mark.parametrize("n_buckets", [1, 7, 512])
def test_bucketed_sum_matches_native_int_keys(ray_session, n_buckets):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from s2sphere_ray.functions._buckets import bucketed_sum

    rng = np.random.default_rng(7)
    # skewed: 90% of rows in 10 hot keys, rest uniform over 3000
    hot = rng.integers(0, 10, 18_000)
    cold = rng.integers(0, 3000, 2_000)
    k = np.concatenate([hot, cold]).astype(np.int64)
    v = rng.integers(-5, 100, len(k)).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"h": pa.array(k), "n": pa.array(v)})
    ).repartition(16)
    native = ds.groupby("h").aggregate(Sum("n", alias_name="n")).take_all()
    buck = bucketed_sum(
        ds,
        ["h"],
        ["n"],
        pa.schema([("h", pa.int64()), ("n", pa.int64())]),
        n_buckets=n_buckets,
    ).take_all()
    assert _sum_rows(buck, ["h"], ["n"]) == _sum_rows(native, ["h"], ["n"])


def test_bucketed_sum_matches_native_string_keys(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from s2sphere_ray.functions._buckets import bucketed_sum

    rng = np.random.default_rng(11)
    words = pa.array([f"tok{int(i)}" for i in rng.integers(0, 400, 9_000)])
    ds = rd.from_arrow(
        pa.table(
            {"word": words, "freq": pa.array(np.ones(len(words), np.int64))}
        )
    ).repartition(8)
    native = (
        ds.groupby("word").aggregate(Sum("freq", alias_name="freq")).take_all()
    )
    buck = bucketed_sum(
        ds,
        ["word"],
        ["freq"],
        pa.schema([("word", pa.string()), ("freq", pa.int64())]),
    ).take_all()
    assert _sum_rows(buck, ["word"], ["freq"]) == _sum_rows(
        native, ["word"], ["freq"]
    )


def test_bucketed_sum_composite_key_and_empty_input(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from s2sphere_ray.functions._buckets import bucketed_sum

    schema = pa.schema(
        [("bg", pa.int64()), ("ctx", pa.int64()), ("n", pa.int64())]
    )
    rng = np.random.default_rng(3)
    bg = rng.integers(-(2**62), 2**62, 5_000).astype(np.int64)
    t = pa.table(
        {
            "bg": pa.array(bg),
            # ctx functionally determined by bg, as in the bigram model
            "ctx": pa.array(bg // 7),
            "n": pa.array(np.ones(len(bg), np.int64)),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    native = (
        ds.groupby(["bg", "ctx"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    buck = bucketed_sum(ds, ["bg", "ctx"], ["n"], schema).take_all()
    assert _sum_rows(buck, ["bg", "ctx"], ["n"]) == _sum_rows(
        native, ["bg", "ctx"], ["n"]
    )

    # fully-empty input: 0 rows out, and any TYPED blocks carry the
    # declared schema (Ray's groupby emits schema-less empties — the
    # documented hazard ``stabilize_schema`` exists for — so a None
    # dataset schema is acceptable here, same as the native groupby)
    empty = rd.from_arrow(schema.empty_table())
    got = bucketed_sum(empty, ["bg", "ctx"], ["n"], schema)
    assert got.count() == 0
    sch = got.schema()
    assert sch is None or sch.names == ["bg", "ctx", "n"]


@pytest.mark.parametrize("extras", [[], ["hamming"]])
def test_distinct_pairs_matches_native(ray_session, extras):
    import ray.data as rd

    from s2sphere_ray.functions._buckets import distinct_pairs

    rng = np.random.default_rng(5)
    ia = rng.integers(0, 300, 25_000).astype(np.int64)
    ib = ia + rng.integers(1, 40, len(ia)).astype(np.int64)
    cols = {"id_a": pa.array(ia), "id_b": pa.array(ib)}
    if extras:
        # extra column is a function of the pair (as hamming is)
        cols["hamming"] = pa.array((ia * 31 + ib) % 17)
    ds = rd.from_arrow(pa.table(cols)).repartition(12)
    native = (
        ds.groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .take_all()
    )
    got = distinct_pairs(ds, extras).take_all()
    keys = ["id_a", "id_b"] + extras
    assert sorted(tuple(r[k] for k in keys) for r in got) == sorted(
        tuple(r[k] for k in keys) for r in native
    )


def test_triu_run_indices_matches_per_run_loop():
    """The length-class-grouped expansion must produce exactly the same
    PAIR SET as the naive per-run triu loop, for fuzzed run layouts
    including empty, all-singleton, one giant run, and mixes."""
    import numpy as np

    from s2sphere_ray.functions.dedup import triu_run_indices

    rng = np.random.default_rng(5)
    layouts = [
        np.array([], np.int64),
        np.array([1], np.int64),
        np.array([1, 1, 1], np.int64),
        np.array([7], np.int64),
        np.array([2, 3, 2, 1, 5, 3, 2], np.int64),
    ]
    for _ in range(30):
        layouts.append(rng.integers(1, 9, rng.integers(1, 40)).astype(np.int64))
    for lens in layouts:
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64) \
            if len(lens) else np.array([], np.int64)
        want = set()
        for s, k in zip(starts, lens):
            ii, jj = np.triu_indices(int(k), k=1)
            want.update(zip((s + ii).tolist(), (s + jj).tolist()))
        a, b = triu_run_indices(starts, lens)
        got = set(zip(a.tolist(), b.tolist()))
        assert got == want
        assert len(a) == len(b) == sum(int(k * (k - 1) // 2) for k in lens)
        if len(a):
            assert (a < b).all()
