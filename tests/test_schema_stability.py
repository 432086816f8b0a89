"""Regression tests for the 0-row-block / schema-broadcast hazard.

Ray's shuffle ops emit 0-row (often schema-less) blocks for empty
partitions, and the native ``Dataset.join`` learns each input's schema
only from that input's FIRST block — a 0-row first block silently
suppresses the broadcast and empty join partitions then fail with
``ArrowInvalid`` (see ``s2sphere_ray/functions/_schema.py``; reproduced
deterministically at ``num_cpus=32`` in round 3 as the
``q_curation_export`` crash). These tests pin the fixed paths at forced
high partition counts, independent of the session CPU count.
"""

import numpy as np
import pyarrow as pa
import pytest


def _typed_nonempty_blocks(ray, ds):
    """(n_blocks, all typed, all nonempty) over a dataset's blocks."""
    m = ds.materialize()
    ok_typed, ok_nonempty, n = True, True, 0
    for bundle in m.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            blk = ray.get(ref)
            n += 1
            if blk.num_columns == 0:
                ok_typed = False
            if blk.num_rows == 0:
                ok_nonempty = False
    return n, ok_typed, ok_nonempty


def test_stabilize_schema_heals_groupby_blocks(ray_session):
    """map_groups output has 0-row blocks; stabilize_schema removes them
    and the result survives a high-partition native join."""
    import ray.data as rd

    from s2sphere_ray.functions._schema import PAIR_SCHEMA, stabilize_schema

    ray = ray_session
    ds = rd.from_items([{"id_a": i % 3, "id_b": i} for i in range(12)])
    pairs = ds.groupby(["id_a", "id_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
    healed = stabilize_schema(pairs, PAIR_SCHEMA)
    n, typed, nonempty = _typed_nonempty_blocks(ray, healed)
    assert n >= 1 and typed and nonempty

    # join shape: only 3 distinct right keys over 4 partitions forces at
    # least one EMPTY join partition — the hazard regime — at any CPU
    # count (32 partitions would deadlock the 4-CPU test cluster on
    # aggregator actors).
    ds3 = rd.from_items([{"id_a": 0, "id_b": i % 3} for i in range(12)])
    pairs3 = ds3.groupby(["id_a", "id_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
    left = rd.from_items([{"doc_id": i, "lang": "en"} for i in range(24)])
    out = left.join(
        stabilize_schema(pairs3, PAIR_SCHEMA).select_columns(["id_b"]),
        join_type="left_anti",
        num_partitions=4,
        on=("doc_id",),
        right_on=("id_b",),
    )
    assert out.count() == 21  # ids 0,1,2 dropped


def test_native_join_hazard_still_present_in_ray(ray_session):
    """Pins the UNDERLYING Ray behavior the workarounds exist for: an
    unhealed map_groups pair stream on the right of a native join at a
    partition count exceeding the distinct-key count raises ArrowInvalid.
    If a Ray upgrade makes this pass, stabilize_schema /
    anti_join_drop_ids can be retired."""
    import ray.data as rd

    ds = rd.from_items([{"id_a": 0, "id_b": i % 3} for i in range(12)])
    pairs = ds.groupby(["id_a", "id_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
    left = rd.from_items([{"doc_id": i, "lang": "en"} for i in range(24)])
    out = left.join(
        pairs.select_columns(["id_b"]),
        join_type="left_anti",
        num_partitions=4,
        on=("doc_id",),
        right_on=("id_b",),
    )
    with pytest.raises(Exception):
        out.count()


def test_stabilize_schema_empty_input(ray_session):
    import ray.data as rd

    from s2sphere_ray.functions._schema import PAIR_SCHEMA, stabilize_schema

    ds = rd.from_arrow(PAIR_SCHEMA.empty_table())
    pairs = ds.groupby(["id_a", "id_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
    healed = stabilize_schema(pairs, PAIR_SCHEMA)
    assert healed.count() == 0
    assert healed.schema().names == ["id_a", "id_b"]


def test_minhash_none_pairs_survive_native_join(ray_session):
    """The verify="none" pair stream (the r3 red row) feeds a 32-partition
    native left_anti join — the exact q_curation_export composition."""
    import ray.data as rd

    from s2sphere_ray.functions.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(11)
    vocab = np.array([f"w{k}" for k in range(500)])
    texts = [
        " ".join(rng.choice(vocab, size=25, replace=False))
        for _ in range(40)
    ]
    texts[7] = texts[3]  # the one planted dup pair -> LSH candidate
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    pairs = minhash_lsh_pairs(docs, verify="none", num_rows=40)
    out = docs.select_columns(["doc_id"]).join(
        pairs.select_columns(["id_b"]),
        join_type="left_anti",
        num_partitions=4,
        on=("doc_id",),
        right_on=("id_b",),
    )
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert 7 not in kept and 3 in kept
    assert len(kept) <= 39


def test_anti_join_drop_ids_matches_reference(ray_session):
    import ray.data as rd

    from s2sphere_ray.stages.join import anti_join_drop_ids

    rng = np.random.default_rng(7)
    n = 200
    langs = ["en", "de", "fr"]
    left_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
            "lang": pa.array([langs[i % 3] for i in range(n)], pa.string()),
        }
    )
    drop_ids = rng.choice(n, size=60, replace=True).astype(np.int64)
    # duplicates in the drop set must be harmless
    drop_tbl = pa.table({"id_b": pa.array(drop_ids)})
    out = anti_join_drop_ids(
        rd.from_arrow(left_tbl),
        left_tbl.schema,
        "doc_id",
        rd.from_arrow(drop_tbl),
        "id_b",
        num_rows=n,
    )
    got = sorted(r["doc_id"] for r in out.take_all())
    want = sorted(set(range(n)) - set(drop_ids.tolist()))
    assert got == want
    # schema of surviving rows is the declared left schema
    assert set(out.schema().names) == {"doc_id", "text", "lang"}


def test_anti_join_drop_ids_empty_drop_side(ray_session):
    import ray.data as rd

    from s2sphere_ray.stages.join import anti_join_drop_ids

    left_tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a", "b", "c"], pa.string()),
            "lang": pa.array(["en", "en", "de"], pa.string()),
        }
    )
    empty_drop = pa.table({"id_b": pa.array([], pa.int64())})
    out = anti_join_drop_ids(
        rd.from_arrow(left_tbl),
        left_tbl.schema,
        "doc_id",
        rd.from_arrow(empty_drop),
        "id_b",
        num_rows=3,
    )
    assert out.count() == 3


def test_ngram_jaccard_no_native_join_exact(ray_session):
    """The rewritten one-exchange verify returns exactly the brute-force
    bigram Jaccard pairs."""
    import itertools

    import ray.data as rd

    from s2sphere_ray.functions.dedup import ngram_jaccard_pairs

    docs = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a lazy dog",   # near-dup of 0
        "completely different words appear in this one",
        "another unrelated document with its own text",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )

    def bigrams(t):
        w = t.split()
        return set(zip(w, w[1:]))

    want = []
    for a, b in itertools.combinations(range(len(docs)), 2):
        A, B = bigrams(docs[a]), bigrams(docs[b])
        inter = len(A & B)
        union = len(A | B)
        if union and inter * 1000 >= 500 * union:
            want.append((a, b, inter, union, 1000 * inter // union))
    out = ngram_jaccard_pairs(
        rd.from_arrow(tbl), n=2, threshold=0.5, num_rows=len(docs)
    )
    got = sorted(
        (
            r["id_a"], r["id_b"], r["inter_n"], r["union_n"], r["jac_x1000"]
        )
        for r in out.take_all()
    )
    assert got == sorted(want)
