"""The generated in-SQL S2 encode must match the numpy kernels exactly."""

import duckdb
import numpy as np
import pytest

from s2sphere_ray import cells as ck
from s2sphere_ray.oracle_sql import s2_token_sql


@pytest.mark.parametrize("level", [0, 4, 12, 22, 30])
def test_sql_tokens_match_kernels(level):
    rng = np.random.default_rng(level + 1)
    n = 2000
    # 4-decimal grid coordinates (the geocode's value domain)
    lat = np.round(rng.uniform(-89.9, 89.9, n), 4)
    lng = np.round(rng.uniform(-180, 179.99, n), 4)
    want = ck.token_from_cell_id(ck.parent(ck.cell_id_from_latlng(lat, lng), level))
    con = duckdb.connect()
    con.register(
        "pts_src",
        __import__("pyarrow").table(
            {"doc_id": np.arange(n), "lat": lat, "lng": lng}
        ),
    )
    sql = s2_token_sql(level, "SELECT doc_id, lat, lng FROM pts_src")
    rows = con.execute(sql + " ORDER BY doc_id").fetchall()
    got = [r[-1] for r in rows]
    assert got == want


def test_sql_tokens_reject_odd_level():
    with pytest.raises(ValueError):
        s2_token_sql(11, "SELECT 1 AS doc_id, 0.0 AS lat, 0.0 AS lng")


@pytest.mark.parametrize("level", [4, 8, 14])
def test_sql_edge_neighbors_match_kernels(level):
    """The in-SQL edge-neighbor derivation (decode → ±size → wrap →
    re-encode) must match cells.edge_neighbors bit-for-bit, including the
    cross-face linear-projection wrap — the stress grid hugs every cube
    edge (±45° lat, 45°-multiple lngs) and both poles, so a majority of
    cells touch a face boundary and exercise the wrap branch."""
    from s2sphere_ray.oracle_sql import s2_neighbors_sql

    rng = np.random.default_rng(level)
    eps = [-1e-4, 0.0, 1e-4]
    lats = sorted(
        {round(b + e, 6) for b in (-89.9999, -45.0, 0.0, 45.0, 89.9999) for e in eps}
        | set(np.round(rng.uniform(-89, 89, 40), 4))
    )
    lngs = sorted(
        {round(b + e, 6) for b in (-179.9999, -135.0, -90.0, -45.0, 0.0, 45.0, 90.0, 135.0, 179.9999) for e in eps}
        | set(np.round(rng.uniform(-180, 179.9, 20), 4))
    )
    grid = [(la, ln) for la in lats for ln in lngs]
    lat = np.array([g[0] for g in grid])
    lng = np.array([g[1] for g in grid])
    doc_id = np.arange(len(grid))
    cell = ck.parent(ck.cell_id_from_latlng(lat, lng), level)
    nbrs = ck.edge_neighbors(cell)
    want = sorted(
        zip(
            np.repeat(doc_id, 4).tolist(),
            ck.token_from_cell_id(nbrs.reshape(-1)),
        )
    )
    # Sanity: the grid must actually reach the wrap branch.
    f, i, j, _ = ck.cell_id_to_face_ij_orientation(cell)
    size = 1 << (30 - level)
    wraps = (
        (i - size < 0) | (i + size >= ck.MAX_SIZE)
        | (j - size < 0) | (j + size >= ck.MAX_SIZE)
    )
    assert wraps.sum() > 50
    con = duckdb.connect()
    con.register(
        "pts_src",
        __import__("pyarrow").table({"doc_id": doc_id, "lat": lat, "lng": lng}),
    )
    sql = s2_neighbors_sql(level, "SELECT doc_id, lat, lng FROM pts_src")
    got = sorted(con.execute(sql).fetchall())
    assert [(a, b) for a, b in got] == want


def test_sql_neighbors_reject_bad_level():
    from s2sphere_ray.oracle_sql import s2_neighbors_sql

    for bad in (7, 0, 30):
        with pytest.raises(ValueError):
            s2_neighbors_sql(bad, "SELECT 1 AS doc_id, 0.0 AS lat, 0.0 AS lng")


def test_sql_neardup_pairs_matches_pipeline(ray_session):
    """The in-SQL MinHash-LSH + SimHash replay (oracle_sql.
    neardup_pairs_sql) must match the Ray pair pipelines exactly on an
    adversarial corpus: exact-dup clusters, one-word-swap near-dups,
    short docs (0/1/2 tokens — the token-fallback + empty-sentinel
    paths), and tab/newline/multi-space whitespace (the regex-vs-
    utf8_split_whitespace parity claim)."""
    import pyarrow as pa
    import ray.data as rd

    from s2sphere_ray.functions.dedup import (
        minhash_lsh_pairs,
        simhash_neardup_pairs,
    )
    from s2sphere_ray.oracle_sql import neardup_pairs_sql

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(60)]
    texts: list[str] = []
    # 3 exact-dup clusters of 3 and near-dup (one-token-swap) variants.
    for c in range(3):
        base = " ".join(rng.choice(vocab, 30))
        texts += [base, base, base]
        toks = base.split()
        toks[5] = "swapped"
        texts.append(" ".join(toks))
    # Unique long docs.
    for _ in range(12):
        texts.append(" ".join(rng.choice(vocab, 25)))
    # Short and empty docs (fallback paths).
    texts += ["", " ", "one", "two words", "\tone\n", "a b", "a  b"]
    # Whitespace-variant duplicates of doc 0 (same token stream).
    texts.append(texts[0].replace(" ", "\t", 3).replace(" ", "\n", 2))
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})

    ds = rd.from_arrow(tbl)
    mh = minhash_lsh_pairs(ds, jaccard_threshold=0.8).to_pandas()
    sh = simhash_neardup_pairs(ds, max_hamming=3).to_pandas()
    want = sorted(
        [(int(a), int(b), "minhash_lsh") for a, b in zip(mh.id_a, mh.id_b)]
        + [(int(a), int(b), "simhash") for a, b in zip(sh.id_a, sh.id_b)]
    )
    assert len(want) > 10  # the corpus genuinely exercises both legs

    con = duckdb.connect()
    con.register("docs_src", tbl)
    got = con.execute(
        neardup_pairs_sql("SELECT doc_id, text FROM docs_src")
    ).fetchall()
    assert sorted([(int(r[0]), int(r[1]), r[2]) for r in got]) == want


def test_sql_hll_matches_kernel():
    """The in-SQL HyperLogLog replay must reproduce the numpy kernel's
    rounded estimate on adversarial int64 distributions: dense smalls,
    negatives (HUGEINT sign handling), 2^k boundaries, and heavy
    duplication — at two precisions."""
    import pyarrow as pa

    from s2sphere_ray.functions.sketch import (
        hll_estimate,
        hll_register_partials,
    )
    from s2sphere_ray.oracle_sql import hll_distinct_sql

    rng = np.random.default_rng(3)
    cases = [
        np.arange(1000, dtype=np.int64),
        np.concatenate([np.arange(-500, 0), np.array([0, 1, -(2**62), 2**62, 2**31, -(2**31)])]).astype(np.int64),
        np.repeat(rng.integers(-(2**60), 2**60, 200, dtype=np.int64), 37),
        rng.integers(0, 50, 5000, dtype=np.int64),
    ]
    for p in (8, 12):
        for vals in cases:
            tbl = pa.table({"v": pa.array(vals, pa.int64())})
            part = hll_register_partials(tbl, "v", p=p)
            regs = np.zeros(1 << p, dtype=np.int64)
            regs[part["reg"].to_numpy()] = part["rho"].to_numpy()
            want = int(round(hll_estimate(regs, p)))
            con = duckdb.connect()
            con.register("vals_src", tbl)
            got = con.execute(
                hll_distinct_sql("SELECT v FROM vals_src", p=p)
            ).fetchone()[0]
            assert got == want, (p, len(vals), got, want)


def test_rho_exact_bit_length():
    """_rho must use EXACT bit length: a bare float64 frexp rounds w
    within half-ulp below 2^k up to 2^k for k >= 54 (round-4 review
    finding) — pin boundary values at every width."""
    from s2sphere_ray.functions.sketch import _rho

    vals = [0, 1, 2, 3]
    for k in range(30, 63):
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    w = np.array(vals, dtype=np.uint64)
    bits = 63
    want = np.array(
        [bits + 1 if v == 0 else bits - int(v).bit_length() + 1 for v in vals],
        dtype=np.int64,
    )
    assert np.array_equal(_rho(w, bits), want)


def test_testdata_is_single_spaced():
    """Several SQL oracles tokenize with string_split(text, ' ') while
    the Arrow kernels split on any whitespace — identical ONLY on
    single-spaced text. This canary pins that property of the driver
    corpus; if it ever fails, switch those oracles to the
    regexp_split_to_array('\\s+') pattern neardup_pairs_sql uses."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01"):
        t = pq.read_table(
            f"/root/testdata/{sf}/documents.parquet", columns=["text"]
        )
        bad = pc.sum(
            pc.match_substring_regex(t["text"], r"[\t\n\r\v\f]|  |^ | $")
        ).as_py()
        assert not bad, f"{sf}: {bad} docs break the single-space assumption"
