"""Hypothesis property fuzzing over the kernel layer (beyond the fixed-seed
suites): encode/decode/token round trips, hierarchy algebra, interval and
cell-union invariants hold for arbitrary inputs."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from s2sphere_ray import cells as ck
from s2sphere_ray import geometry as g

lat_st = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lng_st = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)
level_st = st.integers(min_value=0, max_value=30)


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lng=lng_st)
def test_leaf_roundtrip_any_point(lat, lng):
    ids = ck.cell_id_from_latlng(np.array([lat]), np.array([lng]))
    assert bool(ck.is_valid(ids)[0]) and bool(ck.is_leaf(ids)[0])
    la, lo = ck.cell_id_to_latlng(ids)
    ids2 = ck.cell_id_from_latlng(la, lo)
    assert int(ids[0]) == int(ids2[0])
    tok = ck.token_from_cell_id(ids)
    assert int(ck.token_to_cell_id_array(tok)[0]) == int(ids[0])


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lng=lng_st, level=level_st)
def test_parent_algebra_any_level(lat, lng, level):
    leaf = ck.cell_id_from_latlng(np.array([lat]), np.array([lng]))
    p = ck.parent(leaf, level)
    assert int(ck.level(p)[0]) == level
    assert bool(ck.contains(p, leaf)[0])
    cid = g.CellId(int(p[0]))
    assert cid.to_token() == ck.token_from_cell_id(p)[0]
    if level < 30:
        children = cid.children()
        assert len(children) == 4
        assert children[0].id == cid.child_begin().id
        for ch in children:
            assert cid.contains(ch)
        # children ranges tile the parent range exactly
        assert children[0].range_min().id == cid.range_min().id
        assert children[3].range_max().id == cid.range_max().id


@settings(max_examples=100, deadline=None)
@given(
    lo=st.floats(-math.pi, math.pi, allow_nan=False),
    hi=st.floats(-math.pi, math.pi, allow_nan=False),
    p=st.floats(-math.pi, math.pi, allow_nan=False),
)
def test_sphere_interval_complement_partition(lo, hi, p):
    s = g.SphereInterval(lo, hi)
    if not s.is_valid():
        return
    comp = s.get_complement()
    if s.is_empty() or s.is_full():
        assert comp.is_full() or comp.is_empty()
        return
    # every point is in s or its complement (boundaries in both)
    assert s.contains(p) or comp.contains(p)


@settings(max_examples=60, deadline=None)
@given(
    lat=lat_st,
    lng=lng_st,
    level=st.integers(min_value=1, max_value=28),
    data=st.data(),
)
def test_union_normalize_contains_members(lat, lng, level, data):
    base = g.CellId.from_latlng(g.LatLng.from_degrees(lat, lng)).parent(level)
    members = [base]
    # random descendants/neighbors
    for _ in range(data.draw(st.integers(0, 4))):
        deeper = data.draw(st.integers(level, min(30, level + 4)))
        members.append(base.child_begin(deeper))
    members += base.get_edge_neighbors()
    union = g.CellUnion(members)
    for m in members:
        assert union.contains_cellid(m)
    ids = union.cell_ids
    for a in range(len(ids) - 1):
        assert ids[a].id < ids[a + 1].id
        assert not ids[a].contains(ids[a + 1])


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=20)
)
def test_poly_hash_matches_scalar_reference(docs):
    """poly_hash_strings (vectorized prefix-sum form) must equal the
    straightforward per-doc Horner evaluation for arbitrary byte strings."""
    import numpy as np
    import pyarrow as pa

    from s2sphere_ray.functions.dedup import _POLY_R, poly_hash_strings

    def ref(b: bytes) -> int:
        k = (len(b) + 7) // 8
        pad = b + bytes(k * 8 - len(b))
        h = 0
        for w in np.frombuffer(pad, dtype="<u8"):
            h = (h * int(_POLY_R) + int(w)) % (1 << 64)
        z = h ^ len(b)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % (1 << 64)
        return z ^ (z >> 31)

    got = poly_hash_strings(pa.array(docs, pa.binary()))
    assert [int(x) for x in got] == [ref(d) for d in docs]


@settings(max_examples=25, deadline=None)
@given(
    members=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=500
    )
)
def test_bloom_never_false_negative(members):
    import numpy as np

    from s2sphere_ray.state import BloomFilter

    arr = np.array(members, dtype=np.int64)
    bf = BloomFilter.build(arr)
    assert bf.contains(arr).all()


_line_st = st.text(alphabet="abc \n", max_size=60)


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(_line_st, min_size=1, max_size=12))
def test_collapse_tokens_matches_naive(texts):
    import pyarrow as pa

    from s2sphere_ray.functions.web import collapse_repeated_tokens_batch

    got, kept, dropped = collapse_repeated_tokens_batch(pa.array(texts))
    for t, g_, k_, d_ in zip(
        texts, got.to_pylist(), kept.to_pylist(), dropped.to_pylist()
    ):
        toks = t.split(" ")
        out = [w for i, w in enumerate(toks) if i == 0 or w != toks[i - 1]]
        assert g_ == " ".join(out)
        assert k_ == len(out) and d_ == len(toks) - len(out)


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(_line_st, min_size=1, max_size=10),
    chunk=st.integers(min_value=2, max_value=9),
    overlap=st.integers(min_value=0, max_value=4),
)
def test_chunk_documents_matches_naive_property(texts, chunk, overlap, ray_session):
    import pyarrow as pa
    import ray.data as rd

    from s2sphere_ray.functions.web import chunk_documents

    # ASCII-only corpus (operator chunks on bytes == chars here)
    if overlap >= chunk:
        return
    stride = chunk - overlap
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    got = {}
    for r in chunk_documents(
        ds, chunk_chars=chunk, overlap=overlap
    ).take_all():
        got[(r["doc_id"], r["chunk_ix"])] = r["chunk_text"]
    for d, t in enumerate(texts):
        n = max(1, -(-(len(t) - overlap) // stride))
        for ix in range(n):
            assert got[(d, ix)] == t[ix * stride : ix * stride + chunk]
        assert (d, n) not in got


# --- BPE merge kernel fuzz (functions/bpe.py) ------------------------------


def _py_apply_merge(words, a, b, nid):
    out_words = []
    for s in words:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(nid)
                i += 2
            else:
                out.append(s[i])
                i += 1
        out_words.append(tuple(out))
    return out_words


@settings(max_examples=200, deadline=None)
@given(
    words=st.lists(
        st.lists(st.integers(0, 3), max_size=8).map(tuple), max_size=8
    ),
    a=st.integers(0, 3),
    b=st.integers(0, 3),
)
def test_bpe_apply_merge_matches_greedy_reference(words, a, b):
    """_apply_merge == the left-to-right greedy scan for ANY symbol
    sequence, including same-symbol runs and cross-word boundaries."""
    import numpy as np

    from s2sphere_ray.functions.bpe import _apply_merge

    flat = np.array([x for w in words for x in w], dtype=np.int64)
    offsets = np.cumsum([0] + [len(w) for w in words]).astype(np.int64)
    got_flat, got_off = _apply_merge(flat, offsets, a, b, 99)
    exp = _py_apply_merge(words, a, b, 99)
    exp_flat = [x for w in exp for x in w]
    exp_off = list(np.cumsum([0] + [len(w) for w in exp]))
    assert got_flat.tolist() == exp_flat
    assert got_off.tolist() == exp_off


@settings(max_examples=20, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), max_size=24
    ),
)
def test_pagerank_random_graphs_match_naive(ray_session, edges):
    """Exact-int64 PageRank equals the per-edge Python reference on
    arbitrary small multigraphs (self-loops, parallel edges, sinks)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from s2sphere_ray.functions.cc import pagerank

    if not edges:
        return
    names = [f"n{i}" for i in range(6)]
    src = [names[a] for a, _ in edges]
    dst = [names[b] for _, b in edges]

    nodes = sorted(set(src) | set(dst))
    pos = {v: i for i, v in enumerate(nodes)}
    outdeg = np.zeros(len(nodes), np.int64)
    for s in src:
        outdeg[pos[s]] += 1
    scale = 10**9
    r = np.full(len(nodes), scale, np.int64)
    for _ in range(4):
        acc = np.zeros(len(nodes), np.int64)
        per = r // np.maximum(outdeg, 1)
        for a, b in zip(src, dst):
            acc[pos[b]] += per[pos[a]]
        r = 15 * scale // 100 + 85 * acc // 100
    exp = dict(zip(nodes, r.tolist()))

    out = pagerank(
        rd.from_arrow(
            pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        ).repartition(3)
    )
    got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    assert got == exp
