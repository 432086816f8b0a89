"""Connected components (functions/cc.py) vs a pure-Python union-find
reference, across the graph shapes that stress the large-star/small-star
rounds: long chains (maximum rounds), dense random graphs (duplicate and
reversed edges), stars, multi-component forests, and degenerate inputs.
"""

import numpy as np
import pyarrow as pa
import pytest


def _ref_cc(pairs):
    """Union-find ground truth: (node, min-id component) for every node
    incident to a non-self-loop edge."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {x for p in pairs if p[0] != p[1] for x in p}
    return sorted((n, find(n)) for n in nodes)


def _run(ray_session, pairs, parts=5, local_threshold=None):
    import ray.data as rd

    from s2sphere_ray.functions.cc import connected_components

    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in pairs], pa.int64()),
            "id_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    if len(pairs) >= parts:
        ds = ds.repartition(parts)
    kw = {} if local_threshold is None else {"local_threshold": local_threshold}
    out = connected_components(ds, **kw)
    return sorted((r["node"], r["component"]) for r in out.take_all())


# local_threshold=0 forces the distributed large-star/small-star rounds
# to full convergence; the default takes the single-task finisher path.
BOTH_PATHS = pytest.mark.parametrize("thr", [None, 0], ids=["local", "stars"])


@BOTH_PATHS
def test_cc_chain(ray_session, thr):
    """200-node path graph — the propagation worst case (most rounds)."""
    pairs = [(i, i + 1) for i in range(200)]
    assert _run(ray_session, pairs, local_threshold=thr) == _ref_cc(pairs)


@BOTH_PATHS
def test_cc_chain_reversed_ids(ray_session, thr):
    """Descending chain: min id is at the far end from every start."""
    pairs = [(i + 1, i) for i in range(120)][::-1]
    assert _run(ray_session, pairs, local_threshold=thr) == _ref_cc(pairs)


@BOTH_PATHS
def test_cc_multi_component_with_noise(ray_session, thr):
    """Forest + cycle + self-loops + duplicate/reversed edges."""
    pairs = (
        [(0, 1), (1, 2), (10, 11), (11, 12), (12, 10)]
        + [(5, 3), (3, 5), (4, 4), (3, 4), (9, 9)]
        + [(100, 50), (50, 100), (100, 50)]
    )
    assert _run(ray_session, pairs, local_threshold=thr) == _ref_cc(pairs)


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(7, 500, 800), (11, 64, 40)])
@BOTH_PATHS
def test_cc_random(ray_session, thr, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    pairs = [
        tuple(map(int, rng.integers(0, n_nodes, 2))) for _ in range(n_edges)
    ]
    assert _run(ray_session, pairs, local_threshold=thr) == _ref_cc(pairs)


@BOTH_PATHS
def test_cc_star_and_singleton_edge(ray_session, thr):
    pairs = [(1000, i) for i in range(30)]
    assert _run(ray_session, pairs, local_threshold=thr) == _ref_cc(pairs)
    assert _run(ray_session, [(42, 7)], local_threshold=thr) == [
        (7, 7),
        (42, 7),
    ]


def test_cc_empty_and_self_loops_only(ray_session):
    got = _run(ray_session, [])
    assert got == []
    got = _run(ray_session, [(3, 3), (9, 9)])
    assert got == []


def test_cc_hybrid_handoff(ray_session):
    """Star rounds shrink the state, then the finisher takes over: a
    threshold between the initial and one-round edge counts exercises
    the mid-iteration handoff."""
    pairs = [(i, i + 1) for i in range(400)] + [(i, i + 2) for i in range(398)]
    got = _run(ray_session, pairs, local_threshold=500)
    assert got == _ref_cc(pairs)


def test_cc_contraction_gate_falls_back_to_stars(ray_session):
    """A long chain is incompressible by local contraction (a spanning
    forest of a chain IS the chain), so the dense-regime contraction
    pass must fail its shrink gate and hand off to the star rounds —
    with a threshold far below the node count, the distributed rounds
    do the real work."""
    pairs = [(i, i + 1) for i in range(600)]
    got = _run(ray_session, pairs, local_threshold=50)
    assert got == _ref_cc(pairs)


def test_cc_output_schema_and_invariants(ray_session):
    """Every node appears exactly once; every component label is a member
    of its own component and the minimum of it; schema is typed even for
    forced-high partition counts (empty-partition hazard)."""
    import ray.data as rd

    from s2sphere_ray.functions.cc import connected_components

    rng = np.random.default_rng(3)
    pairs = [tuple(map(int, rng.integers(0, 200, 2))) for _ in range(300)]
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in pairs], pa.int64()),
            "id_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    out = connected_components(rd.from_arrow(t).repartition(32))
    assert out.schema().names == ["node", "component"]
    rows = out.take_all()
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes))
    comp_of = {r["node"]: r["component"] for r in rows}
    for node, comp in comp_of.items():
        assert comp in comp_of and comp_of[comp] == comp
        assert comp <= node
    members = {}
    for node, comp in comp_of.items():
        members.setdefault(comp, []).append(node)
    for comp, ms in members.items():
        assert comp == min(ms)


def _naive_pagerank(src, dst, iters=4, scale=10**9):
    nodes = sorted(set(src) | set(dst))
    pos = {v: i for i, v in enumerate(nodes)}
    outdeg = np.zeros(len(nodes), np.int64)
    for s in src:
        outdeg[pos[s]] += 1
    r = np.full(len(nodes), scale, np.int64)
    base = 15 * scale // 100
    for _ in range(iters):
        acc = np.zeros(len(nodes), np.int64)
        per = r // np.maximum(outdeg, 1)
        for a, b in zip(src, dst):
            acc[pos[b]] += per[pos[a]]
        r = base + 85 * acc // 100
    return dict(zip(nodes, r.tolist()))


def test_pagerank_matches_naive_and_layout_independent(ray_session):
    import ray.data as rd

    from s2sphere_ray.functions.cc import pagerank

    rng = np.random.default_rng(11)
    doms = [f"d{i}" for i in range(15)]
    si = rng.integers(0, 15, 600)
    di = rng.integers(0, 15, 600)
    src = [doms[i] for i in si]
    dst = [doms[i] for i in di]
    exp = _naive_pagerank(src, dst)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    for parts in (1, 11):
        out = pagerank(rd.from_arrow(tbl).repartition(parts))
        got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
        assert got == exp, f"parts={parts}"


def test_pagerank_sink_and_dangling(ray_session):
    """A pure sink (never a src) collects mass; a source-only node
    keeps the teleport floor after its mass drains to ranks below."""
    import ray.data as rd

    from s2sphere_ray.functions.cc import pagerank

    # a -> sink, b -> sink, sink has no out-edges (dangling)
    tbl = pa.table(
        {"src": pa.array(["a", "b", "a"]), "dst": pa.array(["sink", "sink", "b"])}
    )
    exp = _naive_pagerank(["a", "b", "a"], ["sink", "sink", "b"])
    out = pagerank(rd.from_arrow(tbl))
    got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    assert got == exp
    assert got["sink"] > got["a"]  # sink accumulates, source decays


def test_pagerank_empty_and_overflow_guard(ray_session):
    import ray.data as rd

    from s2sphere_ray.functions.cc import pagerank

    empty = pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
    )
    out = pagerank(rd.from_arrow(empty))
    assert out.num_rows == 0
    tbl = pa.table({"src": pa.array(["a"]), "dst": pa.array(["b"])})
    with pytest.raises(OverflowError):
        pagerank(rd.from_arrow(tbl), scale=1 << 61)


def test_pagerank_high_partition_counts(ray_session):
    """The adjacency groupby emits schema-less empty blocks when
    partitions outnumber distinct pairs (round-3 hazard class): the
    iteration consumer must normalize them and stay exact."""
    import ray.data as rd

    from s2sphere_ray.functions.cc import pagerank

    src = ["a", "b", "c", "a"]
    dst = ["b", "c", "a", "c"]
    exp = _naive_pagerank(src, dst)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    out = pagerank(rd.from_arrow(tbl).repartition(32))
    got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    assert got == exp


def test_pagerank_sharded_matches_broadcast_bitforbit(ray_session):
    """Forcing the past-budget hash-sharded path (node_budget=1) must
    reproduce the broadcast path bit-for-bit on a random multigraph —
    same nodes, same exact-int64 ranks, at several edge layouts."""
    import ray.data as rd

    from s2sphere_ray.functions.cc import pagerank

    rng = np.random.default_rng(23)
    doms = [f"d{i}" for i in range(40)]
    si = rng.integers(0, 40, 1500)
    di = rng.integers(0, 40, 1500)
    src = [doms[i] for i in si]
    dst = [doms[i] for i in di]
    exp = _naive_pagerank(src, dst)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    for parts in (1, 13):
        ds = rd.from_arrow(tbl).repartition(parts)
        broad = pagerank(ds)
        shard = pagerank(ds, node_budget=1)
        assert broad.equals(shard), f"parts={parts}"
        got = dict(zip(shard["node"].to_pylist(), shard["rank"].to_pylist()))
        assert got == exp, f"parts={parts}"


def test_pagerank_sharded_sink_dangling_and_empty(ray_session):
    """Sharded-path edge regimes: dangling sinks, source-only nodes,
    and shards that receive state but no adjacency (or vice versa)."""
    import ray.data as rd

    from s2sphere_ray.functions.cc import pagerank

    src = ["a", "b", "a", "x"]
    dst = ["sink", "sink", "b", "y"]
    exp = _naive_pagerank(src, dst)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    out = pagerank(rd.from_arrow(tbl).repartition(32), node_budget=1)
    got = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    assert got == exp


def test_pagerank_driver_iterations_match_distributed(ray_session, monkeypatch):
    """Forcing the adjacency past the driver-gather budget (distributed
    per-iteration map+gather loop) must be bit-identical to the default
    in-process iteration path."""
    import ray.data as rd

    import s2sphere_ray.functions.cc as cc

    rng = np.random.default_rng(17)
    n_nodes = 300
    src = rng.integers(0, n_nodes, 4000)
    dst = rng.integers(0, n_nodes, 4000)
    tbl = pa.table(
        {
            "src": pa.array([f"d{x}" for x in src], pa.string()),
            "dst": pa.array([f"d{x}" for x in dst], pa.string()),
        }
    )
    a = cc.pagerank(rd.from_arrow(tbl), num_iters=5)
    monkeypatch.setattr(cc, "_PR_ADJ_GATHER_ROWS", 0)
    b = cc.pagerank(rd.from_arrow(tbl), num_iters=5)
    assert a.sort_by("node").equals(b.sort_by("node"))


# --- pure-kernel fuzz (no Ray): the contraction combiner ---------------------


def _kernel_pairs(pairs):
    import pyarrow as pa

    return pa.table(
        {
            "u": pa.array([a for a, _ in pairs], pa.int64()),
            "v": pa.array([b for _, b in pairs], pa.int64()),
        }
    )


def test_contract_fuzz_preserves_connectivity():
    """_contract is the map-side combiner: for ANY block split, the union
    of per-block contractions must reach the same components as the raw
    edges, and each contraction must be canonical (node > component,
    component = local min) and never larger than its input."""
    from s2sphere_ray.functions.cc import _contract, _local_cc_kernel

    rng = np.random.default_rng(99)
    for trial in range(40):
        n_nodes = int(rng.integers(2, 120))
        n_edges = int(rng.integers(1, 300))
        pairs = [
            (int(a), int(b))
            for a, b in zip(
                rng.integers(0, n_nodes, n_edges),
                rng.integers(0, n_nodes, n_edges),
            )
        ]
        # arbitrary split into 1..5 blocks
        k = int(rng.integers(1, 6))
        cuts = sorted(rng.integers(0, n_edges + 1, k - 1).tolist())
        blocks, lo = [], 0
        for hi in cuts + [n_edges]:
            blocks.append(pairs[lo:hi])
            lo = hi
        contracted = []
        for blk in blocks:
            canon = [(max(a, b), min(a, b)) for a, b in blk if a != b]
            out = _contract(_kernel_pairs(canon))
            node = out["u"].to_numpy(zero_copy_only=False)
            comp = out["v"].to_numpy(zero_copy_only=False)
            assert len(out) <= len(canon) or len(canon) == 0
            assert (node > comp).all()  # canonical, no settled rows
            contracted.extend(zip(node.tolist(), comp.tolist()))
        # finishing the union of contractions == finishing the raw edges
        got = _local_cc_kernel(_kernel_pairs(contracted))
        want = _ref_cc(pairs)
        assert (
            sorted(
                zip(
                    got["node"].to_numpy(zero_copy_only=False).tolist(),
                    got["component"].to_numpy(zero_copy_only=False).tolist(),
                )
            )
            == want
        )


def test_local_kernel_fuzz_vs_union_find():
    """_local_cc_kernel (with the settled-edge dropping) vs union-find on
    adversarial shapes: chains, stars, cliques, random multigraphs with
    duplicates/reversals/self-loops."""
    from s2sphere_ray.functions.cc import _local_cc_kernel

    rng = np.random.default_rng(1234)
    shapes = []
    shapes.append([(i, i + 1) for i in range(150)])          # chain
    shapes.append([(0, i) for i in range(1, 80)])            # star
    shapes.append(
        [(i, j) for i in range(12) for j in range(i + 1, 12)]
    )                                                        # clique
    for _ in range(25):                                      # random
        n = int(rng.integers(2, 200))
        m = int(rng.integers(1, 400))
        shapes.append(
            [
                (int(a), int(b))
                for a, b in zip(
                    rng.integers(0, n, m), rng.integers(0, n, m)
                )
            ]
        )
    for pairs in shapes:
        canon = [(max(a, b), min(a, b)) for a, b in pairs if a != b]
        got = _local_cc_kernel(_kernel_pairs(canon))
        assert (
            sorted(
                zip(
                    got["node"].to_numpy(zero_copy_only=False).tolist(),
                    got["component"].to_numpy(zero_copy_only=False).tolist(),
                )
            )
            == _ref_cc(pairs)
        )
