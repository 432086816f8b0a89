"""Distributed connected components over an edge Dataset.

Implements the alternating **large-star / small-star** algorithm of
Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected
Components in MapReduce and Beyond" (ACM SoCC 2014) — the standard
shuffle-only CC construction: each round is two hash-bucketed
``groupby().map_groups`` exchanges over the *edge* set (never the
corpus), converging in O(log² n) rounds to a star per component rooted
at the component's minimum node id.

Why this shape for Ray Data / 100 TB:

- The state is always the (compact) pair stream, orders of magnitude
  smaller than the documents that generated it; each round shuffles
  only ``(int64, int64)`` rows.
- Both star operations are *per-node-neighborhood* reductions, expressed
  here as hash-bucketed groupbys with fully vectorized numpy kernels
  (lexsort + ``minimum.reduceat`` segment mins) — one Python call per
  bucket, never per node (same pattern as exact_dedup / sessionize).
- Each round ends in ``materialize()`` — required for an iterative
  algorithm on a lazy Dataset (otherwise round k re-executes rounds
  1..k-1) and safe because the state is compact.
- Convergence = the edge multiset is unchanged by BOTH stars, detected
  by (count, order-independent 64-bit checksum) per star application.
  At the star fixpoint neither operation emits duplicates, so the
  multiset signature is exact there; the checksum makes the equality
  test O(1) driver-side (collision odds ~2^-64, and a false "converged"
  would still require the count to match).

Reference-parity note: the reference corpus (empty at survey time — see
SURVEY.md §0) has no CC operator; this is one of the LLM-data-pipeline
additions (cluster-based near-dup grouping, the consumer of
minhash/Jaccard pair streams). Oracle: DuckDB recursive-CTE transitive
closure (queries.SQL_DEDUP_CLUSTERS).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MASK64 = (1 << 64) - 1
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)

NODE_SCHEMA = pa.schema([("node", pa.int64()), ("component", pa.int64())])


def _segments(u: np.ndarray):
    """Start offsets of equal-value runs in a sorted int array."""
    if len(u) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.flatnonzero(np.r_[True, u[1:] != u[:-1]])


def _dedup_sorted(u: np.ndarray, v: np.ndarray):
    """Drop consecutive duplicate (u, v) rows (inputs lexsorted)."""
    if len(u) == 0:
        return u, v
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    return u[keep], v[keep]


def _sorted_uv(group: pa.Table):
    u = group["u"].to_numpy(zero_copy_only=False)
    v = group["v"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    return _dedup_sorted(u[order], v[order])


def _pairs_table(hi: np.ndarray, lo: np.ndarray) -> pa.Table:
    return pa.table(
        {"u": pa.array(hi, pa.int64()), "v": pa.array(lo, pa.int64())}
    )


def _large_star_kernel(group: pa.Table) -> pa.Table:
    """Large-star on one bucket of SYMMETRIZED edges grouped by u:
    per node u with neighborhood Γ(u), m = min(Γ(u) ∪ {u}); emit
    (v, m) for every v ∈ Γ(u) with v > u.  Output rows are canonical
    (hi, lo): v > u ≥ m."""
    u, v = _sorted_uv(group)
    if len(u) == 0:
        return _pairs_table(u, v)
    starts = _segments(u)
    seg_len = np.diff(np.r_[starts, len(u)])
    m = np.minimum(np.minimum.reduceat(v, starts), u[starts])
    m_full = np.repeat(m, seg_len)
    mask = v > u
    return _pairs_table(v[mask], m_full[mask])


def _small_star_kernel(group: pa.Table) -> pa.Table:
    """Small-star on one bucket of CANONICAL (hi, lo) edges grouped by
    hi=u (all neighbors v < u): m = min(Γ(u)); emit (u, m) and (v, m)
    for v ∈ Γ(u), v ≠ m.  Output rows stay canonical (u > m, v > m)."""
    u, v = _sorted_uv(group)
    if len(u) == 0:
        return _pairs_table(u, v)
    starts = _segments(u)
    seg_len = np.diff(np.r_[starts, len(u)])
    m = np.minimum.reduceat(v, starts)
    m_full = np.repeat(m, seg_len)
    mask = v != m_full
    hi = np.concatenate([u[starts], v[mask]])
    lo = np.concatenate([m, m_full[mask]])
    return _pairs_table(hi, lo)


def _bucketer(n_buckets: int, symmetrize: bool):
    """map_batches fn: (optionally) symmetrize, then attach the group-by
    bucket of hash(u) — same-u rows always land in one bucket, so the
    in-kernel dedup is global for any given neighborhood."""
    from ._buckets import hash_buckets

    def add(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        if symmetrize:
            u, v = np.concatenate([u, v]), np.concatenate([v, u])
        t = _pairs_table(u, v)
        return t.append_column("_hb", pa.array(hash_buckets(u, n_buckets)))

    return add


def _star(ds, kernel, n_buckets: int, symmetrize: bool):
    return (
        ds.map_batches(
            _bucketer(n_buckets, symmetrize),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("_hb")
        .map_groups(kernel, batch_format="pyarrow")
    )


def _signature(mds) -> tuple:
    """(row count, order-independent wraparound-sum checksum) of a
    materialized pair Dataset — one tiny row per block collected."""

    def chk(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            e = u * _P1 + v * _P2
            e ^= e >> np.uint64(33)
            e *= _P1
            s = int(e.sum())
        return pa.table(
            {
                "s": pa.array([s & _MASK64], pa.uint64()),
                "c": pa.array([len(u)], pa.int64()),
            }
        )

    parts = mds.map_batches(chk, batch_format="pyarrow").take_all()
    count = sum(p["c"] for p in parts)
    return count, sum(int(p["s"]) for p in parts) & _MASK64


def _local_cc_kernel(batch: pa.Table) -> pa.Table:
    """Single-task CC over one edge block: hooking + pointer jumping
    (Shiloach–Vishkin style) on compacted node ids — O(log n) fully
    vectorized numpy iterations, no per-edge Python loop."""
    u = batch["u"].to_numpy(zero_copy_only=False)
    v = batch["v"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    m = len(u)
    eu, ev = inv[:m], inv[m:]
    parent = np.arange(len(nodes), dtype=np.int64)
    while len(eu):
        pu, pv = parent[eu], parent[ev]
        # Drop settled edges (both endpoints under one root) for good —
        # they can never hook again, and re-scanning the full edge set
        # every round made this kernel O(E·rounds): 23 s at 4M edges
        # where the shrinking scan is ~2 s (bit-identical output).
        live = pu != pv
        if not live.any():
            break
        eu, ev = eu[live], ev[live]
        pu, pv = pu[live], pv[live]
        # Hook: every root adopts the minimum root seen across its edges.
        lo, hi = np.minimum(pu, pv), np.maximum(pu, pv)
        np.minimum.at(parent, hi, lo)
        # Pointer jumping to full path compression.
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
    comp = nodes[parent]
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array(comp, pa.int64()),
        }
    )


# One finisher task holds ~16 B/edge + the compacted node arrays; 4M
# edges ≈ 64 MB — far under a worker heap, and star rounds shrink any
# larger input toward this fast (post-round state ≈ one edge per node).
LOCAL_FINISH_THRESHOLD = 1 << 22


def _contract(batch: pa.Table) -> pa.Table:
    """Connectivity-preserving local contraction: one batch's edges →
    the (node > root) star forest of its OWN components.  Output rows =
    V − C ≤ min(E, V) (spanning-forest bound) — a contraction NEVER
    grows the state, and the union of per-batch forests has exactly the
    input's connectivity, so this is a pure map-side combiner (the
    partial-aggregate idiom applied to CC).  Output is canonical
    (hi, lo): node > root = local min."""
    out = _local_cc_kernel(batch)
    node = out["node"].to_numpy(zero_copy_only=False)
    comp = out["component"].to_numpy(zero_copy_only=False)
    keep = node != comp
    return _pairs_table(node[keep], comp[keep])


def connected_components(
    edges,
    *,
    left: str = "id_a",
    right: str = "id_b",
    max_rounds: int = 64,
    local_threshold: int = LOCAL_FINISH_THRESHOLD,
):
    """(node:int64, component:int64) for every node incident to an edge;
    ``component`` is the minimum node id of the node's component.
    Isolated nodes never appear in ``edges`` and are the caller's to
    union in (standard edge-list CC semantics).

    ``edges`` is an undirected pair Dataset; self-loops are dropped,
    duplicate/reversed edges are fine.  Bucket sizing always uses the
    exact edge count the convergence signature computes anyway (a
    ``num_rows`` hint parameter was dead weight and was removed).

    Once the (always-shrinking) edge state fits one comfortable block
    (``local_threshold`` rows) the tail is finished by a SINGLE
    vectorized task (``_local_cc_kernel``) instead of more whole-cluster
    rounds — the standard large-scale CC hybrid; each star round costs
    two exchanges plus a barrier, pure overhead on a small state.  Pass
    ``local_threshold=0`` to force star rounds to full convergence.
    """
    import ray.data as rd

    from ._buckets import derive_buckets

    def normalize(batch: pa.Table) -> pa.Table:
        a = batch[left].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[right].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        # Contract each block as it is read: free volume (V−C ≤ E) when
        # blocks are node-dense, a cheap lexsort-class pass when not.
        return _contract(_pairs_table(np.maximum(a, b), np.minimum(a, b)))

    state = edges.map_batches(
        normalize, batch_format="pyarrow", batch_size=None
    ).materialize()
    n, sig = _signature(state)
    if n == 0:
        return rd.from_arrow(NODE_SCHEMA.empty_table())

    def finish_local(mds):
        # The state is MATERIALIZED and ≤ local_threshold rows: gather
        # it and run the kernel in-process — the repartition(1) +
        # map_batches execution this replaces is pure fixed overhead on
        # a single-task tail (the budgeted-sum idiom).
        from ._schema import concat_blocks

        tbl = concat_blocks(
            mds, pa.schema([("u", pa.int64()), ("v", pa.int64())])
        )
        return rd.from_arrow(_local_cc_kernel(tbl))

    if n <= local_threshold:
        return finish_local(state)

    # Dense-regime tree contraction: coalesce blocks into comfortable
    # batches (the finisher's own size class) and contract each locally,
    # repeating while a pass shrinks the state ≥30%.  Each pass is
    # map-only — no shuffle — so on node-dense graphs (edges ≫ nodes,
    # the near-duplicate-cluster regime) it replaces whole star rounds
    # at a fraction of their two-exchange cost; on sparse graphs the
    # first pass fails the shrink gate and costs one narrow rewrite.
    # Skipped when local_threshold=0 (callers forcing pure star rounds).
    if local_threshold > 0:
        for _ in range(max_rounds):
            if n <= local_threshold:
                return finish_local(state)
            c = state.map_batches(
                _contract,
                batch_format="pyarrow",
                batch_size=LOCAL_FINISH_THRESHOLD,
            ).materialize()
            n_c, sig_c = _signature(c)
            shrunk = n_c <= 0.7 * n
            state, n, sig = c, n_c, sig_c
            if not shrunk:
                break
        if n <= local_threshold:
            return finish_local(state)

    for _ in range(max_rounds):
        buckets = derive_buckets(n)
        ls = _star(state, _large_star_kernel, buckets, symmetrize=True)
        ls = ls.materialize()
        n_ls, sig_ls = _signature(ls)
        ss = _star(
            ls, _small_star_kernel, derive_buckets(n_ls), symmetrize=False
        )
        ss = ss.materialize()
        n_ss, sig_ss = _signature(ss)
        converged = (n_ls, sig_ls) == (n, sig) and (n_ss, sig_ss) == (
            n_ls,
            sig_ls,
        )
        state, n, sig = ss, n_ss, sig_ss
        if converged:
            break
        if n <= local_threshold:
            return finish_local(state)
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # State is a star set {(child, root)}: emit child→root and root→root,
    # then one bucket-dedup exchange (roots repeat once per child).
    from ._buckets import hash_buckets

    # Hoisted: derive_buckets reads live cluster resources, so deriving
    # it inside the map UDF could yield DIFFERENT bucket counts across
    # batches (autoscaling mid-job), splitting a node's duplicate rows
    # across groups and defeating the uniq dedup (round-4 review).
    nb_emit = derive_buckets(2 * n)

    def emit(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        node = np.concatenate([u, v])
        comp = np.concatenate([v, v])
        t = pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "component": pa.array(comp, pa.int64()),
            }
        )
        return t.append_column(
            "_hb", pa.array(hash_buckets(node, nb_emit))
        )

    def uniq(group: pa.Table) -> pa.Table:
        node = group["node"].to_numpy(zero_copy_only=False)
        comp = group["component"].to_numpy(zero_copy_only=False)
        order = np.lexsort((comp, node))
        node, comp = _dedup_sorted(node[order], comp[order])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "component": pa.array(comp, pa.int64()),
            }
        )

    out = (
        state.map_batches(emit, batch_format="pyarrow", batch_size=None)
        .groupby("_hb")
        .map_groups(uniq, batch_format="pyarrow")
    )
    # The groupby shuffle emits schema-less 0-row blocks for empty
    # partitions (see functions/_schema.py); the node→component table is
    # compact by construction, so heal it for downstream joins/writes.
    from ._schema import stabilize_schema

    return stabilize_schema(out, NODE_SCHEMA)


# ---------------------------------------------------------------------------
# PageRank power iteration (link-graph authority scoring)
# ---------------------------------------------------------------------------

PAGERANK_SCALE = 10**9

# Above this many distinct nodes the rank/outdeg state no longer
# broadcasts (and the driver must not gather it): pagerank() switches to
# the hash-sharded exchange path.  ~4M nodes ≈ 100 MB of (string, int64,
# int64) state — comfortably under a worker heap, well past the domain
# graphs this engine scores.
PAGERANK_NODE_BUDGET = 4_000_000


# Distinct weighted-adjacency rows below which the broadcast path's
# iterations run driver-side (the budgeted-sum idiom).
_PR_ADJ_GATHER_ROWS = 2_000_000

# Wire schema shared by the sharded path's two per-iteration exchanges:
# kind 0 rows are adjacency (node=src, other=dst, v1=multiplicity) or
# dst-partials (node=dst, v1=partial sum); kind 1 rows are node state
# (node, v1=rank, v2=outdeg).  One schema so the co-partitioning
# union(adj, state).groupby("_sh") stays schema-stable.
_PR_WIRE = pa.schema(
    [
        ("_sh", pa.int32()),
        ("kind", pa.int8()),
        ("node", pa.string()),
        ("other", pa.string()),
        ("v1", pa.int64()),
        ("v2", pa.int64()),
    ]
)

_PR_DEG_SCHEMA = pa.schema([("node", pa.string()), ("d", pa.int64())])
_PR_CS_SCHEMA = pa.schema([("c", pa.int64()), ("s", pa.int64())])


def _flat_arr(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _concat_blocks(ds, schema: pa.Schema) -> pa.Table:
    """Gather a COMPACT Dataset to one Arrow table (column-typed block
    concat — never per-row python).  Schema-less 0-row shuffle blocks
    are dropped; a fully empty input yields ``schema``'s empty table."""
    import ray as _ray

    tabs = [
        t.select(schema.names)
        for t in _ray.get(ds.to_arrow_refs())
        if t.num_rows
    ]
    if not tabs:
        return schema.empty_table()
    return pa.concat_tables(tabs).combine_chunks()


def pagerank(
    edges,
    *,
    src: str = "src",
    dst: str = "dst",
    num_iters: int = 4,
    scale: int = PAGERANK_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
    node_budget: int | None = None,
):
    """Exact-integer PageRank over a directed edge Dataset → pa.Table
    (node:string, rank:int64) — the link-graph authority signal of a
    web-corpus curation stack (Page, Brin, Motwani & Winograd 1999),
    run on the *domain* graph where the node set is vocabulary-sized.

    All arithmetic is int64: ranks start at ``scale``, each iteration is

        rank'(v) = (15·scale)//100 + (85 · Σ_{u→v} rank(u)//outdeg(u)) // 100

    so partial sums commute exactly and the result is bit-reproducible
    across block layouts AND replayable in DuckDB as unrolled CTEs
    (``//`` floor-division on nonnegative BIGINTs matches numpy).
    Dangling nodes keep the teleport term only — their absorbed mass is
    dropped, the standard "remove dangling" variant; total mass is NOT
    conserved and ranks are comparable within a run.

    Scale shape (the classifier/unigram trade), gated on the distinct
    node count vs ``node_budget`` (default :data:`PAGERANK_NODE_BUDGET`):

    - setup (both paths): ONE node-keyed exchange over per-block
      distinct (node, outdeg-partial) rows → the distributed
      (node, outdeg) Dataset;
    - **broadcast path** (nodes ≤ budget): the node table gathers ONCE
      as Arrow blocks (column concat, no row loops) and the string
      edges recode ONCE into the weighted adjacency list — distinct
      packed (src_code, dst_code) pairs with int64 multiplicities.
      Per iteration: rank//outdeg broadcast via ``ray.put``
      (node-sized), a map-only pass over the COMPACT adjacency with
      exact segment-sum pre-aggregation by dst code, then one
      ≤ distinct-dst-per-block exchange and a node-sized Arrow gather;
    - **sharded path** (nodes > budget — :func:`_pagerank_sharded`):
      rank state NEVER touches the driver.  Nodes and edges co-shard
      by a polynomial node hash; each iteration is two hash-bucketed
      ``union(...).groupby("_sh").map_groups`` exchanges — (1) each
      src shard joins its state to its adjacency and emits
      per-dst-pre-aggregated partials, (2) each dst shard folds the
      partials into its node state.  Per-shard memory is
      O(nodes/shards + edges/shards); the only driver-side object is
      the final (node, rank) result table.

    The int64 bound ``damping_num · nodes · scale < 2^62`` (any dst's
    contribution sum is at most the total mass; per-pair
    ``multiplicity · rank//deg ≤ rank`` is bounded by the same mass)
    is asserted up front, along with the 2^31 node-code pack domain.
    Both paths compute the identical integer recurrence, so results are
    bit-for-bit equal (pinned by tests/test_cc.py's forced-shard test).
    """
    if node_budget is None:
        node_budget = PAGERANK_NODE_BUDGET
    edges = edges.materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        svc = pc.value_counts(batch[src])
        dd = _flat_arr(pc.unique(batch[dst]))
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [_flat_arr(svc.field("values")), dd]
                ),
                "d": pa.concat_arrays(
                    [
                        _flat_arr(pc.cast(svc.field("counts"), pa.int64())),
                        pa.array(np.zeros(len(dd), np.int64)),
                    ]
                ),
            }
        )

    # Exact (node, outdeg) via the repo's fast exchange idiom: per-block
    # distinct partials → ONE node-hash-bucketed map_groups whose group
    # body is Arrow's C++ hash aggregate.  (A Ray sort-groupby on the
    # same high-cardinality string key measured ~29 s at 4M edges where
    # this costs ~2 s.)
    from ._buckets import derive_buckets, hash_buckets
    from .dedup import poly_hash_strings

    n_buckets = derive_buckets(edges.count())

    def add_node_bucket(batch: pa.Table) -> pa.Table:
        t = deg_partial(batch)
        return t.append_column(
            "_nb", pa.array(hash_buckets(poly_hash_strings(t["node"]),
                                         n_buckets))
        )

    def combine_deg(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "node" not in group.column_names:
            return _PR_DEG_SCHEMA.empty_table()
        return (
            group.select(["node", "d"])
            .group_by("node")
            .aggregate([("d", "sum")])
            .rename_columns(["node", "d"])
        )

    deg = (
        edges.map_batches(
            add_node_bucket, batch_format="pyarrow", batch_size=None
        )
        .groupby("_nb")
        .map_groups(combine_deg, batch_format="pyarrow")
        .materialize()
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        return pa.table(
            {"node": pa.array([], pa.string()),
             "rank": pa.array([], pa.int64())}
        )
    if damping_num * n_nodes * scale >= (1 << 62) or n_nodes >= (1 << 31):
        raise OverflowError(
            f"pagerank: {n_nodes} nodes at scale {scale} can overflow "
            "int64 contribution sums or the pair pack domain — lower "
            "`scale`"
        )
    base = (damping_den - damping_num) * scale // damping_den
    if n_nodes > node_budget:
        return _pagerank_sharded(
            edges, deg, src, dst, num_iters, scale,
            damping_num, damping_den, base,
        )

    tbl = _concat_blocks(deg, _PR_DEG_SCHEMA).sort_by("node")
    nodes = _flat_arr(tbl["node"])
    outdeg = tbl["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    import ray as _ray

    from .dedup import _get_broadcast

    rank = np.full(n_nodes, scale, dtype=np.int64)
    safe_deg = np.maximum(outdeg, 1)  # sinks never appear as src

    # Recode ONCE to the weighted adjacency list — distinct packed
    # (src_code, dst_code) pairs with multiplicities — and partition it
    # ONCE by dst-code bucket (hash-bucketed map_groups, the repo's fast
    # exchange idiom: a Ray sort-groupby on the 4M-row high-cardinality
    # pair key measured ~29 s where this bucketed exchange is ~2 s).
    # Because every dst's pairs then live in exactly ONE block, each
    # iteration's per-block segment sums are already GLOBAL per-dst
    # totals: the iterations are map + node-sized Arrow gather, no
    # exchange at all.
    nodes_ref = _ray.put(nodes)

    def adj_partial(batch: pa.Table, _ref=nodes_ref) -> pa.Table:
        bn = _get_broadcast(_ref)
        sc = pc.index_in(batch[src], value_set=bn).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        dc = pc.index_in(batch[dst], value_set=bn).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        u, m = np.unique(sc * (np.int64(1) << 32) + dc, return_counts=True)
        return pa.table(
            {
                "_db": pa.array(
                    ((u & ((np.int64(1) << 32) - 1)) % n_buckets).astype(
                        np.int32
                    )
                ),
                "p": pa.array(u),
                "m": pa.array(m.astype(np.int64)),
            }
        )

    def combine_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "p" not in group.column_names:
            return pa.table(
                {"p": pa.array([], pa.int64()),
                 "m": pa.array([], pa.int64())}
            )
        p = group["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = group["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(p, kind="stable")
        ps, ms = p[order], m[order]
        starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        sums = np.add.reduceat(ms, starts).astype(np.int64)
        return pa.table(
            {"p": pa.array(ps[starts]), "m": pa.array(sums)}
        )

    adj = (
        edges.map_batches(
            adj_partial, batch_format="pyarrow", batch_size=None
        )
        .groupby("_db")
        .map_groups(combine_pairs, batch_format="pyarrow")
        .materialize()
    )

    if adj.count() <= _PR_ADJ_GATHER_ROWS:
        # The distinct weighted adjacency fits one driver gather: run
        # every iteration in-process (the budgeted-sum idiom — each
        # distributed iteration is a map + gather dataset execution of
        # pure fixed overhead at this size).  Identical exact-int64
        # recurrence, pinned vs the distributed loop by test_cc.py.
        at = _concat_blocks(
            adj.map_batches(
                lambda b: (
                    b.select(["p", "m"])
                    if b.num_rows and "p" in b.column_names
                    else pa.table(
                        {
                            "p": pa.array([], pa.int64()),
                            "m": pa.array([], pa.int64()),
                        }
                    )
                ),
                batch_format="pyarrow",
                batch_size=None,
            ),
            pa.schema([("p", pa.int64()), ("m", pa.int64())]),
        )
        p = at["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = at["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = p >> 32
        dc = p & ((np.int64(1) << 32) - 1)
        for _ in range(num_iters):
            w = m * (rank // safe_deg).astype(np.int64)[sc]
            sums = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(sums, dc, w)
            rank = base + damping_num * sums // damping_den
        return pa.table({"node": nodes, "rank": pa.array(rank)})

    for _ in range(num_iters):
        ref = _ray.put((rank // safe_deg).astype(np.int64))

        def contrib(batch: pa.Table, _ref=ref) -> pa.Table:
            # the bucketed exchange can emit schema-less empty blocks at
            # high partition counts (round-3 hazard) — normalize first
            if batch.num_rows == 0 or "p" not in batch.column_names:
                return pa.table(
                    {
                        "c": pa.array([], pa.int64()),
                        "s": pa.array([], pa.int64()),
                    }
                )
            per_src = _get_broadcast(_ref)
            p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
            sc = p >> 32
            dc = p & ((np.int64(1) << 32) - 1)
            # m·(rank//deg) ≤ rank ≤ total mass — inside the asserted
            # bound, so the products and sums stay exact int64
            w = m * per_src[sc]
            # int64-exact per-dst total (each dst is block-local after
            # the dst-bucketed partition): bincount floats would round
            # above 2^53, so segment-sum on the sorted dst codes instead
            order = np.argsort(dc, kind="stable")
            dcs = dc[order]
            starts = np.flatnonzero(np.r_[True, dcs[1:] != dcs[:-1]])
            sums = np.add.reduceat(w[order], starts).astype(np.int64)
            return pa.table(
                {"c": pa.array(dcs[starts]), "s": pa.array(sums)}
            )

        got = _concat_blocks(
            adj.map_batches(
                contrib, batch_format="pyarrow", batch_size=None
            ),
            _PR_CS_SCHEMA,
        )
        sums = np.zeros(n_nodes, dtype=np.int64)
        # ACCUMULATE, don't assign: Ray may split an oversized group
        # output across blocks, yielding two partials for one dst — the
        # dst-bucketed partition is a pre-aggregation optimization, not
        # a correctness dependency (int64 adds commute exactly).
        np.add.at(
            sums,
            got["c"].to_numpy(zero_copy_only=False).astype(np.int64),
            got["s"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        rank = base + damping_num * sums // damping_den

    return pa.table({"node": nodes, "rank": pa.array(rank)})


def _pagerank_sharded(
    edges,
    deg,
    src: str,
    dst: str,
    num_iters: int,
    scale: int,
    damping_num: int,
    damping_den: int,
    base: int,
):
    """PageRank with hash-sharded node state — the past-broadcast-budget
    path.  The (node, rank, outdeg) state lives in a Dataset sharded by
    a polynomial node hash; the adjacency co-shards by src ONCE.  Each
    iteration: (1) ``union(adj, state).groupby(shard)`` so every src
    shard scores its own out-edges with its own rank state and emits
    per-dst pre-aggregated int64 partials, (2)
    ``union(partials, state).groupby(shard)`` so every dst shard folds
    its incoming partials into new ranks.  No driver-side node table at
    any point; all arithmetic is the same exact-int64 recurrence as the
    broadcast path, so results are bit-for-bit identical."""
    from ._buckets import derive_buckets, hash_buckets
    from ._schema import stabilize_schema
    from .dedup import poly_hash_strings

    n_shards = derive_buckets(deg.count())

    def shard_of(col) -> pa.Array:
        return pa.array(hash_buckets(poly_hash_strings(col), n_shards))

    def adj_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or src not in batch.column_names:
            return _PR_WIRE.empty_table()
        sa = _flat_arr(batch[src]).to_numpy(zero_copy_only=False)
        da = _flat_arr(batch[dst]).to_numpy(zero_copy_only=False)
        # per-block multiplicity compression (the block-local analogue
        # of the broadcast path's packed-pair exchange)
        order = np.lexsort((da, sa))
        sa, da = sa[order], da[order]
        new = np.r_[True, (sa[1:] != sa[:-1]) | (da[1:] != da[:-1])]
        starts = np.flatnonzero(new)
        m = np.diff(np.r_[starts, len(sa)]).astype(np.int64)
        su = pa.array(sa[starts], pa.string())
        n = len(starts)
        return pa.Table.from_arrays(
            [
                shard_of(su),
                pa.array(np.zeros(n, np.int8)),
                su,
                pa.array(da[starts], pa.string()),
                pa.array(m),
                pa.array(np.zeros(n, np.int64)),
            ],
            schema=_PR_WIRE,
        )

    adj = stabilize_schema(
        edges.map_batches(adj_rows, batch_format="pyarrow", batch_size=None),
        _PR_WIRE,
    )

    def state_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return _PR_WIRE.empty_table()
        nd = _flat_arr(batch["node"])
        n = len(nd)
        return pa.Table.from_arrays(
            [
                shard_of(nd),
                pa.array(np.ones(n, np.int8)),
                nd,
                pa.nulls(n, pa.string()),
                pa.array(np.full(n, scale, np.int64)),
                pc.cast(_flat_arr(batch["d"]), pa.int64()),
            ],
            schema=_PR_WIRE,
        )

    state = stabilize_schema(
        deg.map_batches(state_rows, batch_format="pyarrow", batch_size=None),
        _PR_WIRE,
    )

    def contrib_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "kind" not in group.column_names:
            return _PR_WIRE.empty_table()
        kind = group["kind"].to_numpy(zero_copy_only=False)
        am = kind == 0
        if not am.any():
            return _PR_WIRE.empty_table()  # shard has no out-edges
        node = _flat_arr(group["node"])
        v1 = group["v1"].to_numpy(zero_copy_only=False).astype(np.int64)
        v2 = group["v2"].to_numpy(zero_copy_only=False).astype(np.int64)
        sm = ~am
        snodes = node.filter(pa.array(sm))
        per_src = v1[sm] // np.maximum(v2[sm], 1)
        pos = (
            pc.index_in(node.filter(pa.array(am)), value_set=snodes)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # m·(rank//deg) ≤ rank ≤ total mass — exact int64 per the
        # asserted bound (same invariant as the broadcast path)
        w = v1[am] * per_src[pos]
        dn = (
            _flat_arr(group["other"])
            .filter(pa.array(am))
            .to_numpy(zero_copy_only=False)
        )
        order = np.argsort(dn, kind="stable")
        dns = dn[order]
        starts = np.flatnonzero(np.r_[True, dns[1:] != dns[:-1]])
        sums = np.add.reduceat(w[order], starts).astype(np.int64)
        du = pa.array(dns[starts], pa.string())
        n = len(starts)
        return pa.Table.from_arrays(
            [
                shard_of(du),
                pa.array(np.zeros(n, np.int8)),
                du,
                pa.nulls(n, pa.string()),
                pa.array(sums),
                pa.array(np.zeros(n, np.int64)),
            ],
            schema=_PR_WIRE,
        )

    def update_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "kind" not in group.column_names:
            return _PR_WIRE.empty_table()
        kind = group["kind"].to_numpy(zero_copy_only=False)
        sm = kind == 1
        if not sm.any():
            return _PR_WIRE.empty_table()  # partials always have state
        node = _flat_arr(group["node"])
        v1 = group["v1"].to_numpy(zero_copy_only=False).astype(np.int64)
        snodes = node.filter(pa.array(sm))
        n = len(snodes)
        sums = np.zeros(n, np.int64)
        pm = ~sm
        if pm.any():
            pos = (
                pc.index_in(node.filter(pa.array(pm)), value_set=snodes)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            np.add.at(sums, pos, v1[pm])
        new_rank = base + damping_num * sums // damping_den
        return pa.Table.from_arrays(
            [
                shard_of(snodes),
                pa.array(np.ones(n, np.int8)),
                snodes,
                pa.nulls(n, pa.string()),
                pa.array(new_rank),
                pa.array(
                    group["v2"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[sm]
                ),
            ],
            schema=_PR_WIRE,
        )

    for _ in range(num_iters):
        contrib = stabilize_schema(
            adj.union(state)
            .groupby("_sh")
            .map_groups(contrib_group, batch_format="pyarrow"),
            _PR_WIRE,
        )
        state = stabilize_schema(
            contrib.union(state)
            .groupby("_sh")
            .map_groups(update_group, batch_format="pyarrow"),
            _PR_WIRE,
        )

    out = _concat_blocks(state, _PR_WIRE)
    return pa.table(
        {"node": out["node"], "rank": out["v1"]}
    ).sort_by("node")
