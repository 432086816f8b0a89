"""Benchmark harness — prints ONE JSON line (driver contract).

Headline: the flagship pipeline (synthetic CC-style pages at bench scale →
geocode → leaf cell encode → spatial join vs deterministic regions → tile
counts at level 8 → consume). Sub-queries time individual operators over
``$GRAFT_SF_DIR`` testdata.

``--scaling`` runs the plain bench twice in fresh processes
(``num_cpus=SCALE_LO`` then ``SCALE_HI``; default 4 → 16, the box's honest
linear window — 32 "CPUs" are SMT threads on 16 physical cores) on
identical pre-materialized input and reports throughputs + scaling
efficiency T_lo/(T_hi·4) — the sandbox stand-in for the N vs 4N node rule
(BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "4000000"))
# Scaling pair (N vs 4N): this box has 16 physical cores (32 = SMT threads),
# so the honest linear-scaling window is 4 → 16.
SCALE_LO = int(os.environ.get("GRAFT_SCALE_LO", "4"))
SCALE_HI = int(os.environ.get("GRAFT_SCALE_HI", "16"))


# ---------------------------------------------------------------------------
# Scaled synthetic inputs for the HEAVY-pipeline scaling legs (VERDICT r4
# #8): the sf0.1 tables are too small to amortize per-process fixed cost,
# so each heavy pipeline gets a deterministic at-scale input, materialized
# once under /tmp and reused by every leg.
# ---------------------------------------------------------------------------


def _mix64(x):
    import numpy as np

    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _tiles_checksum(tiles_ds) -> str:
    """Order-insensitive 64-bit fingerprint of the flagship result
    (tile_token, n_rows): XOR over rows of mix64(cell_id) ^ mix64(n_rows
    + odd const).  ``--scaling`` asserts the lo- and hi-parallelism legs
    produced IDENTICAL output, not just a wall-clock ratio.  Computed
    OUTSIDE the timed region (one extra untimed pipeline pass)."""
    import numpy as np
    import pyarrow as pa

    from s2sphere_ray import cells as ck

    def part(batch: pa.Table) -> pa.Table:
        t = ck.token_to_cell_id_array(batch["tile_token"])
        n = batch["n_rows"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _mix64(t) ^ _mix64(n + np.uint64(0x9E37))
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"x": pa.array([int(x)], pa.uint64())})

    acc = 0
    for r in tiles_ds.map_batches(part, batch_format="pyarrow").take_all():
        acc ^= int(r["x"])
    return f"{acc:016x}"


def _heavy_docs_path(n_docs: int) -> str:
    """Near-dup corpus: clusters of 3 docs share a 40-word base (30k-word
    vocabulary), two of the three carry a 1-word mutation — realistic
    prefix-filter selectivity with planted near-dup structure."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    path = f"/tmp/graft_bench_docs_{n_docs}"
    if os.path.isdir(path) and os.listdir(path):
        return path

    def make(batch):
        ids = batch["id"].to_numpy().astype(np.int64)
        out = []
        for d in ids:
            gid = d // 3
            w = (
                _mix64(np.int64(gid) * 64 + np.arange(40, dtype=np.int64))
                % 30_000
            )
            if d % 3:
                w = w.copy()
                w[int(d % 37)] = 30_000 + d % 3
            out.append(" ".join(f"w{int(x)}" for x in w))
        return pa.table(
            {"doc_id": pa.array(ids), "text": pa.array(out, pa.string())}
        )

    rd.range(n_docs, override_num_blocks=64).map_batches(
        make, batch_format="pyarrow"
    ).write_parquet(path)
    return path


def _heavy_edges_path(n_edges: int, n_nodes: int, as_str: bool) -> str:
    """Deterministic random multigraph edges — int64 pair columns for CC,
    string node names for PageRank."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    kind = "str" if as_str else "int"
    path = f"/tmp/graft_bench_edges_{kind}_{n_edges}_{n_nodes}"
    if os.path.isdir(path) and os.listdir(path):
        return path

    def make(batch):
        ids = batch["id"].to_numpy().astype(np.int64)
        a = (_mix64(ids) % n_nodes).astype(np.int64)
        b = (_mix64(ids + np.int64(1 << 40)) % n_nodes).astype(np.int64)
        if as_str:
            return pa.table(
                {
                    "src": pa.array([f"d{x}" for x in a], pa.string()),
                    "dst": pa.array([f"d{x}" for x in b], pa.string()),
                }
            )
        lo = np.minimum(a, b)
        hi = np.maximum(a, b) + 1  # avoid self-loops
        return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi)})

    rd.range(n_edges, override_num_blocks=64).map_batches(
        make, batch_format="pyarrow"
    ).write_parquet(path)
    return path


def _run_heavy(name: str) -> tuple[int, int]:
    """One heavy scaling pipeline over its pre-materialized scaled input
    → (result_rows, input_rows).  Ray is already initialized."""
    import ray.data as rd

    if name == "jaccard":
        n = int(os.environ.get("GRAFT_HEAVY_DOCS", "60000"))
        ds = rd.read_parquet(
            _heavy_docs_path(n), columns=["doc_id", "text"]
        )
        from s2sphere_ray.functions.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(
            ds, n=3, threshold=0.8, num_rows=n
        ).count(), n
    if name == "cc":
        n = int(os.environ.get("GRAFT_HEAVY_EDGES", "4000000"))
        n_nodes = n // 8
        ds = rd.read_parquet(_heavy_edges_path(n, n_nodes, False))
        from s2sphere_ray.functions.cc import connected_components

        return connected_components(ds).count(), n
    if name == "pagerank":
        n = int(os.environ.get("GRAFT_HEAVY_EDGES", "4000000"))
        n_nodes = int(os.environ.get("GRAFT_HEAVY_NODES", "50000"))
        ds = rd.read_parquet(_heavy_edges_path(n, n_nodes, True))
        from s2sphere_ray.functions.cc import pagerank

        return pagerank(ds, num_iters=4).num_rows, n
    raise ValueError(f"unknown heavy pipeline {name!r}")


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from s2sphere_ray.pages import synth_pages, geocode_batch
    from s2sphere_ray.regions import regions_from_sf_dir
    from s2sphere_ray.stages.encode import cell_encode
    from s2sphere_ray.stages.join import spatial_join
    from s2sphere_ray.stages.tiles import tile_counts
    from s2sphere_ray.queries import (
        knn_base,
        q_pricing_summary,
        simsearch_base,
        minhash_pairs_base,
        tile_counts_base,
    )

    queries: dict[str, float] = {}
    regions = regions_from_sf_dir(SF_DIR)

    # Host-speed calibration: a fixed single-core numpy workload, timed
    # (best of 3). This box is a shared VM — co-tenant contention slows
    # identical runs up to ~4x (BASELINE.md) — so cross-run comparisons
    # should normalize by this constant (reference quiet-box value ~0.55s).
    import numpy as _np

    def _calibrate() -> float:
        x = _np.arange(20_000_000, dtype=_np.float64)
        best = 1e9
        for _ in range(3):
            c0 = time.time()
            for _ in range(5):
                y = x * 1.0000001
                s_ = float(y.sum())
            best = min(best, time.time() - c0)
        return round(best, 3)

    calibration_sec = _calibrate()

    # A/B legs can restrict the micro suite to the queries under test
    # (VERDICT r3 #5: attribute micro-bench regressions, not just the
    # flagship) — names not listed are skipped entirely.
    ab_only = set(
        filter(None, os.environ.get("GRAFT_BENCH_AB_QUERIES", "").split(","))
    )

    def timed(name, fn):
        if ab_only and name not in ab_only:
            return None
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        print(f"[bench] {name}: {dt:.3f}s", file=sys.stderr, flush=True)
        return out

    # --- heavy-pipeline scaling leg: one named pipeline over its own
    # scaled input, everything else skipped (VERDICT r4 #8) -----------------
    only_heavy = os.environ.get("GRAFT_BENCH_ONLY")
    if only_heavy and only_heavy != "flagship":
        def _warm_h(batch):
            import s2sphere_ray.functions.dedup  # noqa: F401

            return batch

        rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
            _warm_h, batch_size=1
        ).count()
        # input materialization is inside _run_heavy's *_path builders
        # (idempotent); run_scaling's untimed prep subprocess warms it
        t0 = time.time()
        n_out, n_in = _run_heavy(only_heavy)
        dt = round(time.time() - t0, 3)
        result = {
            "metric": f"{only_heavy}_pipeline_sec",
            "value": dt,
            "unit": "sec",
            "queries": {only_heavy: dt},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "bench_rows": n_in,
            "rows_per_sec": round(n_in / dt, 1),
            "result_rows": n_out,
            "calibration_sec": calibration_sec,
        }
        ray.shutdown()
        return result

    # Materialize the deterministic bench input ONCE (untimed input prep —
    # the engine's job starts at read_parquet, matching real pipelines);
    # reused across processes/parallelism levels for identical input.
    pages_path = f"/tmp/graft_bench_pages_{BENCH_ROWS}"
    if not os.path.isdir(pages_path) or not os.listdir(pages_path):
        synth_pages(BENCH_ROWS, block_rows=50_000).write_parquet(pages_path)

    # Warm-up (untimed): spawn every Ray worker and import the library in
    # each (cold worker start + imports otherwise dominate the first timed
    # stage), and touch the input once for the OS page cache.
    def _warm(batch):
        import s2sphere_ray.cells  # noqa: F401
        import s2sphere_ray.pages  # noqa: F401

        return batch

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm, batch_size=1
    ).count()
    rd.read_parquet(pages_path, columns=["doc_id"]).count()

    # --- headline: flagship over BENCH_ROWS pages -------------------------
    t0 = time.time()

    def read_pages_bench(columns=None):
        return rd.read_parquet(pages_path, columns=columns)

    def build_tiles():
        # Pure input_hint shape: geocode parses the page id from the url.
        pages = read_pages_bench(columns=["url"])
        pages = pages.map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)
        pages = pages.map_batches(cell_encode, batch_format="pyarrow", batch_size=None)
        joined = spatial_join(
            pages,
            regions,
            strategy="broadcast",
            point_cols=("doc_id", "cell_id"),
        )
        return tile_counts(joined, 8, num_rows=BENCH_ROWS)

    def headline():
        return build_tiles().count()

    # Best-of-2 for the headline: box-level noise on this VM swings ±50%
    # between runs (BASELINE.md "variance" note); the min of two
    # back-to-back runs is the stable engine number, both are reported.
    t1 = time.time()
    n_tiles = headline()
    run_a = round(time.time() - t1, 3)
    if os.environ.get("GRAFT_BENCH_SINGLE_RUN"):
        run_b = run_a
    else:
        t2 = time.time()
        headline()
        run_b = round(time.time() - t2, 3)
    queries["flagship"] = min(run_a, run_b)
    headline_sec = queries["flagship"]
    flagship_runs = [run_a, run_b]
    # Untimed output fingerprint for --scaling's cross-leg equality gate.
    tiles_checksum = _tiles_checksum(build_tiles())

    # --- operator micro-benches (skipped for scaling legs: the scaling
    # metric is flagship throughput; the full suite would triple each
    # fresh-process leg) ----------------------------------------------------
    if os.environ.get("GRAFT_BENCH_ONLY_FLAGSHIP"):
        total = round(time.time() - t0, 3)
        result = {
            "metric": "flagship_pipeline_sec",
            "value": headline_sec,
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "bench_rows": BENCH_ROWS,
            "rows_per_sec": round(BENCH_ROWS / headline_sec, 1),
            "flagship_runs": flagship_runs,
            "calibration_sec": calibration_sec,
            "n_tiles": n_tiles,
            "tiles_checksum": tiles_checksum,
            "total_sec": total,
        }
        ray.shutdown()
        return result

    timed("encode_only", lambda: read_pages_bench(columns=["doc_id"])
          .map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)
          .map_batches(cell_encode, batch_format="pyarrow", batch_size=None).count())
    def read_pages_quarter(columns=None):
        # Deterministic quarter: the first quarter of the SORTED fragment
        # list. A bare ``limit(N)`` takes whichever read blocks finish
        # first (measured: three different row sets in four identical
        # runs), making the leg's input — and its output row count —
        # run-dependent; a pinned file slice keeps the early-stop economy
        # of limit with a bit-stable input.
        frags = sorted(
            os.path.join(pages_path, f) for f in os.listdir(pages_path)
        )
        take = frags[: max(1, len(frags) // 4)]
        # 3 blocks per fragment, matching the full read's SplitBlocks
        # fan-out — a bare file-list read yields one block per file,
        # which starved the downstream map/sort at ~20-way parallelism
        # (measured 1.8-2x on both quarter legs).
        return rd.read_parquet(
            take, columns=columns, override_num_blocks=3 * len(take)
        )

    def shuffle_join():
        import pyarrow as pa

        pages = read_pages_quarter(columns=["doc_id"])
        pages = pages.map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)
        return spatial_join(
            pages,
            regions,
            strategy="shuffle",
            point_cols=("doc_id",),
            hot_threshold=max(10_000, BENCH_ROWS // 100),
            split_delta=3,
            point_types={"doc_id": pa.int64()},
            num_rows=BENCH_ROWS // 4,
        ).count()

    timed("shuffle_join_quarter", shuffle_join)

    def write_tiles_bench():
        import shutil

        from s2sphere_ray.stages.tiles import write_tiles

        out_dir = "/tmp/graft_bench_tiles"
        shutil.rmtree(out_dir, ignore_errors=True)
        pages = read_pages_quarter(columns=["url", "doc_id"])
        pages = pages.map_batches(
            geocode_batch, batch_format="pyarrow", batch_size=None
        )
        write_tiles(pages, out_dir, level=4, fingerprint="bench", tile_prefix_len=2)
        from s2sphere_ray.stages.tiles import read_manifests

        n = sum(m["rows"] for m in read_manifests(out_dir))
        shutil.rmtree(out_dir, ignore_errors=True)
        return n

    timed("write_tiles_quarter", write_tiles_bench)
    def cover_1k():
        import numpy as np

        from s2sphere_ray.regions import make_cap_regions, make_rect_regions
        import pyarrow as pa

        regions = pa.concat_tables(
            [
                make_rect_regions(np.arange(500, dtype=np.int64)),
                make_cap_regions(np.arange(500, dtype=np.int64)),
            ]
        )
        from s2sphere_ray.stages.cover import cover_regions

        ds = rd.from_arrow(regions).repartition(16)
        # Pre-start actors: lazy 1->N autoscale ramp dominated the wall
        # time for this short stage (measured 1.9-2.2s -> 1.3s). Cap the
        # pre-start at HALF the cluster: pinning min actors == all CPU
        # slots livelocks the pool against the upstream repartition tasks
        # (reproduced at num_cpus=8 — cover_1k hung indefinitely).
        return cover_regions(
            ds,
            concurrency=(min(8, max(1, NUM_CPUS // 2)), NUM_CPUS),
            batch_size=64,
        ).count()

    timed("cover_1k_regions", cover_1k)
    timed("tile_counts", lambda: tile_counts_base(SF_DIR).count())
    timed("knn", lambda: knn_base(SF_DIR).count())

    def within_join(strategy):
        from s2sphere_ray.queries import (
            WITHIN_K,
            WITHIN_RADIUS_RAD,
            _knn_queries,
            _points,
        )
        from s2sphere_ray.stages.knn import within_radius_join

        return within_radius_join(
            _points(SF_DIR),
            _knn_queries(SF_DIR),
            WITHIN_RADIUS_RAD,
            WITHIN_K,
            strategy=strategy,
        ).count()

    timed("within_join", lambda: within_join("broadcast"))
    timed("within_join_shuffle", lambda: within_join("shuffle"))
    timed("pricing", lambda: q_pricing_summary(SF_DIR).count())
    timed("simsearch", lambda: simsearch_base(SF_DIR).count())
    timed("minhash", lambda: minhash_pairs_base(SF_DIR).count())

    def cc_clusters():
        from s2sphere_ray.functions.cc import connected_components

        return connected_components(minhash_pairs_base(SF_DIR)).count()

    timed("cc_clusters", cc_clusters)
    from s2sphere_ray.queries import (
        q_dedup_exact,
        q_text_stats,
        q_asof_orders,
    )

    timed("dedup_exact", lambda: q_dedup_exact(SF_DIR).count())
    timed("text_quality", lambda: q_text_stats(SF_DIR).count())
    # q_sessions now carries BOTH event-window ops; bench them separately
    # so each leg stays a single-operator measurement.
    def sessions_only():
        from s2sphere_ray.functions.sessions import sessionize

        ds = rd.read_parquet(
            f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_id"]
        )
        return sessionize(ds, gap_minutes=30, num_rows=ds.count()).count()

    def window_funcs():
        from s2sphere_ray.functions.windows import keyed_window

        ds = rd.read_parquet(
            f"{SF_DIR}/events.parquet",
            columns=["user_id", "ts", "event_id", "value"],
        )
        return keyed_window(ds, num_rows=ds.count()).count()

    timed("sessions", sessions_only)
    timed("window_funcs", window_funcs)
    timed("asof_join", lambda: q_asof_orders(SF_DIR).count())
    from s2sphere_ray.queries import q_join_anti
    from s2sphere_ray.functions.quantiles import fixed_point_quantiles

    timed("join_anti", lambda: q_join_anti(SF_DIR).count())

    def quantiles_float():
        import ray.data as rd

        ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["value"])
        return fixed_point_quantiles(
            ds, "value", [25, 50, 75, 90, 99], scale=100
        ).num_rows

    timed("quantiles_float", quantiles_float)
    from s2sphere_ray.queries import q_webtext_quality

    def jaccard():
        # q_ngram_jaccard's sf0.01 config (bigrams, t=0.5) is degenerate
        # on the larger synthetic corpus (its tiny vocabulary makes ~all
        # pairs candidates and the guards fire, correctly); bench the
        # operator at a crawl-realistic trigram/0.8 config instead.
        import ray.data as rd

        from s2sphere_ray.functions.dedup import ngram_jaccard_pairs

        ds = rd.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        return ngram_jaccard_pairs(
            ds, n=3, threshold=0.8, num_rows=ds.count()
        ).count()

    timed("jaccard", jaccard)
    timed("webtext_quality", lambda: q_webtext_quality(SF_DIR).count())

    def classifier():
        import ray.data as rd

        from s2sphere_ray.functions.classifier import perceptron_milli

        ds = rd.read_parquet(
            f"{SF_DIR}/embeddings.parquet",
            columns=["vec_id", "label", "embedding"],
        )
        return perceptron_milli(ds, target_label=0, iters=3).count()

    timed("classifier", classifier)
    from s2sphere_ray.queries import q_line_dedup

    timed("line_dedup", lambda: q_line_dedup(SF_DIR).count())

    def pagerank_bench():
        # domain link graph: one edge per document (corpus-scale join),
        # then 4 exact-int64 power iterations over the domain node set —
        # the SAME construction the oracle checks (shared helper)
        import ray.data as rd

        from s2sphere_ray.functions.cc import pagerank
        from s2sphere_ray.queries import build_domain_link_graph

        docs = rd.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
        )
        edges = build_domain_link_graph(docs, docs.count())
        return pagerank(edges, num_iters=4).num_rows

    timed("pagerank", pagerank_bench)

    total = round(time.time() - t0, 3)
    result = {
        "metric": "flagship_pipeline_sec",
        "value": headline_sec,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_rows": BENCH_ROWS,
        "rows_per_sec": round(BENCH_ROWS / headline_sec, 1),
        "flagship_runs": flagship_runs,
        "calibration_sec": calibration_sec,
        "n_tiles": n_tiles,
        "tiles_checksum": tiles_checksum,
        "total_sec": total,
    }
    ray.shutdown()
    return result


def run_scaling(pipeline: str = "flagship") -> dict:
    # Larger input than the plain bench: the per-process fixed cost (~6 s of
    # plan/schedule/finalize latency) must amortize for the ratio to measure
    # scaling of the *work*, not the constant.
    scale_rows = os.environ.get("GRAFT_BENCH_ROWS", "32000000")
    extra = (
        {"GRAFT_BENCH_ONLY_FLAGSHIP": "1"}
        if pipeline == "flagship"
        else {"GRAFT_BENCH_ONLY": pipeline}
    )

    # Prep pass (untimed, discarded): materializes the input parquet and
    # warms the page cache so both timed runs see identical conditions.
    subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=dict(
            os.environ,
            RAY_GRAFT_CPUS=str(SCALE_HI),
            GRAFT_BENCH_ROWS=scale_rows,
            GRAFT_BENCH_SINGLE_RUN="1",
            **extra,
        ),
        capture_output=True,
        text=True,
        check=True,
    )

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_ROWS=scale_rows,
            GRAFT_BENCH_SINGLE_RUN="1",
            **extra,
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = SCALE_LO, SCALE_HI
    # Best-of-N legs, interleaved lo/hi/lo/hi: this box's co-tenant noise
    # swings single runs 3-4x (observed: the 4-CPU leg at 220 s in a noisy
    # window vs 78.7 s quiet), and one slow leg fabricates an efficiency
    # verdict in either direction. Interleaving + min-of-legs keeps the
    # ratio a property of the engine, not of which leg drew the noise.
    runs = max(1, int(os.environ.get("GRAFT_SCALING_RUNS", "2")))
    legs_lo, legs_hi = [], []
    for _ in range(runs):
        legs_lo.append(one(lo))
        legs_hi.append(one(hi))
    r_lo = min(legs_lo, key=lambda r: r["value"])
    r_hi = min(legs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    # Cross-parallelism OUTPUT equality: every leg must produce the
    # identical result, not just a throughput ratio (flagship: 64-bit
    # (tile_token, n_rows) checksum + tile count; heavy legs: exact
    # result row count — their outputs are deterministic counts/pairs).
    out_keys = [
        k
        for k in ("tiles_checksum", "n_tiles", "result_rows")
        if k in legs_lo[0]
    ]
    outputs = {
        k: sorted({str(r.get(k)) for r in legs_lo + legs_hi})
        for k in out_keys
    }
    output_match = all(len(v) == 1 for v in outputs.values())
    if not output_match:
        print(f"[bench] OUTPUT MISMATCH across legs: {outputs}", file=sys.stderr)
    return {
        "output_match": output_match,
        "outputs": {k: v[0] if len(v) == 1 else v for k, v in outputs.items()},
        "metric": "scaling_efficiency",
        "pipeline": pipeline,
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"rows_per_sec_{lo}": r_lo["rows_per_sec"],
        f"rows_per_sec_{hi}": r_hi["rows_per_sec"],
        "bench_rows": r_lo["bench_rows"],
        "runs_per_leg": runs,
        f"all_sec_{lo}": [r["value"] for r in legs_lo],
        f"all_sec_{hi}": [r["value"] for r in legs_hi],
        "calibration_sec": min(
            r.get("calibration_sec", 0.0) for r in legs_lo + legs_hi
        ),
        "sf": SF_DIR,
    }


def run_ab(prev_rev: str, ab_queries: str | None = None) -> dict:
    """Interleaved fresh-process A/B vs a previous git revision.

    The box is a shared VM whose co-tenant load swings identical runs up
    to ~4x across the day AND drifts over minutes, so one-number
    cross-version comparisons are meaningless (round-2 postmortem: a
    "1.7x regression" was pure host noise). Protocol: checkout
    ``prev_rev`` into a temp git worktree, run flagship-only single-run
    legs in A-B-B-A order (alternation cancels linear drift), normalize
    every leg by its own in-process single-core calibration constant,
    and report the ratio of best normalized times. Ratio > 1 means the
    CURRENT tree is slower than ``prev_rev`` after removing host speed.
    """
    repo = os.path.dirname(os.path.abspath(__file__))
    wt = f"/tmp/graft_ab_{prev_rev.replace('/', '_')[:24]}_{os.getpid()}"
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, prev_rev],
        cwd=repo,
        check=True,
        capture_output=True,
        text=True,
    )
    try:
        env_common = dict(
            os.environ,
            GRAFT_BENCH_SINGLE_RUN="1",
        )
        if not ab_queries:
            env_common["GRAFT_BENCH_ONLY_FLAGSHIP"] = "1"
        # Per-query A/B (VERDICT r3 #5): run the FULL micro suite in
        # BOTH legs — identical query order and session warm-state —
        # and use ``ab_queries`` only to select which ratios to report.
        # (First attempt skipped unlisted queries in the current leg
        # only; the differing preceding workload shifted per-query
        # timings up to 1.9x and manufactured phantom regressions.)

        def leg(script_dir: str) -> dict:
            out = subprocess.run(
                [sys.executable, os.path.join(script_dir, "bench.py")],
                env=env_common,
                cwd=script_dir,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        legs = []  # (which, result)
        for which, d in (("cur", repo), ("prev", wt), ("prev", wt), ("cur", repo)):
            legs.append((which, leg(d)))

        def best_norm(which: str, q: str = None) -> float:
            vals = [
                (r["queries"][q] if q else r["value"])
                / max(r["calibration_sec"], 1e-6)
                for w, r in legs
                if w == which and (q is None or q in r.get("queries", {}))
            ]
            return min(vals) if vals else float("nan")

        cur_n, prev_n = best_norm("cur"), best_norm("prev")
        per_query = {}
        for q in filter(None, (ab_queries or "").split(",")):
            cq, pq = best_norm("cur", q), best_norm("prev", q)
            per_query[q] = {
                "ratio": round(cq / pq, 3),
                "cur_normalized": round(cq, 2),
                "prev_normalized": round(pq, 2),
            }
        return {
            "metric": "ab_normalized_ratio",
            "value": round(cur_n / prev_n, 3),
            "unit": "ratio",
            "prev_rev": prev_rev,
            "cur_normalized": round(cur_n, 2),
            "prev_normalized": round(prev_n, 2),
            "per_query": per_query,
            "legs": [
                {
                    "which": w,
                    "sec": r["value"],
                    "calibration_sec": r["calibration_sec"],
                }
                for w, r in legs
            ],
            "bench_rows": legs[0][1]["bench_rows"],
            "sf": SF_DIR,
        }
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=repo,
            capture_output=True,
            text=True,
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        # bench.py --scaling [pipeline[,pipeline...]] — default flagship
        # (the driver contract); heavy legs: jaccard, cc, pagerank.
        i = sys.argv.index("--scaling")
        names = (
            sys.argv[i + 1].split(",")
            if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-")
            else ["flagship"]
        )
        if len(names) == 1:
            print(json.dumps(run_scaling(names[0])))
        else:
            print(
                json.dumps(
                    {
                        "metric": "scaling_efficiency_multi",
                        "pipelines": {n: run_scaling(n) for n in names},
                    }
                )
            )
    elif "--ab" in sys.argv:
        # bench.py --ab <rev> [q1,q2,...]  (extra arg = per-query A/B)
        i = sys.argv.index("--ab")
        rev = sys.argv[i + 1]
        qcsv = sys.argv[i + 2] if len(sys.argv) > i + 2 else None
        print(json.dumps(run_ab(rev, qcsv)))
    else:
        print(json.dumps(run_bench()))
