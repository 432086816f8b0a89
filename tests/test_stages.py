"""Ray Data stage tests: pages passthrough, tiling, kNN, dedup, text, sim,
multimodal plumbing, resumable sink."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_pages_text_byte_identical(ray_session):
    """BASELINE.json per-row invariant: extracted text passes through
    byte-identical per url end-to-end."""
    from s2sphere_ray.pages import read_pages, geocode_batch

    docs = pq.read_table(f"{SF}/documents.parquet")
    want = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    ds = read_pages(SF).map_batches(geocode_batch, batch_format="pyarrow")
    got = ds.take_all()
    assert len(got) == docs.num_rows
    for row in got:
        assert row["text"] == want[row["doc_id"]]
        assert row["url"].endswith(f"/{row['doc_id']}")
        assert row["html"] == b"<html><body>" + row["text"].encode() + b"</body></html>"


def test_geocode_matches_scalar_reference(ray_session):
    from s2sphere_ray.pages import geocode_from_doc_id

    lat, lng = geocode_from_doc_id(np.arange(10000, dtype=np.int64))
    assert lat.min() >= -89.9 and lat.max() <= 89.9
    assert lng.min() >= -180.0 and lng.max() < 180.0
    hot = np.arange(10000) % 5 == 0
    # hot rows sit within 0.5° of one of the three city centers
    from s2sphere_ray.pages import HOT_CITIES

    for clat, clng in HOT_CITIES:
        pass
    d = np.full(hot.sum(), np.inf)
    for clat, clng in HOT_CITIES:
        d = np.minimum(
            d, np.abs(lat[hot] - clat) + np.abs(lng[hot] - clng)
        )
    assert d.max() <= 1.0 + 1e-9


def test_tile_counts_match_brute(ray_session):
    import ray.data as rd
    from s2sphere_ray import cells as ck
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.stages.tiles import tile_counts

    doc_id = np.arange(2000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    ds = rd.from_arrow(
        pa.table({"doc_id": doc_id, "lat": lat, "lng": lng})
    )
    out = {r["tile_token"]: r["n_rows"] for r in tile_counts(ds, 6).take_all()}
    tiles = ck.parent(ck.cell_id_from_latlng(lat, lng), 6)
    toks = ck.token_from_cell_id(tiles)
    import collections

    want = collections.Counter(toks)
    assert out == dict(want)


def test_knn_matches_brute(ray_session):
    import ray.data as rd
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.stages.knn import knn_points
    from s2sphere_ray.stages.join import _haversine_oracle

    doc_id = np.arange(3000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    ds = rd.from_arrow(pa.table({"doc_id": doc_id, "lat": lat, "lng": lng}))
    queries = pa.table(
        {
            "query_id": pa.array([0, 1, 2], pa.int64()),
            "lat": pa.array([48.0, -10.0, 35.0]),
            "lng": pa.array([2.0, 100.0, -140.0]),
        }
    )
    out = knn_points(ds, queries, k=7).take_all()
    assert len(out) == 21
    for q in range(3):
        d = _haversine_oracle(
            lat, lng, queries["lat"][q].as_py(), queries["lng"][q].as_py()
        )
        order = np.lexsort((doc_id, d))[:7]
        got = sorted(
            (r["rank"], r["doc_id"]) for r in out if r["query_id"] == q
        )
        want = [(i + 1, int(doc_id[order[i]])) for i in range(7)]
        assert got == want


def test_exact_dedup_with_duplicates(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.dedup import exact_dedup

    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(6), pa.int64()), "text": pa.array(texts)}
        )
    )
    out = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    assert out == [0, 1, 3]


def test_minhash_finds_near_dupes(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different content about ray data pipelines " * 6
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([base, near, far]),
            }
        )
    )
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found
    assert all(p == (1, 2) for p in found)


def test_simhash_similarity(ray_session):
    from s2sphere_ray.functions.dedup import simhash_batch, ngram_jaccard

    t = pa.table(
        {
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta eta theta",
                    "alpha beta gamma delta epsilon zeta eta iota",
                    "one two three four five six seven eight",
                ]
            )
        }
    )
    out = simhash_batch(t)
    h = out["simhash"].to_numpy()
    d01 = bin(int(h[0]) ^ int(h[1])).count("1")
    d02 = bin(int(h[0]) ^ int(h[2])).count("1")
    assert d01 < d02
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0


def test_text_functions_deterministic(ray_session):
    from s2sphere_ray.functions.text import (
        token_count_batch,
        quality_batch,
        fingerprint_batch,
        LangIdStage,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["the cat and the hat", "der hund und die katze ist"]),
        }
    )
    tc = token_count_batch(t)
    assert tc["n_tokens"].to_pylist() == [5, 6]
    q = quality_batch(t)
    assert q["stopword_hits"].to_pylist()[0] == 3  # the, and, the
    fp1 = fingerprint_batch(t)["fingerprint"].to_pylist()
    fp2 = fingerprint_batch(t)["fingerprint"].to_pylist()
    assert fp1 == fp2 and fp1[0] != fp1[1]
    lid = LangIdStage()
    langs = lid(t)["lang_guess"].to_pylist()
    assert langs == ["en", "de"]


def test_cosine_topk_exact(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.sim import cosine_topk

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float32()), 16
            ),
        }
    )
    queries = pa.table(
        {
            "query_id": pa.array([7], pa.int64()),
            "embedding": t["embedding"].slice(7, 1),
        }
    )
    out = cosine_topk(rd.from_arrow(t), queries, k=5).take_all()
    assert out[0]["vec_id"] == 7 and out[0]["rank"] == 1
    e = emb.astype(np.float64)
    en = e / np.linalg.norm(e, axis=1, keepdims=True)
    sims = en @ en[7]
    want = np.lexsort((np.arange(200), -sims))[:5].tolist()
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])] == want


def test_multimodal_plumbing(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.multimodal import (
        synth_media_table,
        extract_features,
        ImageFeatureStage,
    )

    media = synth_media_table(50)
    out = extract_features(rd.from_arrow(media), dim=16).take_all()
    assert len(out) == 50
    assert len(out[0]["features"]) == 16
    # mode="real" resolves to the vendored numpy codec tier here (no
    # PIL in this container) and is STRICT: synth payloads are opaque
    # bytes, not PPM/PGM/BMP, so decode must raise rather than fall
    # back silently.
    with pytest.raises(ValueError, match="PPM/PGM/BMP"):
        ImageFeatureStage(fake=False)(media)


def test_npimage_codec_roundtrip():
    """VERDICT r3 #6: the vendored PPM/PGM/BMP codec round-trips
    bit-exactly and its helpers match the documented PIL conventions."""
    from s2sphere_ray.functions import _npimage as npi

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(9, 5), dtype=np.uint8)
    for arr, enc in ((rgb, "ppm"), (rgb, "bmp"), (gray, "pgm")):
        buf = npi.encode(arr, enc)
        assert npi.sniff(buf) == enc
        back = npi.decode(buf)
        np.testing.assert_array_equal(back, arr)
    # comment-tolerant PPM header
    hdr = b"P5 # c\n# c2\n 3\t2\n255\n" + bytes(range(6))
    np.testing.assert_array_equal(
        npi.decode(hdr), np.arange(6, dtype=np.uint8).reshape(2, 3)
    )
    # luma: integer ITU-R 601-2 (PIL convert('L') formula)
    l = npi.to_gray(rgb)
    want = (
        rgb[:, :, 0].astype(np.int64) * 299
        + rgb[:, :, 1].astype(np.int64) * 587
        + rgb[:, :, 2].astype(np.int64) * 114
    ) // 1000
    np.testing.assert_array_equal(l, want.astype(np.float64).ravel())
    # nearest-neighbor resize: exact index math
    small = npi.resize_nearest(rgb, 4, 4)
    yi = np.minimum(((np.arange(4) + 0.5) * 13 / 4).astype(np.int64), 12)
    xi = np.minimum(((np.arange(4) + 0.5) * 17 / 4).astype(np.int64), 16)
    np.testing.assert_array_equal(small, rgb[yi][:, xi])
    with pytest.raises(ValueError):
        npi.decode(b"\x89PNG\r\n")


def test_multimodal_real_numpy_tier(ray_session):
    """The real-decode branch of ImageFeatureStage / ResizeStage runs
    end-to-end on vendored-codec payloads (golden-pinned in-sandbox,
    VERDICT r3 #6): features equal the direct gray-chunk-mean
    computation and resize round-trips through the same format."""
    from s2sphere_ray.functions import _npimage as npi
    from s2sphere_ray.functions.multimodal import (
        ImageFeatureStage,
        ResizeStage,
    )

    rng = np.random.default_rng(11)
    imgs = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for h, w in ((8, 12), (20, 6), (5, 5))
    ]
    kinds = ["ppm", "bmp", "ppm"]
    payloads = [npi.encode(a, k) for a, k in zip(imgs, kinds)]
    media = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "media_type": pa.array(["image"] * 3),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([12, 6, 5], pa.int64()),
            "height": pa.array([8, 20, 5], pa.int64()),
            "duration_ms": pa.array([0, 0, 0], pa.int64()),
        }
    )
    feat_stage = ImageFeatureStage(dim=4, mode="real")
    assert feat_stage.codec == "numpy"
    out = feat_stage(media)
    feats = out["features"].to_pylist()
    for i, arr in enumerate(imgs):
        px = npi.to_gray(arr)
        want = [
            float(np.float32(c.mean())) for c in np.array_split(px, 4)
        ]
        assert feats[i] == pytest.approx(want, abs=0.0), i
    # mode="auto" on the same decodable payloads takes the numpy path too
    auto = ImageFeatureStage(dim=4, mode="auto")(media)
    assert auto["features"].to_pylist() == feats
    # resize: target smaller than both dims, re-encoded in source format
    rs = ResizeStage(target=4, mode="real")
    assert rs.codec == "numpy"
    rout = rs(media)
    for i, arr in enumerate(imgs):
        back = npi.decode(rout["payload"][i].as_py())
        assert back.shape == (4, 4, 3)
        np.testing.assert_array_equal(
            back, npi.resize_nearest(arr, 4, 4)
        )


def test_write_tiles_resume(ray_session, tmp_path):
    import ray.data as rd
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.stages.tiles import write_tiles, read_manifests

    doc_id = np.arange(500, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    tbl = pa.table({"doc_id": doc_id, "lat": lat, "lng": lng})
    out_dir = str(tmp_path / "tiles")
    write_tiles(rd.from_arrow(tbl), out_dir, level=8, fingerprint="t1")
    m1 = read_manifests(out_dir)
    assert len(m1) > 0
    assert sum(m["rows"] for m in m1) == 500
    # rerun: all partitions already committed → no new rows written
    write_tiles(rd.from_arrow(tbl), out_dir, level=8, fingerprint="t1")
    m2 = read_manifests(out_dir)
    assert sum(m["rows"] for m in m2) == 500
    # data is readable and partitioned
    ds = rd.read_parquet(out_dir)
    assert ds.count() == 500


def test_within_radius_join_matches_brute(ray_session):
    """E11b radius join equals the local brute force through BOTH batch
    paths: a small radius (fine cover level — the candidate-cell filter
    is active) and a large radius (cover spans the level — the filter is
    skipped), including rank capping and the (dist, id) tie rule."""
    import ray.data as rd
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.stages.join import _haversine_oracle
    from s2sphere_ray.stages.knn import within_radius_join

    doc_id = np.arange(20000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    ds = rd.from_arrow(pa.table({"doc_id": doc_id, "lat": lat, "lng": lng}))
    queries = pa.table(
        {
            "query_id": pa.array([0, 1, 2, 3], pa.int64()),
            # two dense (hot-city) queries, two sparse ones
            "lat": pa.array([48.85, 40.71, -60.0, 5.0]),
            "lng": pa.array([2.35, -74.0, 100.0, -170.0]),
        }
    )
    for radius, k in ((0.01, 50), (0.3, 10)):
        want = []
        for q in range(4):
            d = _haversine_oracle(
                lat, lng, queries["lat"][q].as_py(), queries["lng"][q].as_py()
            )
            hit = np.flatnonzero(d <= radius)
            order = hit[np.lexsort((doc_id[hit], d[hit]))][:k]
            want.extend(
                (q, i + 1, int(doc_id[order[i]])) for i in range(len(order))
            )
        want.sort()
        for strategy in ("broadcast", "shuffle"):
            got = sorted(
                (r["query_id"], r["rank"], r["doc_id"])
                for r in within_radius_join(
                    ds, queries, radius, k, strategy=strategy
                ).take_all()
            )
            assert got == want, (radius, strategy)
    # Degenerate regimes: an empty query set and a radius with no hits
    # both yield an empty result through both strategies, no errors.
    empty_q = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "lat": pa.array([], pa.float64()),
            "lng": pa.array([], pa.float64()),
        }
    )
    one_q = queries.slice(0, 1)
    for strategy in ("broadcast", "shuffle"):
        assert within_radius_join(ds, empty_q, 0.1, 5, strategy=strategy).count() == 0
        assert within_radius_join(ds, one_q, 1e-12, 5, strategy=strategy).count() == 0


def test_knn_pruned_equals_brute(ray_session):
    import ray.data as rd
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.stages.knn import knn_points, knn_points_pruned

    doc_id = np.arange(20000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    ds = rd.from_arrow(pa.table({"doc_id": doc_id, "lat": lat, "lng": lng}))
    queries = pa.table(
        {
            "query_id": pa.array([0, 1, 2, 3], pa.int64()),
            # two dense (hot-city) queries, two sparse ones
            "lat": pa.array([48.85, 40.71, -60.0, 5.0]),
            "lng": pa.array([2.35, -74.0, 100.0, -170.0]),
        }
    )
    brute = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in knn_points(ds, queries, k=5).take_all()
    }
    for level in (6, 10):
        pruned = {
            (r["query_id"], r["rank"]): r["doc_id"]
            for r in knn_points_pruned(ds, queries, k=5, level=level).take_all()
        }
        assert pruned == brute, level


def test_write_tiles_text_byte_identical_roundtrip(ray_session, tmp_path):
    """The per-row invariant holds through the partitioned sink: text read
    back from the tile layout is byte-identical per url."""
    import ray.data as rd
    from s2sphere_ray.pages import read_pages, geocode_batch
    from s2sphere_ray.stages.tiles import write_tiles

    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = dict(zip(src["doc_id"].to_pylist(), src["text"].to_pylist()))
    pages = read_pages(SF).map_batches(geocode_batch, batch_format="pyarrow")
    out_dir = str(tmp_path / "tiles")
    write_tiles(pages, out_dir, level=6, fingerprint="t")
    back = rd.read_parquet(out_dir).take_all()
    assert len(back) == len(want)
    for row in back:
        assert row["text"] == want[row["doc_id"]]


def test_ivf_topk_finds_self_and_recall(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.sim import cosine_topk, ivf_topk

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((400, 32)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float32()), 32
            ),
        }
    )
    queries = pa.table(
        {
            "query_id": pa.array([3, 77], pa.int64()),
            "embedding": pa.concat_arrays(
                [
                    t["embedding"].slice(3, 1).combine_chunks(),
                    t["embedding"].slice(77, 1).combine_chunks(),
                ]
            ),
        }
    )
    approx = ivf_topk(rd.from_arrow(t), queries, k=10, nprobe=6)
    rows = approx.take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["rank"]] = r["vec_id"]
    # exact self-match always survives pruning (its list is always probed)
    assert by_q[3][1] == 3 and by_q[77][1] == 77
    # decent recall vs brute force
    brute = cosine_topk(rd.from_arrow(t), queries, k=10).take_all()
    bq = {}
    for r in brute:
        bq.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid in (3, 77):
        got = set(by_q[qid].values())
        assert len(got & bq[qid]) >= 5, (qid, got, bq[qid])


def test_tile_counts_deep_level_groupby_fallback(ray_session):
    # level > tree_reduce_max_level exercises the hash-groupby branch.
    import collections

    import ray.data as rd
    from s2sphere_ray import cells as ck
    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.stages.tiles import tile_counts

    doc_id = np.arange(3000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    ds = rd.from_arrow(pa.table({"doc_id": doc_id, "lat": lat, "lng": lng}))
    out = {
        r["tile_token"]: r["n_rows"]
        for r in tile_counts(ds, 14, tree_reduce_max_level=10).take_all()
    }
    toks = ck.token_from_cell_id(ck.parent(ck.cell_id_from_latlng(lat, lng), 14))
    assert out == dict(collections.Counter(toks))


def test_cover_regions_actor_pool(ray_session):
    # The E7 actor-pool stage must match driver-side covering exactly.
    import ray.data as rd
    from s2sphere_ray.regions import regions_from_sf_dir
    from s2sphere_ray.stages.cover import cover_regions, cover_table

    regions = regions_from_sf_dir(SF)
    want = {
        r: c
        for r, c in zip(
            cover_table(regions)["region_id"].to_pylist(),
            cover_table(regions)["cover"].to_pylist(),
        )
    }
    ds = rd.from_arrow(regions).repartition(4)
    got = {
        row["region_id"]: list(row["cover"])
        for row in cover_regions(ds, concurrency=(1, 2), batch_size=16).take_all()
    }
    assert got == {k: list(v) for k, v in want.items()}


def test_minhash_lsh_pair_set_matches_bruteforce_oracle(ray_session):
    """Regression for the signatures-only band shuffle: the distributed
    pair set must equal an independent brute-force LSH+exact-Jaccard
    oracle computed in-process on the same corpus."""
    from collections import defaultdict

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from s2sphere_ray.functions.dedup import (
        MinHashStage,
        _shingle_hashes,
        minhash_lsh_pairs,
    )

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in minhash_lsh_pairs(
            rd.from_arrow(tbl).repartition(4), jaccard_threshold=0.8
        ).take_all()
    )

    st = MinHashStage()
    sig = (
        st(tbl)["minhash"].combine_chunks().flatten().to_numpy().reshape(-1, 64)
    )
    ids = tbl["doc_id"].to_numpy()
    bands, rpb = 16, 4
    cand = set()
    for bnd in range(bands):
        seg = sig[:, bnd * rpb : (bnd + 1) * rpb]
        h = np.zeros(len(ids), dtype=np.uint64)
        for c in range(rpb):
            h = h * np.uint64(1099511628211) + seg[:, c]
        runs = defaultdict(list)
        for i, hv in enumerate(h):
            runs[int(hv)].append(i)
        for run in runs.values():
            for a in range(len(run)):
                for b in range(a + 1, len(run)):
                    lo = min(ids[run[a]], ids[run[b]])
                    hi = max(ids[run[a]], ids[run[b]])
                    cand.add((lo, hi))
    texts = tbl["text"].to_pylist()
    pos = {int(i): k for k, i in enumerate(ids)}
    want = []
    for a, b in sorted(cand):
        sa = _shingle_hashes(texts[pos[a]] or "")
        sb = _shingle_hashes(texts[pos[b]] or "")
        inter = np.intersect1d(sa, sb).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 1.0
        if j >= 0.8:
            want.append((int(a), int(b), round(j, 12)))
    assert got == want


def test_embed_neardup_oversized_bucket_resplit(ray_session):
    """A bucket larger than max_bucket_rows must be re-split on extra
    hyperplanes without losing exact-duplicate pairs."""
    import numpy as np
    import ray.data as rd

    from s2sphere_ray.functions.sim import embedding_neardup_pairs

    rng = np.random.default_rng(7)
    n, dim = 600, 16
    base = rng.standard_normal((n, dim))
    # Plant exact duplicates: vec i and i+n are identical for i % 37 == 0.
    dup_src = np.arange(0, n, 37)
    emb = np.concatenate([base, base[dup_src]])
    ids = np.concatenate([np.arange(n), dup_src + n])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        }
    )
    # Tiny caps force every bucket through the re-split + blocked matmul.
    pairs = embedding_neardup_pairs(
        rd.from_arrow(tbl).repartition(4),
        threshold=0.999999,
        n_planes=2,
        max_bucket_rows=50,
        matmul_block=16,
    ).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(int(i), int(i + n)) for i in dup_src}
    assert want <= got
    # Nothing below the threshold sneaks in.
    lut = {int(i): v for i, v in zip(ids, emb)}
    for a, b in got:
        va, vb = lut[a], lut[b]
        cos = float(
            va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        )
        assert cos >= 0.999998


def test_simhash_neardup_pairs_vs_bruteforce(ray_session):
    """Banded simhash pair generation must find EXACTLY the pairs with
    hamming(simhash) <= max_hamming (pigeonhole guarantees no misses)."""
    import itertools

    import ray.data as rd

    from s2sphere_ray.functions.dedup import simhash_batch, simhash_neardup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    texts = [base, base.replace("kappa", "kappax"),
             base.replace("zeta", "zzz"),
             "totally different words here about nothing at all " * 5,
             base]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    sigs = simhash_batch(tbl)["simhash"].to_numpy()
    want = []
    for i, j in itertools.combinations(range(len(texts)), 2):
        ham = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
        if ham <= 3:
            want.append((i, j, ham))
    got = simhash_neardup_pairs(rd.from_arrow(tbl).repartition(3), max_hamming=3)
    got_rows = sorted(
        zip(
            got["id_a"].to_pylist(),
            got["id_b"].to_pylist(),
            got["hamming"].to_pylist(),
        )
    )
    assert got_rows == sorted(want)
    assert (0, 4, 0) in got_rows  # identical docs


def test_minhash_verify_none_superset(ray_session):
    """verify='none' (the distributed crawl-scale mode) must return a
    SUPERSET of the exact-verified pairs (same band candidates, no
    filtering), deduplicated, as a streamed Dataset."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from s2sphere_ray.functions.dedup import minhash_lsh_pairs

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ds = rd.from_arrow(tbl).repartition(4)
    exact = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(ds, jaccard_threshold=0.8).take_all()
    }
    rows = minhash_lsh_pairs(ds, verify="none").take_all()
    unverified = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(unverified) == len(set(unverified))  # deduped
    assert exact <= set(unverified)


def test_hll_distinct_accuracy(ray_session):
    """HLL estimate within the theoretical ±~1.04/sqrt(2^p) band (use 3
    sigma ≈ 5% at p=12) of the exact distinct count, for int and string
    keys; deterministic across runs."""
    import ray.data as rd

    from s2sphere_ray.functions.sketch import hll_distinct

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 40_000, size=120_000)  # ~38k distinct
    exact = len(np.unique(vals))
    t = pa.table({"k": pa.array(vals, pa.int64())})
    est1 = hll_distinct(rd.from_arrow(t).repartition(8), "k")[
        "n_distinct_est"
    ][0].as_py()
    est2 = hll_distinct(rd.from_arrow(t).repartition(3), "k")[
        "n_distinct_est"
    ][0].as_py()
    assert est1 == est2  # partitioning-invariant merge
    assert abs(est1 - exact) / exact < 0.05
    # string keys
    s = pa.table({"k": pa.array([f"u-{v}" for v in vals])})
    est3 = hll_distinct(rd.from_arrow(s).repartition(8), "k")[
        "n_distinct_est"
    ][0].as_py()
    assert abs(est3 - exact) / exact < 0.05


def test_tile_counts_merge_paths_agree(ray_session):
    """The estimate-gated coalesce path and the hash-groupby fallback must
    produce identical per-tile counts."""
    import ray.data as rd

    from s2sphere_ray.pages import geocode_from_doc_id
    from s2sphere_ray.stages.tiles import tile_counts

    doc_id = np.arange(3000, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    ds = rd.from_arrow(
        pa.table({"doc_id": doc_id, "lat": lat, "lng": lng})
    ).repartition(6)

    def rows(out):
        return sorted(
            (r["tile_token"], r["n_rows"]) for r in out.take_all()
        )

    coalesce = rows(tile_counts(ds, 7, leaf_col=None))
    # Tiny final_combine_rows forces the groupby fallback via the gate.
    fallback = rows(
        tile_counts(ds, 7, leaf_col=None, num_rows=3000, final_combine_rows=1)
    )
    deep = rows(tile_counts(ds, 9, leaf_col=None, tree_reduce_max_level=8))
    coalesce9 = rows(tile_counts(ds, 9, leaf_col=None))
    assert coalesce == fallback
    assert deep == coalesce9


def test_multimodal_resize_and_frames(ray_session):
    import ray.data as rd

    from s2sphere_ray.functions.multimodal import (
        FrameSampleStage,
        ResizeStage,
        sample_frames,
        synth_media_table,
    )

    media = synth_media_table(40)
    resized = ResizeStage(target=32)(media)
    assert resized["width"].to_pylist() == [32] * 40  # all inputs >= 32
    assert all(
        len(p) >= 1 for p in resized["payload"].to_pylist()
    )
    # Frame slices reproduce exact payload byte ranges.
    f = FrameSampleStage(n_frames=8, stride=2)(media)
    assert f.num_rows == 40 * 4
    pl0 = media["payload"][0].as_py()
    want = [pl0[(i * len(pl0)) // 8 : ((i + 1) * len(pl0)) // 8] for i in (0, 2, 4, 6)]
    assert f["frame_payload"].to_pylist()[:4] == want
    # Distributed pipeline end-to-end.
    out = sample_frames(
        rd.from_arrow(media).repartition(4), n_frames=8, stride=2
    ).take_all()
    assert len(out) == 160
    # strict real mode: images fall to the vendored numpy tier which
    # rejects undecodable payloads; video has no numpy tier so it still
    # raises NotImplementedError when PyAV is absent.
    with pytest.raises(ValueError, match="PPM/PGM/BMP"):
        ResizeStage(fake=False)(media)
    with pytest.raises(NotImplementedError):
        FrameSampleStage(fake=False)(media)


def test_exact_dedup_null_keys_survive(ray_session):
    """A NULL key must form its own group with one min-id survivor
    (matching SQL GROUP BY semantics), not silently vanish."""
    import ray.data as rd

    from s2sphere_ray.functions.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", None, "a", None, "b"]),
        }
    )
    out = sorted(
        r["doc_id"] for r in exact_dedup(rd.from_arrow(t)).take_all()
    )
    assert out == [0, 1, 4]


def test_lsh_star_emission_for_degenerate_runs(ray_session):
    """Runs above star_run_threshold emit min-id star pairs (component-
    equivalent) instead of an O(R^2) all-pairs blowup."""
    import ray.data as rd

    from s2sphere_ray.functions.dedup import minhash_lsh_pairs

    text = "identical boilerplate page content repeated everywhere " * 5
    n = 60
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([text] * n),
        }
    )
    pairs = minhash_lsh_pairs(
        rd.from_arrow(t).repartition(4),
        verify="none",
        star_run_threshold=10,
    ).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # Star: every doc connects to doc 0; component covers all n docs.
    assert got == {(0, i) for i in range(1, n)}


def test_hash_buckets_distribution_and_range():
    from s2sphere_ray.functions._buckets import derive_buckets, hash_buckets

    keys = np.arange(100_000, dtype=np.int64) * 7  # structured keys
    for nb in (7, 64, 1000):
        b = hash_buckets(keys, nb)
        assert b.dtype == np.int32
        assert b.min() >= 0 and b.max() < nb
        counts = np.bincount(b, minlength=nb)
        # Full-width mix: no bucket more than 2x the mean even for
        # structured keys (the round-1 >>58 bug failed this for nb > 64).
        assert counts.max() < 2 * len(keys) / nb
    assert derive_buckets(None) >= 4
    assert derive_buckets(10_000_000, target_rows=250_000) >= 40
    assert derive_buckets(10**15) == 1 << 20  # cap


def test_asof_matches_pandas_merge_asof(ray_session):
    """The numpy backward-search asof must match pd.merge_asof on random
    data with duplicate timestamps and users with no events."""
    import pandas as pd
    import ray.data as rd

    from s2sphere_ray.functions.asof import asof_last_event

    rng = np.random.default_rng(9)
    n_orders, n_events = 400, 900
    base = np.datetime64("2024-01-01", "us")
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, 40, n_orders), pa.int64()
            ),
            "o_orderdate": pa.array(
                base + rng.integers(0, 10**6, n_orders).astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
        }
    )
    events = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 35, n_events), pa.int64()),
            "ts": pa.array(
                base + rng.integers(0, 10**6, n_events).astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
        }
    )
    got = (
        asof_last_event(
            rd.from_arrow(orders).repartition(3),
            rd.from_arrow(events).repartition(3),
            num_rows=n_events,
        )
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    odf = orders.to_pandas().sort_values(["o_orderdate", "o_orderkey"])
    edf = events.to_pandas().sort_values("ts")
    want = pd.merge_asof(
        odf,
        edf.rename(columns={"ts": "last_event_ts"}),
        left_on="o_orderdate",
        right_on="last_event_ts",
        left_by="o_custkey",
        right_by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )[["o_orderkey", "last_event_ts"]].sort_values("o_orderkey").reset_index(
        drop=True
    )
    got["last_event_ts"] = got["last_event_ts"].astype("datetime64[us]")
    want["last_event_ts"] = want["last_event_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want)


def test_fixed_point_quantiles_exact(ray_session):
    """Grid quantiles match numpy's lower order statistic on cents."""
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import fixed_point_quantiles

    rng = np.random.default_rng(7)
    v = np.round(rng.uniform(0, 500, 4000), 2)
    ds = rd.from_arrow(pa.table({"value": pa.array(v)}))
    qs = [10, 25, 50, 75, 90, 99]
    out = fixed_point_quantiles(ds, "value", qs, scale=100)
    cents = np.sort(np.floor(v * 100 + 0.5).astype(np.int64))
    for q, got in zip(qs, out["value_cents"].to_pylist()):
        k = int(np.floor(q / 100.0 * (len(v) - 1)))
        assert got == cents[k], (q, got, cents[k])


def test_exact_float_quantiles_vs_numpy(ray_session):
    """Bracketing path (forced through histogram passes by a tiny
    gather_cap) returns the exact lower order statistic — the original
    doubles, bit-for-bit."""
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import exact_float_quantiles

    rng = np.random.default_rng(11)
    # lognormal: heavy tail stresses uneven bin occupancy
    v = rng.lognormal(0, 2.0, 5000)
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    qs = [5, 50, 95, 99]
    out = exact_float_quantiles(
        ds, "x", qs, bins=64, max_passes=3, gather_cap=400
    )
    sv = np.sort(v)
    for q, got in zip(qs, out["value"].to_pylist()):
        k = int(np.floor(q / 100.0 * (len(v) - 1)))
        assert got == sv[k], (q, got, sv[k])


def test_exact_float_quantiles_degenerate_mass(ray_session):
    """90% of rows share one double (bracket collapses below float
    resolution and resolves without gathering); also covers n==1-bin
    edge and values within 1 ulp of each other."""
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import exact_float_quantiles

    base = 1.0 / 3.0
    v = np.concatenate(
        [
            np.full(9000, base),
            np.full(500, np.nextafter(base, np.inf)),
            np.linspace(10.0, 20.0, 500),
        ]
    )
    rng = np.random.default_rng(3)
    rng.shuffle(v)
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    qs = [25, 50, 75, 91, 99]
    out = exact_float_quantiles(
        ds, "x", qs, bins=32, max_passes=4, gather_cap=600
    )
    sv = np.sort(v)
    for q, got in zip(qs, out["value"].to_pylist()):
        k = int(np.floor(q / 100.0 * (len(v) - 1)))
        assert got == sv[k], (q, got, sv[k])


def test_exact_float_quantiles_collapsed_bin_neighbor_double(ray_session):
    """ADVICE r3: collapsed (sub-float-resolution) bins now resolve
    through the exact gather instead of shortcutting to the bin's left
    edge (the one-distinct-double assumption fails at edges: a value
    1 ulp away can floor-round into the bin, and over-range rows clip
    into the LAST bin). This pins the collapse→gather path end-to-end:
    heavy masses on two ADJACENT doubles force brackets to refine past
    1 ulp (512-bin × 10-pass narrowing from a ~20-wide range crosses
    the ~5.5e-17 ulp of base), so the collapse branch must run and the
    gathered order statistics must still be bit-exact."""
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import exact_float_quantiles

    base = 1.0 / 3.0
    below = np.nextafter(base, -np.inf)
    v = np.concatenate(
        [
            np.full(4000, below),
            np.full(5500, base),
            np.linspace(10.0, 20.0, 500),
        ]
    )
    rng = np.random.default_rng(7)
    rng.shuffle(v)
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    qs = [10, 41, 50, 90, 99]
    # bins=512 × 10 passes shrinks the bin width past 1 ulp of base
    # (512^10 ≫ 20/5.5e-17), guaranteeing the collapse branch runs.
    out = exact_float_quantiles(
        ds, "x", qs, bins=512, max_passes=10, gather_cap=600
    )
    sv = np.sort(v)
    for q, got in zip(qs, out["value"].to_pylist()):
        k = int(np.floor(q / 100.0 * (len(v) - 1)))
        assert got == sv[k], (q, got, sv[k])


def test_exact_float_quantiles_all_equal(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import exact_float_quantiles

    ds = rd.from_arrow(pa.table({"x": pa.array(np.full(100, 2.5))}))
    out = exact_float_quantiles(ds, "x", [50, 99], bins=16, gather_cap=10)
    assert out["value"].to_pylist() == [2.5, 2.5]


def test_multimodal_codec_gating(ray_session):
    """Import-gated codec resolution: mode='auto' records which codec was
    resolved and WHY the fake path is active when the real lib is absent;
    real/fake paths share one output schema (this container ships no
    codecs, so the fake branch runs — the assertions are codec-agnostic)."""
    from s2sphere_ray.functions.multimodal import (
        FrameSampleStage,
        ImageFeatureStage,
        ResizeStage,
        synth_media_table,
    )

    media = synth_media_table(8)
    for cls, kw in (
        (ImageFeatureStage, {}),
        (ResizeStage, {}),
        (FrameSampleStage, {}),
    ):
        stage = cls(mode="auto", **kw)
        # image stages fall to the vendored numpy tier when PIL is
        # absent (VERDICT r3 #6); video has no numpy tier → fake.
        assert stage.codec in ("pil", "pyav", "numpy", "fake")
        if stage.codec in ("numpy", "fake"):
            # The fallback must be load-bearing: it knows which import
            # failed.
            assert stage.codec_error and "Error" in stage.codec_error
        # mode='fake' always works and emits the contract schema.
        out = cls(mode="fake", **kw)(media)
        assert out.num_rows > 0
    feats = ImageFeatureStage(mode="fake")(media)
    assert feats.schema.field("features").type == pa.list_(pa.float32(), 16)
    frames = FrameSampleStage(mode="fake")(media)
    assert frames.column_names == ["media_id", "frame_idx", "frame_payload"]


def test_ngram_jaccard_pairs_vs_bruteforce(ray_session):
    """Distributed prefix-filter Jaccard join finds EXACTLY the brute-force
    pair set with exact intersection/union counts, in both gram orders
    (freq = scale path, hash = fewer exchanges)."""
    import ray.data as rd
    from s2sphere_ray.functions.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(60)]
    base = [
        " ".join(rng.choice(vocab, size=rng.integers(12, 40)))
        for _ in range(40)
    ]
    texts = list(base)
    # Plant near-dups: copy + small tail edit, plus one exact dup.
    texts.append(base[3] + " extra")
    texts.append(base[7])
    texts.append("one")  # < n tokens -> empty gram set, must not pair
    ids = list(range(len(texts)))
    t = 0.4

    def grams(s, n=2):
        ws = s.split()
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = grams(texts[i]), grams(texts[j])
            if not a or not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if inter * 1000 >= int(t * 1000) * union:
                want.add((i, j, inter, union))

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    # local_rows=0 forces the fully distributed chain; the default takes
    # the single-block fused path — both must equal brute force.  (The
    # round-4 local path once tried to skip the verify exchange too;
    # Ray's mid-stream block splitting broke pair-group co-location and
    # silently undercounted intersections — keep both paths pinned.)
    # verify_broadcast_rows=0 forces the (pair, gram) exchange verify;
    # the default takes the broadcast-CSR in-task verify — both must
    # equal brute force in every candidate-path combination.
    for order in ("freq", "hash"):
        for local_rows in (0, 2_000_000):
            for vbr in (0, 20_000_000):
                got = {
                    (r["id_a"], r["id_b"], r["inter_n"], r["union_n"])
                    for r in ngram_jaccard_pairs(
                        ds,
                        n=2,
                        threshold=t,
                        order=order,
                        num_rows=len(texts),
                        local_rows=local_rows,
                        verify_broadcast_rows=vbr,
                    ).take_all()
                }
                assert got == want, (order, local_rows, vbr, got ^ want)
    # Post-gather abort: a misleading num_rows hint makes the broadcast
    # ESTIMATE pass (avg_set ~ 0 ⇒ est ≈ |cand docs|) while the real
    # candidate gram rows blow the 2× cap — the gather must abort and
    # fall back to the exchange verify with identical results (round-4
    # review finding: the gate alone could admit an unbounded driver
    # materialization).
    got = {
        (r["id_a"], r["id_b"], r["inter_n"], r["union_n"])
        for r in ngram_jaccard_pairs(
            ds,
            n=2,
            threshold=t,
            num_rows=10_000_000,  # wrong on purpose
            verify_broadcast_rows=40,
        ).take_all()
    }
    assert got == want, ("post-gather-abort", got ^ want)
    assert want, "test corpus produced no pairs — not a real check"


def test_decontaminate_planted_overlap(ray_session):
    """Docs sharing a bigram with the probe set are flagged with the right
    distinct-hit count; mode='drop' removes exactly those rows."""
    import ray.data as rd
    from s2sphere_ray.functions.dedup import decontaminate

    texts = [
        "alpha beta gamma delta",          # shares "alpha beta" with probe
        "omega psi chi phi",               # clean
        "gamma delta epsilon zeta",        # shares "gamma delta"
        "single",                          # < n tokens -> clean by def
        "beta gamma unrelated tail",       # shares "beta gamma"
    ]
    probes = ["alpha beta gamma", "nothing else here"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    flagged = {
        r["doc_id"]: (r["contaminated"], r["n_hits"])
        for r in decontaminate(ds, probes, n=2, mode="flag").take_all()
    }
    # probe grams: {alpha beta, beta gamma, nothing else, else here}
    assert flagged[0] == (True, 2)   # alpha beta + beta gamma
    assert flagged[1] == (False, 0)
    assert flagged[2] == (False, 0)  # gamma delta is NOT a probe bigram
    assert flagged[3] == (False, 0)
    assert flagged[4] == (True, 1)   # beta gamma
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(ds, probes, n=2, mode="drop").take_all()
    )
    assert kept == [1, 2, 3]


def test_frequent_items_exact_under_eviction(ray_session):
    """Heavy hitters stay exact when per-block cardinality far exceeds the
    summary capacity (evictions happen in every block) and hitters are
    spread thinly across many blocks — the case a naive one-pass top-k
    per block gets wrong."""
    import collections

    import ray.data as rd
    from s2sphere_ray.functions.sketch import frequent_items

    rng = np.random.default_rng(13)
    # background noise: 5000 distinct values, ~10 rows each
    noise = rng.integers(10_000, 15_000, size=50_000)
    # true hitters: values 1..6 with counts straddling the threshold
    phi_denom = 16
    planted = np.concatenate(
        [np.full(c, v) for v, c in ((1, 4200), (2, 3600), (3, 3400), (4, 200), (5, 3350), (6, 10))]
    )
    v = np.concatenate([noise, planted])
    rng.shuffle(v)  # hitters spread across every block
    n = len(v)
    want = {
        int(k): int(c)
        for k, c in collections.Counter(v.tolist()).items()
        if c * phi_denom >= n
    }
    ds = rd.from_arrow(pa.table({"x": pa.array(v.astype(np.int64))})).repartition(16)
    out = frequent_items(ds, "x", phi_denom=phi_denom, capacity=64, num_rows=n)
    got = dict(zip(out["item"].to_pylist(), out["n_rows"].to_pylist()))
    assert got == want
    assert want, "threshold produced no hitters — test is vacuous"


def test_exact_float_quantiles_pure_gather(ray_session):
    """n below the gather cap: zero histogram passes, the initial 'range'
    bracket gathers everything — the small-input fast path."""
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import exact_float_quantiles

    rng = np.random.default_rng(2)
    v = rng.standard_normal(500)
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    out = exact_float_quantiles(ds, "x", [10, 50, 90], gather_cap=10_000)
    sv = np.sort(v)
    for q, got in zip([10, 50, 90], out["value"].to_pylist()):
        k = int(np.floor(q / 100.0 * (len(v) - 1)))
        assert got == sv[k]


def test_exact_float_quantiles_multipass_under_range(ray_session):
    """Regression (r3 code review): on passes after the first, rows below
    the union bracket must count ONLY in the `below` slot — clipping them
    into bin 0 double-counts, corrupting every rank. 200k N(0,1) rows with
    the registered q_quantiles 'bracket' parameters force multiple passes
    whose union bracket excludes most of the data."""
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import exact_float_quantiles

    rng = np.random.default_rng(42)
    v = rng.standard_normal(200_000)
    ds = rd.from_arrow(pa.table({"x": pa.array(v)})).repartition(8)
    qs = [25, 50, 75, 90, 99]
    out = exact_float_quantiles(
        ds, "x", qs, bins=512, max_passes=2, gather_cap=2000
    )
    sv = np.sort(v)
    for q, got in zip(qs, out["value"].to_pylist()):
        k = int(np.floor(q / 100.0 * (len(v) - 1)))
        assert got == sv[k], (q, got, sv[k])


def test_fixed_point_quantiles_nulls_dropped(ray_session):
    """Nulls are dropped (SQL semantics) instead of becoming INT64_MIN
    grid values that shift every quantile."""
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import fixed_point_quantiles

    v = pa.array([1.0, None, 2.0, 3.0, None, 4.0, 5.0], pa.float64())
    ds = rd.from_arrow(pa.table({"value": v}))
    out = fixed_point_quantiles(ds, "value", [0, 50, 100], scale=100)
    assert out["value_cents"].to_pylist() == [100, 300, 500]


def test_exact_float_quantiles_nulls_dropped(ray_session):
    """Bracketing path drops nulls (SQL semantics) — they must not inflate
    n or the below-rank via the NaN -> INT64_MIN bin."""
    import ray.data as rd
    from s2sphere_ray.functions.quantiles import exact_float_quantiles

    vals = [float(x) for x in range(1, 101)]
    v = pa.array(vals + [None] * 30, pa.float64())
    ds = rd.from_arrow(pa.table({"x": v}))
    out = exact_float_quantiles(ds, "x", [0, 50, 99], bins=16, gather_cap=60)
    # lower order statistic over the 100 non-null values:
    # k = floor(q/100 * 99) -> indices 0, 49, 98 -> values 1, 50, 99
    assert out["value"].to_pylist() == [1.0, 50.0, 99.0]


def test_bloom_incremental_dedup(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.dedup import bloom_build, bloom_dedup_against

    ref_texts = [f"ref document number {i}" for i in range(2000)]
    new_texts = [f"new document number {i}" for i in range(500)]
    planted = ref_texts[::100]  # 20 true duplicates in the new shard
    ref = rd.from_arrow(pa.table({"text": pa.array(ref_texts)}))
    new = rd.from_arrow(
        pa.table({"text": pa.array(new_texts + planted)})
    ).repartition(8)

    bitmap = bloom_build(ref, "text", m_bits=1 << 18, k=7)
    flagged = bloom_dedup_against(new, bitmap, "text", k=7).take_all()
    by_text = {r["text"]: r["maybe_dup"] for r in flagged}
    # Bloom guarantees zero false negatives: every planted dup flagged.
    assert all(by_text[t] for t in planted)
    # 2^18 bits / 2000 keys = 131 bits/key -> FP rate ~ 0; allow a few.
    fps = sum(1 for t in new_texts if by_text[t])
    assert fps <= 2, f"implausible Bloom FP count {fps}"
    # drop mode removes exactly the flagged rows
    n_flagged = sum(1 for v in by_text.values() if v)
    kept = bloom_dedup_against(new, bitmap, "text", k=7, mode="drop").count()
    assert kept == 520 - n_flagged


def test_stratified_sample_quota_and_determinism(ray_session):
    import ray.data as rd
    from s2sphere_ray.functions.sampling import (
        SAMPLE_MOD,
        SAMPLE_MULT,
        stratified_sample,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(300)]),
        }
    )
    k = 5
    # naive oracle: smallest (hash, id) per lang
    import collections

    by_lang = collections.defaultdict(list)
    for i in range(300):
        by_lang[("en", "de", "fr")[i % 3]].append(
            ((i * SAMPLE_MULT) % SAMPLE_MOD, i)
        )
    expect = {
        (lang, i)
        for lang, rows in by_lang.items()
        for _, i in sorted(rows)[:k]
    }
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        got = {
            (r["lang"], r["doc_id"])
            for r in stratified_sample(
                ds, key_col="lang", id_col="doc_id", k=k, num_rows=300
            ).take_all()
        }
        assert got == expect, f"parts={parts}"


def test_temperature_sample_quota_and_determinism(ray_session):
    """sqrt-tilted quotas: head source shrinks, tail keeps share; result
    is layout-independent and matches the naive rank reference."""
    import collections

    import ray.data as rd

    from s2sphere_ray.functions.sampling import (
        SAMPLE_MOD,
        SAMPLE_MULT,
        temperature_sample,
    )

    # skewed sources: a=240, b=50, c=10
    srcs = ["a"] * 240 + ["b"] * 50 + ["c"] * 10
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "source": pa.array(srcs),
        }
    )
    budget = 60
    w = {
        s: int(np.floor(np.sqrt(n)))
        for s, n in collections.Counter(srcs).items()
    }
    tot = sum(w.values())
    quota = {s: budget * v // tot for s, v in w.items()}
    assert quota["a"] < 240 * budget // 300  # tilted vs proportional
    by_src = collections.defaultdict(list)
    for i, s in enumerate(srcs):
        by_src[s].append(((i * SAMPLE_MULT) % SAMPLE_MOD, i))
    expect = {
        (s, i)
        for s, rows in by_src.items()
        for _, i in sorted(rows)[: quota[s]]
    }
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        got = {
            (r["source"], r["doc_id"])
            for r in temperature_sample(
                ds,
                key_col="source",
                id_col="doc_id",
                budget=budget,
                num_rows=300,
            ).take_all()
        }
        assert got == expect, f"parts={parts}"


def test_kmeans_milli_matches_naive(ray_session):
    """Distributed Lloyd iterations == single-process integer reference
    (same init, tie-break, floor update, empty-cluster carry)."""
    import ray.data as rd

    from s2sphere_ray.functions.sim import kmeans_milli

    rng = np.random.default_rng(7)
    n, d, k, iters = 300, 16, 5, 3
    emb = rng.normal(size=(n, d)).astype(np.float32)
    vid = rng.permutation(n * 2)[:n].astype(np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(vid),
                "embedding": pa.array([list(map(float, r)) for r in emb]),
            }
        )
    ).repartition(7)
    out = kmeans_milli(ds, k=k, iters=iters)

    m = np.floor(emb.astype(np.float64) * 1000).astype(np.int64)
    cent = m[np.argsort(vid)[:k]].copy()
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        d2 = (
            (m * m).sum(1)[:, None]
            + (cent * cent).sum(1)[None, :]
            - 2 * (m @ cent.T)
        )
        a = d2.argmin(1)
        counts = np.zeros(k, dtype=np.int64)
        nc = cent.copy()
        for c in range(k):
            sel = a == c
            if sel.any():
                nc[c] = m[sel].sum(0) // sel.sum()
                counts[c] = sel.sum()
        cent = nc

    assert np.array_equal(
        np.array(out["centroid_milli"]).reshape(k, d), cent
    )
    assert np.array_equal(
        np.array(out["n_vecs"]).reshape(k, d)[:, 0], counts
    )


def test_semdedup_matches_naive(ray_session):
    """Cluster-bucketed integer-cosine pruning == a single-process replay
    (same quantize, kmeans, final assignment, gate, keeper choice)."""
    import ray.data as rd

    from s2sphere_ray.functions.sim import semdedup

    rng = np.random.default_rng(23)
    n, d, k, iters, scale = 240, 12, 4, 3, 100
    emb = rng.normal(size=(n, d)).astype(np.float32)
    emb[50] = emb[10]            # exact duplicate (same cluster, drops)
    emb[120] = emb[40] * 2.0     # parallel copy: cosine 1, other norm
    vid = np.arange(n, dtype=np.int64) * 3 + 1
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(vid),
                "embedding": pa.array([list(map(float, r)) for r in emb]),
            }
        )
    ).repartition(6)
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup(
            ds, k=k, iters=iters, thr_num=99, thr_den=100, scale=scale
        ).take_all()
    }

    # single-process replay
    m = np.floor(emb.astype(np.float64) * scale).astype(np.int64)
    cent = m[np.argsort(vid)[:k]].copy()
    for _ in range(iters):
        d2 = (
            (m * m).sum(1)[:, None]
            + (cent * cent).sum(1)[None, :]
            - 2 * (m @ cent.T)
        )
        a = d2.argmin(1)
        nc = cent.copy()
        for c in range(k):
            sel = a == c
            if sel.any():
                nc[c] = m[sel].sum(0) // sel.sum()
        cent = nc
    d2 = (
        (m * m).sum(1)[:, None]
        + (cent * cent).sum(1)[None, :]
        - 2 * (m @ cent.T)
    )
    a = d2.argmin(1)
    n2 = (m * m).sum(1)
    expect = set()
    for i in range(n):
        keepers = [
            vid[j]
            for j in range(n)
            if a[j] == a[i]
            and vid[j] < vid[i]
            and (dp := int(m[i] @ m[j])) > 0
            and 10000 * dp * dp >= 9801 * int(n2[i]) * int(n2[j])
        ]
        if keepers:
            expect.add((vid[i], min(keepers)))
    assert expect, "test corpus must contain at least one planted drop"
    assert got == expect


def test_perceptron_milli_matches_naive_reference(ray_session):
    """The distributed batch perceptron must be bit-identical to a
    single-process naive implementation regardless of block layout —
    the update is an exact int64 sum, so 13-way partitioning cannot
    change the trained weights, scores or predictions."""
    import ray.data as rd

    from s2sphere_ray.functions.classifier import perceptron_milli

    rng = np.random.default_rng(7)
    n, d = 600, 12
    x = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)
    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "label": labels,
            "embedding": pa.array(
                [row.tolist() for row in x], pa.list_(pa.float32())
            ),
        }
    )
    out = (
        perceptron_milli(
            rd.from_arrow(t).repartition(13), target_label=0, iters=3
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    m = np.floor(x.astype(np.float64) * 1000).astype(np.int64)
    y = np.where(labels == 0, 1, -1).astype(np.int64)
    w = np.zeros(d, dtype=np.int64)
    for _ in range(3):
        s = m @ w
        mis = (y * s) <= 0
        w = w + (m[mis] * y[mis, None]).sum(axis=0, dtype=np.int64)
    s = m @ w
    assert np.array_equal(out["score"].to_numpy(), s)
    assert np.array_equal(out["pred"].to_numpy(), np.where(s > 0, 1, -1))
    assert np.array_equal(out["y"].to_numpy(), y)
    # the probe must actually learn something beyond the zero model
    assert (np.abs(w) > 0).any()


def test_perceptron_milli_overflow_guard():
    """The int64 dot-product bound must refuse rather than wrap."""
    import ray.data as rd

    from s2sphere_ray.functions.classifier import perceptron_milli

    t = pa.table(
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "label": pa.array([0, 0, 0, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0e15, -1.0e15]] * 4, pa.list_(pa.float32())
            ),
        }
    )
    with pytest.raises(OverflowError):
        perceptron_milli(rd.from_arrow(t), target_label=0, iters=2)


def test_split_assign_deterministic_and_exact(ray_session):
    """90/5/5 hold-out split: matches the naive per-id reference, is
    layout-independent, covers every row exactly once, and is
    uncorrelated with the hash10 rate sample's hash."""
    import collections

    import ray.data as rd

    from s2sphere_ray.functions.sampling import (
        SAMPLE_MOD,
        SPLIT_MULT,
        split_assign,
    )

    ids = np.arange(1000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids)})
    expect = {}
    for i in ids:
        b = ((int(i) % SAMPLE_MOD) * SPLIT_MULT) % SAMPLE_MOD % 100
        expect[int(i)] = (
            "train" if b < 90 else ("valid" if b < 95 else "test")
        )
    for parts in (1, 9):
        got = {
            r["doc_id"]: r["split"]
            for r in split_assign(
                rd.from_arrow(tbl).repartition(parts)
            ).take_all()
        }
        assert got == expect, f"parts={parts}"
    n = collections.Counter(expect.values())
    assert n["train"] + n["valid"] + n["test"] == 1000
    # split fractions land near 90/5/5 and all three splits are non-empty
    assert 850 <= n["train"] <= 950 and n["valid"] > 0 and n["test"] > 0


def test_split_assign_custom_fractions_and_overflow_ids(ray_session):
    import ray.data as rd

    from s2sphere_ray.functions.sampling import split_assign

    # ids near int64 max: reduce-first hashing must not wrap
    big = np.array([2**62, 2**63 - 1, 0, 1], dtype=np.int64)
    out = split_assign(
        rd.from_arrow(pa.table({"doc_id": pa.array(big)})),
        valid_pct=0,
        test_pct=50,
    ).take_all()
    assert {r["split"] for r in out} <= {"train", "test"}
    assert len(out) == 4
    with pytest.raises(ValueError):
        split_assign(
            rd.from_arrow(pa.table({"doc_id": pa.array(big)})),
            valid_pct=50,
            test_pct=50,
        ).take_all()
    with pytest.raises(ValueError):
        split_assign(
            rd.from_arrow(pa.table({"doc_id": pa.array(big)})),
            valid_pct=-5,
            test_pct=5,
        ).take_all()


def test_vertex_latlng_vectorized_matches_scalar():
    """The vectorized E8 vertex kernel must match the scalar
    geometry.Cell.vertices() + LatLng.from_point path to <=2 ulp (the
    only permitted divergence is np.arctan2 vs math.atan2 libm
    rounding)."""
    import numpy as np
    import pyarrow as pa

    from s2sphere_ray import cells as ck
    from s2sphere_ray import geometry as g
    from s2sphere_ray.stages.encode import vertex_latlng

    ids = ck.cell_id_from_latlng(
        np.array([48.8584, 40.7486, -33.8568, 90.0, -90.0, 0.1]),
        np.array([2.2945, -73.9857, 151.2153, 0.0, 0.0, 179.9]),
    )
    ids = np.concatenate([ids, ck.parent(ids, 3), ck.parent(ids, 17)])
    out = vertex_latlng(
        pa.table({"cell_id": pa.array(ids, pa.uint64())})
    )
    vlat = out["vertex_lat"].combine_chunks().flatten().to_numpy().reshape(-1, 4)
    vlng = out["vertex_lng"].combine_chunks().flatten().to_numpy().reshape(-1, 4)
    for r, cid in enumerate(ids):
        cell = g.Cell(g.CellId(int(cid)))
        for k in range(4):
            ll = g.LatLng.from_point(cell.get_vertex(k))
            np.testing.assert_array_almost_equal_nulp(
                vlat[r, k], np.degrees(ll.lat), nulp=2
            )
            np.testing.assert_array_almost_equal_nulp(
                vlng[r, k], np.degrees(ll.lng), nulp=2
            )


def test_perceptron_driver_epochs_match_distributed(ray_session, monkeypatch):
    """Forcing the quantized matrix past the gather budget (distributed
    per-epoch loop) must be bit-identical to the in-process epochs."""
    import ray.data as rd

    import s2sphere_ray.functions.classifier as cls

    rng = np.random.default_rng(23)
    n, d = 400, 8
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "label": pa.array(rng.integers(0, 3, n).astype(np.int64)),
            "embedding": pa.array(
                [list(map(float, rng.normal(size=d))) for _ in range(n)],
                pa.list_(pa.float64()),
            ),
        }
    )
    a = cls.perceptron_milli(rd.from_arrow(tbl), iters=4).to_pandas()
    monkeypatch.setattr(cls, "_CLS_GATHER_CELLS", 0)
    b = cls.perceptron_milli(
        rd.from_arrow(tbl).repartition(5), iters=4
    ).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.sort_values("vec_id").reset_index(drop=True),
        b.sort_values("vec_id").reset_index(drop=True),
    )


def test_kmeans_driver_iterations_match_distributed(ray_session, monkeypatch):
    """Forcing kmeans past the gather budget (distributed per-iteration
    loop) must be bit-identical to the in-process iterations."""
    import ray.data as rd

    import s2sphere_ray.functions.sim as sim

    rng = np.random.default_rng(29)
    n, d = 300, 6
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, rng.normal(size=d))) for _ in range(n)],
                pa.list_(pa.float64()),
            ),
        }
    )
    a = sim.kmeans_milli(rd.from_arrow(tbl), k=5, iters=4)
    monkeypatch.setattr(sim, "_KM_GATHER_CELLS", 0)
    b = sim.kmeans_milli(rd.from_arrow(tbl).repartition(7), k=5, iters=4)
    assert a.equals(b)


# --- keyed_window (functions/windows.py) -----------------------------------


def _naive_window(uid, tsv, eid, val):
    """Single-process reference: per-key ordered rn/lag/lead/runsum."""
    import numpy as np

    milli = np.floor(np.asarray(val) * 1000.0 + 0.5).astype(np.int64)
    rows = sorted(
        range(len(uid)), key=lambda i: (uid[i], tsv[i], eid[i])
    )
    out = {}
    prev_u, rn, run, prev_i = None, 0, 0, None
    for i in rows:
        if uid[i] != prev_u:
            rn, run, prev_u, prev_i = 1, int(milli[i]), uid[i], None
        else:
            rn += 1
            run += int(milli[i])
        out[eid[i]] = {
            "rn": rn,
            "lag": None if prev_i is None else int(milli[prev_i]),
            "lead": None,
            "run": run,
        }
        if prev_i is not None:
            out[eid[prev_i]]["lead"] = int(milli[i])
        prev_i = i
    # rank / dense_rank of the value within the key; 3-row moving sum
    # along the (ts, eid) order
    import bisect

    by_user = {}
    for i in rows:
        by_user.setdefault(uid[i], []).append(i)
    for idxs in by_user.values():
        vals = sorted(int(milli[i]) for i in idxs)
        distinct = sorted(set(vals))
        window = []
        for i in idxs:
            v = int(milli[i])
            out[eid[i]]["rank"] = bisect.bisect_left(vals, v) + 1
            out[eid[i]]["dense"] = bisect.bisect_left(distinct, v) + 1
            window.append(v)
            out[eid[i]]["mov3"] = sum(window[-3:])
    return out


def test_keyed_window_matches_naive(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from s2sphere_ray.functions.windows import keyed_window

    rng = np.random.default_rng(7)
    n = 5000
    uid = rng.integers(0, 80, size=n).astype(np.int64)
    tsv = rng.integers(0, 10_000, size=n).astype(np.int64) * 1_000_000
    eid = rng.permutation(n).astype(np.int64)
    val = rng.normal(0, 5, size=n)
    # force ties: several events share a (user, ts) → eid breaks them
    tsv[: n // 10] = tsv[0]
    uid[: n // 10] = uid[0]
    tbl = pa.table(
        {
            "user_id": pa.array(uid),
            "ts": pa.array(tsv, pa.timestamp("us")),
            "event_id": pa.array(eid),
            "value": pa.array(val, pa.float64()),
        }
    )
    want = _naive_window(uid, tsv, eid, val)
    got = pa.concat_tables(
        keyed_window(
            rd.from_arrow(tbl).repartition(9), num_rows=n
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    assert got.num_rows == n
    lag = got["lag_milli"].to_pylist()
    lead = got["lead_milli"].to_pylist()
    rn = got["rn"].to_pylist()
    run = got["runsum_milli"].to_pylist()
    rank = got["rank_milli"].to_pylist()
    dense = got["dense_rank_milli"].to_pylist()
    mov3 = got["movsum3_milli"].to_pylist()
    for j, e in enumerate(got["event_id"].to_pylist()):
        w = want[e]
        assert rn[j] == w["rn"] and run[j] == w["run"]
        assert lag[j] == w["lag"] and lead[j] == w["lead"]
        assert rank[j] == w["rank"] and dense[j] == w["dense"]
        assert mov3[j] == w["mov3"]


def test_keyed_window_single_event_users(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from s2sphere_ray.functions.windows import keyed_window

    tbl = pa.table(
        {
            "user_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([10, 20, 30], pa.timestamp("us")),
            "event_id": pa.array([100, 200, 300], pa.int64()),
            "value": pa.array([1.25, -2.5, 0.0], pa.float64()),
        }
    )
    got = pa.concat_tables(
        keyed_window(rd.from_arrow(tbl), num_rows=3).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("event_id")
    assert got["rn"].to_pylist() == [1, 1, 1]
    assert got["lag_milli"].to_pylist() == [None, None, None]
    assert got["lead_milli"].to_pylist() == [None, None, None]
    assert got["rank_milli"].to_pylist() == [1, 1, 1]
    assert got["dense_rank_milli"].to_pylist() == [1, 1, 1]
    assert got["movsum3_milli"].to_pylist() == got["runsum_milli"].to_pylist()
    # floor(-2500 + 0.5) = -2500 — half-up via floor(x+0.5), toward -inf
    assert got["runsum_milli"].to_pylist() == [1250, -2500, 0]


def test_tile_counts_gather_tail_matches_distributed(
    ray_session, monkeypatch
):
    """The budgeted in-process tile merge (hint-bounded partial gather +
    driver-side combine/tokenize) must be bit-identical to the
    distributed repartition(1) merge — including sum columns and row
    order."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import s2sphere_ray.stages.tiles as tiles_mod

    rng = np.random.default_rng(23)
    n = 20_000
    tbl = pa.table(
        {
            "lat": pa.array(rng.uniform(-80, 80, n)),
            "lng": pa.array(rng.uniform(-179, 179, n)),
            "w": pa.array(rng.uniform(0, 10, n)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(13)

    def run():
        return pa.concat_tables(
            tiles_mod.tile_counts(
                rd.from_arrow(tbl).repartition(13),
                5,
                leaf_col=None,
                sum_cols=("w",),
                num_rows=n,
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ).combine_chunks()

    monkeypatch.setattr(tiles_mod, "TILE_GATHER_FLOOR", 0)
    a = run()  # floor forced to 0 → gather tail
    monkeypatch.setattr(tiles_mod, "TILE_GATHER_ROWS", 0)
    b = run()  # forced distributed repartition(1) merge
    assert a.schema.equals(b.schema)
    assert a.equals(b)
    del ds
