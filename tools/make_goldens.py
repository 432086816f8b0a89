"""Generate the self-golden fixture file (tests/fixtures/goldens.json).

Freezes current engine outputs for deterministic inputs — cell tokens at
several levels, region covers, neighbor sets, kNN results, minhash
signatures — so future optimization rounds that accidentally change
semantics fail `tests/test_goldens.py` loudly. Regenerate ONLY after an
intentional semantic change (and say so in the commit):

    python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2sphere_ray import cells as ck  # noqa: E402
from s2sphere_ray import geometry as g  # noqa: E402
from s2sphere_ray import regions as R  # noqa: E402
from s2sphere_ray.pages import geocode_from_doc_id  # noqa: E402
from s2sphere_ray.functions.dedup import MinHashStage, _token_hash_batch  # noqa: E402


def build() -> dict:
    doc_id = np.arange(0, 400, dtype=np.int64)
    lat, lng = geocode_from_doc_id(doc_id)
    leaf = ck.cell_id_from_latlng(lat, lng)
    out: dict = {"doc_id_range": [0, 400]}
    out["tokens"] = {
        str(lvl): ck.token_from_cell_id(ck.parent(leaf, lvl))
        for lvl in (0, 5, 12, 21, 30)
    }
    out["edge_neighbors_l10"] = [
        [int(x) for x in row]
        for row in ck.edge_neighbors(ck.parent(leaf[:50], 10)).tolist()
    ]
    covers = {}
    cov = g.RegionCoverer(max_cells=8)
    regions = R.regions_from_sf_dir("/root/testdata/sf0.001")
    from s2sphere_ray.regions import region_object

    for row in regions.to_pylist():
        union = cov.get_covering(region_object(row))
        covers[str(row["region_id"])] = union.tokens()
    out["covers"] = covers
    # kNN golden: 5 queries over the 400 points, k=3
    from s2sphere_ray.stages.join import _haversine_oracle

    qlat = np.array([48.85, -10.0, 35.0, 0.0, -45.0])
    qlng = np.array([2.35, 100.0, -140.0, 0.0, 170.0])
    knn = []
    for qi in range(5):
        d = _haversine_oracle(lat, lng, qlat[qi], qlng[qi])
        order = np.lexsort((doc_id, d))[:3]
        knn.append([int(doc_id[i]) for i in order])
    out["knn_top3"] = knn
    # Hash goldens
    texts = ["the quick brown fox", "jumps over the lazy dog", ""]
    th, offs = _token_hash_batch(texts)
    out["token_hashes"] = [int(x) for x in th]
    out["token_offsets"] = [int(x) for x in offs]
    sig = MinHashStage(num_hashes=16).signature(texts[0])
    out["minhash16_first"] = [int(x) for x in sig]
    # Round-2 kernels: poly hash, simhash, quality, langid, HLL.
    import pyarrow as pa

    from s2sphere_ray.functions.dedup import poly_hash_strings, simhash_batch
    from s2sphere_ray.functions.text import LangIdStage, quality_batch
    from s2sphere_ray.functions.sketch import (
        hll_estimate,
        hll_register_partials,
    )

    gold_texts = [
        "the quick brown fox jumps over the lazy dog",
        "el rapido zorro marron salta sobre el perro perezoso que duerme",
        "",
        "一二三四五 testing mixed content here",
    ]
    tbl = pa.table({"text": pa.array(gold_texts)})
    out["poly_hash"] = [int(x) for x in poly_hash_strings(tbl["text"])]
    out["simhash"] = [int(x) for x in simhash_batch(tbl)["simhash"].to_pylist()]
    q = quality_batch(tbl)
    out["quality"] = {
        c: [int(x) for x in q[c].to_pylist()]
        for c in ("mean_token_len_x1000", "stopword_hits", "alpha_ratio_x1000")
    }
    out["langid"] = LangIdStage()(tbl)["lang_guess"].to_pylist()
    hp = hll_register_partials(
        pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))}), "k", p=10
    )
    regs = np.zeros(1024, dtype=np.int64)
    regs[hp["reg"].to_numpy()] = hp["rho"].to_numpy()
    out["hll_5000_p10"] = int(round(hll_estimate(regs, 10)))
    return out


if __name__ == "__main__":
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "goldens.json",
    )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as fh:
        json.dump(build(), fh, indent=1)
    print("wrote", dest)
