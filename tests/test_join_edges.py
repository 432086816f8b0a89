"""Differential edge-case join test: dateline-wrapping rects, polar caps,
near-pole polygons — every strategy must equal brute force."""

import json
import math

import numpy as np
import pyarrow as pa
import pytest

from s2sphere_ray.stages import join as J


def _edge_regions(rng):
    rows = []
    rid = 0

    def add(**kw):
        nonlocal rid
        base = dict(
            region_id=rid, kind=None, lat_lo=None, lat_hi=None, lng_lo=None,
            lng_hi=None, axis_lat=None, axis_lng=None, radius_deg=None,
            poly_json=None,
        )
        base.update(kw)
        rows.append(base)
        rid += 1

    for _ in range(3):  # wrap-crossing rects
        lat_lo = rng.uniform(-70, 60)
        add(kind="rect", lat_lo=lat_lo, lat_hi=lat_lo + rng.uniform(2, 20),
            lng_lo=rng.uniform(150, 179), lng_hi=rng.uniform(-179, -150))
    for pole in (85.0, -85.0):  # polar caps
        add(kind="cap", axis_lat=pole, axis_lng=rng.uniform(-180, 180),
            radius_deg=8.0)
    for _ in range(3):
        add(kind="cap", axis_lat=rng.uniform(-80, 80),
            axis_lng=rng.uniform(-180, 180), radius_deg=rng.uniform(1, 10))
    for clat, clng in ((75, 30), (0, 179)):  # near-pole / near-dateline polys
        nv = 6
        verts = [
            [
                clat + 6 * math.sin(2 * math.pi * a / nv),
                clng
                + 6 * math.cos(2 * math.pi * a / nv)
                / max(0.2, math.cos(math.radians(clat))),
            ]
            for a in range(nv)
        ]
        add(kind="poly", poly_json=json.dumps(verts))
    return pa.table({k: [r[k] for r in rows] for k in rows[0]})


@pytest.mark.parametrize(
    "strategy,kwargs",
    [
        ("broadcast", {}),
        ("shuffle", {}),
        ("shuffle", {"hot_threshold": 100, "split_delta": 2}),
    ],
)
def test_edge_regions_match_brute(ray_session, strategy, kwargs):
    import ray.data as rd

    rng = np.random.default_rng(11)
    regions = _edge_regions(rng)
    n = 1500
    lat = rng.uniform(-89.9, 89.9, n)
    lng = rng.uniform(-180, 180, n)
    doc_id = np.arange(n, dtype=np.int64)
    expected = set()
    for row in regions.to_pylist():
        m = J.refine_mask(lat, lng, row)
        for d in doc_id[m]:
            expected.add((int(d), int(row["region_id"])))
    ds = rd.from_arrow(
        pa.table({"doc_id": doc_id, "lat": lat, "lng": lng})
    ).repartition(4)
    out = J.spatial_join(
        ds, regions, strategy=strategy, point_cols=("doc_id",), **kwargs
    )
    got = set((r["doc_id"], r["region_id"]) for r in out.take_all())
    assert got == expected
