"""Region tables: deterministic generation + region-object construction.

A *regions table* is the engine's representation of a set of query regions
(SURVEY §1.2): one row per region with ``region_id:int64, kind:string`` and
kind-specific params. Three kinds:

* ``rect`` — lat/lng-aligned rectangle (integer-degree bounds here, so the
  DuckDB oracle's BETWEEN predicates are exact);
* ``cap``  — spherical disc (axis lat/lng + radius degrees);
* ``poly`` — convex spherical polygon (JSON vertex list; engine-defined
  semantics, oracle via edge-normal dot products);
* ``loop`` — GENERAL (concave) spherical polygon, crossing-parity
  containment (geometry.Loop); axis_lat/axis_lng carry the loop center
  whose antipode is the parity reference point.

Deterministic generators derive regions from the driver's ``nation`` /
``supplier`` tables by integer arithmetic so the oracle SQL can regenerate
the identical regions from the same views (no side-channel files).
"""

from __future__ import annotations

import json
import math

import numpy as np
import pyarrow as pa

from . import geometry as g

REGIONS_SCHEMA = pa.schema(
    [
        ("region_id", pa.int64()),
        ("kind", pa.string()),
        ("lat_lo", pa.float64()),
        ("lat_hi", pa.float64()),
        ("lng_lo", pa.float64()),
        ("lng_hi", pa.float64()),
        ("axis_lat", pa.float64()),
        ("axis_lng", pa.float64()),
        ("radius_deg", pa.float64()),
        ("poly_json", pa.string()),
    ]
)

# Rect derivation from n_nationkey (mirrored in SQL by rect_regions_sql):
#   lat_lo = (k*7919) % 120 - 60        (integer degrees in [-60, 59])
#   lat_hi = lat_lo + 4 + k % 13
#   lng_lo = (k*104729) % 300 - 170     (integer degrees in [-170, 129])
#   lng_hi = lng_lo + 6 + k % 17
_RECT = dict(latm=7919, lngm=104729)


def rect_bounds_from_key(k: np.ndarray):
    k = k.astype(np.int64)
    lat_lo = (k * _RECT["latm"]) % 120 - 60
    lat_hi = lat_lo + 4 + (k % 13)
    lng_lo = (k * _RECT["lngm"]) % 300 - 170
    lng_hi = lng_lo + 6 + (k % 17)
    return lat_lo, lat_hi, lng_lo, lng_hi


def rect_regions_sql(key_expr: str = "n_nationkey", table: str = "nation") -> str:
    """SELECT producing the identical rect regions inside DuckDB."""
    k = f"CAST({key_expr} AS BIGINT)"
    return (
        f"SELECT {k} AS region_id,"
        f" ({k} * {_RECT['latm']}) % 120 - 60 AS lat_lo,"
        f" ({k} * {_RECT['latm']}) % 120 - 60 + 4 + {k} % 13 AS lat_hi,"
        f" ({k} * {_RECT['lngm']}) % 300 - 170 AS lng_lo,"
        f" ({k} * {_RECT['lngm']}) % 300 - 170 + 6 + {k} % 17 AS lng_hi"
        f" FROM {table}"
    )


# Cap derivation from s_suppkey (mirrored in SQL by cap_regions_sql):
#   axis_lat = (k*7919) % 140 - 70
#   axis_lng = (k*104729) % 360 - 180
#   radius_deg = 2 + k % 7
def cap_params_from_key(k: np.ndarray):
    k = k.astype(np.int64)
    axis_lat = (k * _RECT["latm"]) % 140 - 70
    axis_lng = (k * _RECT["lngm"]) % 360 - 180
    radius = 2 + (k % 7)
    return axis_lat, axis_lng, radius


def cap_regions_sql(key_expr: str = "s_suppkey", table: str = "supplier") -> str:
    k = f"CAST({key_expr} AS BIGINT)"
    return (
        f"SELECT {k} AS region_id,"
        f" ({k} * {_RECT['latm']}) % 140 - 70 AS axis_lat,"
        f" ({k} * {_RECT['lngm']}) % 360 - 180 AS axis_lng,"
        f" 2 + {k} % 7 AS radius_deg"
        f" FROM {table}"
    )


def make_rect_regions(nation_keys: np.ndarray) -> pa.Table:
    lat_lo, lat_hi, lng_lo, lng_hi = rect_bounds_from_key(nation_keys)
    n = len(nation_keys)
    return pa.table(
        {
            "region_id": pa.array(nation_keys.astype(np.int64)),
            "kind": pa.array(["rect"] * n),
            "lat_lo": pa.array(lat_lo.astype(np.float64)),
            "lat_hi": pa.array(lat_hi.astype(np.float64)),
            "lng_lo": pa.array(lng_lo.astype(np.float64)),
            "lng_hi": pa.array(lng_hi.astype(np.float64)),
            "axis_lat": pa.nulls(n, pa.float64()),
            "axis_lng": pa.nulls(n, pa.float64()),
            "radius_deg": pa.nulls(n, pa.float64()),
            "poly_json": pa.nulls(n, pa.string()),
        }
    )


def make_cap_regions(supp_keys: np.ndarray, id_offset: int = 1000) -> pa.Table:
    axis_lat, axis_lng, radius = cap_params_from_key(supp_keys)
    n = len(supp_keys)
    return pa.table(
        {
            "region_id": pa.array(supp_keys.astype(np.int64) + id_offset),
            "kind": pa.array(["cap"] * n),
            "lat_lo": pa.nulls(n, pa.float64()),
            "lat_hi": pa.nulls(n, pa.float64()),
            "lng_lo": pa.nulls(n, pa.float64()),
            "lng_hi": pa.nulls(n, pa.float64()),
            "axis_lat": pa.array(axis_lat.astype(np.float64)),
            "axis_lng": pa.array(axis_lng.astype(np.float64)),
            "radius_deg": pa.array(radius.astype(np.float64)),
            "poly_json": pa.nulls(n, pa.string()),
        }
    )


def make_poly_regions(keys: np.ndarray, id_offset: int = 2000) -> pa.Table:
    """Seeded convex polygons (squashed hexagons) around deterministic
    centers; engine-defined semantics (rows-only oracle)."""
    rows = []
    for k in keys.astype(np.int64):
        rng = np.random.default_rng(42 + int(k))
        clat = float((k * 7919) % 100 - 50)
        clng = float((k * 104729) % 320 - 160)
        r = 10.0 + 3.0 * float(k % 5)
        nv = 4 + int(k % 5)
        verts = []
        # CCW seen from outside the sphere = counterclockwise in the local
        # (east, north) frame: angle 0 → east, π/2 → north.
        for a in range(nv):
            ang = 2 * math.pi * a / nv
            verts.append(
                [
                    clat + r * math.sin(ang),
                    clng + r * math.cos(ang) / max(0.2, math.cos(math.radians(clat))),
                ]
            )
        rows.append((int(k) + id_offset, json.dumps(verts)))
    n = len(rows)
    return pa.table(
        {
            "region_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["poly"] * n),
            "lat_lo": pa.nulls(n, pa.float64()),
            "lat_hi": pa.nulls(n, pa.float64()),
            "lng_lo": pa.nulls(n, pa.float64()),
            "lng_hi": pa.nulls(n, pa.float64()),
            "axis_lat": pa.nulls(n, pa.float64()),
            "axis_lng": pa.nulls(n, pa.float64()),
            "radius_deg": pa.nulls(n, pa.float64()),
            "poly_json": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def make_loop_regions(keys: np.ndarray, id_offset: int = 3000) -> pa.Table:
    """Seeded CONCAVE star polygons (alternating outer/inner radius, so
    every other vertex is a reflex notch) around deterministic centers;
    kind='loop' → crossing-parity containment (geometry.Loop). The
    center rides in axis_lat/axis_lng so consumers derive the parity
    reference point (the center's antipode) without re-aggregating
    vertices; the oracle SQL regenerates the identical vertices from the
    same key arithmetic (SQL_JOIN_LOOP)."""
    rows = []
    for k in keys.astype(np.int64):
        clat = float((k * 7919) % 90 - 45)  # stay off the poles
        clng = float((k * 104729) % 320 - 160)
        r_out = 10.0 + 3.0 * float(k % 5)
        nv = 2 * (5 + int(k % 3))  # 10/12/14 vertices, always even
        verts = []
        for a in range(nv):
            ang = 2 * math.pi * a / nv
            rr = r_out if a % 2 == 0 else 0.4 * r_out
            verts.append(
                [
                    clat + rr * math.sin(ang),
                    clng
                    + rr
                    * math.cos(ang)
                    / max(0.2, math.cos(math.radians(clat))),
                ]
            )
        rows.append((int(k) + id_offset, clat, clng, json.dumps(verts)))
    n = len(rows)
    return pa.table(
        {
            "region_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["loop"] * n),
            "lat_lo": pa.nulls(n, pa.float64()),
            "lat_hi": pa.nulls(n, pa.float64()),
            "lng_lo": pa.nulls(n, pa.float64()),
            "lng_hi": pa.nulls(n, pa.float64()),
            "axis_lat": pa.array([r[1] for r in rows], pa.float64()),
            "axis_lng": pa.array([r[2] for r in rows], pa.float64()),
            "radius_deg": pa.nulls(n, pa.float64()),
            "poly_json": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def regions_from_sf_dir(sf_dir: str, kinds=("rect", "cap", "poly")) -> pa.Table:
    """Deterministic regions table derived from the driver testdata tables."""
    import pyarrow.parquet as pq

    parts = []
    if "rect" in kinds:
        nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
        parts.append(
            make_rect_regions(nation["n_nationkey"].to_numpy().astype(np.int64))
        )
    if "cap" in kinds:
        supplier = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
        parts.append(
            make_cap_regions(supplier["s_suppkey"].to_numpy().astype(np.int64))
        )
    if "poly" in kinds:
        region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey"])
        parts.append(
            make_poly_regions(region["r_regionkey"].to_numpy().astype(np.int64))
        )
    if "loop" in kinds:
        region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey"])
        parts.append(
            make_loop_regions(region["r_regionkey"].to_numpy().astype(np.int64))
        )
    return pa.concat_tables(parts)


def region_object(row: dict):
    """Regions-table row → scalar region object (geometry.py contract)."""
    kind = row["kind"]
    if kind == "rect":
        return g.LatLngRect.from_degrees(
            row["lat_lo"], row["lng_lo"], row["lat_hi"], row["lng_hi"]
        )
    if kind == "cap":
        axis = g.LatLng.from_degrees(row["axis_lat"], row["axis_lng"]).to_point()
        return g.Cap.from_axis_angle(axis, math.radians(row["radius_deg"]))
    if kind == "poly":
        return g.ConvexPolygon(json.loads(row["poly_json"]))
    if kind == "loop":
        c = g.LatLng.from_degrees(row["axis_lat"], row["axis_lng"]).to_point()
        return g.Loop(json.loads(row["poly_json"]), ref=g.neg(c))
    raise ValueError(f"unknown region kind: {kind}")
