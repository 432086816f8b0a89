"""Stateless cell-kernel stages (engine ops E2–E6, E8, E10, E15).

Each function here is a vectorized ``pa.Table → pa.Table`` batch transform
meant for ``ds.map_batches(fn, batch_format="pyarrow")``: zero-copy numpy
views of Arrow columns in, appended Arrow columns out. No per-row Python in
any of them (SURVEY §3 Trace 1: the reference's scalar call chain is fused
into one batch kernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cells as ck


def _np(col) -> np.ndarray:
    """Arrow column → numpy (zero-copy when possible)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def cell_encode(
    batch: pa.Table,
    lat_col: str = "lat",
    lng_col: str = "lng",
    out_col: str = "cell_id",
    level: int | None = None,
) -> pa.Table:
    """E3: lat/lng degrees → (leaf or ``level``) cell id column (uint64)."""
    ids = ck.cell_id_from_latlng(_np(batch[lat_col]), _np(batch[lng_col]))
    if level is not None:
        ids = ck.parent(ids, level)
    return batch.append_column(out_col, pa.array(ids, pa.uint64()))


def cell_token(
    batch: pa.Table, id_col: str = "cell_id", out_col: str = "cell_token"
) -> pa.Table:
    """E4: cell id → token string column."""
    return batch.append_column(
        out_col, ck.token_array_from_cell_id(_np(batch[id_col]))
    )


def token_to_cell(
    batch: pa.Table, token_col: str = "cell_token", out_col: str = "cell_id"
) -> pa.Table:
    """E4 inverse: token string → cell id column."""
    ids = ck.token_to_cell_id_array(batch[token_col])
    return batch.append_column(out_col, pa.array(ids, pa.uint64()))


def cell_decode(
    batch: pa.Table,
    id_col: str = "cell_id",
    lat_col: str = "cell_lat",
    lng_col: str = "cell_lng",
) -> pa.Table:
    """E5: cell id → center lat/lng degree columns."""
    lat, lng = ck.cell_id_to_latlng(_np(batch[id_col]))
    batch = batch.append_column(lat_col, pa.array(lat, pa.float64()))
    return batch.append_column(lng_col, pa.array(lng, pa.float64()))


def cell_props(batch: pa.Table, id_col: str = "cell_id") -> pa.Table:
    """E6: level / face / is_leaf / range_min / range_max columns."""
    ids = _np(batch[id_col])
    batch = batch.append_column("cell_level", pa.array(ck.level(ids), pa.int32()))
    batch = batch.append_column("cell_face", pa.array(ck.face(ids), pa.int32()))
    batch = batch.append_column("cell_is_leaf", pa.array(ck.is_leaf(ids)))
    batch = batch.append_column("range_min", pa.array(ck.range_min(ids), pa.uint64()))
    batch = batch.append_column("range_max", pa.array(ck.range_max(ids), pa.uint64()))
    return batch


def tile_assign(
    batch: pa.Table,
    level: int,
    id_col: str = "cell_id",
    out_col: str = "tile_id",
    token: bool = True,
) -> pa.Table:
    """E15: ancestor tile at fixed ``level`` (+ token column for partitioning)."""
    tiles = ck.parent(_np(batch[id_col]), level)
    batch = batch.append_column(out_col, pa.array(tiles, pa.uint64()))
    if token:
        batch = batch.append_column(
            out_col + "_token", ck.token_array_from_cell_id(tiles)
        )
    return batch


def neighbors_expand(
    batch: pa.Table,
    id_col: str = "cell_id",
    kind: str = "edge",
    out_col: str = "neighbor_id",
    keep_cols: list[str] | None = None,
    nbr_level: int | None = None,
) -> pa.Table:
    """E10: 1→k row expansion to (kept columns ×, neighbor_id).

    ``kind`` ∈ {"edge" (4), "all" (8, deduped per-row upstream
    consumers), "vertex" (3-4 at the coarser ``nbr_level`` — the 0
    sentinel rows cells.vertex_neighbors emits at cube corners are
    dropped here)}.  Implemented as a widened batch (flat-map style)
    without per-row Python.
    """
    ids = _np(batch[id_col])
    if kind == "edge":
        nbrs = ck.edge_neighbors(ids)
    elif kind == "vertex":
        if nbr_level is None:
            raise ValueError("kind='vertex' requires nbr_level")
        nbrs = ck.vertex_neighbors(ids, nbr_level)
    else:
        nbrs = ck.all_neighbors(ids)
    k = nbrs.shape[1]
    idx = np.repeat(np.arange(len(ids)), k)
    flat = nbrs.reshape(-1)
    if kind == "vertex":
        keep = flat != np.uint64(0)
        idx, flat = idx[keep], flat[keep]
    cols = {}
    for name in keep_cols or batch.column_names:
        cols[name] = batch[name].take(pa.array(idx))
    cols[out_col] = pa.array(flat, pa.uint64())
    return pa.table(cols)


def vertex_latlng(batch: pa.Table, id_col: str = "cell_id") -> pa.Table:
    """E8: 4 cell vertices as list<float64> lat/lng columns — fully
    vectorized (was a per-row Cell loop through round 4).  Same CCW
    corner order ((lo,lo),(hi,lo),(hi,hi),(lo,hi)) and the same float
    operations as ``geometry.Cell.vertices()`` + ``LatLng.from_point``
    (normalize then atan2); equal to the scalar path within 2 ulp —
    np.arctan2 vs math.atan2 libm rounding is the only divergence
    (pinned by tests/test_stages.py)."""
    ids = _np(batch[id_col])
    f, i, j, _ = ck.cell_id_to_face_ij_orientation(ids)
    size = ck.get_size_ij(ck.level(ids))
    i0, j0 = i & -size, j & -size
    us = (
        ck.st_to_uv(ck.ij_to_st_min(i0)),
        ck.st_to_uv(ck.ij_to_st_min(i0 + size)),
    )
    vs = (
        ck.st_to_uv(ck.ij_to_st_min(j0)),
        ck.st_to_uv(ck.ij_to_st_min(j0 + size)),
    )
    vlat = np.empty((len(ids), 4))
    vlng = np.empty((len(ids), 4))
    for k, (ui, vi) in enumerate(((0, 0), (1, 0), (1, 1), (0, 1))):
        x, y, z = ck.face_uv_to_xyz(f, us[ui], vs[vi])
        nrm = np.sqrt(x * x + y * y + z * z)
        x, y, z = x / nrm, y / nrm, z / nrm
        vlat[:, k] = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
        vlng[:, k] = np.degrees(np.arctan2(y, x))
    batch = batch.append_column(
        "vertex_lat", pa.FixedSizeListArray.from_arrays(pa.array(vlat.reshape(-1)), 4)
    )
    batch = batch.append_column(
        "vertex_lng", pa.FixedSizeListArray.from_arrays(pa.array(vlng.reshape(-1)), 4)
    )
    return batch


def cell_area(batch: pa.Table, id_col: str = "cell_id") -> pa.Table:
    """E13 helper: average-metric area (steradians) per cell id (vectorized)."""
    from .. import geometry as g

    ids = _np(batch[id_col])
    lv = ck.level(ids)
    area = g.AVG_AREA.deriv * np.power(2.0, -2.0 * lv)
    return batch.append_column("avg_area_sr", pa.array(area, pa.float64()))
