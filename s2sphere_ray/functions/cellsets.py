"""Vectorized S2 CellUnion set algebra over raw uint64 id arrays.

The object API (geometry.CellUnion, G1-G4) operates on CellId lists —
exact but Python-speed.  These kernels reproduce the SAME results on
numpy uint64 arrays so the distributed q_cellset_ops pipeline can
normalize/compare unions of hundreds of thousands of cells per group
without a Python loop per cell; equality with the object algebra is
property-tested (tests/test_cellsets.py).

Representation invariants: a "union" is a 1-D np.uint64 array, sorted
ascending, with pairwise disjoint leaf ranges and no complete 4-sibling
group (i.e. CellUnion._normalized output order — S2 ids sort by range
order once disjoint).
"""

from __future__ import annotations

import numpy as np

from .. import cells as ck

_u = np.uint64
_ONE = _u(1)
_FACE_LSB = _u(1) << _u(60)


def _ranges(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    l = ck.lsb(ids)
    return ids - (l - _ONE), ids + (l - _ONE)


def normalize_ids(ids: np.ndarray) -> np.ndarray:
    """Vectorized CellUnion._normalized (geometry.py:119-144): sort,
    drop ids contained in another id, collapse complete 4-sibling
    groups (cascading).  Fixpoint formulation — containment removal is
    one running-max sweep (nested-or-disjoint ranges sorted by
    (range_min asc, range_max desc) put every container before its
    containees), then ≤ max-level rounds of vectorized quad collapse
    (each round lifts complete quads one level; collapse cannot create
    new containment because a cell covering the new parent would have
    covered — and removed — all four children first)."""
    ids = np.unique(np.asarray(ids, dtype=np.uint64))
    if not len(ids):
        return ids
    rmin, rmax = _ranges(ids)
    order = np.lexsort((np.iinfo(np.uint64).max - rmax, rmin))
    rmax_o = rmax[order]
    run = np.maximum.accumulate(rmax_o)
    contained = np.zeros(len(ids), dtype=bool)
    contained[1:] = rmax_o[1:] <= run[:-1]
    ids = np.sort(ids[order][~contained])
    # Quad collapse to fixpoint.
    while len(ids) >= 4:
        l = ck.lsb(ids)
        non_face = l < _FACE_LSB
        if not non_face.any():
            break
        new_lsb = l << _u(2)
        par = (ids & (~new_lsb + _ONE)) | new_lsb
        par = np.where(non_face, par, ids)  # faces never collapse
        uniq, inv, cnt = np.unique(par[non_face], return_inverse=True, return_counts=True)
        complete = cnt == 4
        if not complete.any():
            break
        drop = np.zeros(len(ids), dtype=bool)
        drop[non_face] = complete[inv]
        ids = np.sort(np.concatenate([ids[~drop], uniq[complete]]))
    return ids


def contained_mask(ids: np.ndarray, union: np.ndarray) -> np.ndarray:
    """For each id, True iff it is contained in some cell of the
    NORMALIZED ``union`` (disjoint ranges ⇒ at most one candidate: the
    last union cell whose range_min ≤ the id's range_min)."""
    ids = np.asarray(ids, dtype=np.uint64)
    if not len(union):
        return np.zeros(len(ids), dtype=bool)
    rmin, rmax = _ranges(ids)
    umin, umax = _ranges(union)
    idx = np.searchsorted(umin, rmin, side="right") - 1
    safe = idx >= 0
    out = np.zeros(len(ids), dtype=bool)
    out[safe] = rmax[safe] <= umax[idx[safe]]
    return out


def intersects_mask(ids: np.ndarray, union: np.ndarray) -> np.ndarray:
    """For each id, True iff its leaf range overlaps any cell of the
    NORMALIZED ``union`` (nested-or-disjoint ⇒ overlap means one
    contains the other: check the union cell at/before range_min and
    any union cell starting inside the id's range)."""
    ids = np.asarray(ids, dtype=np.uint64)
    if not len(union):
        return np.zeros(len(ids), dtype=bool)
    rmin, rmax = _ranges(ids)
    umin, umax = _ranges(union)
    idx = np.searchsorted(umin, rmin, side="right") - 1
    covered = np.zeros(len(ids), dtype=bool)
    safe = idx >= 0
    covered[safe] = umax[idx[safe]] >= rmin[safe]
    # A union cell starting within (rmin, rmax].
    nxt = np.searchsorted(umin, rmax, side="right") - 1
    starts_inside = (nxt >= 0) & (umin[np.maximum(nxt, 0)] >= rmin)
    return covered | starts_inside


def intersection_ids(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """CellUnion.get_intersection (geometry.py:2055-2085) on normalized
    unions: the deeper cell of every nested pair, deduped — exactly
    {x ∈ a contained in b} ∪ {y ∈ b contained in a}."""
    take_a = a[contained_mask(a, b)]
    take_b = b[contained_mask(b, a)]
    return np.unique(np.concatenate([take_a, take_b]))


def union_ids(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """CellUnion.get_union: concatenate + normalize."""
    return normalize_ids(np.concatenate([a, b]))


def difference_ids(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """CellUnion.get_difference (geometry.py:2088-2100) on normalized
    unions: recursively subdivide each a-cell that partially overlaps
    ``b``; keep non-overlapping (sub)cells, drop contained ones.  The
    object code recurses depth-first per cell; the output SET is
    level-bounded by ``b``'s deepest cell, so a breadth-first frontier
    sweep (≤ 30 rounds) yields the identical id set, and no complete
    quad or containment can appear (a quad with all 4 children kept
    would mean the parent never overlapped ``b``)."""
    a = np.asarray(a, dtype=np.uint64)
    out: list[np.ndarray] = []
    frontier = a
    for _ in range(31):
        if not len(frontier):
            break
        hit = intersects_mask(frontier, b)
        out.append(frontier[~hit])
        live = frontier[hit]
        live = live[~contained_mask(live, b)]
        if not len(live):
            break
        child_lsb = ck.lsb(live) >> _u(2)
        k = np.arange(4, dtype=np.uint64)
        frontier = (
            live[:, None] + (_u(2) * k[None, :] - _u(3)) * child_lsb[:, None]
        ).reshape(-1)
    return np.sort(np.concatenate(out)) if out else np.zeros(0, np.uint64)
