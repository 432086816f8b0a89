"""E7 — RegionCoverer as a Ray Data actor-pool stage.

One input region row → one cover (``list<uint64>``). Covering is per-region
sequential and branchy (SURVEY §3 Trace 2), so the batch body is a Python
loop over region rows, but the stage parallelizes across batches via an
actor pool: Hilbert/metric tables and coverer config are built once per
actor in ``__init__`` (not per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import geometry as g
from ..regions import region_object


class CovererStage:
    """Callable-class stage for ``map_batches(CovererStage, concurrency=N)``.

    Appends ``cover:list<uint64>`` (and optionally ``cover_tokens``) to a
    regions batch. Config mirrors sphere.py RegionCoverer (SURVEY §2.1 I1).
    """

    def __init__(
        self,
        max_cells: int = 8,
        min_level: int = 0,
        max_level: int = g.MAX_LEVEL,
        level_mod: int = 1,
        interior: bool = False,
        tokens: bool = False,
        interior_work_budget: int = 4000,
    ):
        self.coverer = g.RegionCoverer(
            min_level=min_level,
            max_level=max_level,
            level_mod=level_mod,
            max_cells=max_cells,
            interior_work_budget=interior_work_budget,
        )
        self.interior = interior
        self.tokens = tokens

    # region_object() consumes only the region-spec columns; everything
    # else in the batch (payload, ids, covers from earlier stages) stays
    # in Arrow and never round-trips through Python (VERDICT r3 minor).
    _SPEC_COLS = (
        "kind", "lat_lo", "lng_lo", "lat_hi", "lng_hi",
        "axis_lat", "axis_lng", "radius_deg", "poly_json",
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        covers = []
        spec = [c for c in self._SPEC_COLS if c in batch.column_names]
        rows = batch.select(spec).to_pylist()
        for row in rows:
            region = region_object(row)
            if self.interior:
                union = self.coverer.get_interior_covering(region)
            else:
                union = self.coverer.get_covering(region)
            covers.append(union.ids())
        batch = batch.append_column(
            "cover", pa.array(covers, pa.list_(pa.uint64()))
        )
        if self.tokens:
            from .. import cells as ck

            toks = [
                ck.token_from_cell_id(np.array(ids, dtype=np.uint64)) if ids else []
                for ids in covers
            ]
            batch = batch.append_column(
                "cover_tokens", pa.array(toks, pa.list_(pa.string()))
            )
        return batch


def cover_regions(
    regions_ds,
    max_cells: int = 8,
    min_level: int = 0,
    max_level: int = g.MAX_LEVEL,
    level_mod: int = 1,
    interior: bool = False,
    tokens: bool = False,
    concurrency=None,
    batch_size: int = 512,
    interior_work_budget: int = 4000,
):
    """Dataset of region rows → same rows + ``cover`` list column."""
    from ..functions._buckets import derive_concurrency

    if concurrency is None:
        # Coverer is CPU-bound per-region Python: scale the pool to the
        # cluster instead of a pinned constant.
        concurrency = derive_concurrency(1.0)
    return regions_ds.map_batches(
        CovererStage,
        fn_constructor_kwargs=dict(
            max_cells=max_cells,
            min_level=min_level,
            max_level=max_level,
            level_mod=level_mod,
            interior=interior,
            tokens=tokens,
            interior_work_budget=interior_work_budget,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def cover_table(
    regions: pa.Table,
    max_cells: int = 8,
    min_level: int = 0,
    max_level: int = g.MAX_LEVEL,
    level_mod: int = 1,
    interior: bool = False,
    interior_work_budget: int = 4000,
) -> pa.Table:
    """Driver-side covering of a small regions table (broadcast-index path)."""
    stage = CovererStage(
        max_cells=max_cells,
        min_level=min_level,
        max_level=max_level,
        level_mod=level_mod,
        interior=interior,
        interior_work_budget=interior_work_budget,
    )
    return stage(regions)
