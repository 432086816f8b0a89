"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). See s2sphere_ray/queries.py for the registry;
SURVEY.md §2.3 maps each query to its engine operator.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (SURVEY §7 M1):
    pages → geocode → spatial join vs deterministic regions → per-tile
    counts. Returns the (small) aggregate Dataset."""
    from s2sphere_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001", tile_level=8)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.3."""
    from s2sphere_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for ALL 50 registered queries — 48 are
    independent derivations (including generated in-SQL replays of the
    Hilbert encode, edge neighbors, MinHash-LSH/SimHash pair streams,
    the curation export, the HyperLogLog estimate, and CellUnion set
    algebra); the two actor pipelines SQL cannot derive
    (q_cover_regions_golden, q_media) read frozen self-goldens."""
    from s2sphere_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
