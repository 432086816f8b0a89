"""Freeze the cover golden (tests/fixtures/cover_golden.parquet).

Runs the q_cover_regions_golden pipeline (fixed 135-region set through
the distributed E7 coverer) and writes its exploded
(region_id, cell_rank, cover_token) output as the frozen oracle table.
Like tools/make_goldens.py: regenerate ONLY after an intentional
semantic change to the coverer, and say so in the commit.

    python tools/make_cover_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from s2sphere_ray.queries import _COVER_GOLDEN_PATH, q_cover_regions_golden

        out = q_cover_regions_golden("unused")
        table = pa.Table.from_pylist(
            out.take_all(),
            schema=pa.schema(
                [
                    ("region_id", pa.int64()),
                    ("cell_rank", pa.int64()),
                    ("cover_token", pa.string()),
                    ("variant", pa.string()),
                ]
            ),
        )
        pq.write_table(table, _COVER_GOLDEN_PATH)
        print(f"wrote {table.num_rows} rows -> {_COVER_GOLDEN_PATH}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
