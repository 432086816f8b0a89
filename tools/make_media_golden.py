"""Freeze the media golden (tests/fixtures/media_golden.parquet).

q_media is sf-INDEPENDENT (a fixed 200-item seeded synthetic media
table through the E25 resize/frame-sample/feature actor pools,
mode="fake") and fully deterministic, so its output can be frozen as a
hash-exact oracle the same way the cover golden is — a regression
anchor, not an independent derivation (DuckDB cannot run the actor
pipeline).  Regenerate ONLY after an intentional semantic change to the
multimodal stages, and say so in the commit.

    python tools/make_media_golden.py
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

        from s2sphere_ray.queries import _MEDIA_GOLDEN_PATH, q_media

        out = q_media("unused")
        table = pa.Table.from_pylist(
            out.take_all(),
            schema=pa.schema(
                [
                    ("media_id", pa.int64()),
                    ("idx", pa.int64()),
                    ("val", pa.int64()),
                    ("variant", pa.string()),
                ]
            ),
        ).sort_by(
            [("variant", "ascending"), ("media_id", "ascending"), ("idx", "ascending")]
        )
        pq.write_table(table, _MEDIA_GOLDEN_PATH)
        print(f"wrote {table.num_rows} rows -> {_MEDIA_GOLDEN_PATH}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
