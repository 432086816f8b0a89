"""Freeze the sketch golden (tests/fixtures/sketch_golden.parquet).

Runs q_sketch_golden (minhash head / simhash / fingerprint over the fixed
in-code corpus) and writes its output as the frozen oracle table.
Regenerate ONLY after an intentional semantic change (and say so in the
commit):

    python tools/make_sketch_golden.py
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

        from s2sphere_ray.queries import _SKETCH_GOLDEN_PATH, q_sketch_golden

        rows = q_sketch_golden("unused").take_all()
        rows.sort(key=lambda r: r["doc_id"])
        table = pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("minhash_head", pa.int64()),
                    ("simhash", pa.int64()),
                    ("fingerprint", pa.int64()),
                ]
            ),
        )
        pq.write_table(table, _SKETCH_GOLDEN_PATH)
        print(f"wrote {table.num_rows} rows -> {_SKETCH_GOLDEN_PATH}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
