"""Build a multi-fragment copy of a testdata SF directory.

Real crawl inputs are thousands of parquet fragments, some empty — a
regime single-file testdata never exercises (empty fragments +
fragment-boundary block layouts are the round-4 review's untested
hazard class).  This tool rewrites selected tables as DIRECTORIES of
parquet fragments (including deliberately EMPTY ones) and symlinks the
rest, so the same 50-query oracle harness can run against it:

    python tools/make_multifrag.py /root/testdata/sf0.01 /tmp/mfrag
    python tools/oracle_harness.py /tmp/mfrag

Determinism: fragment boundaries are row-range slices in row order, so
the logical table is identical to the source.
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# table -> (n_fragments, n_empty_extra)
FRAGMENT = {"documents": (14, 2), "events": (7, 1), "lineitem": (8, 0)}


def build(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(dst, f"{t}.parquet")
        if t not in FRAGMENT:
            if not os.path.exists(dp):
                os.symlink(sp, dp)
            continue
        n_frag, n_empty = FRAGMENT[t]
        tbl = pq.read_table(sp)
        os.makedirs(dp, exist_ok=True)
        n = tbl.num_rows
        per = max(1, (n + n_frag - 1) // n_frag)
        k = 0
        for i in range(n_frag):
            part = tbl.slice(i * per, per)
            if part.num_rows == 0:
                break
            pq.write_table(part, os.path.join(dp, f"part-{k:04d}.parquet"))
            k += 1
        for _ in range(n_empty):
            pq.write_table(
                tbl.schema.empty_table(),
                os.path.join(dp, f"part-{k:04d}.parquet"),
            )
            k += 1
        check = pq.read_table(dp)
        assert check.num_rows == n, (t, check.num_rows, n)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mfrag"
    build(src, dst)
    print(f"multifrag copy of {src} at {dst}")
