"""CLI entry point — the ``ray job submit`` surface.

    python -m s2sphere_ray flagship --sf-dir /root/testdata/sf0.001
    python -m s2sphere_ray write --sf-dir ... --out /tmp/tiles --level 8
    python -m s2sphere_ray query q_join_rect --sf-dir ...
    python -m s2sphere_ray export-jsonl --sf-dir ... --out /tmp/docs_jsonl
    python -m s2sphere_ray export-csv --sf-dir ... --out /tmp/docs_csv
    python -m s2sphere_ray export-ipc --sf-dir ... --out /tmp/docs_ipc

Owns its Ray session (guarded init per driver contract: library code never
calls ray.init, only CLI/bench/test entry points do).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="s2sphere_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)
    fl = sub.add_parser("flagship", help="run the flagship pipeline")
    fl.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    fl.add_argument("--tile-level", type=int, default=8)
    wr = sub.add_parser("write", help="resumable partitioned tile write")
    wr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    wr.add_argument("--out", required=True)
    wr.add_argument("--level", type=int, default=8)
    wr.add_argument("--fingerprint", default="cli-v1")
    qr = sub.add_parser("query", help="run one registered query")
    qr.add_argument("name")
    qr.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qr.add_argument("--limit", type=int, default=20)
    for fmt in ("jsonl", "csv", "ipc"):
        ex = sub.add_parser(
            f"export-{fmt}",
            help=f"resumable {fmt.upper()} export of the documents table",
        )
        ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        ex.add_argument("--out", required=True)
        ex.add_argument("--fingerprint", default="cli-v1")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "flagship":
            from s2sphere_ray.pipelines.flagship import flagship

            out = flagship(args.sf_dir, tile_level=args.tile_level)
            rows = out.take(10)
            print(
                json.dumps(
                    {"cmd": "flagship", "n_tiles": out.count(), "head": rows},
                    default=str,
                )
            )
        elif args.cmd == "write":
            from s2sphere_ray.pipelines.flagship import flagship_write
            from s2sphere_ray.stages.tiles import read_manifests

            flagship_write(
                args.sf_dir, args.out, tile_level=args.level,
                fingerprint=args.fingerprint,
            )
            manifests = read_manifests(args.out)
            print(
                json.dumps(
                    {
                        "cmd": "write",
                        "partitions": len(manifests),
                        "rows": sum(m["rows"] for m in manifests),
                        "out": args.out,
                    }
                )
            )
        elif args.cmd == "query":
            from s2sphere_ray.queries import QUERIES

            import pyarrow as pa

            res = QUERIES[args.name](args.sf_dir)
            if isinstance(res, pa.Table):
                head = res.slice(0, args.limit).to_pylist()
                n = res.num_rows
            else:  # ray.data.Dataset
                head = res.take(args.limit)
                n = res.count()
            print(
                json.dumps(
                    {"cmd": "query", "name": args.name, "rows": n, "head": head},
                    default=str,
                )
            )
        elif args.cmd in ("export-jsonl", "export-csv", "export-ipc"):
            import pyarrow.parquet as pq

            from s2sphere_ray.sources import write_csv, write_ipc, write_jsonl
            from s2sphere_ray.sources._partsink import read_manifests

            writer = {
                "export-jsonl": write_jsonl,
                "export-csv": write_csv,
                "export-ipc": write_ipc,
            }[args.cmd]
            path = f"{args.sf_dir}/documents.parquet"
            n_hint = None
            if os.path.isfile(path):
                n_hint = pq.ParquetFile(path).metadata.num_rows
            writer(
                rd.read_parquet(path),
                args.out,
                fingerprint=args.fingerprint,
                num_rows=n_hint,
            )
            manifests = read_manifests(args.out)
            print(
                json.dumps(
                    {
                        "cmd": args.cmd,
                        "partitions": len(manifests),
                        "rows": sum(m["rows"] for m in manifests),
                        "out": args.out,
                    }
                )
            )
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
