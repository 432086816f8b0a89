"""The ``python -m s2sphere_ray`` CLI (the ray-job-submit surface) runs
end to end in its own process and prints one parseable JSON line."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "s2sphere_ray", "--num-cpus", "4", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # Last stdout line is the JSON payload (Ray may log above it).
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_cli_flagship_smoke():
    out = _run_cli("flagship", "--sf-dir", "/root/testdata/sf0.001")
    assert out["cmd"] == "flagship"
    assert out["n_tiles"] > 0
    assert isinstance(out["head"], list) and out["head"]


def test_cli_query_smoke():
    out = _run_cli(
        "query", "q_encode_suite", "--sf-dir", "/root/testdata/sf0.001",
        "--limit", "3",
    )
    assert out["cmd"] == "query"
    assert out["rows"] > 0
    assert len(out["head"]) == 3


def test_cli_export_jsonl_smoke(tmp_path):
    out_dir = str(tmp_path / "docs_jsonl")
    out = _run_cli(
        "export-jsonl", "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir
    )
    assert out["cmd"] == "export-jsonl"
    assert out["rows"] == 500
    assert out["partitions"] >= 16
    # resume: a second run rewrites nothing (manifests already present)
    again = _run_cli(
        "export-jsonl", "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir
    )
    assert again["rows"] == 500 and again["partitions"] == out["partitions"]


def test_cli_export_csv_smoke(tmp_path):
    out_dir = str(tmp_path / "docs_csv")
    out = _run_cli(
        "export-csv", "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir
    )
    assert out["cmd"] == "export-csv"
    assert out["rows"] == 500
    assert out["partitions"] >= 16
    again = _run_cli(
        "export-csv", "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir
    )
    assert again["rows"] == 500 and again["partitions"] == out["partitions"]


def test_cli_export_ipc_smoke(tmp_path):
    out_dir = str(tmp_path / "docs_ipc")
    out = _run_cli(
        "export-ipc", "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir
    )
    assert out["cmd"] == "export-ipc"
    assert out["rows"] == 500
    assert out["partitions"] >= 16
    again = _run_cli(
        "export-ipc", "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir
    )
    assert again["rows"] == 500 and again["partitions"] == out["partitions"]
