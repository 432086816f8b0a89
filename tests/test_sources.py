"""JSONL source/sink (E0 widening): exact roundtrips, resume contract,
and operator-equality between the parquet and jsonl read paths."""

import math
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _sorted_tbl(tbl: pa.Table) -> pa.Table:
    return tbl.sort_by("doc_id").combine_chunks()


@pytest.fixture()
def out_dir(tmp_path):
    d = str(tmp_path / "jsonl_out")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_documents_roundtrip_exact(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import read_jsonl, write_jsonl
    from s2sphere_ray.sources.jsonl import read_manifests

    src = pq.read_table(f"{SF}/documents.parquet")
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    summaries = write_jsonl(ds, out_dir, num_rows=src.num_rows)
    assert sum(s["rows"] for s in summaries) == src.num_rows

    mans = read_manifests(out_dir)
    assert sum(m["rows"] for m in mans) == src.num_rows
    assert all(m["op_fingerprint"] == "" for m in mans)
    # one data file per manifest, bytes accounted
    for m in mans:
        p = os.path.join(out_dir, m["partition"] + ".jsonl")
        assert os.path.getsize(p) == m["bytes"]

    back = read_jsonl(out_dir, schema=src.schema)
    got = _sorted_tbl(
        pa.concat_tables(
            back.iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    want = _sorted_tbl(src)
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_column_pruned_read(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import read_jsonl, write_jsonl

    src = pq.read_table(f"{SF}/documents.parquet")
    write_jsonl(rd.read_parquet(f"{SF}/documents.parquet"), out_dir,
                num_rows=src.num_rows)
    back = read_jsonl(out_dir, columns=["doc_id", "lang"], schema=src.schema)
    tbl = _sorted_tbl(
        pa.concat_tables(
            back.iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    assert tbl.column_names == ["doc_id", "lang"]
    want = _sorted_tbl(src.select(["doc_id", "lang"]))
    assert tbl.cast(want.schema).equals(want)


def test_float_roundtrip_bit_exact(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_jsonl, write_jsonl

    vals = np.array(
        [0.1, 1 / 3, math.pi, 1.0000000000000002, 1e-308, 6.02214076e23]
    )
    src = pa.table(
        {
            "doc_id": pa.array(np.arange(len(vals)), pa.int64()),
            "x": pa.array(vals, pa.float64()),
            "big": pa.array(
                [9007199254740993 + i for i in range(len(vals))], pa.int64()
            ),
        }
    )
    d = str(tmp_path / "floats")
    write_jsonl(rd.from_arrow(src), d, num_rows=len(vals))
    back = pa.concat_tables(
        read_jsonl(d, schema=src.schema).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("doc_id")
    assert back.cast(src.schema).equals(src)  # bit-exact doubles + >2^53 ints


def test_resume_skips_finished_partitions(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import write_jsonl
    from s2sphere_ray.sources.jsonl import read_manifests

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    first = write_jsonl(ds, out_dir, num_rows=500)
    assert first
    stamp = {
        m["partition"]: m["written_at"] for m in read_manifests(out_dir)
    }
    second = write_jsonl(ds, out_dir, num_rows=500)
    assert second == []  # nothing re-written
    for m in read_manifests(out_dir):
        assert m["written_at"] == stamp[m["partition"]]


def test_partition_bytes_independent_of_input_partitioning(
    ray_session, tmp_path
):
    import ray.data as rd

    from s2sphere_ray.sources import write_jsonl

    ds1 = rd.read_parquet(f"{SF}/documents.parquet")
    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    write_jsonl(ds1, d1, num_rows=500)
    ds2 = rd.read_parquet(f"{SF}/documents.parquet").repartition(7)
    write_jsonl(ds2, d2, num_rows=500)
    f1 = sorted(f for f in os.listdir(d1) if f.endswith(".jsonl"))
    f2 = sorted(f for f in os.listdir(d2) if f.endswith(".jsonl"))
    assert f1 == f2
    for f in f1:
        with open(os.path.join(d1, f), "rb") as a, open(
            os.path.join(d2, f), "rb"
        ) as b:
            assert a.read() == b.read()


def test_operator_equality_across_sources(ray_session, out_dir):
    """A real operator (fused text stats) gives identical results whether
    the corpus arrived via parquet or jsonl."""
    import ray.data as rd

    from s2sphere_ray.functions.text import quality_batch
    from s2sphere_ray.sources import read_jsonl, write_jsonl

    src_schema = pq.read_schema(f"{SF}/documents.parquet")
    pq_ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    write_jsonl(
        rd.read_parquet(f"{SF}/documents.parquet"), out_dir, num_rows=500
    )
    jl_ds = read_jsonl(out_dir, columns=["doc_id", "text"], schema=src_schema)

    def stats(ds):
        return ds.map_batches(
            quality_batch, batch_format="pyarrow", batch_size=None
        )

    a = _sorted_tbl(
        pa.concat_tables(
            stats(pq_ds).iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    b = _sorted_tbl(
        pa.concat_tables(
            stats(jl_ds).iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    assert a.equals(b.cast(a.schema))


def test_binary_column_policy(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_jsonl, write_jsonl

    src = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"\x00\xffabc", None], pa.binary()),
        }
    )
    d = str(tmp_path / "bin")
    with pytest.raises(ValueError, match="binary"):
        write_jsonl(rd.from_arrow(src), d, num_rows=2)
    write_jsonl(rd.from_arrow(src), d, num_rows=2, binary="base64")
    back = pa.concat_tables(
        read_jsonl(d).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    assert back["payload"].to_pylist() == src["payload"].to_pylist()


def test_nonfinite_floats_rejected(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import write_jsonl

    src = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "x": pa.array([1.5, float("nan")], pa.float64()),
        }
    )
    with pytest.raises(ValueError, match="non-finite"):
        write_jsonl(rd.from_arrow(src), str(tmp_path / "nan"), num_rows=2)
    src2 = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "emb": pa.array([[0.5, float("inf")]], pa.list_(pa.float64())),
        }
    )
    with pytest.raises(ValueError, match="non-finite"):
        write_jsonl(rd.from_arrow(src2), str(tmp_path / "inf"), num_rows=1)
    # null floats stay legal
    src3 = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "x": pa.array([1.5, None], pa.float64()),
        }
    )
    write_jsonl(rd.from_arrow(src3), str(tmp_path / "ok"), num_rows=2)


def test_empty_export_reads_back_empty(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_jsonl, write_jsonl

    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    d = str(tmp_path / "empty")
    out = write_jsonl(rd.from_arrow(schema.empty_table()), d, num_rows=0)
    assert out == []
    back = read_jsonl(d, schema=schema)
    assert back.count() == 0


def test_duplicate_ids_deterministic_bytes(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import write_jsonl

    tbl = pa.table(
        {
            "doc_id": pa.array([7, 7, 7, 8], pa.int64()),
            "text": pa.array(["c", "a", "b", "z"], pa.string()),
        }
    )
    rev = tbl.take(pa.array([3, 2, 1, 0]))
    d1, d2 = str(tmp_path / "x"), str(tmp_path / "y")
    write_jsonl(rd.from_arrow(tbl), d1, num_rows=4)
    write_jsonl(rd.from_arrow(rev).repartition(3), d2, num_rows=4)
    f1 = sorted(f for f in os.listdir(d1) if f.endswith(".jsonl"))
    f2 = sorted(f for f in os.listdir(d2) if f.endswith(".jsonl"))
    assert f1 == f2
    for f in f1:
        with open(os.path.join(d1, f), "rb") as a, open(
            os.path.join(d2, f), "rb"
        ) as b:
            assert a.read() == b.read()


def test_unicode_and_control_chars_roundtrip(ray_session, tmp_path):
    """Newlines inside values must NOT break the line-delimited format
    (JSON escapes them), and unicode/control chars survive exactly."""
    import ray.data as rd

    from s2sphere_ray.sources import read_jsonl, write_jsonl

    texts = [
        "plain",
        "embedded\nnewline\r\nand\rcarriage",
        "tab\tquote\"backslash\\slash/",
        "emoji \U0001f600\U0001f680 combining é",
        "nul\x00bell\x07esc\x1b",
        "𠜎𠜱𠝹 ﷽ مرحبا שלום",
        "",
    ]
    src = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = str(tmp_path / "uni")
    write_jsonl(rd.from_arrow(src), d, num_rows=len(texts))
    back = pa.concat_tables(
        read_jsonl(d, schema=src.schema).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("doc_id")
    assert back["text"].to_pylist() == texts
    # every physical line is one JSON doc (the newline inside a value
    # was escaped, not emitted raw)
    total_lines = 0
    for f in os.listdir(d):
        if f.endswith(".jsonl"):
            with open(os.path.join(d, f), "rb") as fh:
                total_lines += sum(1 for _ in fh)
    assert total_lines == len(texts)
