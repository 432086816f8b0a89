"""CSV source/sink (E0 widening): exact roundtrips, fidelity contract
(null vs empty string, embedded newlines, bit-exact floats), resume,
and the flat/binary policies."""

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


def _gather(ds) -> pa.Table:
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
    )


@pytest.fixture()
def out_dir(tmp_path):
    d = str(tmp_path / "csv_out")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_documents_roundtrip_exact(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import read_csv, write_csv
    from s2sphere_ray.sources.csv import read_manifests

    src = pq.read_table(f"{SF}/documents.parquet")
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    summaries = write_csv(ds, out_dir, num_rows=src.num_rows)
    assert sum(s["rows"] for s in summaries) == src.num_rows

    mans = read_manifests(out_dir)
    assert sum(m["rows"] for m in mans) == src.num_rows
    for m in mans:
        p = os.path.join(out_dir, m["partition"] + ".csv")
        assert os.path.getsize(p) == m["bytes"]

    back = read_csv(out_dir, schema=src.schema)
    got = _sorted_tbl(_gather(back))
    want = _sorted_tbl(src)
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_parse_level_pruned_read(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import read_csv, write_csv

    src = pq.read_table(f"{SF}/documents.parquet")
    write_csv(
        rd.read_parquet(f"{SF}/documents.parquet"), out_dir,
        num_rows=src.num_rows,
    )
    back = read_csv(out_dir, columns=["doc_id", "lang"], schema=src.schema)
    tbl = _sorted_tbl(_gather(back))
    assert tbl.column_names == ["doc_id", "lang"]
    want = _sorted_tbl(src.select(["doc_id", "lang"]))
    assert tbl.cast(want.schema).equals(want)


def test_float_roundtrip_bit_exact(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_csv, write_csv

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
    write_csv(rd.from_arrow(src), d, num_rows=len(vals))
    back = _gather(read_csv(d, schema=src.schema)).sort_by("doc_id")
    assert back.cast(src.schema).equals(src)  # bit-exact doubles + >2^53 ints


def test_null_vs_empty_string(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_csv, write_csv

    src = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "s": pa.array(["a", "", None], pa.string()),
        }
    )
    d = str(tmp_path / "nulls")
    write_csv(rd.from_arrow(src), d, num_rows=3)
    back = _gather(read_csv(d, schema=src.schema)).sort_by("doc_id")
    assert back["s"].to_pylist() == ["a", "", None]


def test_embedded_newlines_and_unicode(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_csv, write_csv

    texts = [
        "plain",
        "embedded\nnewline\r\nand\rcarriage",
        'tab\tquote"backslash\\comma,semicolon;',
        "emoji \U0001f600\U0001f680 combining é",
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
    write_csv(rd.from_arrow(src), d, num_rows=len(texts))
    back = _gather(read_csv(d, schema=src.schema)).sort_by("doc_id")
    assert back["text"].to_pylist() == texts


def test_resume_skips_finished_partitions(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import write_csv
    from s2sphere_ray.sources.csv import read_manifests

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    first = write_csv(ds, out_dir, num_rows=500)
    assert first
    stamp = {
        m["partition"]: m["written_at"] for m in read_manifests(out_dir)
    }
    second = write_csv(ds, out_dir, num_rows=500)
    assert second == []  # nothing re-written
    for m in read_manifests(out_dir):
        assert m["written_at"] == stamp[m["partition"]]


def test_partition_bytes_independent_of_input_partitioning(
    ray_session, tmp_path
):
    import ray.data as rd

    from s2sphere_ray.sources import write_csv

    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    write_csv(rd.read_parquet(f"{SF}/documents.parquet"), d1, num_rows=500)
    write_csv(
        rd.read_parquet(f"{SF}/documents.parquet").repartition(7),
        d2,
        num_rows=500,
    )
    f1 = sorted(f for f in os.listdir(d1) if f.endswith(".csv"))
    f2 = sorted(f for f in os.listdir(d2) if f.endswith(".csv"))
    assert f1 == f2
    for f in f1:
        with open(os.path.join(d1, f), "rb") as a, open(
            os.path.join(d2, f), "rb"
        ) as b:
            assert a.read() == b.read()


def test_duplicate_ids_deterministic_bytes(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import write_csv

    tbl = pa.table(
        {
            "doc_id": pa.array([7, 7, 7, 8], pa.int64()),
            "text": pa.array(["c", "a", "b", "z"], pa.string()),
        }
    )
    rev = tbl.take(pa.array([3, 2, 1, 0]))
    d1, d2 = str(tmp_path / "x"), str(tmp_path / "y")
    write_csv(rd.from_arrow(tbl), d1, num_rows=4)
    write_csv(rd.from_arrow(rev).repartition(3), d2, num_rows=4)
    f1 = sorted(f for f in os.listdir(d1) if f.endswith(".csv"))
    f2 = sorted(f for f in os.listdir(d2) if f.endswith(".csv"))
    assert f1 == f2
    for f in f1:
        with open(os.path.join(d1, f), "rb") as a, open(
            os.path.join(d2, f), "rb"
        ) as b:
            assert a.read() == b.read()


def test_nested_columns_rejected(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import write_csv

    src = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "emb": pa.array([[0.5, 1.5]], pa.list_(pa.float64())),
        }
    )
    with pytest.raises(ValueError, match="flat"):
        write_csv(rd.from_arrow(src), str(tmp_path / "nested"), num_rows=1)


def test_binary_column_policy(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_csv, write_csv

    src = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"\x00\xffabc", None], pa.binary()),
        }
    )
    d = str(tmp_path / "bin")
    with pytest.raises(ValueError, match="binary"):
        write_csv(rd.from_arrow(src), d, num_rows=2)
    write_csv(rd.from_arrow(src), d, num_rows=2, binary="base64")
    back = _gather(read_csv(d)).sort_by("doc_id")
    assert back["payload"].to_pylist() == src["payload"].to_pylist()


def test_nonfinite_floats_rejected(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import write_csv

    src = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "x": pa.array([1.5, float("nan")], pa.float64()),
        }
    )
    with pytest.raises(ValueError, match="non-finite"):
        write_csv(rd.from_arrow(src), str(tmp_path / "nan"), num_rows=2)
    # null floats stay legal
    src2 = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "x": pa.array([1.5, None], pa.float64()),
        }
    )
    write_csv(rd.from_arrow(src2), str(tmp_path / "ok"), num_rows=2)


def test_empty_export_reads_back_empty(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_csv, write_csv

    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    d = str(tmp_path / "empty")
    out = write_csv(rd.from_arrow(schema.empty_table()), d, num_rows=0)
    assert out == []
    back = read_csv(d, schema=schema)
    assert back.count() == 0


def test_operator_equality_across_sources(ray_session, out_dir):
    """A real operator (fused text stats) gives identical results whether
    the corpus arrived via parquet or csv."""
    import ray.data as rd

    from s2sphere_ray.functions.text import quality_batch
    from s2sphere_ray.sources import read_csv, write_csv

    src_schema = pq.read_schema(f"{SF}/documents.parquet")
    pq_ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    write_csv(
        rd.read_parquet(f"{SF}/documents.parquet"), out_dir, num_rows=500
    )
    csv_ds = read_csv(out_dir, columns=["doc_id", "text"], schema=src_schema)

    def stats(ds):
        return ds.map_batches(
            quality_batch, batch_format="pyarrow", batch_size=None
        )

    a = _sorted_tbl(_gather(stats(pq_ds)))
    b = _sorted_tbl(_gather(stats(csv_ds)))
    assert a.equals(b.cast(a.schema))
