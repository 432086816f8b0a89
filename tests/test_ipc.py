"""Arrow IPC source/sink (E0 widening): full-fidelity roundtrips
(binary, nested lists, NaN/Inf, >2^53 ints), read-time column pruning,
resume, partitioning-independent bytes, empty-dir schema restore, and
cross-source operator equality."""

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
    d = str(tmp_path / "ipc_out")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_documents_roundtrip_exact(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import read_ipc, write_ipc
    from s2sphere_ray.sources.ipc import read_manifests

    src = pq.read_table(f"{SF}/documents.parquet")
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    summaries = write_ipc(ds, out_dir, num_rows=src.num_rows)
    assert sum(s["rows"] for s in summaries) == src.num_rows

    mans = read_manifests(out_dir)
    assert sum(m["rows"] for m in mans) == src.num_rows
    for m in mans:
        p = os.path.join(out_dir, m["partition"] + ".arrow")
        assert os.path.getsize(p) == m["bytes"]

    back = read_ipc(out_dir)
    got = _sorted_tbl(_gather(back))
    want = _sorted_tbl(src)
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_full_fidelity_types_roundtrip(ray_session, tmp_path):
    """The types the flat sinks gate — binary, nested list, NaN/Inf,
    >2^53 ints — roundtrip bit-exactly through IPC."""
    import ray.data as rd

    from s2sphere_ray.sources import read_ipc, write_ipc

    big = (1 << 62) + 12345
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "blob": pa.array(
                [b"\x00\xffraw", b"", None, b"\x01\x02"], pa.binary()
            ),
            "emb": pa.array(
                [[1.5, -2.25], [0.0, 3.75], None, [float("nan"), 1.0]],
                pa.list_(pa.float64()),
            ),
            "big": pa.array([big, -big, 0, 7], pa.int64()),
            "f": pa.array(
                [math.inf, -math.inf, 2.0 ** -1074, -0.0], pa.float64()
            ),
        }
    )
    out = str(tmp_path / "fid")
    write_ipc(rd.from_arrow(tbl).repartition(3), out, num_rows=4)
    got = _sorted_tbl(_gather(read_ipc(out)))
    want = _sorted_tbl(tbl)
    # NaN != NaN under equals? Arrow equals treats NaN as equal at the
    # array level; double-check bits for the float column explicitly.
    assert got.select(want.column_names).equals(want) or (
        got.drop_columns(["emb", "f"]).equals(want.drop_columns(["emb", "f"]))
        and np.array_equal(
            np.concatenate([np.asarray(x or [0]) for x in got["emb"].to_pylist()]),
            np.concatenate([np.asarray(x or [0]) for x in want["emb"].to_pylist()]),
            equal_nan=True,
        )
        and got["f"].to_numpy(zero_copy_only=False).view(np.uint64).tolist()
        == want["f"].to_numpy(zero_copy_only=False).view(np.uint64).tolist()
    )


def test_read_time_column_pruning(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import read_ipc, write_ipc

    src = pq.read_table(f"{SF}/documents.parquet")
    write_ipc(
        rd.read_parquet(f"{SF}/documents.parquet"), out_dir,
        num_rows=src.num_rows,
    )
    back = read_ipc(out_dir, columns=["doc_id", "lang"])
    tbl = _sorted_tbl(_gather(back))
    assert tbl.column_names == ["doc_id", "lang"]
    want = _sorted_tbl(src.select(["doc_id", "lang"]))
    assert tbl.cast(want.schema).equals(want)


def test_resume_skips_finished_partitions(ray_session, out_dir):
    import ray.data as rd

    from s2sphere_ray.sources import write_ipc
    from s2sphere_ray.sources.ipc import read_manifests

    src = pq.read_table(f"{SF}/documents.parquet")
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    write_ipc(ds, out_dir, num_rows=src.num_rows)
    n_parts = len(read_manifests(out_dir))
    # drop one manifest: only that partition is rewritten
    victim = sorted(
        f for f in os.listdir(os.path.join(out_dir, "_manifests"))
        if f.endswith(".json") and not f.startswith("_")
    )[0]
    os.remove(os.path.join(out_dir, "_manifests", victim))
    redo = write_ipc(ds, out_dir, num_rows=src.num_rows)
    assert len(redo) == 1
    assert redo[0]["partition"] + ".json" == victim
    assert len(read_manifests(out_dir)) == n_parts


def test_partition_bytes_independent_of_input_partitioning(
    ray_session, tmp_path
):
    import ray.data as rd

    from s2sphere_ray.sources import write_ipc

    src = pq.read_table(f"{SF}/documents.parquet")
    outs = []
    for parts in (2, 13):
        out = str(tmp_path / f"ipc_{parts}")
        write_ipc(
            rd.from_arrow(src).repartition(parts), out,
            num_rows=src.num_rows,
        )
        outs.append(out)
    a, b = outs
    names = sorted(f for f in os.listdir(a) if f.endswith(".arrow"))
    assert names == sorted(f for f in os.listdir(b) if f.endswith(".arrow"))
    for n in names:
        with open(os.path.join(a, n), "rb") as fa, open(
            os.path.join(b, n), "rb"
        ) as fb:
            assert fa.read() == fb.read(), n


def test_duplicate_ids_deterministic_bytes(ray_session, tmp_path):
    """Duplicate ids with binary payloads (the case the JSON tie-break
    key cannot express) still give layout-independent part bytes."""
    import ray.data as rd

    from s2sphere_ray.sources import write_ipc

    tbl = pa.table(
        {
            "doc_id": pa.array([7, 7, 7, 7, 3, 3], pa.int64()),
            "blob": pa.array(
                [b"dd", b"aa", b"cc", b"bb", b"\x00", b"\x01"], pa.binary()
            ),
        }
    )
    outs = []
    for parts, tag in ((1, "x"), (5, "y")):
        out = str(tmp_path / f"dup_{tag}")
        write_ipc(rd.from_arrow(tbl).repartition(parts), out, num_rows=6)
        outs.append(out)
    a, b = outs
    for n in sorted(f for f in os.listdir(a) if f.endswith(".arrow")):
        with open(os.path.join(a, n), "rb") as fa, open(
            os.path.join(b, n), "rb"
        ) as fb:
            assert fa.read() == fb.read(), n


def test_empty_export_reads_back_empty_with_schema(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_ipc, write_ipc

    schema = pa.schema(
        [("doc_id", pa.int64()), ("emb", pa.list_(pa.float64()))]
    )
    out = str(tmp_path / "empty_ipc")
    write_ipc(rd.from_arrow(schema.empty_table()), out, num_rows=0)
    back = read_ipc(out)
    assert back.count() == 0
    got = pa.schema(zip(back.schema().names, back.schema().types))
    assert got.equals(schema)
    pruned = read_ipc(out, columns=["doc_id"])
    assert pruned.schema().names == ["doc_id"]


def test_operator_equality_across_sources(ray_session, out_dir):
    """The same operator over parquet-read and ipc-read inputs gives
    identical results (block layout independence downstream)."""
    import ray.data as rd

    from s2sphere_ray.functions.text import token_count_batch
    from s2sphere_ray.sources import read_ipc, write_ipc

    src = pq.read_table(f"{SF}/documents.parquet")
    write_ipc(
        rd.read_parquet(f"{SF}/documents.parquet"), out_dir,
        num_rows=src.num_rows,
    )
    a = _sorted_tbl(
        _gather(
            rd.read_parquet(
                f"{SF}/documents.parquet", columns=["doc_id", "text"]
            ).map_batches(token_count_batch, batch_format="pyarrow")
        )
    )
    b = _sorted_tbl(
        _gather(
            read_ipc(out_dir, columns=["doc_id", "text"]).map_batches(
                token_count_batch, batch_format="pyarrow"
            )
        )
    )
    assert a.equals(b.select(a.column_names).cast(a.schema))


def test_compression_recorded_and_readable(ray_session, tmp_path):
    import ray.data as rd

    from s2sphere_ray.sources import read_ipc, write_ipc
    from s2sphere_ray.sources._partsink import read_meta

    src = pq.read_table(f"{SF}/documents.parquet")
    out = str(tmp_path / "zstd_ipc")
    write_ipc(
        rd.from_arrow(src), out, num_rows=src.num_rows, compression="zstd"
    )
    assert read_meta(out)["compression"] == "zstd"
    got = _sorted_tbl(_gather(read_ipc(out)))
    want = _sorted_tbl(src)
    assert got.select(want.column_names).cast(want.schema).equals(want)
