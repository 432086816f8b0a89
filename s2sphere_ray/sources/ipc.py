"""E0 widening — Arrow IPC (Feather V2) source + sink.

IPC is the FULL-fidelity interchange format: every Arrow type the
engine produces — binary media columns, list<float> embeddings, nested
token-id lists, NaN/Inf floats, >2^53 integers — roundtrips
bit-exactly with none of the flat/finite/binary gates the CSV and JSONL
edges need, and readers memory-map parts with zero parse cost.  It is
the right hand-off between two Arrow-native pipelines (this engine to a
training loader, stage snapshots between runs).

The sink shares the manifested, resumable, id-hash-bucketed partition
contract (``sources/_partsink.py``): id-sorted deterministic part
bytes, ``_manifests/{part}.json`` lineage + metrics, reruns skip
finished partitions.  The writer's schema is persisted (base64 IPC
schema bytes) in ``_meta.json`` so an empty directory still reads back
with correct types.

Fidelity and layout notes (pinned in tests/test_ipc.py):

- Part bytes are a pure function of the data: the body is id-sorted
  (duplicate-id runs tie-broken by per-row IPC bytes — JSON cannot
  express binary/nested rows, so the generic orjson key is replaced via
  ``write_partitioned(row_key=...)``), and the IPC file writer emits no
  timestamps or run-dependent fields.
- ``compression`` (``"zstd"`` / ``"lz4"``) is recorded in ``_meta.json``;
  the default stays uncompressed so byte-determinism never depends on a
  codec build.  Readers auto-detect either way.
- Column pruning happens AT THE READ: ``feather.read_table(columns=…)``
  materializes only the requested columns from the memory-mapped file.
"""

from __future__ import annotations

import base64
import os

import pyarrow as pa

from ._partsink import (
    read_manifests,  # noqa: F401  (re-exported: the sink's public API)
    read_meta,
    write_partitioned,
)

_EXT = ".arrow"


def _row_ipc_key(body: pa.Table) -> list[bytes]:
    """Total-order tie-break key for duplicate-id rows: each row's own
    IPC stream bytes — deterministic for every Arrow type (the JSON key
    the other sinks use cannot express binary/nested cells)."""
    out = []
    for i in range(body.num_rows):
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, body.schema) as w:
            w.write_table(body.slice(i, 1))
        out.append(sink.getvalue().to_pybytes())
    return out


def write_ipc(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    fingerprint: str = "",
    num_rows: int | None = None,
    compression: str | None = None,
):
    """Write ``ds`` as an id-hash-partitioned Arrow IPC file directory
    with lineage manifests; returns the partition summaries written
    THIS run (resumed partitions are skipped).  Any Arrow schema is
    accepted — nested, binary and non-finite values roundtrip exactly."""
    schema = pa.schema(zip(ds.schema().names, ds.schema().types))

    def serialize(body: pa.Table) -> bytes:
        # IpcWriteOptions is a Cython object cloudpickle cannot ship —
        # build it inside the task from the plain ``compression`` string.
        opts = pa.ipc.IpcWriteOptions(compression=compression)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, body.schema, options=opts) as w:
            w.write_table(body)
        return sink.getvalue().to_pybytes()

    return write_partitioned(
        ds,
        out_dir,
        id_col=id_col,
        fingerprint=fingerprint,
        num_rows=num_rows,
        ext=_EXT,
        prepare=lambda body: body,
        serialize=serialize,
        extra_meta={
            "schema_ipc_b64": base64.b64encode(
                schema.serialize().to_pybytes()
            ).decode("ascii"),
            "compression": compression or "uncompressed",
        },
        row_key=_row_ipc_key,
    )


def read_ipc(path, columns=None):
    """Read an Arrow IPC file, list of files, or a ``write_ipc``
    directory into a Dataset — one read task per part, each a
    memory-mapped ``feather.read_table`` materializing only the
    requested ``columns``.  An empty sink directory reads back as a
    correctly-typed empty Dataset via the schema persisted in
    ``_meta.json``."""
    import ray.data as rd

    if isinstance(path, str) and os.path.isdir(path):
        meta = read_meta(path)
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(_EXT)
        )
        if not paths:
            if meta is not None and "schema_ipc_b64" in meta:
                schema = pa.ipc.read_schema(
                    pa.BufferReader(
                        base64.b64decode(meta["schema_ipc_b64"])
                    )
                )
                if columns is not None:
                    schema = pa.schema(
                        [schema.field(c) for c in columns]
                    )
                return rd.from_arrow(schema.empty_table())
            raise FileNotFoundError(f"no {_EXT} files under {path}")
    elif isinstance(path, str):
        paths = [path]
    else:
        paths = list(path)

    want = list(columns) if columns is not None else None

    def load(batch: pa.Table) -> pa.Table:
        from pyarrow import feather

        tbls = [
            feather.read_table(p, columns=want, memory_map=True)
            for p in batch["path"].to_pylist()
        ]
        return tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)

    return rd.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths)
    ).map_batches(load, batch_format="pyarrow", batch_size=None)
