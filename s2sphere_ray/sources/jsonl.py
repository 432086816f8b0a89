"""E0 widening — newline-delimited JSON (JSONL / NDJSON) source + sink.

JSONL is the interchange format of web-text pipelines (crawl dumps,
filtered shards, eval sets); Parquet stays the scale format.  This
module lets a pipeline ingest or export the interchange form without
leaving the engine.

The sink uses the shared manifested, resumable, id-hash-bucketed
partition contract (``sources/_partsink.py`` — part files +
``_manifests/`` lineage, reruns skip finished partitions, part bytes
are a pure function of the data).

Serialization is orjson (shortest-roundtrip doubles: float64 columns
survive write→read bit-exact; pandas ``to_json`` — Ray's stock JSON
sink — truncates at ``double_precision`` ≤ 15).  The per-row encode
loop is inherent to the format (there is no vectorized JSON writer in
this stack) and is confined to the sink; orjson runs at GB/s.  JSON has
no binary type: binary columns raise by default, or base64-encode with
``binary="base64"`` (recorded in ``_meta.json`` so ``read_jsonl``
auto-decodes).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ._partsink import (
    b64_decode_batch,
    b64_encode_columns,
    read_manifests,  # noqa: F401  (re-exported: the sink's public API)
    read_meta,
    write_partitioned,
)


def _orjson():
    import orjson

    return orjson


def _check_finite(body: pa.Table) -> None:
    """JSON has no NaN/Inf; orjson would silently serialize them as
    ``null`` — gate them with an error instead (the binary-column
    policy applied to non-finite floats).  Checks float columns and
    list<float> columns (flattened); nulls stay legal."""
    for name, typ in zip(body.schema.names, body.schema.types):
        col = None
        if pa.types.is_floating(typ):
            col = body[name]
        elif (
            pa.types.is_list(typ) or pa.types.is_large_list(typ)
        ) and pa.types.is_floating(typ.value_type):
            col = body[name].combine_chunks().flatten()
        if col is None:
            continue
        vals = pc.drop_null(col)
        if len(vals) and not pc.all(pc.is_finite(vals)).as_py():
            raise ValueError(
                f"column {name!r} holds non-finite floats (NaN/Inf); "
                "JSON cannot represent them — clean or drop the column, "
                "or write Parquet."
            )


def _binary_columns(schema) -> list[str]:
    return [
        n
        for n, t in zip(schema.names, schema.types)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t)
    ]


def write_jsonl(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    fingerprint: str = "",
    num_rows: int | None = None,
    binary: str = "error",
):
    """Write ``ds`` as an id-hash-partitioned JSONL directory with
    lineage manifests; returns the list of partition summaries
    (``{partition, rows, bytes}``) written THIS run (resumed partitions
    are skipped and not re-listed).

    ``id_col`` must be an integer column; rows are bucketed by its hash
    and sorted by it — with equal-id runs tie-broken by canonical row
    bytes — inside each part file, so part bytes are deterministic even
    for duplicate ids.  ``binary="base64"`` converts binary columns to
    base64 strings and records them in the meta so ``read_jsonl``
    restores them.  Non-finite float values (NaN/±Inf) raise — JSON has
    no representation for them (orjson would silently emit ``null``).
    """
    b64_cols = _binary_columns(ds.schema())
    if b64_cols and binary != "base64":
        raise ValueError(
            f"JSON has no binary type; columns {b64_cols} are binary. "
            'Pass binary="base64" to encode them, or write Parquet.'
        )

    def prepare(body: pa.Table) -> pa.Table:
        _check_finite(body)
        return b64_encode_columns(body, b64_cols)

    def serialize(body: pa.Table) -> bytes:
        dumps = _orjson().dumps
        return b"".join(dumps(r) + b"\n" for r in body.to_pylist())

    return write_partitioned(
        ds,
        out_dir,
        id_col=id_col,
        fingerprint=fingerprint,
        num_rows=num_rows,
        ext=".jsonl",
        prepare=prepare,
        serialize=serialize,
        extra_meta={"b64_cols": sorted(b64_cols)},
    )


def read_jsonl(path, columns=None, schema: pa.Schema | None = None):
    """Read a JSONL file, list of files, or a ``write_jsonl`` directory
    into a Dataset.

    ``columns`` + ``schema`` together enable parse-level pruning (only
    the requested fields are parsed — pyarrow's
    ``unexpected_field_behavior="ignore"``); ``columns`` alone projects
    after the parse.  Base64-encoded binary columns recorded by the
    sink's meta are decoded back to binary automatically.
    """
    import ray.data as rd
    from pyarrow import json as pj

    b64_cols: list[str] = []
    if isinstance(path, str) and os.path.isdir(path):
        meta = read_meta(path)
        if meta is not None:
            b64_cols = meta.get("b64_cols", [])
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".jsonl") or f.endswith(".jsonl.gz")
        )
        if not paths:
            # A sink dir with meta but no parts is a legal 0-row export
            # (empty buckets write no file); surface it as a typed empty
            # Dataset when the caller gave a schema.
            if meta is not None and schema is not None:
                fields = [
                    f
                    for f in schema
                    if columns is None or f.name in set(columns)
                ]
                return rd.from_arrow(pa.schema(fields).empty_table())
            raise FileNotFoundError(f"no .jsonl files under {path}")
    else:
        paths = path

    kwargs = {}
    if schema is not None:
        fields = [
            f
            for f in schema
            if columns is None or f.name in set(columns)
        ]
        # base64'd binary fields arrive as strings on the wire
        fields = [
            pa.field(f.name, pa.string()) if f.name in set(b64_cols) else f
            for f in fields
        ]
        kwargs["parse_options"] = pj.ParseOptions(
            explicit_schema=pa.schema(fields),
            unexpected_field_behavior="ignore",
        )

    ds = rd.read_json(paths, file_extensions=None, **kwargs)
    if columns is not None and schema is None:
        ds = ds.select_columns(list(columns))

    dec = [c for c in b64_cols if columns is None or c in set(columns)]
    if dec:
        ds = ds.map_batches(
            lambda batch, _c=dec: b64_decode_batch(batch, _c),
            batch_format="pyarrow",
            batch_size=None,
        )
    return ds
