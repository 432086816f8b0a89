"""E0 widening — newline-delimited JSON (JSONL / NDJSON) source + sink.

JSONL is the interchange format of web-text pipelines (crawl dumps,
filtered shards, eval sets); Parquet stays the scale format.  This
module lets a pipeline ingest or export the interchange form without
leaving the engine.

Sink contract (mirrors ``stages/tiles.write_tiles``): the output
directory holds ``part-{bucket}.jsonl`` files plus
``_manifests/{bucket}.json`` lineage manifests with
``{partition, rows, bytes, inputs, op_fingerprint, wall_ms,
written_at}``; a rerun with manifests present skips those partitions —
the checkpoint/resume contract (SURVEY §4).  Rows are id-hash bucketed
(bucket count sized from the ``num_rows`` hint at ~100k rows/part in
[16, 4096], persisted in ``_manifests/_meta.json`` and reused by
reruns) and id-sorted inside each part, so every part's BYTES are a
pure function of the data — independent of input partitioning — which
is what makes the resume skip-set safe.

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

import base64
import json
import math
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

_META = "_meta.json"


def _orjson():
    import orjson

    return orjson


def _part_name(bucket: int) -> str:
    return f"part-{bucket:05d}"


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
    and sorted by it — with equal-id runs tie-broken by serialized bytes
    — inside each part file, so part bytes are deterministic even for
    duplicate ids.  ``binary="base64"`` converts binary columns to
    base64 strings and records them in the meta so ``read_jsonl``
    restores them.  Non-finite float values (NaN/±Inf) raise — JSON has
    no representation for them (orjson would silently emit ``null``).
    """
    from ..functions._buckets import hash_buckets

    man_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(man_dir, exist_ok=True)
    meta_path = os.path.join(man_dir, _META)

    schema = ds.schema()
    b64_cols = [
        n
        for n, t in zip(schema.names, schema.types)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t)
    ]
    if b64_cols and binary != "base64":
        raise ValueError(
            f"JSON has no binary type; columns {b64_cols} are binary. "
            'Pass binary="base64" to encode them, or write Parquet.'
        )

    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        n_parts = int(meta["n_parts"])
    else:
        if num_rows is not None and num_rows > 0:
            n_parts = min(4096, max(16, math.ceil(num_rows / 100_000)))
        else:
            n_parts = 64
        meta = {"n_parts": n_parts, "b64_cols": sorted(b64_cols)}
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, meta_path)

    done = {
        f[: -len(".json")]
        for f in os.listdir(man_dir)
        if f.endswith(".json") and not f.startswith("_")
    }
    try:
        input_files = sorted(ds.input_files() or [])
    except Exception:
        input_files = []

    t0 = time.time()

    import numpy as np

    # vectorized resume filter: bucket → still-to-write? lookup table
    keep_tbl = np.ones(n_parts, dtype=bool)
    for i in range(n_parts):
        if _part_name(i) in done:
            keep_tbl[i] = False

    def tag(batch: pa.Table) -> pa.Table:
        import numpy as np

        if batch.num_rows == 0:
            return batch.append_column("_jp", pa.array([], pa.int32()))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = hash_buckets(ids, n_parts)
        if done:
            mask = keep_tbl[b]
            batch = batch.filter(pa.array(mask))
            b = b[mask]
        return batch.append_column("_jp", pa.array(b, pa.int32()))

    def write_part(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "partition": pa.array([], pa.string()),
                "rows": pa.array([], pa.int64()),
                "bytes": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "_jp" not in group.column_names:
            return empty
        bucket = int(group["_jp"][0].as_py())
        name = _part_name(bucket)
        if name in done:
            return empty
        body = group.drop_columns(["_jp"]).sort_by(id_col)
        _check_finite(body)
        for c in b64_cols:
            ix = body.schema.get_field_index(c)
            enc = pa.array(
                [
                    None if v is None else base64.b64encode(v).decode()
                    for v in body[c].to_pylist()
                ],
                pa.string(),
            )
            body = body.set_column(ix, c, enc)
        dumps = _orjson().dumps
        lines = [dumps(r) + b"\n" for r in body.to_pylist()]
        ids = body[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
            # duplicate ids: tie-break equal-id runs by serialized bytes
            # so part bytes stay a pure function of the data
            order = sorted(
                range(len(lines)), key=lambda i: (int(ids[i]), lines[i])
            )
            lines = [lines[i] for i in order]
        buf = b"".join(lines)
        path = os.path.join(out_dir, name + ".jsonl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(buf)
        os.replace(tmp, path)
        manifest = {
            "partition": name,
            "rows": body.num_rows,
            "bytes": len(buf),
            "inputs": input_files,
            "op_fingerprint": fingerprint,
            "wall_ms": int((time.time() - t0) * 1000),
            "written_at": time.time(),
        }
        mtmp = os.path.join(man_dir, name + ".json.tmp")
        with open(mtmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(mtmp, os.path.join(man_dir, name + ".json"))
        return pa.table(
            {
                "partition": pa.array([name]),
                "rows": pa.array([body.num_rows], pa.int64()),
                "bytes": pa.array([len(buf)], pa.int64()),
            }
        )

    summaries = (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("_jp")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()
    )
    return sorted(summaries, key=lambda r: r["partition"])


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
        meta_path = os.path.join(path, "_manifests", _META)
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                b64_cols = json.load(fh).get("b64_cols", [])
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".jsonl") or f.endswith(".jsonl.gz")
        )
        if not paths:
            # A sink dir with meta but no parts is a legal 0-row export
            # (empty buckets write no file); surface it as a typed empty
            # Dataset when the caller gave a schema.
            if os.path.exists(meta_path) and schema is not None:
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

        def decode(batch: pa.Table) -> pa.Table:
            for c in dec:
                if c not in batch.column_names:
                    continue
                ix = batch.schema.get_field_index(c)
                raw = pa.array(
                    [
                        None if v is None else base64.b64decode(v)
                        for v in batch[c].to_pylist()
                    ],
                    pa.binary(),
                )
                batch = batch.set_column(ix, c, raw)
            return batch

        ds = ds.map_batches(decode, batch_format="pyarrow", batch_size=None)
    return ds


def read_manifests(out_dir: str) -> list[dict]:
    """Partition manifests written by ``write_jsonl``, partition-sorted."""
    man_dir = os.path.join(out_dir, "_manifests")
    out = []
    for f in sorted(os.listdir(man_dir)):
        if f.endswith(".json") and not f.startswith("_"):
            with open(os.path.join(man_dir, f)) as fh:
                out.append(json.load(fh))
    return out
