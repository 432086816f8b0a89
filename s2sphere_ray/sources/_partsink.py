"""Shared machinery for manifested, resumable, id-hash-bucketed sinks.

Both interchange sinks (``jsonl``, ``csv``) share one contract
(mirrors ``stages/tiles.write_tiles``): the output directory holds
``part-{bucket}{ext}`` files plus ``_manifests/{bucket}.json`` lineage
manifests with ``{partition, rows, bytes, inputs, op_fingerprint,
wall_ms, written_at}``; a rerun with manifests present skips those
partitions — the checkpoint/resume contract (SURVEY §4).  Rows are
id-hash bucketed (bucket count sized from the ``num_rows`` hint at
~100k rows/part in [16, 4096], persisted in ``_manifests/_meta.json``
and reused by reruns) and id-sorted inside each part — equal-id runs
tie-broken by a canonical per-row serialization — so every part's
BYTES are a pure function of the data, independent of input
partitioning, which is what makes the resume skip-set safe.

Format specifics stay in the caller: ``prepare(body)`` validates and
re-encodes columns (non-finite gate, base64 for binary), and
``serialize(body)`` turns the ordered Arrow table into the part file's
bytes.
"""

from __future__ import annotations

import base64
import json
import math
import os
import time

import pyarrow as pa

_META = "_meta.json"


def _part_name(bucket: int) -> str:
    return f"part-{bucket:05d}"


def b64_encode_columns(body: pa.Table, cols) -> pa.Table:
    """Replace binary columns with base64 strings (sink side)."""
    for c in cols:
        ix = body.schema.get_field_index(c)
        enc = pa.array(
            [
                None if v is None else base64.b64encode(v).decode()
                for v in body[c].to_pylist()
            ],
            pa.string(),
        )
        body = body.set_column(ix, c, enc)
    return body


def b64_decode_batch(batch: pa.Table, cols) -> pa.Table:
    """Restore base64-string columns to binary (read side)."""
    for c in cols:
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


def write_partitioned(
    ds,
    out_dir: str,
    *,
    id_col: str,
    fingerprint: str,
    num_rows: int | None,
    ext: str,
    prepare,
    serialize,
    extra_meta: dict | None = None,
    row_key=None,
):
    """Write ``ds`` as an id-hash-partitioned directory of
    ``serialize``-encoded part files with lineage manifests; returns the
    partition summaries (``{partition, rows, bytes}``) written THIS run
    (resumed partitions are skipped and not re-listed).

    ``id_col`` must be an integer column; rows are bucketed by its hash
    and id-sorted inside each part, with equal-id runs ordered by each
    row's canonical JSON serialization (computed on the ``prepare``-d
    body, so the key is format-independent and part bytes stay
    deterministic even for duplicate ids).  Formats whose schemas JSON
    cannot express (binary / nested — the IPC sink) pass ``row_key``, a
    ``body -> list[bytes]`` giving each row a total-order tie-break key.
    """
    import numpy as np

    from ..functions._buckets import hash_buckets

    man_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(man_dir, exist_ok=True)
    meta_path = os.path.join(man_dir, _META)

    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        n_parts = int(meta["n_parts"])
    else:
        if num_rows is not None and num_rows > 0:
            n_parts = min(4096, max(16, math.ceil(num_rows / 100_000)))
        else:
            n_parts = 64
        meta = {"n_parts": n_parts, **(extra_meta or {})}
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
        body = prepare(group.drop_columns(["_jp"]).sort_by(id_col))
        ids = body[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
            # duplicate ids: tie-break equal-id runs by each row's
            # canonical JSON bytes so part bytes stay a pure function
            # of the data (orjson never emits a strict prefix of a
            # sibling row, so the key order is total)
            if row_key is not None:
                keys = row_key(body)
            else:
                import orjson

                keys = [orjson.dumps(r) for r in body.to_pylist()]
            order = sorted(
                range(len(keys)), key=lambda i: (int(ids[i]), keys[i])
            )
            body = body.take(pa.array(order, pa.int64()))
        buf = serialize(body)
        path = os.path.join(out_dir, name + ext)
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


def read_meta(out_dir: str) -> dict | None:
    meta_path = os.path.join(out_dir, "_manifests", _META)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as fh:
        return json.load(fh)


def read_manifests(out_dir: str) -> list[dict]:
    """Partition manifests written by a partitioned sink, sorted."""
    man_dir = os.path.join(out_dir, "_manifests")
    out = []
    for f in sorted(os.listdir(man_dir)):
        if f.endswith(".json") and not f.startswith("_"):
            with open(os.path.join(man_dir, f)) as fh:
                out.append(json.load(fh))
    return out
