"""E0 widening — CSV source + sink (flat interchange tables).

CSV is how labels, eval sets, URL lists and per-domain metadata arrive
at a curation stack's edges; Parquet stays the scale format.  The sink
shares the manifested, resumable, id-hash-bucketed partition contract
(``sources/_partsink.py``).

Fidelity notes (all pinned in tests/test_csv.py):

- Floats roundtrip bit-exact: Arrow's CSV writer emits shortest-
  roundtrip doubles and the reader parses them back to the same bits.
- Every valid value is quoted (``quoting_style="all_valid"``) so an
  EMPTY STRING (``""``) is distinguishable from NULL (empty field);
  the reader restores both (``strings_can_be_null=True`` +
  ``quoted_strings_can_be_null=False``).  Embedded newlines stay inside
  quotes (``newlines_in_values=True`` on read).
- CSV is FLAT: nested columns (list/struct/map) raise — write Parquet
  or JSONL.  Binary columns raise by default or base64-encode with
  ``binary="base64"`` (recorded in ``_meta.json`` so ``read_csv``
  restores them).  Non-finite floats raise, matching the JSONL policy
  (and keeping part bytes canonical).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ._partsink import (
    b64_decode_batch,
    b64_encode_columns,
    read_manifests,  # noqa: F401  (re-exported: the sink's public API)
    read_meta,
    write_partitioned,
)
from .jsonl import _binary_columns, _check_finite


def _check_flat(schema) -> None:
    nested = [
        n
        for n, t in zip(schema.names, schema.types)
        if pa.types.is_nested(t)
    ]
    if nested:
        raise ValueError(
            f"CSV is a flat format; columns {nested} are nested "
            "(list/struct/map) — write Parquet or JSONL."
        )


def write_csv(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    fingerprint: str = "",
    num_rows: int | None = None,
    binary: str = "error",
):
    """Write ``ds`` as an id-hash-partitioned CSV directory with lineage
    manifests; returns the partition summaries written THIS run
    (resumed partitions are skipped).  Semantics mirror ``write_jsonl``
    — integer ``id_col`` bucketing, id-sorted deterministic part bytes,
    ``binary="base64"`` policy, non-finite floats rejected."""
    import pyarrow.csv as pacsv

    schema = ds.schema()
    _check_flat(schema)
    b64_cols = _binary_columns(schema)
    if b64_cols and binary != "base64":
        raise ValueError(
            f"CSV has no binary type; columns {b64_cols} are binary. "
            'Pass binary="base64" to encode them, or write Parquet.'
        )

    def prepare(body: pa.Table) -> pa.Table:
        _check_finite(body)
        return b64_encode_columns(body, b64_cols)

    def serialize(body: pa.Table) -> bytes:
        import io

        sink = io.BytesIO()
        pacsv.write_csv(
            body,
            sink,
            write_options=pacsv.WriteOptions(
                include_header=True, quoting_style="all_valid"
            ),
        )
        return sink.getvalue()

    return write_partitioned(
        ds,
        out_dir,
        id_col=id_col,
        fingerprint=fingerprint,
        num_rows=num_rows,
        ext=".csv",
        prepare=prepare,
        serialize=serialize,
        extra_meta={"b64_cols": sorted(b64_cols)},
    )


def read_csv(path, columns=None, schema: pa.Schema | None = None):
    """Read a CSV file, list of files, or a ``write_csv`` directory into
    a Dataset.

    ``schema`` fixes the column types (no inference drift across
    fragments); ``columns`` prunes AT THE PARSE (pyarrow's
    ``include_columns`` — unrequested fields are never converted).
    Base64-encoded binary columns recorded by the sink's meta are
    decoded back to binary automatically.  Reader options restore the
    sink's fidelity contract: bare empty field → null, quoted ``""`` →
    empty string, quoted newlines stay in-value.
    """
    import pyarrow.csv as pacsv
    import ray.data as rd

    b64_cols: list[str] = []
    if isinstance(path, str) and os.path.isdir(path):
        meta = read_meta(path)
        if meta is not None:
            b64_cols = meta.get("b64_cols", [])
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".csv") or f.endswith(".csv.gz")
        )
        if not paths:
            if meta is not None and schema is not None:
                fields = [
                    f
                    for f in schema
                    if columns is None or f.name in set(columns)
                ]
                return rd.from_arrow(pa.schema(fields).empty_table())
            raise FileNotFoundError(f"no .csv files under {path}")
    else:
        paths = path

    convert = pacsv.ConvertOptions(
        strings_can_be_null=True, quoted_strings_can_be_null=False
    )
    if schema is not None:
        fields = [
            f
            for f in schema
            if columns is None or f.name in set(columns)
        ]
        # base64'd binary fields arrive as strings on the wire
        convert.column_types = {
            f.name: (pa.string() if f.name in set(b64_cols) else f.type)
            for f in fields
        }
        if columns is not None:
            convert.include_columns = [f.name for f in fields]

    ds = rd.read_csv(
        paths,
        file_extensions=None,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=convert,
    )
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
