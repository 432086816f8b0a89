"""Common-Crawl-style pages table: derivation, synthesis, and geocoding.

The engine's flagship input is a Parquet table of web pages with columns
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
(BASELINE.json input_hint). Two deterministic sources:

* :func:`pages_from_documents` — maps the driver's ``documents`` table
  (``doc_id, text, lang, source, n_chars``) onto the pages shape via
  ``url := https://{source}.example/{doc_id}``, ``warc_ts := epoch + doc_id``
  seconds, ``html := b"<html><body>" + text + b"</body></html>"``
  (FIXTURES.md §1). The ``text`` column is passed through **byte-identical**
  (the per-row invariant of BASELINE.json).
* :func:`synth_pages` — standalone seed-fixed generator used by bench at
  arbitrary row counts (no external data).

Geocoding (engine op E1, SURVEY §2.3): deterministic integer-hash of the
document id parsed from the ``url`` tail. All arithmetic is exact 64-bit
integer math followed by division by an exact power of ten, so the oracle
SQL (``oracle_geocode_sql``) reproduces lat/lng **bit-for-bit** in DuckDB.
20%% of rows land in three 0.5°-radius "hot cities" (Paris/NYC/Tokyo) to
exercise hot-cell skew handling (E9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Geocode constants — documented fixed algorithm (FIXTURES.md §1).
_H1_MULT = 2654435761  # Knuth multiplicative hash
_H2_MULT = 2246822519  # xxhash 32-bit prime (odd, full-period mod 2^32)
_H2_ADD = 2654435761
_MOD32 = 1 << 32

HOT_CITIES = ((48.8566, 2.3522), (40.7128, -74.0060), (35.6762, 139.6503))
HOT_FRACTION_MOD = 5  # doc_id % 5 == 0 → hot row (20%)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def geocode_from_doc_id(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """doc_id (int64) → (lat, lng) float64 degrees; integer-exact math."""
    d = doc_id.astype(np.int64)
    h1 = (d * _H1_MULT) % _MOD32
    h2 = (d * _H2_MULT + _H2_ADD) % _MOD32
    hot = (d % HOT_FRACTION_MOD) == 0
    city = (d // HOT_FRACTION_MOD) % 3
    city_lat = np.choose(city, [c[0] for c in HOT_CITIES])
    city_lng = np.choose(city, [c[1] for c in HOT_CITIES])
    hot_lat = city_lat + ((h1 % 10000) - 5000) / 10000.0
    hot_lng = city_lng + ((h2 % 10000) - 5000) / 10000.0
    cold_lat = (h1 % 1600000) / 10000.0 - 80.0
    cold_lng = (h2 % 3600000) / 10000.0 - 180.0
    lat = np.where(hot, hot_lat, cold_lat)
    lng = np.where(hot, hot_lng, cold_lng)
    return lat, lng


GEOCODE_SQL_EXPR = {
    # Fragments the oracle SQL composes; must mirror geocode_from_doc_id
    # exactly (integer ops + /10000.0 are IEEE-exact on both sides).
    "h1": f"(({{id}}) * {_H1_MULT}) % {_MOD32}",
    "h2": f"(({{id}}) * {_H2_MULT} + {_H2_ADD}) % {_MOD32}",
}


def geocode_sql(id_expr: str) -> tuple[str, str]:
    """Return (lat_sql, lng_sql) reproducing geocode_from_doc_id in DuckDB."""
    h1 = f"((({id_expr}) * {_H1_MULT}) % {_MOD32})"
    h2 = f"((({id_expr}) * {_H2_MULT} + {_H2_ADD}) % {_MOD32})"
    city = f"((({id_expr}) // {HOT_FRACTION_MOD}) % 3)"
    clat = (
        f"(CASE {city} WHEN 0 THEN {HOT_CITIES[0][0]} WHEN 1 THEN"
        f" {HOT_CITIES[1][0]} ELSE {HOT_CITIES[2][0]} END)"
    )
    clng = (
        f"(CASE {city} WHEN 0 THEN {HOT_CITIES[0][1]} WHEN 1 THEN"
        f" {HOT_CITIES[1][1]} ELSE {HOT_CITIES[2][1]} END)"
    )
    hot = f"(({id_expr}) % {HOT_FRACTION_MOD} = 0)"
    lat = (
        f"(CASE WHEN {hot} THEN {clat} + (({h1} % 10000) - 5000) / 10000.0"
        f" ELSE ({h1} % 1600000) / 10000.0 - 80.0 END)"
    )
    lng = (
        f"(CASE WHEN {hot} THEN {clng} + (({h2} % 10000) - 5000) / 10000.0"
        f" ELSE ({h2} % 3600000) / 10000.0 - 180.0 END)"
    )
    return lat, lng


def doc_id_from_url(url: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Parse the trailing integer of ``https://{source}.example/{doc_id}``
    (vectorized regex extract)."""
    m = pc.extract_regex(url, r"(?P<doc_id>[0-9]+)$")
    return pc.cast(pc.struct_field(m, "doc_id"), pa.int64())


def pages_from_documents_batch(batch: pa.Table) -> pa.Table:
    """documents batch → pages batch (E1 upstream; text passes byte-identical).

    Vectorized: url via Arrow binary_join_element_wise, warc_ts from doc_id,
    html wraps the text bytes. Column-aware: outputs are built only from
    the document columns actually present, so a pruned read (e.g.
    ``read_pages(columns=["doc_id"])``) never touches absent fields.
    """
    doc_id = batch["doc_id"]
    cols: dict[str, object] = {}
    if "source" in batch.column_names:
        id_str = pc.cast(doc_id, pa.string())
        url = pc.binary_join_element_wise(
            pc.binary_join_element_wise(
                "https://", pc.cast(batch["source"], pa.string()), ".example/", ""
            ),
            id_str,
            "",
        )
        cols["url"] = pc.cast(url, pa.string())
    epoch = pa.scalar(1704067200_000000, pa.int64())  # 2024-01-01 UTC in µs
    cols["warc_ts"] = pc.cast(
        pc.add(pc.multiply(pc.cast(doc_id, pa.int64()), 1_000_000), epoch),
        pa.timestamp("us"),
    )
    if "text" in batch.column_names:
        text = batch["text"]
        cols["html"] = pc.cast(
            pc.binary_join_element_wise(
                "<html><body>", pc.cast(text, pa.string()), "</body></html>", ""
            ),
            pa.binary(),
        )
        cols["text"] = text
    if "lang" in batch.column_names:
        cols["lang"] = batch["lang"]
    cols["doc_id"] = doc_id
    return pa.table(cols)


def geocode_batch(batch: pa.Table) -> pa.Table:
    """E1 geocode stage: append lat/lng derived from the url (deterministic).

    The document id is parsed from the url tail; ``text`` and all other
    columns pass through untouched (byte-identical invariant).
    """
    if "doc_id" in batch.column_names:
        doc_id = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out = batch
    else:
        parsed = doc_id_from_url(batch["url"])
        if isinstance(parsed, pa.ChunkedArray):
            parsed = parsed.combine_chunks()
        doc_id = parsed.to_numpy(zero_copy_only=False)
        out = batch.append_column("doc_id", parsed)
    lat, lng = geocode_from_doc_id(doc_id)
    out = out.append_column("lat", pa.array(lat, pa.float64()))
    out = out.append_column("lng", pa.array(lng, pa.float64()))
    return out


def read_pages(sf_dir: str, columns: list[str] | None = None):
    """Pages dataset derived from ``{sf_dir}/documents.parquet`` (streaming).

    Column pruning: only the documents columns needed for the requested
    pages columns are read.
    """
    import ray.data as rd

    need = set(columns or ["url", "warc_ts", "html", "text", "lang", "doc_id"])
    doc_cols = {"doc_id"}
    if {"url"} & need:
        doc_cols.add("source")
    if {"html", "text"} & need:
        doc_cols.add("text")
    if "lang" in need:
        doc_cols.add("lang")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=sorted(doc_cols))
    ds = ds.map_batches(
        pages_from_documents_batch, batch_format="pyarrow", batch_size=None
    )
    if columns:
        ds = ds.select_columns(columns)
    return ds


# ---------------------------------------------------------------------------
# Standalone deterministic synthesis (bench-scale input; no external data)
# ---------------------------------------------------------------------------

_WORDS = (
    "the of and to in is was for on that with as by at from are this be an "
    "or which you not have has had were their one all we can her his its "
    "data web page cell sphere index tile join query region point level "
    "stream batch shard spill actor arrow vector hash token text lang href"
).split()


def synth_pages_table(start_id: int, count: int, seed: int = 42) -> pa.Table:
    """Deterministic pages rows [start_id, start_id+count) — pure function of
    (start_id, count, seed); used by bench to scale input without external
    data."""
    rng = np.random.default_rng(seed + start_id)
    doc_id = np.arange(start_id, start_id + count, dtype=np.int64)
    n_words = rng.integers(8, 60, size=count)
    words = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    texts = []
    pos = 0
    wl = _WORDS
    for n in n_words:
        texts.append(" ".join(wl[w] for w in words[pos : pos + n]))
        pos += n
    sources = np.array(["alpha", "beta", "gamma", "delta"])[doc_id % 4]
    langs = np.array(["en", "es", "de", "zh", "fr"])[doc_id % 5]
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_id),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(sources.tolist(), pa.string()),
        }
    )
    return pages_from_documents_batch(tbl)


def synth_pages(total_rows: int, seed: int = 42, block_rows: int = 100_000):
    """Ray Dataset of deterministic synthetic pages, built block-parallel."""
    import ray.data as rd

    starts = list(range(0, total_rows, block_rows))
    ds = rd.from_items(
        [{"start": s, "count": min(block_rows, total_rows - s)} for s in starts]
    )
    def _expand(batch: pa.Table) -> pa.Table:
        outs = [
            synth_pages_table(int(s), int(c), seed)
            for s, c in zip(
                batch["start"].to_pylist(), batch["count"].to_pylist()
            )
        ]
        return pa.concat_tables(outs)

    return ds.repartition(len(starts)).map_batches(
        _expand, batch_format="pyarrow", batch_size=1
    )
