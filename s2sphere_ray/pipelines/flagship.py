"""Flagship pipeline (north_star shape): pages → geocode → cell encode →
spatial join → tile assignment/aggregation → partitioned write.

Streaming end-to-end: every stage is a batch transform; the only
materialized results are the small aggregates. ``html`` is projected away
before any shuffle (SURVEY §7 hard part d).
"""

from __future__ import annotations

import pyarrow as pa

from ..pages import read_pages, geocode_batch
from ..regions import regions_from_sf_dir
from ..stages.encode import cell_encode, cell_token
from ..stages.join import spatial_join
from ..stages.tiles import tile_counts, write_tiles


def geocoded_pages(sf_dir: str, with_html: bool = True):
    cols = None if with_html else ["url", "warc_ts", "text", "lang", "doc_id"]
    ds = read_pages(sf_dir, columns=cols)
    return ds.map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)


def flagship(sf_dir: str, tile_level: int = 8, join_strategy: str = "broadcast"):
    """→ Dataset(tile_token, n_rows): joined-page density per tile.

    pages → geocode (E1) → spatial join vs deterministic regions (E9/E12)
    → per-tile counts of joined pages (E13/E15).
    """
    regions = regions_from_sf_dir(sf_dir)
    pages = geocoded_pages(sf_dir, with_html=False)
    pages = pages.map_batches(cell_encode, batch_format="pyarrow", batch_size=None)
    joined = spatial_join(
        pages,
        regions,
        strategy=join_strategy,
        point_cols=("doc_id", "cell_id"),
    )
    # Parquet-metadata row count (free) gates the coalesce-vs-groupby
    # choice of the final tile merge at scale.
    try:
        import ray.data as _rd

        n_hint = _rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).count()
    except Exception:
        n_hint = None
    return tile_counts(joined, tile_level, num_rows=n_hint)


def flagship_write(
    sf_dir: str, out_dir: str, tile_level: int = 8, fingerprint: str = "flagship-v1"
):
    """Full write path: encoded pages partitioned by tile with manifests."""
    pages = geocoded_pages(sf_dir, with_html=True)
    pages = pages.map_batches(cell_encode, batch_format="pyarrow", batch_size=None)
    pages = pages.map_batches(cell_token, batch_format="pyarrow")
    try:
        import ray.data as _rd

        n_hint = _rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).count()
    except Exception:
        n_hint = None
    return write_tiles(
        pages, out_dir, tile_level, fingerprint=fingerprint, num_rows=n_hint
    )
