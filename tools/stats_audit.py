"""Per-operator ``ds.stats()`` audit for the flagship + shuffle join.

Run: ``python tools/stats_audit.py [sf_dir]`` — prints the Ray Data
operator breakdown so wall-time can be attributed (fused map chain vs
shuffle barriers). Used to keep BASELINE.md's stats narrative honest.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402

ray.init(
    address="local",
    num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    include_dashboard=False,
    ignore_reinit_error=True,
    logging_level="ERROR",
)
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

from s2sphere_ray.pages import geocode_batch, synth_pages  # noqa: E402
from s2sphere_ray.regions import regions_from_sf_dir  # noqa: E402
from s2sphere_ray.stages.encode import cell_encode  # noqa: E402
from s2sphere_ray.stages.join import spatial_join  # noqa: E402
from s2sphere_ray.stages.tiles import tile_counts  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "4000000"))

pages_path = f"/tmp/graft_bench_pages_{ROWS}"
if not os.path.isdir(pages_path) or not os.listdir(pages_path):
    synth_pages(ROWS, block_rows=50_000).write_parquet(pages_path)

regions = regions_from_sf_dir(SF_DIR)


def _warm(b):
    import s2sphere_ray.cells  # noqa: F401

    return b


rd.range(128, override_num_blocks=128).map_batches(_warm, batch_size=1).count()

print("=== flagship (broadcast join + tile counts) ===")
t0 = time.time()
pages = rd.read_parquet(pages_path, columns=["url"])
pages = pages.map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)
pages = pages.map_batches(cell_encode, batch_format="pyarrow", batch_size=None)
joined = spatial_join(
    pages, regions, strategy="broadcast", point_cols=("doc_id", "cell_id")
)
tiles = tile_counts(joined, 8, num_rows=ROWS).materialize()
print(f"wall {time.time()-t0:.2f}s, {tiles.count()} tiles")
print(tiles.stats())

print("=== shuffle join (skewed quarter) ===")
t0 = time.time()
pages = rd.read_parquet(pages_path, columns=["doc_id"]).limit(ROWS // 4)
pages = pages.map_batches(geocode_batch, batch_format="pyarrow", batch_size=None)
j = spatial_join(
    pages,
    regions,
    strategy="shuffle",
    point_cols=("doc_id",),
    hot_threshold=max(10_000, ROWS // 100),
    split_delta=3,
)
j = j.materialize()
print(f"wall {time.time()-t0:.2f}s, {j.count()} rows")
print(j.stats())
ray.shutdown()
