"""Multi-fragment input regime (empty fragments + fragment-boundary
block layouts) — a real crawl is thousands of parquet files, not one.

The FULL 50-query harness runs against a fragmented copy via
``tools/make_multifrag.py`` + ``tools/oracle_harness.py`` (recorded in
BASELINE.md); this pytest pins a fast representative subset so the
regime stays covered in-suite.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF = "/root/testdata/sf0.001"

SUBSET = [
    "q_text_stats",      # fused Arrow kernels over documents
    "q_dedup_exact",     # hash-bucketed groupby
    "q_sample_hash",     # map-only + rank exchanges + bloom variant
    "q_events_hourly",   # fragmented events table
    "q_pricing_summary", # fragmented lineitem table
]


@pytest.fixture(scope="module")
def mfrag_dir(tmp_path_factory):
    from make_multifrag import build

    dst = str(tmp_path_factory.mktemp("mfrag"))
    build(SF, dst)
    return dst


@pytest.mark.parametrize("qname", SUBSET)
def test_query_over_fragmented_input_matches_single_file(
    ray_session, mfrag_dir, qname
):
    from s2sphere_ray.queries import QUERIES

    fn = QUERIES[qname]
    a = fn(SF).to_pandas()
    b = fn(mfrag_dir).to_pandas()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )
