"""Driver-contract smoke: entry() runs, a sample of queries matches the
DuckDB oracle at sf0.001 (the full sweep runs at sf0.01 via the driver)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
SAMPLE = [
    "q_encode_suite",
    "q_join_rect",
    "q_join_cap",
    "q_join_poly",
    "q_knn",
    "q_text_stats",
    "q_pricing_summary",
    "q_sessions",
    "q_curation",
    "q_band_join",
    "q_events_sliding",
    "q_asof_orders",
    "q_simsearch",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    n = res.count()
    assert n >= 0
    assert "tile_token" in [f for f in res.schema().names]


def test_queries_have_oracle_or_reason(ray_session):
    import __ray_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    assert set(oq) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as e

    df = e.queries()[name](SF).to_pandas()
    odf = con.execute(e.oracle_sql()[name]).fetchdf()
    cols = sorted(df.columns)
    assert cols == sorted(odf.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
