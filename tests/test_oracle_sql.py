"""The generated in-SQL S2 encode must match the numpy kernels exactly."""

import duckdb
import numpy as np
import pytest

from s2sphere_ray import cells as ck
from s2sphere_ray.oracle_sql import s2_token_sql


@pytest.mark.parametrize("level", [0, 4, 12, 22, 30])
def test_sql_tokens_match_kernels(level):
    rng = np.random.default_rng(level + 1)
    n = 2000
    # 4-decimal grid coordinates (the geocode's value domain)
    lat = np.round(rng.uniform(-89.9, 89.9, n), 4)
    lng = np.round(rng.uniform(-180, 179.99, n), 4)
    want = ck.token_from_cell_id(ck.parent(ck.cell_id_from_latlng(lat, lng), level))
    con = duckdb.connect()
    con.register(
        "pts_src",
        __import__("pyarrow").table(
            {"doc_id": np.arange(n), "lat": lat, "lng": lng}
        ),
    )
    sql = s2_token_sql(level, "SELECT doc_id, lat, lng FROM pts_src")
    rows = con.execute(sql + " ORDER BY doc_id").fetchall()
    got = [r[-1] for r in rows]
    assert got == want


def test_sql_tokens_reject_odd_level():
    with pytest.raises(ValueError):
        s2_token_sql(11, "SELECT 1 AS doc_id, 0.0 AS lat, 0.0 AS lng")
