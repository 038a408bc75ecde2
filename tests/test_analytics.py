"""Relational join/aggregate pipelines (pipelines/analytics.py) vs
DuckDB ground truth at sf0.001 — the same comparison the driver's
correctness gate runs at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from skewer_ray.pipelines.analytics import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_matches_duckdb(name, ddb, ray_session):
    res = QUERIES[name](SF)
    ours = res.to_pandas()
    theirs = ddb.sql(ORACLES[name]).df()
    a, b = _norm(ours), _norm(theirs)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
    assert len(a) > 0  # every query returns rows at sf0.001


def test_q3_topk_is_ordered_desc(ray_session):
    rows = QUERIES["tpch_q3"](SF).take_all()
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert len(rows) == 10
