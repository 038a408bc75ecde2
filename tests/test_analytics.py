"""Relational join/aggregate pipelines (pipelines/analytics.py) vs
DuckDB ground truth at sf0.001 — the same comparison the driver's
correctness gate runs at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from skewer_ray.pipelines import analytics_joins  # noqa: F401  (registers)
from skewer_ray.pipelines.analytics import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events")


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


def test_q18_having_bound(ray_session):
    """Every surviving order genuinely exceeds the HAVING threshold."""
    from skewer_ray.pipelines.analytics import Q18_MIN_QTY
    rows = QUERIES["tpch_q18"](SF).take_all()
    assert rows and all(r["sum_qty"] > Q18_MIN_QTY for r in rows)


def test_quantiles_match_sorted_selection(ray_session):
    """p50/p90/p99 equal direct index selection on the sorted values."""
    import math

    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    df = t.to_pandas()
    out = {r["event_type"]: r
           for r in QUERIES["events_quantiles"](SF).to_pylist()}
    for et, grp in df.groupby("event_type"):
        vals = sorted(round(v * 100) / 100.0 for v in grp["value"])
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            idx = max(0, math.ceil(p * len(vals)) - 1)
            assert abs(out[et][col] - round(vals[idx], 6)) < 1e-9


def test_q3_topk_is_ordered_desc(ray_session):
    rows = QUERIES["tpch_q3"](SF).take_all()
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert len(rows) == 10


def test_q13_buckets_cover_all_customers(ray_session):
    """Histogram masses sum to |customer| (incl. the zero bucket)."""
    import pyarrow.parquet as pq
    n_cust = pq.ParquetFile(f"{SF}/customer.parquet").metadata.num_rows
    rows = QUERIES["tpch_q13"](SF).to_pylist()
    assert sum(r["custdist"] for r in rows) == n_cust


def test_q10_topk_ordered_and_bounded(ray_session):
    rows = QUERIES["tpch_q10"](SF).to_pylist()
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert len(rows) <= analytics_joins.Q10_K


def test_q22_survivors_have_no_recent_orders(ray_session):
    """Cross-check the union-indicator anti-join against pandas."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    bal_c = (cust["c_acctbal"] * 100).round().astype("int64")
    pos = bal_c[bal_c > 0]
    recent = set(orders.loc[
        orders["o_orderdate"] >= analytics_joins.Q22_CUTOFF, "o_custkey"])
    keep = (bal_c * len(pos) > pos.sum()) & ~cust["c_custkey"].isin(recent)
    expect = cust[keep].groupby("c_nationkey")["c_custkey"].count()
    got = {r["cntry"]: r["numcust"]
           for r in QUERIES["tpch_q22"](SF).to_pylist()}
    assert got == expect.to_dict()
