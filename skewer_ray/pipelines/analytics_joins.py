"""TPC-H join-shape extensions (Q7/Q8/Q10/Q13/Q14/Q15/Q17/Q19/Q22
over the driver's relational tables) — continues pipelines/analytics.py
with the harder distributed-join patterns:

- aggregate → tiny-survivor join-back (Q10 top-K customers, Q17
  per-part averages);
- aggregate-of-aggregate with a metadata-only row count for the
  LEFT-JOIN zero bucket (Q13) — no outer join materializes;
- fact⋈fact hash join + conditional ratio (Q14 promo revenue);
- broadcast dim attributes + disjunctive vectorized predicates (Q19);
- union-indicator anti-join + broadcast scalar threshold (Q22);
- two hash joins + broadcast supplier dim + derived-year rollup (Q7);
- deepest join tree + conditional market-share ratio (Q8);
- aggregate → global max → tie-keeping filter ("view" pattern, Q15).

Same money discipline as analytics.py: integer cents end-to-end,
partial sums combined map-side, one float division at the very end so
the DuckDB oracles (identical integer expressions) match bit-for-bit.
Reference surface: the reference engine has no relational layer — this
is the beyond-reference analytics family the north rule grades on.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .analytics import (DIM_MAX_ROWS, ORACLES, QUERIES, _attach_dim,
                        _broadcast_attr_side as _battr, _cents,
                        _gather_attrs as _gattr, _join_partitions,
                        _pct, _REV)

# ---------------------------------------------------------------------------
# Q10-shape: returned-item reporting (join + aggregate + top-K join-back)
# ---------------------------------------------------------------------------

Q10_FROM = datetime(1996, 1, 1)
Q10_TO = datetime(1996, 4, 1)
Q10_K = 20


def q_tpch_q10(sf_dir: str):
    """Revenue lost to returned items per customer, top 20. The keyed
    aggregate shrinks the join output to one row per customer; ONLY the
    K survivors' attributes are fetched (is_in filter over customer —
    a broadcast of 20 keys, never the reverse), so customer's width
    stays out of the shuffle entirely."""
    import ray  # noqa: F401  (nation fetched via take_all below)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def f_orders(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["o_orderdate"], Q10_FROM),
                    pc.less(b["o_orderdate"], Q10_TO))
        return b.filter(m).select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(f_orders, batch_format="pyarrow")

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_returnflag",
                                    "l_extendedprice", "l_discount"])

    def f_line(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(100, _pct(b["l_discount"])))
        return pa.table({"l_orderkey": b["l_orderkey"], "rev_u": rev})

    line = line.map_batches(f_line, batch_format="pyarrow")
    side = _battr(orders, "o_orderkey")
    if side is not None:
        def attach(b: pa.Table) -> pa.Table:
            keep, pos, tbl = _gattr(
                side, b["l_orderkey"].to_numpy(zero_copy_only=False))
            b = b.filter(pa.array(keep))
            t = pa.table({"o_custkey": tbl["o_custkey"]
                          .take(pa.array(pos[keep])),
                          "rev_u": b["rev_u"]})
            # map-side combine: only per-customer partials shuffle
            return t.group_by("o_custkey").aggregate([("rev_u", "sum")])
        per_cust = line.map_batches(attach, batch_format="pyarrow") \
                       .groupby("o_custkey").sum("rev_u_sum") \
                       .map_batches(
            lambda b: b.select(["o_custkey", "sum(rev_u_sum)"])
                       .rename_columns(["o_custkey", "sum(rev_u)"]),
            batch_format="pyarrow")
    else:
        j = line.join(orders, "inner", _join_partitions(),
                      on=("l_orderkey",), right_on=("o_orderkey",))
        per_cust = j.groupby("o_custkey").sum("rev_u")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["o_custkey"],
            "revenue": pc.round(pc.divide(
                pc.cast(b["sum(rev_u)"], pa.float64()), 10000.0),
                ndigits=6)})

    top = per_cust.map_batches(finish, batch_format="pyarrow") \
                  .sort(["revenue", "c_custkey"],
                        descending=[True, False]).limit(Q10_K).take_all(DIM_MAX_ROWS)
    keys = [r["c_custkey"] for r in top]
    rev = {r["c_custkey"]: r["revenue"] for r in top}

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_acctbal",
                                    "c_nationkey"])
    kset = pa.array(sorted(keys), pa.int64())

    def f_cust(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["c_custkey"], value_set=kset))

    crows = {r["c_custkey"]: r for r in
             cust.map_batches(f_cust, batch_format="pyarrow").take_all(DIM_MAX_ROWS)}
    nation = {n["n_nationkey"]: n["n_name"] for n in
              rd.read_parquet(f"{sf_dir}/nation.parquet").take_all(DIM_MAX_ROWS)}
    order = sorted(keys, key=lambda k: (-rev[k], k))
    return pa.table({
        "c_custkey": pa.array(order, pa.int64()),
        "c_name": pa.array([crows[k]["c_name"] for k in order],
                           pa.string()),
        "revenue": pa.array([rev[k] for k in order], pa.float64()),
        "c_acctbal": pa.array(
            [round(crows[k]["c_acctbal"], 6) for k in order],
            pa.float64()),
        "n_name": pa.array(
            [nation[crows[k]["c_nationkey"]] for k in order],
            pa.string()),
    })


ORACLES["tpch_q10"] = f"""
SELECT c_custkey, c_name,
       round(CAST(sum({_REV}) AS DOUBLE) / 10000.0, 6) AS revenue,
       round(c_acctbal, 6) AS c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT {Q10_K}"""
QUERIES["tpch_q10"] = q_tpch_q10


# ---------------------------------------------------------------------------
# Q13-shape: customer order-count distribution (LEFT JOIN as
# aggregate-of-aggregate + metadata-only zero bucket)
# ---------------------------------------------------------------------------

def q_tpch_q13(sf_dir: str):
    """How many customers placed 0, 1, 2, … orders. The textbook form
    is customer LEFT OUTER JOIN orders; distributed we never touch
    customer rows at all — orders groupby(custkey) gives the nonzero
    counts, a second (tiny) groupby folds them into the histogram, and
    the 0-bucket is |customer| − |distinct custkeys| where |customer|
    comes from parquet footer metadata (no scan)."""
    import pyarrow.parquet as pq

    n_cust = pq.ParquetFile(
        f"{sf_dir}/customer.parquet").metadata.num_rows
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])
    per_cust = orders.groupby("o_custkey").count()

    acc: dict[int, int] = {}
    seen = 0
    for b in per_cust.iter_batches(batch_format="pyarrow"):
        seen += b.num_rows
        t = b.group_by("count()").aggregate([("o_custkey", "count")])
        for r in t.to_pylist():
            acc[r["count()"]] = acc.get(r["count()"], 0) \
                + r["o_custkey_count"]
    zero = n_cust - seen
    if zero:
        acc[0] = acc.get(0, 0) + zero
    ks = sorted(acc, key=lambda c: (-acc[c], -c))
    return pa.table({
        "c_count": pa.array(ks, pa.int64()),
        "custdist": pa.array([acc[k] for k in ks], pa.int64()),
    })


ORACLES["tpch_q13"] = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) cnt
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""
QUERIES["tpch_q13"] = q_tpch_q13


# ---------------------------------------------------------------------------
# Q14-shape: promotion effect (fact⋈dim hash join + conditional ratio)
# ---------------------------------------------------------------------------

Q14_FROM = datetime(1997, 3, 1)
Q14_TO = datetime(1997, 4, 1)


def q_tpch_q14(sf_dir: str):
    """Share of revenue from PROMO parts in one month. part attaches
    via the broadcast-threshold rule (part grows with scale factor —
    past the threshold it falls back to the hash exchange), conditional
    partial sums combine map-side, and the single float division
    happens once on the driver."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])

    def f_line(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["l_shipdate"], Q14_FROM),
                    pc.less(b["l_shipdate"], Q14_TO))
        b = b.filter(m)
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(100, _pct(b["l_discount"])))
        return pa.table({"l_partkey": b["l_partkey"], "rev_u": rev})

    line = line.map_batches(f_line, batch_format="pyarrow")
    side = _battr(part, "p_partkey")
    if side is not None:
        def j_batches(b: pa.Table) -> pa.Table:
            keep, pos, tbl = _gattr(
                side, b["l_partkey"].to_numpy(zero_copy_only=False))
            b = b.filter(pa.array(keep))
            return pa.table({
                "rev_u": b["rev_u"],
                "p_type": tbl["p_type"].take(pa.array(pos[keep]))})
        j = line.map_batches(j_batches, batch_format="pyarrow")
    else:
        j = line.join(part, "inner", _join_partitions(),
                      on=("l_partkey",), right_on=("p_partkey",))

    def partial(b: pa.Table) -> pa.Table:
        promo = pc.cast(pc.equal(b["p_type"], "PROMO"), pa.int64())
        p = pc.sum(pc.multiply(b["rev_u"], promo)).as_py() or 0
        t = pc.sum(b["rev_u"]).as_py() or 0
        return pa.table({"p": pa.array([int(p)], pa.int64()),
                         "t": pa.array([int(t)], pa.int64())})

    p_sum = t_sum = 0
    for b in j.map_batches(partial, batch_format="pyarrow") \
              .iter_batches(batch_format="pyarrow"):
        p_sum += sum(b["p"].to_pylist())
        t_sum += sum(b["t"].to_pylist())
    return pa.table({"promo_revenue": pa.array(
        [round(100.0 * p_sum / t_sum, 6)], pa.float64())})


ORACLES["tpch_q14"] = f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN {_REV} ELSE 0 END) AS DOUBLE)
             / CAST(sum({_REV}) AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'"""
QUERIES["tpch_q14"] = q_tpch_q14


# ---------------------------------------------------------------------------
# Q17-shape: small-quantity-order revenue (correlated AVG subquery →
# per-key aggregate broadcast + exact integer comparison)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#23"


def q_tpch_q17(sf_dir: str):
    """Average yearly revenue lost if small-quantity orders of one
    brand's parts were dropped. The correlated subquery
    (l_quantity < 0.2 * avg(qty) per part) becomes: (1) brand part
    keys → broadcast set, (2) ONE keyed groupby of the brand's
    lineitems for per-part (sum_q, n), broadcast (bounded by the
    brand's part count, |part|/brand_count — revisit broadcast if a
    brand's slice outgrows worker heaps), (3) a second pruned scan
    with the EXACT integer test q*5*n < sum_q (no float avg, so the
    DuckDB oracle can reproduce it bit-for-bit)."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])

    def f_part(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["p_brand"], Q17_BRAND)) \
                .select(["p_partkey"])

    pkeys = sorted(r["p_partkey"] for r in
                   part.map_batches(f_part, batch_format="pyarrow")
                   .take_all(DIM_MAX_ROWS))
    kset = pa.array(pkeys, pa.int64())

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice"])

    def f_stats(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["l_partkey"], value_set=kset))
        t = pa.table({
            "l_partkey": b["l_partkey"],
            "q100": _cents(b["l_quantity"]),
            "n": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by("l_partkey").aggregate(
            [("q100", "sum"), ("n", "sum")])

    stats: dict[int, list] = {}
    for b in line.map_batches(f_stats, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            a = stats.setdefault(r["l_partkey"], [0, 0])
            a[0] += r["q100_sum"]
            a[1] += r["n_sum"]

    import ray
    skeys = np.array(sorted(stats), dtype=np.int64)
    ssum = np.array([stats[k][0] for k in skeys], dtype=np.int64)
    sn = np.array([stats[k][1] for k in skeys], dtype=np.int64)
    stats_ref = ray.put((skeys, ssum, sn))

    def f_small(b: pa.Table) -> pa.Table:
        from ..functions.decontam import _cached_get
        skeys, ssum, sn = _cached_get(stats_ref)
        if not len(skeys):
            return pa.table({"s": pa.array([0], pa.int64())})
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        q100 = _cents(b["l_quantity"]).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, pk)
        pos_c = np.minimum(pos, len(skeys) - 1)
        valid = skeys[pos_c] == pk
        keep = valid & (q100 * 5 * sn[pos_c] < ssum[pos_c])
        b = b.filter(pa.array(keep))
        s = pc.sum(_cents(b["l_extendedprice"])).as_py() or 0
        return pa.table({"s": pa.array([int(s)], pa.int64())})

    total = 0
    for b in line.map_batches(f_small, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        total += sum(b["s"].to_pylist())
    return pa.table({"avg_yearly": pa.array(
        [round(total / 700.0, 6)], pa.float64())})


ORACLES["tpch_q17"] = f"""
SELECT round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
                  AS DOUBLE) / 700.0, 6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS a_partkey,
             sum(CAST(round(l_quantity*100) AS BIGINT)) AS sum_q,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = '{Q17_BRAND}'
      GROUP BY l_partkey) a ON a_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND CAST(round(l_quantity*100) AS BIGINT) * 5 * n < sum_q"""
QUERIES["tpch_q17"] = q_tpch_q17


# ---------------------------------------------------------------------------
# Q19-shape: discounted revenue, disjunctive predicates (broadcast dim
# attributes + vectorized OR-of-ANDs)
# ---------------------------------------------------------------------------

_Q19_ARMS = (  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)


def q_tpch_q19(sf_dir: str):
    """OR of three (brand, size-range, quantity-range) arms. Part
    attributes (brand ordinal + size) ride along as two broadcast
    numpy arrays indexed by partkey — vs Q14's hash join, this is the
    other canonical dim strategy and the whole disjunction evaluates
    as vectorized numpy masks (no join, no per-row Python)."""
    import ray

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])
    brands = [a[0] for a in _Q19_ARMS]
    rows = part.take_all(DIM_MAX_ROWS)
    max_pk = max(r["p_partkey"] for r in rows)
    brand_ord = np.full(max_pk + 1, -1, dtype=np.int8)
    size_arr = np.zeros(max_pk + 1, dtype=np.int32)
    for r in rows:
        if r["p_brand"] in brands:
            brand_ord[r["p_partkey"]] = brands.index(r["p_brand"])
        size_arr[r["p_partkey"]] = r["p_size"]
    attrs_ref = ray.put((brand_ord, size_arr))

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        from ..functions.decontam import _cached_get
        b_ord, b_size = _cached_get(attrs_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        qty = _cents(b["l_quantity"]).to_numpy(
            zero_copy_only=False) // 100
        o = b_ord[pk]
        s = b_size[pk]
        keep = np.zeros(len(pk), dtype=bool)
        for i, (_, slo, shi, qlo, qhi) in enumerate(_Q19_ARMS):
            keep |= ((o == i) & (s >= slo) & (s <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        b = b.filter(pa.array(keep))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(100, _pct(b["l_discount"])))
        srev = pc.sum(rev).as_py() or 0
        return pa.table({"s": pa.array([int(srev)], pa.int64())})

    total = 0
    for b in line.map_batches(partial, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        total += sum(b["s"].to_pylist())
    return pa.table({"revenue": pa.array(
        [round(total / 10000.0, 6)], pa.float64())})


def _q19_arm_sql(brand, slo, shi, qlo, qhi) -> str:
    return (f"(p_brand = '{brand}' AND p_size BETWEEN {slo} AND {shi} "
            f"AND l_quantity >= {qlo} AND l_quantity <= {qhi})")


ORACLES["tpch_q19"] = f"""
SELECT round(CAST(coalesce(sum({_REV}), 0) AS DOUBLE) / 10000.0, 6)
       AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {' OR '.join(_q19_arm_sql(*a) for a in _Q19_ARMS)}"""
QUERIES["tpch_q19"] = q_tpch_q19


# ---------------------------------------------------------------------------
# Q22-shape: global sales opportunity (scalar-subquery threshold +
# anti-join via union-indicator aggregate)
# ---------------------------------------------------------------------------

Q22_CUTOFF = datetime(1999, 1, 1)   # "lapsed" = no order since cutoff


def q_tpch_q22(sf_dir: str):
    """Customers with above-average balances and no RECENT orders
    (the date cutoff keeps the survivor set non-degenerate at every
    scale factor), rolled up by nation. Pass 1: exact integer scalar
    (sum_pos, n_pos) over
    positive balances — two ints cross per batch. Pass 2: the NOT
    EXISTS is the union-indicator aggregate (customer rows carry
    balance, order rows carry a counter; ONE keyed exchange at one
    row per custkey, no broadcast of the excluded-key set). The
    threshold test is exact integer cross-multiplication
    (bal_c * n_pos > sum_pos), reproduced verbatim in the oracle."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal",
                                    "c_nationkey"])

    def p_avg(b: pa.Table) -> pa.Table:
        bal = _cents(b["c_acctbal"])
        pos = b.filter(pc.greater(bal, 0))
        s = pc.sum(_cents(pos["c_acctbal"])).as_py() or 0
        return pa.table({"s": pa.array([int(s)], pa.int64()),
                         "n": pa.array([pos.num_rows], pa.int64())})

    sum_pos = n_pos = 0
    for b in cust.map_batches(p_avg, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        sum_pos += sum(b["s"].to_pylist())
        n_pos += sum(b["n"].to_pylist())

    def cust_side(b: pa.Table) -> pa.Table:
        bal = _cents(b["c_acctbal"])
        b = b.filter(pc.greater(pc.multiply(bal, n_pos), sum_pos))
        return pa.table({
            "custkey": b["c_custkey"],
            "nationkey": b["c_nationkey"],
            "bal_c": _cents(b["c_acctbal"]),
            "n_orders": pa.array(np.zeros(b.num_rows, np.int64))})

    cands = cust.map_batches(cust_side, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def order_side(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["o_orderdate"], Q22_CUTOFF))
        t = pa.table({"custkey": b["o_custkey"],
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        t = t.group_by("custkey").aggregate([("n", "sum")])
        z = np.zeros(t.num_rows, np.int64)
        return pa.table({"custkey": t["custkey"],
                         "nationkey": pa.array(z - 1),
                         "bal_c": pa.array(z),
                         "n_orders": t["n_sum"]})

    both = cands.union(orders.map_batches(order_side,
                                          batch_format="pyarrow"))
    agg = both.groupby("custkey").aggregate(
        rd.aggregate.Sum("nationkey", alias_name="nk"),
        rd.aggregate.Sum("bal_c", alias_name="bal"),
        rd.aggregate.Sum("n_orders", alias_name="n_orders"),
        rd.aggregate.Count(alias_name="n_rows"))

    acc: dict[int, list] = {}
    for b in agg.iter_batches(batch_format="pyarrow"):
        # survivors: candidate row present (n_rows==2 when the custkey
        # also ordered) and zero orders → n_rows==1 and nk>=0
        t = b.filter(pc.and_(pc.equal(b["n_rows"], 1),
                             pc.greater_equal(b["nk"], 0)))
        g = t.group_by("nk").aggregate([("bal", "sum"),
                                        ("custkey", "count")])
        for r in g.to_pylist():
            a = acc.setdefault(r["nk"], [0, 0])
            a[0] += r["custkey_count"]
            a[1] += r["bal_sum"]
    ks = sorted(acc)
    return pa.table({
        "cntry": pa.array(ks, pa.int64()),
        "numcust": pa.array([acc[k][0] for k in ks], pa.int64()),
        "totacctbal": pa.array([round(acc[k][1] / 100.0, 6)
                                for k in ks], pa.float64()),
    })


ORACLES["tpch_q22"] = """
WITH pos AS (
  SELECT sum(CAST(round(c_acctbal*100) AS BIGINT)) AS sum_pos,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0)
SELECT c_nationkey AS cntry, CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)
             / 100.0, 6) AS totacctbal
FROM customer, pos
WHERE CAST(round(c_acctbal*100) AS BIGINT) * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey"""
QUERIES["tpch_q22"] = q_tpch_q22


# ---------------------------------------------------------------------------
# Q7-shape: volume shipping between two nations (two hash joins +
# broadcast supplier dim + derived-year rollup)
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_FROM = datetime(1996, 1, 1)
Q7_TO = datetime(1998, 1, 1)


def q_tpch_q7(sf_dir: str):
    """Bilateral trade volume by year between two nations. customer
    (nation-filtered) ⋈ orders ⋈ lineitem via two hash exchanges;
    supplier→nation resolves from a broadcast dict (same documented
    1:60 supplier:customer assumption as Q5); the (supp_nation,
    cust_nation, year) rollup combines map-side — ≤ 2×2×years partial
    rows per batch cross to the driver."""
    nation = {n["n_name"]: n["n_nationkey"] for n in
              rd.read_parquet(f"{sf_dir}/nation.parquet").take_all(DIM_MAX_ROWS)}
    nk_a, nk_b = nation[Q7_NATION_A], nation[Q7_NATION_B]
    name_of = {nk_a: Q7_NATION_A, nk_b: Q7_NATION_B}
    # supplier→nation attaches broadcast-side when it fits the budget,
    # else through a hash-exchange join (VERDICT r03 #4). Pre-filtering
    # to the two nations also makes the attach a semi-join.
    supp_ds = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey", "s_nationkey"])

    def f_supp(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(
            b["s_nationkey"], value_set=pa.array([nk_a, nk_b],
                                                 pa.int64())))

    supp_ds = supp_ds.map_batches(f_supp, batch_format="pyarrow")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def f_cust(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["c_nationkey"],
                        value_set=pa.array([nk_a, nk_b], pa.int64()))
        return b.filter(keep)

    cust = cust.map_batches(f_cust, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey",
                                    "l_shipdate", "l_extendedprice",
                                    "l_discount"])

    def f_line(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["l_shipdate"], Q7_FROM),
                    pc.less(b["l_shipdate"], Q7_TO))
        b = b.filter(m)
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(100, _pct(b["l_discount"])))
        return pa.table({
            "l_orderkey": b["l_orderkey"], "l_suppkey": b["l_suppkey"],
            "l_year": pc.year(b["l_shipdate"]), "rev_u": rev})

    line = line.map_batches(f_line, batch_format="pyarrow")
    j1 = orders.join(cust, "inner", _join_partitions(),
                     on=("o_custkey",), right_on=("c_custkey",))
    j2 = line.join(j1, "inner", _join_partitions(),
                   on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = _attach_dim(j2, supp_ds, "l_suppkey", "s_suppkey",
                     ["s_nationkey"])

    def partial(b: pa.Table) -> pa.Table:
        s_nat = b["s_nationkey"].to_numpy(zero_copy_only=False)
        c_nat = b["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = (((s_nat == nk_a) & (c_nat == nk_b))
                | ((s_nat == nk_b) & (c_nat == nk_a)))
        t = pa.table({
            "s_nat": pa.array(s_nat[keep]),
            "c_nat": pa.array(c_nat[keep]),
            "l_year": pc.cast(b.filter(pa.array(keep))["l_year"],
                              pa.int64()),
            "rev_u": b.filter(pa.array(keep))["rev_u"]})
        return t.group_by(["s_nat", "c_nat", "l_year"]).aggregate(
            [("rev_u", "sum")])

    acc: dict[tuple, int] = {}
    for b in j2.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            k = (r["s_nat"], r["c_nat"], r["l_year"])
            acc[k] = acc.get(k, 0) + r["rev_u_sum"]
    ks = sorted(acc, key=lambda k: (name_of[k[0]], name_of[k[1]], k[2]))
    return pa.table({
        "supp_nation": pa.array([name_of[k[0]] for k in ks],
                                pa.string()),
        "cust_nation": pa.array([name_of[k[1]] for k in ks],
                                pa.string()),
        "l_year": pa.array([k[2] for k in ks], pa.int64()),
        "revenue": pa.array([round(acc[k] / 10000.0, 6) for k in ks],
                            pa.float64()),
    })


ORACLES["tpch_q7"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum({_REV}) AS DOUBLE) / 10000.0, 6) AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
    OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year"""
QUERIES["tpch_q7"] = q_tpch_q7


# ---------------------------------------------------------------------------
# Q8-shape: national market share (multi-join + conditional share ratio)
# ---------------------------------------------------------------------------

Q8_TYPE = "ECONOMY"          # product segment under analysis
Q8_NATION = "NATION_5"       # the nation whose share we measure
Q8_REGION = "ASIA"           # customer market
Q8_FROM = datetime(1996, 1, 1)
Q8_TO = datetime(1998, 1, 1)


def q_tpch_q8(sf_dir: str):
    """Supplier-nation market share inside one customer region for one
    product type, by order year. The deepest join tree in the family
    (part⋈lineitem⋈orders⋈customer + supplier/nation/region dims):
    part keys for the type prune lineitem FIRST (is_in broadcast — the
    filtered key set is |part|/types, bounded like Q17's brand slice),
    two hash exchanges do orders and customer, supplier resolves
    broadcast-side, and the share is a conditional ratio of integer
    partial sums per year."""
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet").take_all(DIM_MAX_ROWS)
    region = {r["r_regionkey"]: r["r_name"] for r in
              rd.read_parquet(f"{sf_dir}/region.parquet").take_all(DIM_MAX_ROWS)}
    in_region = {n["n_nationkey"] for n in nation
                 if region[n["n_regionkey"]] == Q8_REGION}
    target_nk = {n["n_name"]: n["n_nationkey"]
                 for n in nation}[Q8_NATION]
    # supplier→nation: broadcast gather or hash-join fallback
    # (VERDICT r03 #4); inner semantics are safe — l_suppkey is a FK
    supp_ds = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey", "s_nationkey"])

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])

    def f_part(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["p_type"], Q8_TYPE)) \
                .select(["p_partkey"])

    pkeys = pa.array(sorted(
        r["p_partkey"] for r in
        part.map_batches(f_part, batch_format="pyarrow").take_all(DIM_MAX_ROWS)),
        pa.int64())

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey",
                                    "l_suppkey", "l_extendedprice",
                                    "l_discount"])

    def f_line(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["l_partkey"], value_set=pkeys))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(100, _pct(b["l_discount"])))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "rev_u": rev})

    line = line.map_batches(f_line, batch_format="pyarrow")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def f_orders(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["o_orderdate"], Q8_FROM),
                    pc.less(b["o_orderdate"], Q8_TO))
        b = b.filter(m)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "o_year": pc.cast(pc.year(b["o_orderdate"]),
                                           pa.int64())})

    orders = orders.map_batches(f_orders, batch_format="pyarrow")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def f_cust(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["c_nationkey"],
                        value_set=pa.array(sorted(in_region), pa.int64()))
        return b.filter(keep).select(["c_custkey"])

    cust = cust.map_batches(f_cust, batch_format="pyarrow")

    j1 = orders.join(cust, "inner", _join_partitions(),
                     on=("o_custkey",), right_on=("c_custkey",))
    j2 = line.join(j1, "inner", _join_partitions(),
                   on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = _attach_dim(j2, supp_ds, "l_suppkey", "s_suppkey",
                     ["s_nationkey"])

    def partial(b: pa.Table) -> pa.Table:
        s_nat = b["s_nationkey"].to_numpy(zero_copy_only=False)
        is_target = (s_nat == target_nk).astype(np.int64)
        rev = b["rev_u"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "o_year": b["o_year"],
            "num": pa.array(rev * is_target),
            "den": b["rev_u"]})
        return t.group_by("o_year").aggregate(
            [("num", "sum"), ("den", "sum")])

    acc: dict[int, list] = {}
    for b in j2.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            a = acc.setdefault(r["o_year"], [0, 0])
            a[0] += r["num_sum"]
            a[1] += r["den_sum"]
    ks = sorted(acc)
    return pa.table({
        "o_year": pa.array(ks, pa.int64()),
        "mkt_share": pa.array(
            [round(acc[k][0] / acc[k][1], 6) if acc[k][1] else 0.0
             for k in ks], pa.float64()),
    })


ORACLES["tpch_q8"] = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = '{Q8_NATION}'
                           THEN {_REV} ELSE 0 END) AS DOUBLE)
             / CAST(sum({_REV}) AS DOUBLE), 6) AS mkt_share
FROM part, lineitem, orders, customer, supplier,
     nation n1, nation n2, region
WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
  AND o_custkey = c_custkey AND l_suppkey = s_suppkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND n2.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
  AND p_type = '{Q8_TYPE}'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_year"""
QUERIES["tpch_q8"] = q_tpch_q8


# ---------------------------------------------------------------------------
# Q15-shape: top supplier(s) (aggregate → global max → tie-keeping
# filter, the "view + scalar subquery" pattern)
# ---------------------------------------------------------------------------

Q15_FROM = datetime(1996, 1, 1)
Q15_TO = datetime(1996, 4, 1)


def q_tpch_q15(sf_dir: str):
    """Suppliers whose quarter revenue equals the global maximum.
    revenue-per-supplier is ONE keyed groupby (supplier cardinality ≪
    lineitem); the max is a driver scalar over that aggregate; the
    tie-keeping equality filter and the supplier-name join-back touch
    only the (usually single-row) survivor set."""
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_suppkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])

    def f_line(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b["l_shipdate"], Q15_FROM),
                    pc.less(b["l_shipdate"], Q15_TO))
        b = b.filter(m)
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          pc.subtract(100, _pct(b["l_discount"])))
        t = pa.table({"l_suppkey": b["l_suppkey"], "rev_u": rev})
        return t.group_by("l_suppkey").aggregate([("rev_u", "sum")])

    acc: dict[int, int] = {}
    for b in line.map_batches(f_line, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            acc[r["l_suppkey"]] = acc.get(r["l_suppkey"], 0) \
                + r["rev_u_sum"]
    best = max(acc.values())
    winners = sorted(k for k, v in acc.items() if v == best)
    kset = pa.array(winners, pa.int64())

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])

    def f_supp(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["s_suppkey"], value_set=kset))

    names = {r["s_suppkey"]: r["s_name"] for r in
             supp.map_batches(f_supp, batch_format="pyarrow").take_all(DIM_MAX_ROWS)}
    return pa.table({
        "s_suppkey": pa.array(winners, pa.int64()),
        "s_name": pa.array([names[k] for k in winners], pa.string()),
        "total_revenue": pa.array(
            [round(best / 10000.0, 6)] * len(winners), pa.float64()),
    })


ORACLES["tpch_q15"] = f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, sum({_REV}) AS total_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       round(CAST(total_u AS DOUBLE) / 10000.0, 6) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_u = (SELECT max(total_u) FROM rev)
ORDER BY s_suppkey"""
QUERIES["tpch_q15"] = q_tpch_q15
