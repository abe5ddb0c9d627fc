"""Relational capability queries beyond the reference's own surface:
TPC-H-shaped joins/aggregations over the driver's star schema.

The reference's only "joins" are a dict probe and a containment flatten
(SURVEY §2.3); these queries demonstrate that the rebuilt engine serves
the full relational surface a user would expect — EXISTS semi-joins
with inequality predicates, multi-way star joins, conditional
aggregation, HAVING-then-join, OR'd multi-column predicates, correlated
subqueries, and ROLLUP grouping — all expressed declaratively so
Catalyst picks the physical strategy (broadcast for fixed-size dims,
shuffle hash/sort-merge + AQE for fact-fact).

Scale notes per query are in the docstrings: which side broadcasts,
where the one unavoidable shuffle lands, and why the plan survives
1000 executors × 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q4_priority_exists",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("tpch", "semi_join"),
    bench=True,
)
def q_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with an inequality across tables → LEFT
    SEMI join (first match short-circuits; no fan-out, no distinct).
    Both sides shuffle once on l_orderkey; at scale co-partition /
    bucket both tables by orderkey and the shuffle disappears."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q7_nation_volume",
    """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l_discount AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation cn ON customer.c_nationkey = cn.n_nationkey
JOIN nation sn ON supplier.s_nationkey = sn.n_nationkey
WHERE cn.n_name < sn.n_name
GROUP BY cn.n_name, sn.n_name
""",
    tags=("tpch", "join"),
    bench=True,
)
def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume. The nation dim is
    fixed-size (25 rows at every SF) → explicit broadcast twice;
    supplier/customer/orders resolve via AQE (broadcast at fixture SF,
    shuffle-hash at 100 TB). The only mandatory shuffles are the two
    fact-fact key exchanges + the final 300-group agg. Revenue sums in
    DECIMAL: associative-exact, so the partial-agg merge order can
    never flip a 2-dp rounding boundary (doubles drifted here)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = F.broadcast(n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    sn = F.broadcast(n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(cn, c["c_nationkey"] == F.col("c_nk"))
        .join(sn, s["s_nationkey"] == F.col("s_nk"))
        .where(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (1 - F.col("l_discount")).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("tpch", "join", "topk"),
    bench=True,
)
def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers.
    The returnflag filter is pushed into the lineitem scan (⅓
    selectivity before any join); nation broadcasts; the top-k is
    TakeOrderedAndProject — no global sort materializes."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_share",
    """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6)
           AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
    tags=("tpch", "conditional_agg"),
)
def q_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share via conditional aggregation
    — one pass, no self-join. part joins on its key (AQE broadcasts at
    small SF; at 100 TB this is the classic bucket-both-by-partkey
    co-located join)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_rev()), 6).alias(
                "promo_share_pct"
            )
        )
    )


@register(
    "q18_large_orders",
    """
WITH big AS (
    SELECT l_orderkey, sum(l_quantity) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 250
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum_qty, 2) AS sum_qty
FROM big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("tpch", "having"),
    bench=True,
)
def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join. The HAVING collapses
    lineitem to ~1% of orders BEFORE joining orders/customer — the
    join input shrinks by 100×, which is the difference between a
    broadcast and a multi-TB shuffle at scale."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 250)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("raw_qty"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_or_predicates",
    """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 30)
""",
    tags=("tpch", "predicates"),
)
def q_q19_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of multi-column conjunctions spanning both
    join sides. Catalyst extracts the common single-side conjuncts
    (brand IN (...), quantity ranges) below the join as pushable
    filters; the residual OR evaluates post-join in codegen."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(10, 30) & q.between(10, 20))
        | ((b == "Brand#34") & sz.between(20, 50) & q.between(20, 30))
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .where(cond)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "part_min_price_per_type",
    """
SELECT p_type, p_partkey, p_retailprice
FROM part p1
WHERE p_retailprice = (
    SELECT min(p_retailprice) FROM part p2 WHERE p2.p_type = p1.p_type)
""",
    tags=("tpch", "correlated_subquery"),
)
def q_part_min_price_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery decorrelated the way Catalyst would:
    groupBy-min on the correlation key + equi-join back. One shuffle on
    p_type for the agg; the 6-row mins table broadcasts."""
    p = _t(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_type").alias("mt")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p["p_type"] == F.col("mt"))
            & (p["p_retailprice"] == F.col("min_price")),
        )
        .select("p_type", "p_partkey", "p_retailprice")
    )


@register(
    "lineitem_rollup",
    """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("tpch", "rollup"),
)
def q_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level totals in one pass: ROLLUP expands to grouping sets
    (flag+status, flag, grand total) inside a single Expand+HashAgg —
    one shuffle instead of three unioned aggregations."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "events_asof_join",
    """
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.ts AS asof_ts, c.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    tags=("asof", "window"),
    bench=True,
)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the latest at-or-before click of
    the same user (operators/asof.asof_join — union + carry-forward
    window, ONE shuffle, no range crossJoin, no Python). The oracle is
    DuckDB's native ASOF JOIN — an independent algorithm agreeing on
    every row."""
    from data_ingestion_py_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases, clicks, on=["user_id"], ts_col="ts", payload_cols=["value"]
    ).select("event_id", "user_id", "ts", "value", "asof_ts", "asof_value")


@register(
    "events_range_join_pairs",
    """
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
       abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
""",
    tags=("range_join",),
    bench=True,
)
def q_events_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-distance range join: same-user event pairs within 5
    minutes (operators/rangejoin.time_proximity_pairs — banded
    equi-join on (user, time-bin), never a nested-loop). The oracle is
    DuckDB's direct inequality join — independent algorithm, same
    rows."""
    from data_ingestion_py_spark.operators.rangejoin import (
        time_proximity_pairs,
    )

    return time_proximity_pairs(
        _t(spark, sf_dir, "events"), max_gap_seconds=300
    )


@register(
    "events_value_quantiles",
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
    tags=("agg", "quantile"),
    bench=True,
)
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`). At 100 TB swap in `approx_percentile`
    (t-digest sketch, mergeable across partitions) — same plan shape,
    bounded memory; the exact form is the oracle-checkable twin."""
    e = _t(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return (
        e.groupBy("event_type")
        .agg(pct.alias("q"))
        .select(
            "event_type",
            F.round(F.col("q")[0], 6).alias("p50"),
            F.round(F.col("q")[1], 6).alias("p95"),
            F.round(F.col("q")[2], 6).alias("p99"),
        )
    )


@register(
    "q13_order_count_distribution",
    """
WITH c_orders AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
""",
    tags=("tpch", "outer_join"),
)
def q_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram INCLUDING zero-order
    customers — the left join is the point (an inner join silently
    drops the zero bucket). count(col) counts non-null matches only."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    """
WITH rev AS (
    SELECT l_suppkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS total_rev
    FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
""",
    tags=("tpch", "scalar_subquery"),
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving max revenue — scalar
    subquery against an aggregate of the same CTE. DECIMAL sums so the
    equality against max() can't be broken by partial-agg float drift;
    the 1-row max broadcasts."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (1 - F.col("l_discount")).cast("decimal(18,4)")
            ),
            2,
        )
        .cast("double")
        .alias("total_rev")
    )
    maxv = rev.agg(F.max("total_rev").alias("mx"))
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .crossJoin(F.broadcast(maxv))
        .where(F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q17_small_quantity_revenue",
    """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
      SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = lineitem.l_partkey)
""",
    tags=("tpch", "correlated_subquery"),
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated average threshold, decorrelated to a
    per-part aggregate + equi-join — the avg is computed once per part,
    not once per row. The brand filter prunes part before the join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    thr = l.groupBy(F.col("l_partkey").alias("tk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(thr, l["l_partkey"] == F.col("tk"))
        .where(F.col("l_quantity") < F.col("qty_thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q22_dormant_rich_customers",
    """
WITH avg_bal AS (
    SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_mktsegment
""",
    tags=("tpch", "anti_join"),
)
def q_q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers who never
    placed a large (>400k) order — scalar-subquery threshold + anti
    join against a filtered subquery, grouped by segment. (Every
    customer has *some* order in the fixture, so the plain no-orders
    form would be an empty — vacuous — result.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q16_supplier_variety",
    """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
""",
    tags=("tpch", "count_distinct"),
    bench=True,
)
def q_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part descriptor
    (lineitem stands in for partsupp — same key relation). countDistinct
    expands to a two-phase agg; the brand exclusion prunes at the part
    scan."""
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#45")
    l = _t(spark, sf_dir, "lineitem")
    return (
        p.join(l, p["p_partkey"] == l["l_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
        .limit(50)
    )


@register(
    "q21_sole_late_supplier",
    """
WITH late AS (
    SELECT DISTINCT l_orderkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("tpch", "semi_join", "anti_join"),
)
def q_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a late
    multi-supplier order. The oracle keeps the textbook EXISTS +
    NOT EXISTS formulation; here both quantifiers collapse into ONE
    per-order aggregation — "exactly one distinct late supplier AND
    ≥2 distinct suppliers overall" — so the plan is two hash aggs
    sharing the l_orderkey partitioning plus a tiny join, instead of
    three O(lineitem) self-joins. That aggregation rewrite is the
    difference between one shuffle and three at 100 TB."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_per_order = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_late"),
            F.min("l_suppkey").alias("sole_suppkey"),
        )
    )
    sole = (
        late_per_order.where(F.col("n_late") == 1)
        .join(per_order.where(F.col("n_supp") >= 2), "l_orderkey")
    )
    return (
        sole.join(s, F.col("sole_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "events_multi_rollup",
    """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS TIMESTAMP),
                 CAST(date_trunc('hour', ts) AS TIMESTAMP))
""",
    tags=("rollup", "timeseries"),
    bench=True,
)
def q_events_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly, daily, and
    grand totals from ONE pass (ROLLUP → Expand + single hash agg, one
    shuffle) instead of three unioned aggregations. At 100 TB this is
    the continuous-aggregate pattern: materialize the hour level,
    derive day/total from it."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "q8_market_share",
    """
WITH region_rev AS (
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           sn.n_name AS supp_nation,
           CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l_discount AS DECIMAL(18,4)) AS volume
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN supplier  ON l_suppkey  = s_suppkey
    JOIN nation sn ON supplier.s_nationkey = sn.n_nationkey
    JOIN region    ON sn.n_regionkey = region.r_regionkey
    WHERE region.r_name = 'AFRICA'
)
SELECT o_year,
       CAST(round(100.0 * sum(CASE WHEN supp_nation = 'NATION_0'
                                   THEN volume ELSE 0 END)
                  / sum(volume), 6) AS DOUBLE) AS mkt_share_pct
FROM region_rev
GROUP BY o_year
""",
    tags=("tpch", "conditional_agg"),
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of its region's supplier
    revenue per order-year — conditional aggregation over a star join,
    region filter pruning the nation dim BEFORE it broadcasts. DECIMAL
    volume so the share ratio is drift-free."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    dims = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    vol = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (1 - F.col("l_discount")).cast("decimal(18,4)")
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_0", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(dims, s["s_nationkey"] == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(100.0 * F.sum(nation_vol) / F.sum(vol), 6)
            .cast("double")
            .alias("mkt_share_pct")
        )
    )


@register(
    "q9_profit_by_nation_year",
    """
SELECT sn.n_name AS supp_nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l_discount AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS profit
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey  = s_suppkey
JOIN nation sn ON supplier.s_nationkey = sn.n_nationkey
GROUP BY sn.n_name, CAST(year(o_orderdate) AS INT)
""",
    tags=("tpch", "join"),
)
def q_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit rollup by supplier nation × order year
    (no partsupp cost column in the fixture, so profit = discounted
    revenue). Two fact joins sharing the l_orderkey / l_suppkey
    partitionings + a broadcast nation dim; DECIMAL sums."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sn = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(sn, s["s_nationkey"] == F.col("s_nk"))
        .groupBy(
            "supp_nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (1 - F.col("l_discount")).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("profit")
        )
    )


@register(
    "orders_analytic_functions",
    """
SELECT o_orderkey,
       o_custkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(lag(o_orderkey) OVER w AS BIGINT) AS prev_orderkey,
       CAST(lead(o_orderkey) OVER w AS BIGINT) AS next_orderkey,
       CAST(ntile(4) OVER w AS INT) AS spend_quartile,
       round(cume_dist() OVER w, 6) AS spend_cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice, o_orderkey)
""",
    tags=("window", "analytic"),
)
def q_orders_analytic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-function suite over one keyed window: lag/lead
    neighbors, ntile quartiles, cumulative distribution — one shuffle
    on o_custkey + per-partition sort, all functions evaluated in a
    single Window physical node. Total ORDER BY (price, orderkey) so
    every function is deterministic."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.lag("o_orderkey").over(w).cast("bigint").alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).cast("bigint").alias("next_orderkey"),
        F.ntile(4).over(w).cast("int").alias("spend_quartile"),
        F.round(F.cume_dist().over(w), 6).alias("spend_cume"),
    )


@register(
    "events_pivot_by_type",
    """
SELECT user_id,
       round(sum(CASE WHEN event_type = 'click'    THEN value ELSE 0 END), 2) AS click,
       round(sum(CASE WHEN event_type = 'error'    THEN value ELSE 0 END), 2) AS error,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase,
       round(sum(CASE WHEN event_type = 'signup'   THEN value ELSE 0 END), 2) AS signup,
       round(sum(CASE WHEN event_type = 'view'     THEN value ELSE 0 END), 2) AS view
FROM events
GROUP BY user_id
""",
    tags=("pivot",),
)
def q_events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user value totals, one column per event
    type. The explicit value list keeps it a single-pass conditional
    agg — Spark skips the extra distinct-values job and the plan is
    identical at any scale. Missing combinations surface as 0 via the
    ELSE, matching the oracle exactly."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2))
    )
    # pivot yields NULL for absent (user, type) pairs; oracle's ELSE 0
    return pivoted.select(
        "user_id",
        *[F.round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(t) for t in types],
    )


@register(
    "supplier_set_ops",
    """
SELECT s_suppkey FROM supplier WHERE s_acctbal > 1000
INTERSECT
SELECT l_suppkey AS s_suppkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT
SELECT l_suppkey AS s_suppkey FROM lineitem
WHERE l_quantity > 49 AND l_discount >= 0.09
""",
    tags=("set_ops",),
)
def q_supplier_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra (absent from the reference, SURVEY §2.7): rich
    suppliers with returned shipments, minus any that ever shipped a
    max-quantity deep-discount line. INTERSECT/EXCEPT compile to left-semi/left-anti
    joins with aggregate-dedup — same shuffle shape as the quantifier
    queries, set semantics for free."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    rich = s.where(F.col("s_acctbal") > 1000).select("s_suppkey")
    returned = (
        l.where(F.col("l_returnflag") == "R")
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    maxed = (
        l.where((F.col("l_quantity") > 49) & (F.col("l_discount") >= 0.09))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return rich.intersect(returned).exceptAll(maxed.distinct())


@register(
    "lang_doc_rollcall",
    """
SELECT lang,
       count(*) AS n_docs,
       array_to_string(list(doc_id ORDER BY doc_id)[1:5], ',')
           AS first_doc_ids
FROM documents
GROUP BY lang
""",
    tags=("array_agg",),
)
def q_lang_doc_rollcall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: per-language doc counts + the first 5
    doc ids as an array column. collect_list has no order guarantee in
    a distributed agg — sort_array after collection is the only
    deterministic form (the oracle's `list(... ORDER BY)` states the
    same contract)."""
    d = _docs2(spark, sf_dir)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 5),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("first_doc_ids"),
    )


def _docs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents")


@register(
    "events_asof_nearest",
    """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click'),
b AS (
    SELECT p.event_id, p.user_id, p.ts, p.value,
           cb.ts AS b_ts, cb.value AS b_value
    FROM p ASOF LEFT JOIN c cb
      ON p.user_id = cb.user_id AND p.ts >= cb.ts
),
f AS (
    SELECT p.event_id, cf.ts AS f_ts, cf.value AS f_value
    FROM p ASOF LEFT JOIN c cf
      ON p.user_id = cf.user_id AND p.ts <= cf.ts
)
SELECT b.event_id, b.user_id, b.ts, b.value,
       CASE WHEN f.f_ts IS NULL
                 OR (b.b_ts IS NOT NULL
                     AND epoch_us(b.ts) - epoch_us(b.b_ts)
                         <= epoch_us(f.f_ts) - epoch_us(b.ts))
            THEN b.b_ts ELSE f.f_ts END AS near_ts,
       CASE WHEN f.f_ts IS NULL
                 OR (b.b_ts IS NOT NULL
                     AND epoch_us(b.ts) - epoch_us(b.b_ts)
                         <= epoch_us(f.f_ts) - epoch_us(b.ts))
            THEN b.b_value ELSE f.f_value END AS near_value
FROM b JOIN f USING (event_id)
""",
    tags=("asof", "window"),
)
def q_events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: each purchase gets the closest
    click of the same user in EITHER direction (ties → backward) —
    polars' ``strategy="nearest"``, which neither Spark nor plain SQL
    has built-in. One union + one sort + two frames over the same
    per-key ordering (``operators/asof.py``): still exactly ONE
    shuffle, no range crossJoin, no Python. The oracle composes two
    native DuckDB ASOF joins (backward + forward) and picks the
    closer — an independent algorithm agreeing on every row."""
    from data_ingestion_py_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts_col="ts",
        payload_cols=["value"],
        direction="nearest",
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_ts").alias("near_ts"),
        F.col("asof_value").alias("near_value"),
    )


@register(
    "events_conversion_latency",
    """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click'),
m AS (
    SELECT strftime(p.ts AT TIME ZONE 'UTC', '%Y-%m-%d') AS day,
           CASE WHEN cb.ts IS NOT NULL
                THEN (epoch_us(p.ts) - epoch_us(cb.ts)) // 1000000
           END AS gap_s
    FROM p ASOF LEFT JOIN c cb
      ON p.user_id = cb.user_id AND p.ts >= cb.ts
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(gap_s) AS BIGINT) AS n_converted,
       round(quantile_cont(gap_s, 0.5), 6) AS p50_s,
       round(quantile_cont(gap_s, 0.95), 6) AS p95_s
FROM m GROUP BY day
""",
    tags=("asof", "funnel", "quantile"),
)
def q_events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency report: per purchase day, how long after
    their latest prior click users purchase — median and p95 of the
    gap in whole seconds (integer-floored before the quantile, so
    both engines interpolate over identical integers). Composes the
    as-of operator (one union-sort-carry shuffle, no range crossJoin)
    with per-group exact percentiles over the PURCHASE-sized rollup;
    at 100 TB the percentile swaps to approx_percentile with the same
    plan (documented in SCALE.md). Purchases with no prior click stay
    in ``n_purchases`` but out of the latency quantiles — funnel
    leakage is visible, not silently dropped."""
    from data_ingestion_py_spark.functions.time import ts_us
    from data_ingestion_py_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")
    j = asof_join(purchases, clicks, on=["user_id"], ts_col="ts")
    gap_s = F.when(
        F.col("asof_ts").isNotNull(),
        F.expr("(unix_micros(ts) - unix_micros(asof_ts)) div 1000000"),
    )
    return (
        j.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            gap_s.alias("gap_s"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.count("gap_s").cast("long").alias("n_converted"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("p50_s"),
            F.round(F.expr("percentile(gap_s, 0.95)"), 6).alias("p95_s"),
        )
    )
