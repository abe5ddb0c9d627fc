"""Product/behavioral analytics: RFM segmentation, YoY growth, funnel
conversion, retention cohorts.

The reference's query surface stops at lookups and scans
(data_ingestion.py:306-330); these are the standard warehouse analytics
any engine replacing it must serve. All patterns are shuffle-on-the-
natural-key aggregations (customer, user, year) plus tiny window passes
— the shapes that survive a 100× scale-up unchanged because the heavy
table shuffles exactly once per stage and dimension passes stay
broadcast-sized.

Parity discipline: money sums go through DECIMAL(18,2) before any
arithmetic (partial-agg order must not flip doubles), dates are emitted
as strings (DATE objects hash differently across engines' pandas
bridges), and every window that feeds ntile/lag carries a unique
tie-break column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.queries import register


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


@register(
    "customer_rfm_segments",
    """
WITH rfm AS (
    SELECT o_custkey AS c_custkey,
           max(o_orderdate) AS last_order,
           count(*) AS n_orders,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
    FROM orders GROUP BY o_custkey
), scored AS (
    SELECT c_custkey, n_orders,
           CAST(monetary AS DOUBLE) AS monetary_total,
           ntile(4) OVER (ORDER BY last_order, c_custkey) AS r_score,
           ntile(4) OVER (ORDER BY n_orders, c_custkey) AS f_score,
           ntile(4) OVER (ORDER BY monetary, c_custkey) AS m_score
    FROM rfm
)
SELECT c_custkey, CAST(n_orders AS BIGINT) AS n_orders, monetary_total,
       r_score, f_score, m_score,
       r_score || '-' || f_score || '-' || m_score AS segment
FROM scored
""",
    tags=("analytics", "rfm"),
    bench=True,
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation: one
    shuffle on custkey for the base aggregate, then three EXACT ntile
    passes over the customer-sized table — each via the two-phase
    global rank (``operators/ranking.py``: range-partition → tiny
    offsets broadcast → local window), so nothing single-partitions at
    any scale. ``ntile_expr`` reproduces SQL NTILE(4) bit-exactly from
    (rank, total), which keeps the DuckDB window-function oracle
    unchanged. Every order carries a custkey tie-break so quartile
    edges are engine-deterministic; monetary sums in DECIMAL so
    partial-agg order cannot flip cents."""
    from data_ingestion_py_spark.operators.ranking import (
        ntile_expr,
        with_global_rank,
    )

    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    for key, score in (
        ("last_order", "r_score"),
        ("n_orders", "f_score"),
        ("monetary", "m_score"),
    ):
        rfm = with_global_rank(
            rfm,
            [F.asc(key), F.asc("c_custkey")],
            rank_col="_rnk",
            total_col="_tot",
        )
        rfm = rfm.withColumn(
            score, ntile_expr(F.col("_rnk"), F.col("_tot"), 4)
        ).drop("_rnk", "_tot")
    scored = rfm.select(
        "c_custkey",
        "n_orders",
        F.col("monetary").cast("double").alias("monetary_total"),
        "r_score",
        "f_score",
        "m_score",
    )
    return scored.select(
        "c_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        "monetary_total",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "-", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    )


# ---------------------------------------------------------------------------
# Year-over-year revenue growth
# ---------------------------------------------------------------------------


@register(
    "orders_yoy_revenue",
    """
WITH yearly AS (
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY 1
)
SELECT order_year,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev - lag(rev) OVER (ORDER BY order_year) AS DOUBLE)
           AS yoy_delta
FROM yearly
""",
    tags=("analytics", "window"),
)
def q_orders_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue delta: one rollup to year grain, then a
    lag window over the handful of year rows. The delta stays in
    DECIMAL until the final cast — subtracting two rounded doubles
    would reintroduce representation drift. At scale the window costs
    nothing (it runs on the aggregate, rows = distinct years)."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("order_year")
    return yearly.select(
        "order_year",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - F.lag("rev").over(w))
        .cast("double")
        .alias("yoy_delta"),
    )


# ---------------------------------------------------------------------------
# Funnel conversion (view -> click -> purchase, strictly ordered)
# ---------------------------------------------------------------------------


@register(
    "events_funnel_conversion",
    """
WITH v AS (
    SELECT user_id, min(ts) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked_after,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased_after
""",
    tags=("analytics", "funnel"),
)
def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: first view, first click AFTER that
    view, first purchase AFTER that click — per user, then counts per
    stage. Three aggregations all keyed on user_id: the event table
    shuffles once and the later stages join stage outputs (user-sized,
    far smaller than events) back on the same key, so AQE keeps the
    exchange reuse. The strict inequality makes same-timestamp races
    non-events on both engines."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.join(v, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_viewed"))
        .crossJoin(
            F.broadcast(
                c.agg(
                    F.count(F.lit(1)).cast("long").alias("n_clicked_after")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                p.agg(
                    F.count(F.lit(1))
                    .cast("long")
                    .alias("n_purchased_after")
                )
            )
        )
    )


# ---------------------------------------------------------------------------
# Retention cohorts
# ---------------------------------------------------------------------------


@register(
    "events_retention_cohorts",
    """
WITH firsts AS (
    SELECT user_id,
           CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           CAST(date_trunc('week', e.ts) AS DATE) AS active_week
    FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week,
       CAST(datediff('day', cohort_week, active_week) / 7 AS INT)
           AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM activity GROUP BY cohort_week, week_offset
""",
    tags=("analytics", "retention"),
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: users bucketed by first-activity week
    (cohort), counted in each later week they were active. Two
    aggregations on user_id plus one on the (cohort, offset) pair —
    the distinct collapses the event table to user-week grain early,
    which is what keeps the final shuffle small at 100 TB. ISO Monday
    week-start on both engines; weeks emitted as strings (DATE objects
    round-trip differently through the two pandas bridges)."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).cast("date").alias("active_week"),
        )
        .distinct()
    )
    return (
        activity.select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# CUBE aggregation + unpivot (melt)
# ---------------------------------------------------------------------------


@register(
    "events_cube_day_type",
    """
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY CUBE (CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR),
               event_type)
""",
    tags=("analytics", "cube"),
)
def q_events_cube_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (day, event_type): all four grouping combinations —
    per-cell, per-day, per-type, grand total — in ONE Expand+HashAgg
    pass instead of four scans. The Expand multiplies rows 4× before
    the aggregate, which is the deliberate trade: one shuffle, partial
    aggregation applies, and AQE coalesces the skewed null-group
    partitions."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", F.col("ts"))
            .cast("date")
            .cast("string")
            .alias("day"),
            "event_type",
        )
        .cube("day", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "lineitem_unpivot_metrics",
    """
WITH agg AS (
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS disc
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty' AS metric, qty AS val FROM agg
UNION ALL
SELECT l_returnflag, 'price', price FROM agg
UNION ALL
SELECT l_returnflag, 'disc', disc FROM agg
""",
    tags=("analytics", "unpivot"),
)
def q_lineitem_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-flag aggregate → long (flag, metric,
    value) rows via the native unpivot operator (one Expand pass, the
    inverse of events_pivot_by_type). Sums travel as DECIMAL and only
    the final value is cast — the metric column stays engine-stable."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("price"),
        F.sum(F.col("l_discount").cast("decimal(18,4)"))
        .cast("double")
        .alias("disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "disc"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Gaps and islands + Pareto analysis
# ---------------------------------------------------------------------------


@register(
    "events_activity_islands",
    """
WITH days AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
    FROM events
), grp AS (
    SELECT user_id, d,
           d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INT) AS g
    FROM days
)
SELECT user_id, CAST(min(d) AS VARCHAR) AS island_start,
       CAST(max(d) AS VARCHAR) AS island_end,
       CAST(count(*) AS INT) AS island_days
FROM grp GROUP BY user_id, g
""",
    tags=("analytics", "islands"),
)
def q_events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per
    user via the date-minus-row_number trick (consecutive dates share
    the group key). The distinct collapses events to user-day grain
    first, so the window runs on ~users×days rows, partitioned by user
    — no global sort, one shuffle on user_id. Dates leave as strings
    for the pandas-bridge reason documented module-wide."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub(
            F.col("d"), F.row_number().over(w)
        ).alias("g"),
    )
    return grp.groupBy("user_id", "g").agg(
        F.min("d").cast("string").alias("island_start"),
        F.max("d").cast("string").alias("island_end"),
        F.count(F.lit(1)).cast("int").alias("island_days"),
    ).drop("g")


@register(
    "orders_pareto_revenue",
    """
WITH by_cust AS (
    SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY o_custkey
), ranked AS (
    SELECT o_custkey,
           CAST(rev AS DOUBLE) AS revenue,
           row_number() OVER (ORDER BY rev DESC, o_custkey) AS rnk,
           CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM by_cust
)
SELECT o_custkey, revenue, rnk, cum_revenue
FROM ranked WHERE rnk <= 100
""",
    tags=("analytics", "pareto"),
    bench=True,
)
def q_orders_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration: customers ranked by revenue with a
    running cumulative total, top 100. Rank AND running sum come from
    one two-phase global-rank pass (``operators/ranking.py``) over the
    customer aggregate — range-partition on (rev desc, custkey), tiny
    offsets broadcast, local window — so the running sum never
    single-partitions. The cumulative sum stays DECIMAL until the final
    cast, so partial ordering can never flip cents; the rank<=100 cut
    means only the head of the distribution ever leaves the cluster."""
    from data_ingestion_py_spark.operators.ranking import with_global_rank

    o = load_table(spark, sf_dir, "orders")
    by_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    ranked = with_global_rank(
        by_cust,
        [F.desc("rev"), F.asc("o_custkey")],
        rank_col="rnk",
        cumsum={"cum_rev": F.col("rev")},
    )
    return ranked.where(F.col("rnk") <= 100).select(
        "o_custkey",
        F.col("rev").cast("double").alias("revenue"),
        "rnk",
        F.col("cum_rev").cast("double").alias("cum_revenue"),
    )


@register(
    "events_type_transitions",
    """
WITH ordered AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM ordered WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
    tags=("analytics", "markov"),
)
def q_events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences
    (the Markov-chain / session-bigram shape): lag window partitioned
    by user with a (ts, event_id) tie-break, then one count rollup on
    the 5x5 type pairs. The event table shuffles once on user_id for
    the window; the final aggregate is tiny. Same construction as
    token-bigram counting, applied to behavioral sequences."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        ordered.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


# ---------------------------------------------------------------------------
# Exact quantiles, distributed (two-phase rank — no single-partition sort)
# ---------------------------------------------------------------------------

_QUANTILES = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
              ("p90", 9, 10), ("p99", 99, 100))


def _quantile_oracle() -> str:
    aggs, outs = [], []
    for label, num, den in _QUANTILES:
        lo = f"((n - 1) * {num}) // {den} + 1"
        rem = f"((n - 1) * {num}) % {den}"
        aggs.append(
            f"max(CASE WHEN rnk = {lo} THEN v END) AS lo_{label},\n"
            f"    max(CASE WHEN rnk = {lo} + 1 THEN v END) AS hi_{label},\n"
            f"    max({rem}) AS rem_{label}"
        )
        outs.append(
            f"round(lo_{label} + rem_{label} * "
            f"(coalesce(hi_{label}, lo_{label}) - lo_{label}) / {den}, 4)"
            f" AS {label}"
        )
    return f"""
WITH ranked AS (
    SELECT o_totalprice AS v,
           row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
           count(*) OVER () AS n
    FROM orders
), agg AS (
    SELECT {', '.join(aggs)}
    FROM ranked
)
SELECT {', '.join(outs)} FROM agg
"""


@register(
    "orders_exact_quantiles",
    _quantile_oracle(),
    tags=("analytics", "quantile"),
    bench=True,
)
def q_orders_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p25/p50/p75/p90/p99 of order totals, computed distributed:
    the two-phase global rank (``operators/ranking.py``) assigns every
    row its position without a single-partition sort, then one
    aggregation picks the two straddling ranks per percentile and
    interpolates (quantile_cont semantics). All rank arithmetic is
    INTEGER (h = (n-1)·num/den as div + mod), so no float h can round
    differently across engines — the one place naive exact-percentile
    implementations drift. This is the scale path ``F.percentile``
    (which collects each group into one task's memory) cannot take;
    the DuckDB oracle replays the identical integer interpolation over
    a naive global window."""
    from data_ingestion_py_spark.operators.ranking import with_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"), "o_orderkey"
    )
    ranked = with_global_rank(
        o,
        [F.asc("v"), F.asc("o_orderkey")],
        rank_col="rnk",
        total_col="n",
    )
    aggs = []
    for label, num, den in _QUANTILES:
        lo = F.expr(f"((n - 1) * {num}) div {den} + 1")
        aggs += [
            F.max(F.when(F.col("rnk") == lo, F.col("v"))).alias(f"_lo_{label}"),
            F.max(F.when(F.col("rnk") == lo + 1, F.col("v"))).alias(
                f"_hi_{label}"
            ),
            F.max(F.expr(f"((n - 1) * {num}) % {den}")).alias(f"_rem_{label}"),
        ]
    agg = ranked.agg(*aggs)
    outs = [
        F.round(
            F.col(f"_lo_{label}")
            + F.col(f"_rem_{label}")
            * (F.coalesce(F.col(f"_hi_{label}"), F.col(f"_lo_{label}"))
               - F.col(f"_lo_{label}"))
            / den,
            4,
        ).alias(label)
        for label, num, den in _QUANTILES
    ]
    return agg.select(*outs)


@register(
    "customer_quantile_normalize",
    """
WITH c AS (
    SELECT c_custkey, c_mktsegment,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
    FROM customer
)
SELECT c_custkey, c_mktsegment,
       round(bal_c / 100.0, 2) AS acctbal,
       round(percent_rank() OVER (PARTITION BY c_mktsegment
                                  ORDER BY bal_c, c_custkey), 6) AS pctile
FROM c
""",
    tags=("analytics", "feature-prep"),
)
def q_customer_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile transform (feature prep): each customer's
    account balance → its percentile WITHIN its market segment —
    uniform-margin normalization for downstream models. The scale
    point: NO per-segment window. A partitioned window with 5 segment
    keys means 5 corpus-sized tasks (low-cardinality partition skew);
    instead ONE two-phase global rank over the total order (segment,
    balance, custkey) (`operators/ranking.py` — range shuffle +
    offset broadcast) and per-segment offsets (a 5-row broadcast)
    convert the global rank into the within-segment percent_rank
    arithmetically. Ties are impossible (custkey tiebreak), so
    rank ≡ row_number and the percent_rank identity (r-1)/(n-1) is
    exact integer arithmetic before one final rounded division."""
    from data_ingestion_py_spark.operators.ranking import with_global_rank

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    ranked = with_global_rank(
        c,
        order_by=[F.col("c_mktsegment"), F.col("bal_c"), F.col("c_custkey")],
        rank_col="rnk",
    )
    seg = ranked.groupBy("c_mktsegment").agg(
        F.min("rnk").alias("off"), F.count(F.lit(1)).alias("n")
    )
    r = F.col("rnk") - F.col("off")  # 0-based within-segment rank
    return ranked.join(F.broadcast(seg), "c_mktsegment").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("bal_c") / 100.0, 2).alias("acctbal"),
        F.round(r / (F.col("n") - 1), 6).alias("pctile"),
    )


@register(
    "customer_decile_gains",
    """
WITH rev AS (
    SELECT c.c_custkey,
           coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
               AS rev_c
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1
), ranked AS (
    SELECT rev_c,
           ntile(10) OVER (ORDER BY rev_c DESC, c_custkey) AS decile
    FROM rev
), d AS (
    SELECT decile, count(*) AS n_customers, sum(rev_c) AS dec_rev
    FROM ranked GROUP BY decile
), t AS (SELECT sum(dec_rev) AS tot FROM d)
SELECT CAST(d.decile AS INT) AS decile,
       CAST(d.n_customers AS BIGINT) AS n_customers,
       round(d.dec_rev / 100.0, 2) AS decile_revenue,
       round(CAST(sum(d.dec_rev) OVER (ORDER BY d.decile
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t.tot, 6)
           AS cum_revenue_share
FROM d, t
""",
    tags=("analytics", "gains"),
)
def q_customer_decile_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains table: customers ranked by lifetime revenue, split
    into 10 equal-count buckets, each bucket's revenue and the
    cumulative share — the lift/gains curve every scoring-model
    evaluation reads (top decile carrying ~x% of revenue is the
    targeting headline). Exact SQL NTILE from the two-phase global
    rank (``ranking.ntile_expr`` — no single-partition window over
    the customer table; the only unpartitioned windows run over the
    10-row decile rollup). Revenue in integer cents end-to-end; the
    1-row total broadcasts into the share division."""
    from data_ingestion_py_spark.operators.ranking import (
        ntile_expr,
        with_global_rank,
    )

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                F.lit(0),
            ).alias("rev_c")
        )
    )
    ranked = with_global_rank(
        rev,
        order_by=[F.col("rev_c").desc(), F.col("c_custkey")],
        rank_col="rnk",
        total_col="tot_n",
    )
    d = (
        ranked.withColumn(
            "decile", ntile_expr(F.col("rnk"), F.col("tot_n"), 10)
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("rev_c").alias("dec_rev"),
        )
    )
    t = d.agg(F.sum("dec_rev").alias("tot"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return d.crossJoin(F.broadcast(t)).select(
        F.col("decile").cast("int").alias("decile"),
        "n_customers",
        F.round(F.col("dec_rev") / 100.0, 2).alias("decile_revenue"),
        F.round(
            F.sum("dec_rev").over(w).cast("double") / F.col("tot"), 6
        ).alias("cum_revenue_share"),
    )
