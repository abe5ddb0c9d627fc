"""Sketch-aggregate accuracy: the documented 100 TB swaps.

documents_profile / events_group_quantiles keep EXACT countDistinct /
percentile so the DuckDB oracle is exact; at scale those become
approx_count_distinct (HyperLogLog++) and approx_percentile (t-digest)
with the same plan shape. These tests pin the swap's accuracy contract
so "just flip to approx at 100 TB" stays an evidenced claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_rsd(spark):
    e = load_table(spark, SF_SMOKE, "events")
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) <= max(3 * 0.02 * row.exact, 1), row


def test_approx_percentile_close_to_exact(spark):
    e = load_table(spark, SF_SMOKE, "events")
    row = e.agg(
        F.expr("percentile(value, 0.95)").alias("exact"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("approx"),
    ).first()
    # accuracy=10000 → rank error ≤ n/10000; value gap must be tiny
    spread = e.agg((F.max("value") - F.min("value")).alias("s")).first().s
    assert abs(row.approx - row.exact) <= 0.01 * spread, row


def test_approx_count_distinct_same_plan_shape(spark):
    """The swap keeps one hash-agg pass — no extra exchange vs exact."""
    from data_ingestion_py_spark.plans import explain as E

    e = load_table(spark, SF_SMOKE, "events")
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("n")
    )
    assert E.num_exchanges(approx) == 1, E.executed_plan(approx)


# ---------------------------------------------------------------------------
# House HLL (md5 register algebra, functions/sketch.py)
# ---------------------------------------------------------------------------


def test_hll_rank_algebra_matches_bit_math(spark):
    """The string/CASE rank kernel equals the arithmetic definition
    (leading zeros of the 40-bit window + 1) computed independently in
    Python over real md5 hashes."""
    import hashlib

    from data_ingestion_py_spark.functions.sketch import (
        HLL_MAX_RANK,
        hll_rank,
        hll_register_index,
    )

    keys = [str(i) for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r.k: (r.reg, r.r)
        for r in df.select(
            "k",
            hll_register_index(F.md5("k")).alias("reg"),
            hll_rank(F.md5("k")).alias("r"),
        ).collect()
    }
    for k in keys:
        h = hashlib.md5(k.encode()).hexdigest()
        reg = int(h[:2], 16)
        w = int(h[2 : 2 + 10], 16)  # 40-bit window
        rank = HLL_MAX_RANK if w == 0 else 41 - w.bit_length()
        assert got[k] == (reg, rank), (k, h, got[k], (reg, rank))


def test_hll_rank_all_zero_window(spark):
    """A hand-built hex column with an all-zero window hits max rank."""
    from data_ingestion_py_spark.functions.sketch import (
        HLL_MAX_RANK,
        hll_rank,
    )

    df = spark.createDataFrame(
        [("ff" + "0" * 10 + "ab" * 10,), ("00" + "0" * 9 + "1" + "f" * 20,)],
        "h string",
    )
    rows = df.select(hll_rank(F.col("h")).alias("r")).collect()
    assert rows[0].r == HLL_MAX_RANK
    assert rows[1].r == 40  # 39 leading zero bits then a 1


def test_hll_registers_merge_by_max(spark):
    """Register tables of two halves, merged by per-register max, equal
    the whole's register table — the mergeability the rollup query and
    any streaming maintainer rely on."""
    from data_ingestion_py_spark.functions.sketch import hll_registers

    df = spark.range(5000).select(
        (F.col("id") % 2).alias("half"), F.col("id").cast("string").alias("k")
    )
    whole = {
        (r.reg): r.r
        for r in hll_registers(df, F.col("k"), []).collect()
    }
    halves = hll_registers(df, F.col("k"), ["half"])
    merged = {
        r.reg: r.r
        for r in halves.groupBy("reg").agg(F.max("r").alias("r")).collect()
    }
    assert merged == whole


def test_hll_estimate_within_error_band(spark):
    """Raw-path estimate lands inside ~3·(1.04/√256) ≈ 20% of truth for
    a cardinality well above the linear-counting range."""
    from data_ingestion_py_spark.functions.sketch import (
        hll_estimate_cols,
        hll_registers,
    )

    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    est = hll_estimate_cols(
        hll_registers(df, F.col("k"), []).withColumn("g", F.lit(1)), ["g"]
    ).first()
    assert abs(est.hll_estimate - n) / n < 0.20, est


def test_hll_linear_counting_small_cardinality(spark):
    """Tiny sets take the linear-counting branch and stay within ~15%
    (empty-register estimator is tight when V is large)."""
    from data_ingestion_py_spark.functions.sketch import (
        hll_estimate_cols,
        hll_registers,
    )

    n = 40
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    est = hll_estimate_cols(
        hll_registers(df, F.col("k"), []).withColumn("g", F.lit(1)), ["g"]
    ).first()
    assert abs(est.hll_estimate - n) / n < 0.15, est
