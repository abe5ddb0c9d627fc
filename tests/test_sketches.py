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
