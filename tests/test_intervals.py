"""Unit semantics for operators/intervals.merge_intervals."""

from __future__ import annotations

from pyspark.sql import Row

from data_ingestion_py_spark.operators.intervals import merge_intervals


def _merge(spark, rows, gap=0):
    df = spark.createDataFrame(
        [Row(k=k, start=s, end=e) for k, s, e in rows]
    )
    out = merge_intervals(df, ["k"], merge_gap=gap)
    return sorted(
        (r.k, r.start, r.end, r.n_merged) for r in out.collect()
    )


def test_overlap_touch_and_gap(spark):
    rows = [("a", 1, 5), ("a", 4, 8), ("a", 9, 10), ("a", 15, 20)]
    # [1,5]+[4,8] overlap; [9,10] TOUCHES coverage end 8 (end-inclusive,
    # gap 0 → merges); [15,20] is separate
    assert _merge(spark, rows) == [("a", 1, 10, 3), ("a", 15, 20, 1)]


def test_nested_interval_does_not_split_coverage(spark):
    # [2,3] nests inside [1,10]; the naive prev-row-end test would see
    # [12,13] vs prev end 3 and wrongly merge — running max(end) must
    # keep coverage at 10 and still split before 12
    rows = [("a", 1, 10), ("a", 2, 3), ("a", 12, 13)]
    assert _merge(spark, rows) == [("a", 1, 10, 2), ("a", 12, 13, 1)]


def test_merge_gap_bridges_small_holes(spark):
    rows = [("a", 1, 2), ("a", 6, 7)]
    assert _merge(spark, rows, gap=0) == [("a", 1, 2, 1), ("a", 6, 7, 1)]
    assert _merge(spark, rows, gap=3) == [("a", 1, 7, 2)]


def test_keys_are_independent(spark):
    rows = [("a", 1, 5), ("b", 4, 8)]
    assert _merge(spark, rows) == [("a", 1, 5, 1), ("b", 4, 8, 1)]
