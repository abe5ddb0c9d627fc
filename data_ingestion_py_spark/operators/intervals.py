"""Interval merging — union of possibly-overlapping/nested ranges per key.

The gaps-and-islands generalization behind coverage analysis (when was
this entity active), retention windows, outage stitching, and the
substring-cut merge (queries_linkage.corpus_substring_cuts inlines the
fixed-length special case where a running max is unnecessary). This
operator handles the general case: intervals may OVERLAP, NEST, or
touch, so island detection needs the running maximum of *end* over all
earlier intervals, not just the previous row's end.

Intervals are integer (start, end) pairs, end inclusive — callers map
their domain in (epoch days/micros, token positions) and back out.
Everything is per-key windows (partitioned, never global) + one keyed
rollup; deterministic integer arithmetic end to end.

Reference contrast: egorji/data_ingestion.py has no interval logic at
all; its closest analog is the expiry sweep's single-date compare
(:483-506).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_intervals(
    df: DataFrame,
    keys: list[str],
    start: str = "start",
    end: str = "end",
    merge_gap: int = 0,
) -> DataFrame:
    """(keys..., start, end, n_merged) — maximal merged intervals.

    Two intervals merge when the next one starts within ``merge_gap``
    of the running coverage end: ``next.start <= max_prev_end +
    merge_gap + 1`` (end-inclusive semantics, so touching intervals
    merge at gap 0). Nested intervals collapse correctly because the
    island test uses the running MAX of end, not the previous row's
    end."""
    w_order = Window.partitionBy(*keys).orderBy(start, end)
    prev_max_end: Column = F.max(end).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        F.col(start) > prev_max_end + merge_gap + 1
    )  # end-inclusive: start == prev_end+1 is contiguous coverage.
    # NULL prev (first row) → NULL → coalesce to True
    flagged = df.withColumn(
        "_new", F.coalesce(new_island, F.lit(True)).cast("int")
    )
    islands = flagged.withColumn(
        "_isl",
        F.sum("_new").over(
            w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy(*keys, "_isl")
        .agg(
            F.min(start).alias(start),
            F.max(end).alias(end),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_isl")
    )
