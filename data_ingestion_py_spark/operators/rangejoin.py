"""Range (non-equi) join, done scale-first.

Spark executes a bare inequality join as BroadcastNestedLoopJoin or a
cartesian product — O(n·m) and dead at 100 TB. The banded rewrite turns
a bounded-distance predicate into an equi-join:

    |a.ts - b.ts| <= g
    ⇒ bin(t) = floor(t / g); matching rows differ by at most one bin
    ⇒ expand one side to probe bins {bin-1, bin, bin+1}, equi-join on
      (key, bin), then apply the exact predicate.

Each true pair meets exactly once (the probed side's single bin hits
exactly one of the three probe bins), so no distinct pass is needed.
Physical shape: 3× expansion of one side, ONE shuffle on (key, bin),
exact filter in codegen. Bin width = the distance bound keeps the
false-candidate rate proportional to local density, never to n·m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_ingestion_py_spark.functions.time import ts_us


def time_proximity_pairs(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap_seconds: int = 300,
) -> DataFrame:
    """All (a, b) pairs with the same key, ``id_a < id_b``, and
    timestamps within ``max_gap_seconds`` of each other.

    Returns (key, id_a, id_b, gap_us) with the exact microsecond gap —
    integer arithmetic end-to-end, no float drift.
    """
    gap_us = max_gap_seconds * 1_000_000
    binned = events.select(
        F.col(key),
        F.col(id_col),
        ts_us(ts_col).alias("_us"),
        F.floor(ts_us(ts_col) / gap_us).alias("_bin"),
    )
    probe = binned.select(
        F.col(key),
        F.col(id_col).alias("id_a"),
        F.col("_us").alias("us_a"),
        F.explode(
            F.array(F.col("_bin") - 1, F.col("_bin"), F.col("_bin") + 1)
        ).alias("_bin"),
    )
    build = binned.select(
        F.col(key),
        F.col(id_col).alias("id_b"),
        F.col("_us").alias("us_b"),
        F.col("_bin"),
    )
    return (
        probe.join(build, [key, "_bin"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= gap_us)
        )
        .select(
            key,
            "id_a",
            "id_b",
            F.abs(F.col("us_a") - F.col("us_b")).alias("gap_us"),
        )
    )
