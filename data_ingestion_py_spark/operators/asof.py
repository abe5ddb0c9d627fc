"""As-of (point-in-time) join — the time-series staple Spark lacks as a
built-in, done scale-first.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key. The naive formulations are
a range ``crossJoin`` (O(n·m) — dead at scale) or a per-key
``applyInPandas`` (Python in the hot path). This implementation is the
union-sort-carry trick instead:

1. union both sides with a ``side`` tag (right=0, left=1) and the
   right-side payload nulled on left rows;
2. one window per key ordered by (ts, side):
   ``last(payload, ignorenulls=True)`` carries the latest right payload
   forward onto every subsequent row;
3. keep left rows only.

Physical shape: ONE shuffle on the key (the same partitioning the
window needs), a per-partition sort, zero Python — identical asymptotics
to a sort-merge join. Skewed keys split via AQE; at 100 TB pre-bucket
both inputs by key and the exchange disappears entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    payload_cols: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join (latest right row at-or-before each left ts).

    ``payload_cols`` are the right-side columns to carry (each emitted
    as ``{prefix}{col}``, plus ``{prefix}{ts_col}`` for the matched
    timestamp); unmatched left rows get nulls. Left columns pass
    through unchanged.
    """
    on = list(on)
    carried = [ts_col, *payload_cols]

    lhs = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carried],
        *[F.col(c) for c in left.columns if c not in on and c != ts_col],
    )
    rhs = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c != ts_col
        ],
    )
    # right sorts before left at equal ts → the match is inclusive
    # (right_ts <= left_ts), mirroring standard ASOF JOIN semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lhs.unionByName(rhs)
    for c in carried:
        unioned = unioned.withColumn(
            f"{prefix}{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return unioned.where(F.col("_side") == 1).drop(
        "_side", *[f"_r_{c}" for c in carried]
    )
