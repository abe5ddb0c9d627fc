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
    direction: str = "backward",
) -> DataFrame:
    """As-of join in a chosen ``direction``:

    - ``"backward"`` (default): latest right row at-or-BEFORE each
      left ts — the standard ASOF JOIN.
    - ``"forward"``: earliest right row at-or-AFTER each left ts
      (polars/kdb ``strategy="forward"``; Spark has no built-in).
    - ``"nearest"``: the closer of the two, ties → backward. One
      union + TWO frames over the same sort — still one shuffle.

    ``payload_cols`` are the right-side columns to carry (each emitted
    as ``{prefix}{col}``, plus ``{prefix}{ts_col}`` for the matched
    timestamp); unmatched left rows get nulls. Left columns pass
    through unchanged. All directions keep the union-sort-carry shape:
    one shuffle on the key, per-partition sort, zero Python.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    on = list(on)
    carried = [ts_col, *payload_cols]

    # side ordering controls tie semantics at equal ts: the right row
    # must sort on the INCLUSIVE side of the left row for the primary
    # direction (backward/nearest: right first → right_ts <= left_ts
    # inclusive; forward: left first → right_ts >= left_ts inclusive).
    left_side = 0 if direction == "forward" else 1
    lhs = left.select(
        *on,
        F.col(ts_col),
        F.lit(left_side).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carried],
        *[F.col(c) for c in left.columns if c not in on and c != ts_col],
    )
    rhs = right.select(
        *on,
        F.col(ts_col),
        F.lit(1 - left_side).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c != ts_col
        ],
    )
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    w_back = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    unioned = lhs.unionByName(rhs)
    if direction == "backward":
        for c in carried:
            unioned = unioned.withColumn(
                f"{prefix}{c}", F.last(f"_r_{c}", ignorenulls=True).over(w_back)
            )
    elif direction == "forward":
        for c in carried:
            unioned = unioned.withColumn(
                f"{prefix}{c}", F.first(f"_r_{c}", ignorenulls=True).over(w_fwd)
            )
    else:  # nearest: both carries over ONE sort, pick the closer match.
        # Equal-ts rights sort before the left row here, so the forward
        # frame is exclusive at ties — harmless: the backward carry
        # already holds the equal-ts match and wins the tie by rule.
        for c in carried:
            unioned = unioned.withColumn(
                f"_b_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w_back)
            ).withColumn(
                f"_f_{c}", F.first(f"_r_{c}", ignorenulls=True).over(w_fwd)
            )
        d_back = F.unix_micros(F.col(ts_col)) - F.unix_micros(
            F.col(f"_b_{ts_col}")
        )
        d_fwd = F.unix_micros(F.col(f"_f_{ts_col}")) - F.unix_micros(
            F.col(ts_col)
        )
        pick_back = F.col(f"_f_{ts_col}").isNull() | (
            F.col(f"_b_{ts_col}").isNotNull() & (d_back <= d_fwd)
        )
        for c in carried:
            unioned = unioned.withColumn(
                f"{prefix}{c}",
                F.when(pick_back, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}")),
            )
        unioned = unioned.drop(
            *[f"_b_{c}" for c in carried], *[f"_f_{c}" for c in carried]
        )
    return unioned.where(F.col("_side") == left_side).drop(
        "_side", *[f"_r_{c}" for c in carried]
    )
