"""Contiguous sequence packing: assign ordered items to fixed token
budgets by cumulative offset (GPT-style concat-and-chunk).

The defining constraint is that pack assignment depends on a GLOBAL
running sum over the ordered corpus — the naive plan is one
unpartitioned window holding every row. This operator implements the
scalable two-phase form instead: per-range partial sums produce a tiny
offsets table (rows = number of ranges) that broadcasts back, and the
running sum completes inside each range independently. The big table
never single-partitions; the only global pass runs on the range
aggregate.

Used by the ``corpus_pack_sequences`` registry query (whose DuckDB
oracle recomputes the naive global window — different algorithm, same
answer) and property-tested against a clean-room Python model in
``tests/test_packing.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def with_pack_ids(
    items: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    n_col: str = "n",
    range_size: int | None = None,
) -> DataFrame:
    """items(id, n) → items + cum_before + pack_id.

    ``cum_before`` is the sum of ``n`` over all rows with a smaller id;
    ``pack_id = floor(cum_before / budget)`` — an item belongs to the
    pack its offset starts in (items may straddle pack boundaries).
    ``range_size`` controls the two-phase split: ranges = id div
    range_size; the offsets table has one row per range and broadcasts.
    By default it is DERIVED so the offsets table stays O(√n) at any
    corpus size (a fixed value is an 8M-row broadcast at 1e9 docs): one
    cheap (count, min, max) pass sizes the ranges as id-span / √n. Pass
    an explicit ``range_size`` to skip that pass when the caller
    already knows the corpus shape.

    Fault-tolerance tradeoff of the derived path: the lazy
    ``localCheckpoint`` below truncates lineage and its blocks are
    unreplicated — an executor lost after the sizing agg materializes
    them fails the job with no recompute path, and the blocks stay
    pinned for the returned DataFrame's lifetime (repeated builds in a
    loop accumulate storage until GC). On very large or preemptible
    deployments pass an explicit ``range_size`` — that path has no
    checkpoint at all.
    """
    idc: Column = F.col(id_col)
    if range_size is None:
        # the sizing agg is an extra action over the full items lineage
        # (for corpus_pack_sequences that would be a second scan+tokenize
        # pass) — a lazy localCheckpoint materializes once at the agg and
        # the main plan below reuses the same blocks
        items = items.localCheckpoint(eager=False)
        n, lo, hi = items.agg(
            F.count(F.lit(1)), F.min(idc), F.max(idc)
        ).first()
        span = (hi - lo + 1) if n else 1
        range_size = max(1, math.ceil(span / max(1, math.isqrt(n or 1))))
    base = items.withColumn("_range_id", F.floor(idc / range_size))
    range_totals = base.groupBy("_range_id").agg(
        F.sum(n_col).alias("_range_n")
    )
    w_ranges = Window.orderBy("_range_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = range_totals.select(
        "_range_id",
        F.coalesce(F.sum("_range_n").over(w_ranges), F.lit(0)).alias(
            "_offset"
        ),
    )
    w_in_range = (
        Window.partitionBy("_range_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offsets), "_range_id")
        .withColumn(
            "cum_before",
            F.col("_offset")
            + F.coalesce(F.sum(n_col).over(w_in_range), F.lit(0)),
        )
        .withColumn(
            "pack_id",
            F.floor(F.col("cum_before") / budget).cast("long"),
        )
        .drop("_range_id", "_range_n", "_offset")
    )
