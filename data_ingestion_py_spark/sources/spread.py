"""Input rebalance for CPU-bound Arrow kernel stages.

The decode/walk kernels (PDF parse, OCR-lite, JPEG/JPX/JBIG2/H.264
decode, shard-manifest walks) are embarrassingly parallel per item —
but only across however many partitions the input arrives in. A corpus
that arrives as a few fat files (the sf fixtures are ONE parquet file →
a 1–2-task scan) funnels the whole kernel stage onto 1–2 cores while
the other 30 idle: measured r15, ``pdf_jpx_scanned_digits`` ran its
entire 5,000-document EBCOT decode on ONE task, 103 s where 32-way
spread costs ~4 s (guide §2.5 "input skew — one huge unsplittable
file: repartition immediately after the read"; same rationale as the
signature-stage rebalance in ``operators/dedup.minhash_signatures``).

``spread_for_kernel`` rebalances ONLY when the input is
under-partitioned relative to the cluster — a multi-file corpus that
already spans the cluster (the 100 TB case) must not pay a gratuitous
full shuffle of payload bytes, so there the helper is an exact no-op
and the wrappers stay narrow. The check is scale-adaptive
(``defaultParallelism``), not a tuned constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_kernel(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` to the cluster's parallelism when (and only
    when) it arrives with fewer partitions — call with the PROJECTED
    input of an Arrow kernel stage so the exchange, when it happens at
    all, carries only the columns the kernel needs (guide §2.3).
    Streaming DataFrames pass through untouched (no ``.rdd`` on a
    streaming plan; foreachBatch hands the walkers plain batch
    DataFrames, which do get spread).

    The width probe must not run jobs at plan-BUILD time: under AQE,
    ``df.rdd`` on a plan that already contains an Exchange eagerly
    materializes every upstream shuffle stage as a real job (advisor,
    r15 — chained wrapped kernels paid the inner spread's payload
    shuffle once for the probe and again at action time, and even
    ``.explain()`` triggered jobs). So when the physical plan already
    carries an Exchange the helper skips entirely — a shuffle already
    (re)distributes this input across the cluster, so a second
    round-robin would be a gratuitous extra pass over the payload
    anyway. Exchange-free plans (scan → project → optional Python
    stage) build their RDD lazily, so the probe is job-free there."""
    if df.isStreaming:
        return df
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        # BroadcastExchange does NOT redistribute the stream side (and
        # its probe cost is only the small build), so only a real
        # shuffle exchange skips the spread.
        if "Exchange" in plan.replace("BroadcastExchange", ""):
            return df
    except Exception:  # noqa: BLE001 — probe guard is advisory
        pass
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
