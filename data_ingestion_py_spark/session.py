"""SparkSession factory with scale-appropriate defaults.

The local test/bench harness runs ``local[$SPARK_GRAFT_CPUS]``; the same
configuration (AQE, skew-join handling, broadcast threshold, UTC session
timezone for oracle parity) is what we would ship to a real cluster —
only memory/executor counts change there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for the 100 TB posture:
#: - AQE on: runtime coalescing of post-shuffle partitions + skew-join
#:   splitting replaces hand-tuned shuffle.partitions at every SF.
#: - autoBroadcastJoinThreshold 64m: the dimension tables (region,
#:   nation, supplier, categories) stay broadcast even at SF100k.
#: - maxPartitionBytes 128m: parquet scan tasks sized to fit executor
#:   memory with room for shuffle buffers.
#: - session timezone UTC: deterministic timestamp semantics matching
#:   the DuckDB oracle.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime bloom-filter pruning: a selective filter on one join side
    # injects a bloom filter into the other side's scan, cutting the
    # shuffled fact volume before the exchange. The payoff IS the
    # 100 TB case (fact >> filtered build side); local fixtures sit
    # under the default thresholds, so test_plans pins the injection
    # with thresholds lowered.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # Parquet µs timestamps with isAdjustedToUTC=false would otherwise be
    # inferred as TIMESTAMP_NTZ (Spark 4.x default), which breaks
    # unix_micros() and withWatermark(). With the session pinned to UTC
    # above, reading them as plain TIMESTAMP is value-identical to what
    # the DuckDB oracle sees (naive timestamps over the same bytes).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.shuffle.partitions": "64",
    # local[N] is ONE JVM doing driver + all N executor threads, so the
    # heap must cover N concurrent tasks' shuffle/broadcast buffers —
    # but the right size is host-specific (the bench box has 128 GiB;
    # a laptop doesn't), so it is an ENV OVERRIDE, not a baked default:
    # SPARK_GRAFT_DRIVER_MEM, default 4g. bench.py exports 48g for the
    # sf0.1×10 iter_slope probes (1g default heap OOMs there). The
    # setting is ignored anyway once a JVM/gateway exists. NOTE: the
    # env var is read in get_spark() at session-BUILD time, not here at
    # import time — otherwise any top-level library import that runs
    # before the caller sets the env var would silently freeze the 4g
    # default (bench.py only worked because its imports were deferred).
    "spark.ui.enabled": "false",
    "spark.driver.extraJavaOptions": "-Dio.netty.tryReflectionSetAccessible=true",
}


def get_spark(
    app_name: str = "data_ingestion_py_spark",
    master: str | None = None,
    **overrides: str,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so tests, bench, and the driver all agree.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.driver.memory"] = os.environ.get(
        "SPARK_GRAFT_DRIVER_MEM", "4g"
    )
    conf.update({k: str(v) for k, v in overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
