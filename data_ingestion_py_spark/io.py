"""Table loaders / writers for the engine.

The driver-generated star schema lives as one parquet file per table
under ``/root/testdata/sf{0.001,0.01,0.1}/`` (see TESTDATA.md). At
cluster scale the same API points at partitioned parquet/Delta
directories; Catalyst pushes filters and prunes columns into the scan
either way (reference contrast: ``data_ingestion.py:306-311`` fetches
entire collections then filters client-side).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's reader rejects
    them outright (PARQUET_TYPE_ILLEGAL), so they need the nanosAsLong
    legacy path + an explicit restore to TimestampType."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain parquet scan → full pushdown/pruning.

    Nano-precision timestamp columns (e.g. ``events.ts``) are read as
    long via ``spark.sql.legacy.parquet.nanosAsLong`` and restored to
    microsecond timestamps (the fixtures carry no sub-microsecond data,
    so this is lossless and matches the DuckDB oracle exactly).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nano_cols = _nano_ts_columns(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        from pyspark.sql import functions as F

        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Belt-and-braces for sessions built outside get_spark() (which pins
    # inferTimestampNTZ=false): normalize any TIMESTAMP_NTZ column to
    # plain TIMESTAMP so unix_micros()/withWatermark() work downstream.
    # The session timezone is UTC, so the cast is value-preserving and
    # matches the DuckDB oracle's naive-timestamp reading byte-for-byte.
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz_cols:
        # The NTZ→TIMESTAMP cast is value-preserving ONLY under a UTC
        # session timezone; this path exists precisely for sessions
        # built outside get_spark() (which pins UTC), so pin it here
        # too rather than silently shifting values under a local zone.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            import warnings

            warnings.warn(
                f"load_table: session timezone {tz!r} would shift "
                f"TIMESTAMP_NTZ columns {ntz_cols} during the cast; "
                "setting spark.sql.session.timeZone=UTC to keep values "
                "oracle-identical",
                stacklevel=2,
            )
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load several tables as a dict (lazy DataFrames; nothing is read yet)."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a serving table, partitioned for pruning at scale.

    E.g. the flat snippets table partitions by (category/source) so a
    per-category cascade delete (reference ``omit_category``,
    data_ingestion.py:344-363) is a partition drop, not a full rewrite.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    out_path: str | None = None,
) -> None:
    """Compact a small-file-fragmented parquet dataset to
    ``target_files`` files (streaming sinks and per-batch appends
    fragment tables; scan cost at 100 TB is dominated by file count
    once files drop below ~128 MB).

    ``coalesce`` (no shuffle) when reducing, ``repartition`` when
    growing. Writes to ``out_path`` (default: in-place via a temp
    subdir swap is intentionally NOT done here — at scale compaction
    writes a new snapshot and swaps a table pointer atomically).
    """
    df = spark.read.parquet(path)
    n_now = df.rdd.getNumPartitions()
    out = out_path or (path.rstrip("/") + "_compacted")
    if target_files < n_now:
        df.coalesce(target_files).write.mode("overwrite").parquet(out)
    else:
        df.repartition(target_files).write.mode("overwrite").parquet(out)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Write a catalog table hash-bucketed (and per-file sorted) on the
    join key — the shuffle-elimination layout for repeated big joins.

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT either side exchanging: Spark trusts the on-disk
    hash partitioning (``HashPartitioning(key, n)``) and plans a
    sort-merge join whose sort is also satisfied by ``sortBy``. At
    100 TB this converts every fact⋈fact join on the bucket key from
    two full-table shuffles into a zero-shuffle zip of co-numbered
    buckets — the single biggest repeated-join win there is; pinned by
    ``tests/test_bucketing.py`` (zero Exchange operators in the
    executed plan, results equal to the plain join).

    Requires ``saveAsTable`` (bucket metadata lives in the session
    catalog, not in parquet files), hence ``table`` + explicit
    ``path``. The catalog entry is session-scoped here; a real
    deployment points this at a shared metastore.
    """
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .saveAsTable(table)
    )
