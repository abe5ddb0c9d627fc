"""Type-proof time helpers.

The fixture parquet files have stored timestamps as NANOS (rounds 1-3)
and as µs ``isAdjustedToUTC=false`` (round 4+), which Spark 4.x reads
as ``TIMESTAMP_NTZ`` unless ``spark.sql.parquet.inferTimestampNTZ``
is disabled. ``unix_micros`` and ``withWatermark`` both require plain
``TIMESTAMP``; these helpers absorb the difference so query code never
cares which encoding the scan produced. With the session timezone
pinned to UTC the NTZ→LTZ cast is value-preserving.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def as_ltz(col: Column | str) -> Column:
    """Coerce a TIMESTAMP or TIMESTAMP_NTZ column to plain TIMESTAMP.

    A no-op cast for already-LTZ columns (Catalyst folds it away);
    value-preserving for NTZ under a UTC session timezone.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def ts_us(col: Column | str) -> Column:
    """``unix_micros`` that accepts TIMESTAMP and TIMESTAMP_NTZ alike."""
    return F.unix_micros(as_ltz(col))


def with_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Ensure ``ts_col`` is plain TIMESTAMP so ``withWatermark`` accepts
    it as event time (streaming rejects NTZ event-time columns)."""
    from pyspark.sql.types import TimestampNTZType

    field = next((f for f in df.schema.fields if f.name == ts_col), None)
    if field is not None and isinstance(field.dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
