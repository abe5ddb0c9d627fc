"""Data-layout operators: Z-order (Morton) clustering for multi-column
scan locality.

A table sorted by one column prunes scans on that column only; a
Z-ordered table interleaves the bits of two (or more) key columns so
rows close in EITHER dimension land in the same files — min/max file
statistics then prune selective predicates on both columns. This is
the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed as
plain column algebra + repartitionByRange, so it works on bare parquet.

The reference has no layout story at all (Mongo heap collections);
at 100 TB layout IS the query optimizer's raw material.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZBITS = 16


def zorder_key(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two non-negative integer columns (each taken
    mod 2^bits) into one sortable key: bit i of ``a`` lands at position
    2i, bit i of ``b`` at 2i+1. Pure integer fold — identical in any
    engine, no UDF."""
    a = a.cast("long") % (1 << bits)
    b = b.cast("long") % (1 << bits)
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(1), i * 2)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(1), i * 2 + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` Z-ordered on (col_a, col_b): range-partition by the
    Morton key (so each output file owns a contiguous key range — a
    2-D tile) and sort within partitions for page-level locality.
    Range partitioning samples the key distribution, so skewed keys
    still split evenly across files."""
    zk = zorder_key(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("_zkey", zk)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
