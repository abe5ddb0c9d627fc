"""Z-order layout: key correctness + the clustering effect it exists
to produce (narrow per-file ranges on BOTH dimensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.operators.layout import write_zordered, zorder_key
from tests.conftest import SF_SMOKE


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = spark.range(200).select(
        F.col("id").alias("a"),
        ((F.col("id") * 37) % 200).alias("b"),
        zorder_key(F.col("id"), (F.col("id") * 37) % 200).alias("zk"),
    ).collect()
    for r in rows:
        assert r.zk == _morton_ref(r.a % (1 << 16), r.b % (1 << 16)), r


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Per-file span of the SECOND column must shrink dramatically vs a
    single-column sort layout (where each file spans ~the full b-range).
    This is the property that makes min/max pruning work on both
    predicates."""
    # orderkey and partkey are independent; partkey/suppkey would NOT
    # be (suppkey is derived from partkey in TPC-H-style generators)
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        (F.col("l_orderkey") % 256).alias("a"),
        (F.col("l_partkey") % 256).alias("b"),
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "single_sorted")
    write_zordered(li, zpath, "a", "b", n_files=16, bits=8)
    (
        li.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def avg_span(path: str, col: str) -> float:
        per_file = (
            spark.read.parquet(path)
            .withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        return per_file.agg(F.avg("span")).collect()[0][0]

    z_span_b = avg_span(zpath, "b")
    s_span_b = avg_span(spath, "b")
    # single-col sort leaves b unclustered (~full 0-255 range per file);
    # z-order must at least halve the span
    assert s_span_b > 150, s_span_b
    assert z_span_b < s_span_b / 2, (z_span_b, s_span_b)
    # and a stays reasonably clustered too (not a plain sort on b)
    assert avg_span(zpath, "a") < 150
