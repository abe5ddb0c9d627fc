"""Storage-level control for corpus-sized materializations
(operators/materialize.pin): the 100 TB swap the dedup/ranking
docstrings promise — DISK_ONLY persist instead of localCheckpoint —
must produce identical results and actually use the requested level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_ingestion_py_spark.operators.dedup import near_duplicates_minhash
from data_ingestion_py_spark.operators.materialize import pin
from data_ingestion_py_spark.operators.ranking import with_global_rank
from tests.conftest import SF_SMOKE


def test_pin_disk_only_uses_disk_level(spark):
    df = spark.range(1000).withColumn("x", F.col("id") * 2)
    pinned = pin(df, "DISK_ONLY")
    try:
        assert pinned.storageLevel == StorageLevel.DISK_ONLY
        assert pinned.count() == 1000
    finally:
        pinned.unpersist()


def test_pin_rejects_unknown_level(spark):
    with pytest.raises(ValueError, match="unknown storage level"):
        pin(spark.range(10), "NOT_A_LEVEL")


def test_minhash_dedup_same_result_disk_only(spark):
    from data_ingestion_py_spark.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    default = near_duplicates_minhash(docs)
    disk = near_duplicates_minhash(docs, storage_level="DISK_ONLY")
    key = lambda r: (r.doc_a, r.doc_b, r.jaccard)  # noqa: E731
    assert sorted(map(key, default.collect())) == sorted(
        map(key, disk.collect())
    )


def test_global_rank_same_result_disk_only(spark):
    from data_ingestion_py_spark.io import load_table

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    a = with_global_rank(o, order_by=order)
    b = with_global_rank(o, order_by=order, storage_level="DISK_ONLY")
    key = lambda r: (r.o_orderkey, r.rnk)  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))
