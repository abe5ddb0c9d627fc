"""MongoDB seam + mongoexport Extended-JSON ingestion (r14 —
reference data_ingestion.py:318-331). The live connector is an
optional-dependency seam (no JAR in this container, gated test); the
dump path is real column algebra, pinned here against hand-built
mongoexport lines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_py_spark.sources import mongo

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("document_name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("upload_date", T.LongType()),   # $date epoch ms
        T.StructField("expiry_date", T.StringType()),  # $date ISO
        T.StructField("n_pages", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_extended_json_normalize_and_parse(spark):
    lines = [
        '{"_id": {"$oid": "64a1b2c3d4e5f60718293a4b"}, '
        '"document_name": "a.pdf", "status": "active", '
        '"upload_date": {"$date": {"$numberLong": "1700000000123"}}, '
        '"expiry_date": {"$date": "2026-01-02T03:04:05Z"}, '
        '"n_pages": {"$numberLong": "42"}, '
        '"score": {"$numberDouble": "0.75"}}',
        # relaxed scalars, negative number, no envelopes at all
        '{"_id": "plain", "document_name": "b.pdf", "status": "x", '
        '"upload_date": {"$date": {"$numberLong": "-5"}}, '
        '"expiry_date": null, "n_pages": 7, "score": 1.5}',
        'not json at all',
    ]
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    out = {r.document_name: r for r in
           mongo.parse_extended_json(df, SCHEMA).collect()}
    a = out["a.pdf"]
    assert a._id == "64a1b2c3d4e5f60718293a4b"
    assert a.upload_date == 1700000000123
    assert a.expiry_date == "2026-01-02T03:04:05Z"
    assert a.n_pages == 42 and a.score == 0.75 and a._corrupt is None
    b = out["b.pdf"]
    assert b._id == "plain" and b.upload_date == -5 and b.n_pages == 7
    # the unparseable line survives as queryable honesty
    bad = [r for r in
           mongo.parse_extended_json(df, SCHEMA).collect()
           if r._corrupt is not None]
    assert len(bad) == 1 and bad[0]._corrupt == "not json at all"


def test_read_mongoexport_roundtrip(tmp_path, spark):
    p = tmp_path / "dump.jsonl"
    p.write_text(
        '{"_id": {"$oid": "aaaaaaaaaaaaaaaaaaaaaaaa"}, '
        '"document_name": "c.pdf", "status": "expired", '
        '"upload_date": {"$date": {"$numberLong": "1000"}}, '
        '"expiry_date": {"$date": "2025-12-31T00:00:00Z"}, '
        '"n_pages": {"$numberInt": "3"}, '
        '"score": {"$numberDecimal": "2.25"}}\n'
    )
    rows = mongo.read_mongoexport(spark, str(p), SCHEMA).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r._id, r.status, r.upload_date, r.n_pages, r.score) == (
        "a" * 24, "expired", 1000, 3, 2.25
    )


def test_connector_seam_raises_not_implemented(spark):
    """No connector JAR in this container: the live path must surface
    the documented optional-dependency seam, not a raw py4j error."""
    with pytest.raises(NotImplementedError, match="connector"):
        mongo.read_collection(
            spark, "mongodb://db.example.com:27017", "hres", "pages"
        )
    df = spark.range(1).select(F.lit("x").alias("document_name"))
    with pytest.raises(NotImplementedError, match="connector"):
        mongo.write_collection(
            df, "mongodb://db.example.com:27017", "hres", "pages"
        )
