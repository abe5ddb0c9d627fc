"""MongoDB ingestion/egress (SURVEY §2 S3/S5 — the reference's store,
data_ingestion.py:318-331) — Spark-first, two paths (r14):

1. **Live connector** (``read_collection``/``write_collection``):
   ``spark.read.format("mongodb")`` against the official Spark
   connector. The connector JAR is not baked into this container, so
   the call raises a documented ``NotImplementedError`` seam when the
   data source is absent — the same optional-dependency contract as
   Pillow/ffmpeg/tesseract. With the JAR on the classpath the calls
   are complete: URI/database/collection options, schema pushdown on
   read, append/overwrite on write.

2. **Extras-free dump path** (``parse_extended_json`` /
   ``read_mongoexport``): how Mongo data actually reaches a data lake
   at 100 TB — ``mongoexport`` JSONL dumps. MongoDB Extended JSON
   wraps scalars in type envelopes (``{"$oid": …}``, ``{"$date":
   {"$numberLong": …}}``, ``{"$numberLong": …}`` …); this path
   normalizes the standard envelopes to plain JSON with a column-
   algebra ``regexp_replace`` chain and parses with ``from_json``
   under the caller's schema — one narrow codegen stage, no UDF, no
   shuffle, splittable line-by-line like any JSONL corpus.

Scope honesty: the normalizer targets mongoexport's canonical/relaxed
envelopes on scalar fields (the shapes the reference's collections
use: _id $oid, $date both forms, $numberLong/Int/Double/Decimal).
Envelope-shaped LITERAL STRINGS inside user data would be rewritten
too — the documented trade of a regex normalizer; a corpus needing
byte-exact envelope preservation should use the live connector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_collection(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    schema=None,
):
    """Distributed read of one MongoDB collection via the official
    Spark connector (partitioned server-side; predicates and column
    pruning push down through the connector's aggregation pipeline).
    Raises ``NotImplementedError`` when the connector data source is
    not on the classpath — this container's documented seam."""
    reader = (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
    )
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load()
    except Exception as exc:  # noqa: BLE001 — classify the seam
        if "DataSource" in str(exc) or "Failed to find" in str(exc):
            raise NotImplementedError(
                "the MongoDB Spark connector is not on the classpath "
                "(add org.mongodb.spark:mongo-spark-connector via "
                "spark.jars.packages); for dump files use "
                "read_mongoexport (extras-free)"
            ) from exc
        raise


def write_collection(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str,
    mode: str = "append",
) -> None:
    """Distributed write to one MongoDB collection via the official
    connector. Same ``NotImplementedError`` seam as
    ``read_collection`` when the data source is absent."""
    writer = (
        df.write.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .mode(mode)
    )
    try:
        writer.save()
    except Exception as exc:  # noqa: BLE001
        if "DataSource" in str(exc) or "Failed to find" in str(exc):
            raise NotImplementedError(
                "the MongoDB Spark connector is not on the classpath "
                "(add org.mongodb.spark:mongo-spark-connector via "
                "spark.jars.packages)"
            ) from exc
        raise


def normalize_extended_json(col: Column) -> Column:
    """Rewrite MongoDB Extended JSON type envelopes to plain JSON in
    column algebra — the ``mongoexport`` line becomes ``from_json``
    parseable under an ordinary Spark schema:

    - ``{"$oid": "<24 hex>"}``                → the hex string
    - ``{"$date": {"$numberLong": "<ms>"}}``  → the integer (epoch ms)
    - ``{"$date": "<ISO-8601>"}``             → the ISO string
    - ``{"$numberLong|Int|Double|Decimal": "<n>"}`` → the bare number
    """
    out = F.regexp_replace(
        col,
        r'\{\s*"\$oid"\s*:\s*"([0-9a-fA-F]{24})"\s*\}',
        '"$1"',
    )
    out = F.regexp_replace(
        out,
        r'\{\s*"\$date"\s*:\s*\{\s*"\$numberLong"\s*:\s*"(-?\d+)"\s*\}\s*\}',
        "$1",
    )
    out = F.regexp_replace(
        out,
        r'\{\s*"\$date"\s*:\s*"([^"]*)"\s*\}',
        '"$1"',
    )
    out = F.regexp_replace(
        out,
        r'\{\s*"\$number(?:Long|Int|Double|Decimal)"\s*:\s*'
        r'"(-?[0-9][0-9.eE+-]*)"\s*\}',
        "$1",
    )
    return out


def parse_extended_json(
    df: DataFrame, schema, text_col: str = "value"
) -> DataFrame:
    """JSONL rows of Extended JSON → typed columns: normalize the
    envelopes, ``from_json`` under ``schema``, and flatten. Rows whose
    JSON does not parse land with null fields plus the (normalized)
    line in ``_corrupt`` (PERMISSIVE corrupt-record column) —
    queryable honesty, never dropped silently."""
    from pyspark.sql import types as T

    schema2 = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = F.from_json(
        normalize_extended_json(F.col(text_col)),
        schema2,
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    carry = [c for c in df.columns if c != text_col]
    return df.select(*carry, parsed.alias("_doc")).select(
        *carry,
        *[F.col(f"_doc.{f.name}") for f in schema.fields],
        F.col("_doc._corrupt_record").alias("_corrupt"),
    )


def read_mongoexport(
    spark: SparkSession, path: str, schema
) -> DataFrame:
    """``mongoexport`` JSONL dump(s) → typed DataFrame, extras-free:
    ``spark.read.text`` (splittable, distributed) + the Extended-JSON
    normalizer. At 100 TB this is the bandwidth-bound shape — one
    narrow codegen stage over the text scan, no UDF, no shuffle."""
    return parse_extended_json(spark.read.text(path), schema)
