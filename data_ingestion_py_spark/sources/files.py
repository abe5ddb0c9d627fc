"""Semi-structured file ingestion: JSON / CSV readers with explicit
schemas, corrupt-record quarantine, and schema-evolution reads.

The reference ingests from exactly one shape (a Mongo collection plus
PDFs on disk, data_ingestion.py:101-141); a corpus pipeline at 100 TB
ingests whatever the crawl delivers — JSONL dumps, CSV exports, parquet
from upstream jobs — and the first battle is rows that do not parse.
Policy here is the standard one: parse PERMISSIVE with an explicit
``_corrupt_record`` column, split the stream into (good, quarantine),
and never silently drop. An explicit schema is mandatory — schema
inference at scale means reading the data twice and letting one bad
file re-type a column for the whole corpus.

Mechanically the readers scan with the *text* source and parse via the
``from_json`` / ``from_csv`` expressions rather than the json/csv file
formats: the file formats refuse plans whose required schema is only
the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which would
force a cache of the full corpus just to count quarantined rows. As
expressions, both branches stay lazy projections of one text scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """Schema + the corrupt-record capture column (must be part of the
    declared schema for PERMISSIVE mode to populate it)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def _split(
    raw: DataFrame, parsed_col, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    parsed = raw.select(
        F.col("value").alias("raw_record"), parsed_col.alias("rec")
    )
    good = parsed.where(F.col(f"rec.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"rec.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(
        F.col(f"rec.{CORRUPT_COL}").isNotNull()
    ).select("raw_record")
    return good, quarantine


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with quarantine.

    Returns ``(good, quarantine)``: good rows carry the declared
    columns; quarantine rows carry the raw offending line. Both are
    lazy projections of the same text scan — nothing is cached, nothing
    silently dropped (``good + quarantine == input lines``).
    """
    full = _with_corrupt(schema)
    raw = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return _split(raw, parsed, schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV with the same (good, quarantine) contract as
    ``read_jsonl``. A row with the wrong column count or an
    untype-castable cell lands in quarantine whole, not as nulls
    smeared into the good stream.

    With ``header=True`` lines equal to the literal header are
    filtered out (the text source has no per-file header notion; a
    data row that exactly reproduces the header would also be dropped
    — acceptable for a header-checked export, documented here).
    """
    full = _with_corrupt(schema)
    raw = spark.read.text(path)
    if header:
        header_line = delimiter.join(f.name for f in schema.fields)
        raw = raw.where(F.col("value") != header_line)
    # from_csv takes a DDL schema string (from_json accepts StructType)
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in full.fields
    )
    parsed = F.from_csv(
        F.col("value"),
        ddl,
        {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": CORRUPT_COL,
            "delimiter": delimiter,
        },
    )
    return _split(raw, parsed, schema)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet snapshots whose schema grew over time
    (``mergeSchema``): columns absent in older files surface as null.
    This is the append-only schema-evolution contract every long-lived
    corpus table ends up needing; widening/renames still require a
    rewrite and are intentionally not hidden here."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
