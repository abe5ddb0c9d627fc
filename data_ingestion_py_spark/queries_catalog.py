"""Catalog mutation flows as driver-checkable registry queries.

The mutation layer (`catalog/mutations.py` — M1-M9 of SURVEY §2) is
pytest-covered, but pytest is the soft gate; these queries drive the
REAL mutation functions over a deterministic state built from the
`documents` fixture and emit set-level results a DuckDB oracle
recomputes independently — putting upload dup-guards, status flips,
expiry sweeps, removes, and category cascades under the hard
driver-vs-oracle hash check.

Reference tie-in: the flows mirror data_ingestion.py's saga surface —
upload (:227), remove (:375/:407), status change (:413), auto-expiry
(:483), category add/remove (:336/:344) — with the derived-view design
replacing every rollback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_py_spark.catalog import mutations
from data_ingestion_py_spark.catalog.state import (
    CATEGORY_SCHEMA,
    CatalogState,
)
from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.queries import register


def _initial_state(spark: SparkSession, sf_dir: str) -> CatalogState:
    """Deterministic catalog built from the documents fixture:
    name 'doc-<id>', category doc_id%5, expiry by doc_id%7
    (0 → past 2020-01-01, 1 → future 2030-01-01, else NULL), one page
    per document carrying the fixture text."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        F.col("doc_id").alias("document_id"),
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("document_name"),
        (F.col("doc_id") % 5).cast("int").alias("category_id"),
        F.lit(None).cast("string").alias("document_link"),
        F.lit(None).cast("array<string>").alias("document_tags"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("2020-01-01").cast("date"))
        .when(F.col("doc_id") % 7 == 1, F.lit("2030-01-01").cast("date"))
        .alias("document_expiryDate"),
        F.create_map().cast("map<string,string>").alias("document_metadata"),
        F.lit(mutations.STATUS_ACTIVE).alias("document_status"),
        F.current_date().alias("date_uploaded"),
    )
    pages = d.select(
        F.col("doc_id").alias("document_id"),
        F.lit(1).cast("int").alias("page_number"),
        F.col("text").alias("page_text"),
    )
    cats = spark.createDataFrame(
        [(i, f"cat-{i}") for i in range(5)], CATEGORY_SCHEMA
    )
    return CatalogState(categories=cats, documents=docs, pages=pages)


@register(
    "catalog_lifecycle_counts",
    """
WITH base AS (
    SELECT doc_id AS document_id, 'doc-' || doc_id AS document_name,
           CASE WHEN doc_id % 7 = 0 THEN DATE '2020-01-01'
                WHEN doc_id % 7 = 1 THEN DATE '2030-01-01' END AS expiry
    FROM documents
), swept AS (
    -- M5 auto-expiry then M4 reactivate (%11 names)
    SELECT document_id, document_name,
           CASE WHEN document_id % 11 = 0 THEN 'Active'
                WHEN expiry IS NOT NULL AND expiry < current_date
                    THEN 'Expired'
                ELSE 'Active' END AS document_status
    FROM base
), kept AS (
    -- M2 remove %13 names
    SELECT * FROM swept WHERE document_id % 13 <> 0
), uploads AS (
    -- M1 upload batch: fresh names always accepted; clashing names
    -- ('doc-<id>', id%19=0) accepted ONLY if the original was removed
    SELECT document_id + 7000000 AS document_id, 'Active' AS document_status
    FROM base WHERE document_id % 17 = 0
    UNION ALL
    SELECT b.document_id + 8000000 AS document_id, 'Active'
    FROM base b
    WHERE b.document_id % 19 = 0
      AND NOT EXISTS (SELECT 1 FROM kept k
                      WHERE k.document_name = b.document_name)
), final AS (
    SELECT document_id, document_status, 1 AS pages_each FROM kept
    UNION ALL
    SELECT document_id, document_status, 2 AS pages_each FROM uploads
)
SELECT document_status, count(*) AS n_docs,
       CAST(sum(pages_each) AS BIGINT) AS n_pages
FROM final GROUP BY document_status
""",
    tags=("catalog", "mutations"),
)
def q_catalog_lifecycle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end mutation flow through the REAL catalog functions:
    expiry sweep (M5) → reactivate %11 (M4) → remove %13 (M2) → upload
    batch with fresh + name-clashing docs (M1, dup-guard must reject
    clashes unless the original was removed). Output: per-status doc
    and page counts. The oracle replays the same set logic in pure SQL
    over the fixture — any drift in join type, guard, or status
    precedence hash-mismatches."""
    state = _initial_state(spark, sf_dir)
    state = mutations.expire_documents_auto(state)
    reactivate = state.documents.where(
        F.col("document_id") % 11 == 0
    ).select("document_name")
    state = mutations.change_document_status(
        state, reactivate, mutations.STATUS_ACTIVE
    )
    removes = state.documents.where(F.col("document_id") % 13 == 0).select(
        "document_name"
    )
    state = mutations.remove_documents(state, removes)

    d = load_table(spark, sf_dir, "documents")
    fresh = d.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 7000000).alias("document_id"),
        F.concat(F.lit("doc-"), F.col("doc_id") + 7000000).alias(
            "document_name"
        ),
    )
    clash = d.where(F.col("doc_id") % 19 == 0).select(
        (F.col("doc_id") + 8000000).alias("document_id"),
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("document_name"),
    )
    new_docs = fresh.unionByName(clash).select(
        "document_id",
        "document_name",
        F.lit(0).cast("int").alias("category_id"),
        F.lit(None).cast("string").alias("document_link"),
        F.lit(None).cast("array<string>").alias("document_tags"),
        F.lit(None).cast("date").alias("document_expiryDate"),
        F.create_map().cast("map<string,string>").alias("document_metadata"),
    )
    new_pages = new_docs.select(
        "document_id",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("page_number"),
        F.lit("uploaded page").alias("page_text"),
    )
    state = mutations.upload_documents(state, new_docs, new_pages)

    pages_per_doc = state.pages.groupBy("document_id").agg(
        F.count(F.lit(1)).alias("pages_each")
    )
    return (
        state.documents.join(pages_per_doc, "document_id")
        .groupBy("document_status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pages_each").cast("long").alias("n_pages"),
        )
    )


@register(
    "catalog_category_cascade",
    """
WITH cats AS (
    SELECT i AS category_id, 'cat-' || i AS category_name
    FROM generate_series(0, 4) t(i)
    UNION ALL
    -- M6 add batch: (5, cat-5) and (7, cat-7) accepted;
    -- (3, 'brand-new-name') rejected on id clash;
    -- (6, 'cat-0') rejected on name clash
    SELECT 5, 'cat-5' UNION ALL SELECT 7, 'cat-7'
), after_remove AS (
    -- M7 cascade remove of category 1
    SELECT * FROM cats WHERE category_id <> 1
)
SELECT c.category_id, c.category_name,
       count(d.doc_id) AS n_docs
FROM after_remove c
LEFT JOIN documents d ON d.doc_id % 5 = c.category_id
GROUP BY c.category_id, c.category_name
""",
    tags=("catalog", "categories"),
)
def q_catalog_category_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category dimension lifecycle through the real functions: add a
    batch containing an id-clash and a name-clash (M6 guards must
    reject both, keeping 5 and 7), then cascade-remove category 1 (M7
    — its documents and pages go with it). Output: surviving
    categories with their document counts."""
    state = _initial_state(spark, sf_dir)
    adds = spark.createDataFrame(
        [
            (5, "cat-5"),
            (3, "brand-new-name"),  # id clash with existing cat 3
            (6, "cat-0"),  # name clash with existing cat 0
            (7, "cat-7"),
        ],
        CATEGORY_SCHEMA,
    )
    state = mutations.add_categories(state, adds)
    state = mutations.remove_categories_cascade(
        state, spark.createDataFrame([(1,)], "category_id int")
    )
    return (
        state.categories.join(
            state.documents, "category_id", "left"
        )
        .groupBy("category_id", "category_name")
        .agg(F.count("document_id").alias("n_docs"))
    )
