"""Set-based catalog mutations (SURVEY §2.5, M1-M9).

Every reference mutation is a per-row loop of Mongo round trips with
hand-rolled compensation on failure; here each is one pure
``(state, batch) -> state`` transformation. Bulk-by-construction: every
function takes a *set* of inputs, so the reference's queue batching
(README.md:4) becomes ordinary DataFrame set algebra. Reference bugs
intentionally not replicated (SURVEY §7 risk register): the undefined
``category_id`` in remove (data_ingestion.py:384/389), the arity bug in
remove_multiple (:410), and snippet-level status copies (:436/:443 —
status derives from the document row here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_ingestion_py_spark.catalog.state import CatalogState

STATUS_ACTIVE = "Active"
STATUS_EXPIRED = "Expired"


def upload_documents(
    state: CatalogState, new_docs: DataFrame, new_pages: DataFrame
) -> CatalogState:
    """M1 upload pipeline, batch form.

    Dup-guard (reference ``document_exist`` full scan + client loop,
    data_ingestion.py:302-315) is a LEFT ANTI join on document_name;
    enrichment (T6, :245-255) stamps status/date. Pages of rejected
    docs are dropped by a LEFT SEMI join. One shuffle per join, no
    driver round trips; snippets need no write at all (derived view).
    """
    accepted = (
        new_docs.join(state.documents, "document_name", "left_anti")
        .dropDuplicates(["document_name"])
        .withColumn("document_status", F.lit(STATUS_ACTIVE))
        .withColumn("date_uploaded", F.current_date())
    )
    accepted_pages = new_pages.join(
        accepted.select("document_id"), "document_id", "left_semi"
    )
    return state.with_(
        documents=state.documents.unionByName(
            accepted.select(*state.documents.columns)
        ),
        pages=state.pages.unionByName(
            accepted_pages.select(*state.pages.columns)
        ),
    )


def remove_documents(state: CatalogState, names: DataFrame) -> CatalogState:
    """M2/M9 delete by name, batch form (set-based DELETE WHERE;
    reference loops one queue item per name, :375-410)."""
    docs = state.documents.join(names, "document_name", "left_anti")
    pages = state.pages.join(
        docs.select("document_id"), "document_id", "left_semi"
    )
    return state.with_(documents=docs, pages=pages)


def change_document_status(
    state: CatalogState, names: DataFrame, new_status: str
) -> CatalogState:
    """M4 soft status change (expire or reactivate — README.md:3).

    UPDATE ... WHERE document_name IN (batch). No snippet update
    exists because snippet status derives from the document row.
    """
    marked = state.documents.join(
        names.select("document_name").withColumn("_hit", F.lit(1)),
        "document_name",
        "left",
    )
    return state.with_(
        documents=marked.withColumn(
            "document_status",
            F.when(F.col("_hit") == 1, F.lit(new_status)).otherwise(
                F.col("document_status")
            ),
        ).drop("_hit")
    )


def expire_documents_auto(state: CatalogState) -> CatalogState:
    """M5 expiry sweep: one set-based predicate, pushed to the scan
    (reference fetches then compares dates client-side per doc,
    :486-503)."""
    return state.with_(
        documents=state.documents.withColumn(
            "document_status",
            F.when(
                F.col("document_expiryDate").isNotNull()
                & (F.col("document_expiryDate") < F.current_date())
                & (F.col("document_status") == STATUS_ACTIVE),
                F.lit(STATUS_EXPIRED),
            ).otherwise(F.col("document_status")),
        )
    )


def add_categories(state: CatalogState, new_cats: DataFrame) -> CatalogState:
    """M6 dim append with value-uniqueness guard on name (:338) AND on
    category_id — two incoming rows with distinct names but the same id
    would otherwise both insert, breaking the id uniqueness the
    left-anti join enforces against existing state."""
    accepted = (
        new_cats.join(state.categories, "category_name", "left_anti")
        .join(
            state.categories.select("category_id"), "category_id", "left_anti"
        )
        .dropDuplicates(["category_name"])
        .dropDuplicates(["category_id"])
    )
    return state.with_(
        categories=state.categories.unionByName(
            accepted.select(*state.categories.columns)
        )
    )


def remove_categories_cascade(
    state: CatalogState, category_ids: DataFrame
) -> CatalogState:
    """M7 category removal + cascade delete of its documents/pages
    (:344-363). With tables partitioned by category_id this is a
    partition drop at scale."""
    cats = state.categories.join(category_ids, "category_id", "left_anti")
    docs = state.documents.join(category_ids, "category_id", "left_anti")
    pages = state.pages.join(
        docs.select("document_id"), "document_id", "left_semi"
    )
    return state.with_(categories=cats, documents=docs, pages=pages)


def truncate(state: CatalogState) -> CatalogState:
    """M8 clear_dataset (:507-525): overwrite with empty."""
    return state.with_(
        documents=state.documents.limit(0),
        pages=state.pages.limit(0),
    )
