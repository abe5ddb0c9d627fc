"""Action-queue orchestration (SURVEY §2.6, Q1-Q3).

The reference wraps every mutation in a command dict with an
``action_code`` (0=remove doc, 1=upload, 2=add category, 3=remove
category; data_ingestion.py:51-69), puts it on a bounded
``Queue(maxsize=40)`` (:37), and drains the queue one item at a time
(:46-72). Here a command batch is a DataFrame with ACTION_SCHEMA and
``apply_actions`` dispatches **set-based per code** — all uploads in
one anti-join, all removes in one delete — exactly the "send many
documents ... simultaneously" behavior README.md:4 advertises, without
per-item round trips. Per-command status messages (the reference's
return strings) become an audit DataFrame.

Invalid codes are recorded in the audit with status 'rejected' (the
reference pops them twice and loses one message — quirk at :68+:71 not
replicated). Streaming form: streaming/pipeline.py wraps this in
``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_ingestion_py_spark.catalog import mutations
from data_ingestion_py_spark.catalog.state import (
    ACTION_ADD_CATEGORY,
    ACTION_REMOVE_CATEGORY,
    ACTION_REMOVE_DOC,
    ACTION_UPLOAD_DOC,
    CatalogState,
)

VALID_CODES = (
    ACTION_REMOVE_DOC,
    ACTION_UPLOAD_DOC,
    ACTION_ADD_CATEGORY,
    ACTION_REMOVE_CATEGORY,
)


def apply_actions(
    state: CatalogState, commands: DataFrame
) -> tuple[CatalogState, DataFrame]:
    """Drain one command batch: returns (new_state, audit).

    Audit columns: seq, action_code, target, status — one row per
    command, mirroring the reference's per-action message list (:52-69)
    as a table instead of strings.

    **Batch-order contract** (intentional divergence from the
    reference's strict FIFO drain): within one batch, all uploads apply
    before all removes, so ``[remove X (seq 1), upload X (seq 2)]``
    ends with X *absent*. Commands whose relative order matters must be
    split across batches (the streaming pipeline's micro-batches
    preserve cross-batch order). Cross-name operations never interact,
    so this only affects same-name sequences within a single batch.

    ``commands`` is cached here (read ~6× across dispatch + audit);
    the caller should ``commands.unpersist()`` once the returned state
    and audit are materialized (streaming/pipeline.py does).
    """
    commands = commands.cache()

    uploads = commands.where(F.col("action_code") == ACTION_UPLOAD_DOC)
    removes = commands.where(F.col("action_code") == ACTION_REMOVE_DOC)
    cat_adds = commands.where(F.col("action_code") == ACTION_ADD_CATEGORY)
    cat_removes = commands.where(F.col("action_code") == ACTION_REMOVE_CATEGORY)

    pre_docs = state.documents

    # FIFO parity: within a batch, the first upload of a name wins
    # (reference drains the queue in arrival order, :46-72) — rank by seq
    # instead of relying on dropDuplicates' arbitrary survivor.
    from pyspark.sql.window import Window

    w = Window.partitionBy("document_name").orderBy("seq")
    uploads = uploads.withColumn("_rn", F.row_number().over(w))
    first_uploads = uploads.where(F.col("_rn") == 1).drop("_rn")

    # uploads: expand page_texts into page rows (the fixture-world stand-in
    # for PDF extraction — sources/pdf.py produces the same shape)
    new_docs = first_uploads.select(
        "document_id",
        "document_name",
        "category_id",
        F.col("file_link").alias("document_link"),
        "document_tags",
        "document_expiryDate",
        F.create_map().cast("map<string,string>").alias("document_metadata"),
    )
    new_pages = first_uploads.select(
        "document_id",
        F.posexplode("page_texts").alias("pos", "page_text"),
    ).select(
        "document_id",
        (F.col("pos") + 1).cast("int").alias("page_number"),
        "page_text",
    )
    state = mutations.upload_documents(state, new_docs, new_pages)
    state = mutations.remove_documents(
        state, removes.select("document_name")
    )
    state = mutations.add_categories(
        state, cat_adds.select("category_id", "category_name")
    )
    state = mutations.remove_categories_cascade(
        state, cat_removes.select("category_id")
    )

    # audit: success/duplicate/missing per command, set-based.
    # Duplicate = name pre-existing OR a later same-name upload in this
    # batch; missing = name in neither the prior state nor this batch's
    # uploads (FIFO view: uploads land before removes).
    dup = uploads.join(
        pre_docs.select("document_name"), "document_name", "left_semi"
    ).select("seq").unionByName(
        uploads.where(F.col("_rn") > 1).select("seq")
    ).distinct()
    visible_names = pre_docs.select("document_name").unionByName(
        first_uploads.select("document_name")
    )
    missing = removes.join(
        visible_names, "document_name", "left_anti"
    ).select("seq")
    flagged = dup.unionByName(missing).withColumn("_flag", F.lit(1))
    audit = (
        commands.join(flagged, "seq", "left")
        .select(
            "seq",
            "action_code",
            F.coalesce("document_name", "category_name").alias("target"),
            F.when(~F.col("action_code").isin(*VALID_CODES), "rejected")
            .when(
                (F.col("action_code") == ACTION_UPLOAD_DOC)
                & (F.col("_flag") == 1),
                "duplicate",
            )
            .when(
                (F.col("action_code") == ACTION_REMOVE_DOC)
                & (F.col("_flag") == 1),
                "not_found",
            )
            .otherwise("ok")
            .alias("status"),
        )
    )
    return state, audit


def commands_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build a command batch from plain dicts (test/API convenience)."""
    from data_ingestion_py_spark.catalog.state import ACTION_SCHEMA

    return spark.createDataFrame(
        [
            tuple(r.get(f.name) for f in ACTION_SCHEMA.fields)
            for r in rows
        ],
        ACTION_SCHEMA,
    )
