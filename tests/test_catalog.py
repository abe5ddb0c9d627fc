"""E2E catalog tests replaying the reference main() scenario
(data_ingestion.py:535-609): upload ×2, duplicate-reject, remove,
category add, category remove w/ cascade, expiry sweep, reactivate.
Assertions are on table states, not status strings (SURVEY §5.3)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_ingestion_py_spark.catalog import mutations
from data_ingestion_py_spark.catalog.actions import (
    apply_actions,
    commands_from_rows,
)
from data_ingestion_py_spark.catalog.state import (
    CatalogState,
    empty_state,
    seed_categories,
)

PAGES = {
    "docA": ["alpha beta gamma delta " * 12, "epsilon zeta " * 20],
    "docB": ["one two three four five six seven eight nine ten " * 5],
    "docC": ["lorem ipsum dolor sit amet " * 10],
}


def _upload_cmd(seq, doc_id, name, cat, expiry=None):
    return {
        "seq": seq,
        "action_code": 1,
        "document_id": doc_id,
        "document_name": name,
        "category_id": cat,
        "file_link": f"https://docs/{name}.pdf",
        "page_texts": PAGES[name],
        "document_tags": ["union", "retired"],
        "document_expiryDate": expiry,
    }


@pytest.fixture()
def seeded(spark):
    st = empty_state(spark).with_(categories=seed_categories(spark))
    cmds = commands_from_rows(
        spark,
        [
            _upload_cmd(1, 101, "docA", 1),
            _upload_cmd(2, 102, "docB", 2, expiry=dt.date(2020, 1, 1)),
            _upload_cmd(3, 103, "docC", 1),
        ],
    )
    st, audit = apply_actions(st, cmds)
    return st, audit


def test_upload_and_derived_snippets(spark, seeded):
    st, audit = seeded
    assert st.documents.count() == 3
    docs = {r.document_name: r for r in st.documents.collect()}
    assert docs["docA"].document_status == "Active"
    assert docs["docA"].date_uploaded == dt.date.today()
    # pages exploded with 1-based numbering
    pages = st.pages.where(F.col("document_id") == 101).collect()
    assert sorted(p.page_number for p in pages) == [1, 2]
    # snippets derive with denormalized parent fields + page_link (T3/T4/J2)
    sn = st.snippets().where(F.col("document_id") == 101).collect()
    assert sn and all(s.category_name == "Collective Agreements" for s in sn)
    assert all(
        s.page_link == f"https://docs/docA.pdf#page={s.page_number}" for s in sn
    )
    assert {r.status for r in audit.collect()} == {"ok"}


def test_duplicate_upload_rejected(spark, seeded):
    st, _ = seeded
    cmds = commands_from_rows(spark, [_upload_cmd(9, 999, "docA", 2)])
    st2, audit = apply_actions(st, cmds)
    assert st2.documents.count() == 3  # unchanged
    # original doc untouched (id still 101, category still 1)
    row = st2.documents.where(F.col("document_name") == "docA").first()
    assert row.document_id == 101 and row.category_id == 1
    assert audit.first().status == "duplicate"


def test_remove_document_cascades_to_pages_and_snippets(spark, seeded):
    st, _ = seeded
    cmds = commands_from_rows(
        spark, [{"seq": 10, "action_code": 0, "document_name": "docB"}]
    )
    st2, audit = apply_actions(st, cmds)
    assert st2.documents.where(F.col("document_name") == "docB").count() == 0
    assert st2.pages.where(F.col("document_id") == 102).count() == 0
    assert st2.snippets().where(F.col("document_id") == 102).count() == 0
    assert audit.first().status == "ok"


def test_remove_missing_document_reported(spark, seeded):
    st, _ = seeded
    cmds = commands_from_rows(
        spark, [{"seq": 11, "action_code": 0, "document_name": "ghost"}]
    )
    st2, audit = apply_actions(st, cmds)
    assert st2.documents.count() == 3
    assert audit.first().status == "not_found"


def test_category_add_and_cascade_remove(spark, seeded):
    st, _ = seeded
    cmds = commands_from_rows(
        spark,
        [
            {"seq": 20, "action_code": 2, "category_id": 3,
             "category_name": "contracts"},
            {"seq": 21, "action_code": 3, "category_id": 1},
        ],
    )
    st2, audit = apply_actions(st, cmds)
    names = {r.category_name for r in st2.categories.collect()}
    assert names == {"Benefits", "contracts"}
    # cascade: category 1 docs (docA, docC) and their pages gone (M7)
    assert {
        r.document_name for r in st2.documents.collect()
    } == {"docB"}
    assert st2.pages.join(
        st2.documents.select("document_id"), "document_id", "left_anti"
    ).count() == 0
    assert {r.status for r in audit.collect()} == {"ok"}


def test_duplicate_category_name_rejected(spark, seeded):
    st, _ = seeded
    new = spark.createDataFrame(
        [(7, "Benefits"), (8, "fresh")],
        "category_id int, category_name string",
    )
    st2 = mutations.add_categories(st, new)
    rows = {r.category_name: r.category_id for r in st2.categories.collect()}
    assert rows["Benefits"] == 2  # original kept, dup id-7 rejected
    assert rows["fresh"] == 8


def test_expiry_sweep_and_reactivation(spark, seeded):
    st, _ = seeded
    st2 = mutations.expire_documents_auto(st)
    status = {
        r.document_name: r.document_status for r in st2.documents.collect()
    }
    assert status == {"docA": "Active", "docB": "Expired", "docC": "Active"}
    # snippet status follows the document (derived, no second UPDATE)
    sn_status = {
        r.document_status
        for r in st2.snippets().where(F.col("document_id") == 102).collect()
    }
    assert sn_status == {"Expired"}
    # reactivate (README.md:3 "brought back to the active state")
    names = spark.createDataFrame([("docB",)], "document_name string")
    st3 = mutations.change_document_status(st2, names, "Active")
    assert (
        st3.documents.where(F.col("document_name") == "docB")
        .first()
        .document_status
        == "Active"
    )
    # idempotent: sweeping again re-expires docB (expiry date still past)
    st4 = mutations.expire_documents_auto(st3)
    assert (
        st4.documents.where(F.col("document_name") == "docB")
        .first()
        .document_status
        == "Expired"
    )


def test_truncate(spark, seeded):
    st, _ = seeded
    st2 = mutations.truncate(st)
    assert st2.documents.count() == 0
    assert st2.pages.count() == 0
    assert st2.snippets().count() == 0
    assert st2.categories.count() == 2  # dims survive (ref clears only data)


def test_invalid_action_code_rejected(spark, seeded):
    st, _ = seeded
    cmds = commands_from_rows(
        spark, [{"seq": 30, "action_code": 9, "document_name": "docA"}]
    )
    st2, audit = apply_actions(st, cmds)
    assert st2.documents.count() == 3
    assert audit.first().status == "rejected"


def test_bulk_batch_mixed_codes(spark):
    """One batch with every action code — the queue-drain semantics
    (reference drains item-by-item; here it's one set-based pass)."""
    st = empty_state(spark).with_(categories=seed_categories(spark))
    cmds = commands_from_rows(
        spark,
        [
            _upload_cmd(1, 101, "docA", 1),
            _upload_cmd(2, 102, "docB", 2),
            {"seq": 3, "action_code": 0, "document_name": "docA"},
            {"seq": 4, "action_code": 2, "category_id": 3,
             "category_name": "contracts"},
            {"seq": 5, "action_code": 3, "category_id": 2},
        ],
    )
    st2, audit = apply_actions(st, cmds)
    # uploads applied first, then removes (docA uploaded then removed),
    # then category ops (category 2 cascade removes docB)
    assert st2.documents.count() == 0
    assert {r.category_name for r in st2.categories.collect()} == {
        "Collective Agreements",
        "contracts",
    }
    assert {r.status for r in audit.collect()} == {"ok"}
