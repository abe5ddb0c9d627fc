"""Planted-case semantics for queries_linkage (fuzzy match, source
overlap, standardization, leakage-safe split).

The oracle-parity mirror proves Spark == DuckDB; these tests prove
both are RIGHT, on inputs small enough to verify by hand. Planted
tables are written as ``{tmp}/part.parquet`` etc. so the registry
query functions run unmodified against the temp dir."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_py_spark.queries import QUERIES
import data_ingestion_py_spark.queries_ext  # noqa: F401  (extends QUERIES)
from tests.conftest import SF_SMOKE


def _write(spark, tmp_path, table: str, rows: list[Row]) -> str:
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/{table}.parquet"
    )
    return sf_dir


def test_fuzzy_matches_planted(spark, tmp_path):
    """One 'ring' block: 2×'red ring' + 1×'rad ring' (lev = 1 ≤ 3 →
    all 3 pairs match) and 1×'chartreuse ring' (lev > 3 to both
    others → candidate but not match); a lone 'bolt' block with a
    single record (0 pairs)."""
    rows = [
        Row(p_partkey=1, p_name="red ring"),
        Row(p_partkey=2, p_name="red ring"),
        Row(p_partkey=3, p_name="rad ring"),
        Row(p_partkey=4, p_name="chartreuse ring"),
        Row(p_partkey=5, p_name="small bolt"),
    ]
    sf_dir = _write(spark, tmp_path, "part", rows)
    out = {
        r["block"]: r
        for r in QUERIES["parts_fuzzy_matches"].spark(spark, sf_dir).collect()
    }
    ring = out["ring"]
    assert ring["n_parts"] == 4
    assert ring["n_pairs"] == 6
    # same-name (1,2) + cross-name red×rad (1,3),(2,3); chartreuse out
    assert ring["n_matches"] == 3
    bolt = out["bolt"]
    assert (bolt["n_parts"], bolt["n_pairs"], bolt["n_matches"]) == (1, 0, 0)


def test_source_overlap_planted(spark, tmp_path):
    """Two sources sharing exactly one 8-gram out of 16+16 distinct
    grams; a third source with no overlap emits no pair row."""
    shared = " ".join(f"w{i}" for i in range(8))  # 8 tokens → 1 gram
    a_extra = " ".join(f"a{i}" for i in range(15))  # + bridge grams
    b_extra = " ".join(f"b{i}" for i in range(15))
    rows = [
        Row(doc_id=1, text=f"{shared} {a_extra}", source="sA"),
        Row(doc_id=2, text=f"{shared} {b_extra}", source="sB"),
        Row(doc_id=3, text=" ".join(f"c{i}" for i in range(20)), source="sC"),
    ]
    sf_dir = _write(spark, tmp_path, "documents", rows)
    out = QUERIES["corpus_source_overlap"].spark(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("sA", "sB")
    # each doc has 23 tokens → 23-8+1 = 16 distinct grams; the bridge
    # grams (mixing shared + per-source tokens) differ between the two
    # sources, so the intersection is exactly the 1 pure shared gram
    assert r["n_common"] == 1
    assert r["jaccard"] == round(1 / (16 + 16 - 1), 6)


def test_standardize_planted(spark, tmp_path):
    """Two 2-dim vectors {1.0, 3.0} per dimension → z = ∓1 exactly
    (integer math: q = {10000, 30000}, n·q−S1 = ∓20000, √(n·S2−S1²)
    = 20000)."""
    rows = [
        Row(vec_id=1, embedding=[1.0, 3.0]),
        Row(vec_id=2, embedding=[3.0, 1.0]),
    ]
    sf_dir = _write(spark, tmp_path, "embeddings", rows)
    out = QUERIES["embedding_standardize"].spark(spark, sf_dir).collect()
    z = {(r["vec_id"], r["pos"]): r["z"] for r in out}
    assert z == {
        (1, 0): -1.0,
        (1, 1): 1.0,
        (2, 0): 1.0,
        (2, 1): -1.0,
    }


def test_standardize_constant_dimension(spark, tmp_path):
    """A zero-variance dimension standardizes to 0.0, not NaN/inf."""
    rows = [
        Row(vec_id=1, embedding=[5.0, 1.0]),
        Row(vec_id=2, embedding=[5.0, 2.0]),
    ]
    sf_dir = _write(spark, tmp_path, "embeddings", rows)
    out = QUERIES["embedding_standardize"].spark(spark, sf_dir).collect()
    z0 = [r["z"] for r in out if r["pos"] == 0]
    assert z0 == [0.0, 0.0]


@pytest.fixture(scope="module")
def leakage_rows(spark):
    return (
        QUERIES["dataset_split_leakage_safe"].spark(spark, SF_SMOKE).collect()
    )


def test_leakage_safe_split_no_leaks(leakage_rows):
    """The guarantee the query exists for: zero near-dup pairs straddle
    a split boundary (components are assigned atomically)."""
    assert leakage_rows
    assert all(r["leaked_pairs"] == 0 for r in leakage_rows)


def test_leakage_safe_split_covers_corpus(spark, leakage_rows):
    """Every corpus doc lands in exactly one split, and groups ≤ docs."""
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups
    from data_ingestion_py_spark.io import load_table

    n = _corpus_with_near_dups(
        load_table(spark, SF_SMOKE, "documents")
    ).count()
    assert sum(r["n_docs"] for r in leakage_rows) == n
    assert all(r["n_groups"] <= r["n_docs"] for r in leakage_rows)


def test_leakage_safe_split_agrees_with_components(spark):
    """Cross-check the atomic-assignment invariant directly: every
    member of every connected component gets the SAME split as its
    component representative would."""
    from data_ingestion_py_spark.operators import dedup
    from data_ingestion_py_spark.operators.components import (
        connected_components,
    )
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups
    from data_ingestion_py_spark.queries_pipeline import assign_split
    from data_ingestion_py_spark.io import load_table

    corpus = _corpus_with_near_dups(load_table(spark, SF_SMOKE, "documents"))
    pairs = dedup.near_duplicates_minhash(corpus, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    cc = connected_components(pairs)
    n_mixed = (
        cc.select(
            "component", assign_split(F.col("node")).alias("naive_split")
        )
        .groupBy("component")
        .agg(F.countDistinct("naive_split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    # the naive per-doc split DOES break up components on this corpus —
    # i.e. the leakage-safe variant is not vacuously equal to it
    assert n_mixed > 0


def test_substring_cuts_planted(spark, tmp_path):
    """Two docs share a 10-token span; only the 3 pure-shared 8-grams
    per doc are flagged and they merge into ONE cut covering exactly
    the shared token range. doc 4 (mod-5 clone source) is avoided by
    using ids 1-3; doc 3 has no repeats → no cut rows.

    Note: the query seeds clones for doc_id % 5 == 0, so ids are
    chosen non-multiples of 5 to keep the planted corpus exact."""
    shared = " ".join(f"s{i}" for i in range(10))
    ua = " ".join(f"a{i}" for i in range(5))
    ua2 = " ".join(f"x{i}" for i in range(5))
    ub = " ".join(f"b{i}" for i in range(10))
    rows = [
        Row(doc_id=1, text=f"{ua} {shared} {ua2}"),   # shared = tokens 5..14
        Row(doc_id=2, text=f"{shared} {ub}"),          # shared = tokens 0..9
        Row(doc_id=3, text=" ".join(f"c{i}" for i in range(20))),
    ]
    sf_dir = _write(spark, tmp_path, "documents", rows)
    out = QUERIES["corpus_substring_cuts"].spark(spark, sf_dir).collect()
    cuts = {r["doc_id"]: (r["cut_start"], r["cut_end"], r["n_flagged_grams"])
            for r in out}
    assert set(cuts) == {1, 2}
    assert cuts[1] == (5, 14, 3)
    assert cuts[2] == (0, 9, 3)


def test_prefix_filter_is_exact_superset_of_lsh(spark):
    """Ground truth: the prefix-filter join is EXACT (no recall loss),
    so every LSH-found pair at the same threshold must appear in it —
    and the measured LSH recall against exact truth stays ≥ 0.9 (the
    property the banded-LSH design promises probabilistically)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_prefix_filter_pairs"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh_pairs"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    assert lsh <= exact, f"LSH invented pairs: {sorted(lsh - exact)[:5]}"
    assert exact, "exact join found nothing — fixture broken"
    assert len(lsh) / len(exact) >= 0.9


def test_sorted_neighborhood_planted(spark, tmp_path):
    """Names that blocking-on-last-token would separate ('blue bolt' vs
    'blue bolts') sit adjacent in sort order and match; a name more
    than W ranks away is never compared. Expected sort order: 'blue
    bolt'(1), 'blue bolts'(2), 'blue colt'(3), then 'zz...' names."""
    rows = [
        Row(p_partkey=1, p_name="blue bolt"),
        Row(p_partkey=2, p_name="blue bolts"),
        Row(p_partkey=3, p_name="blue colt"),
    ] + [Row(p_partkey=10 + i, p_name=f"zz{i:03d} widget") for i in range(20)]
    sf_dir = _write(spark, tmp_path, "part", rows)
    out = {
        (r["key_a"], r["key_b"]): r["lev"]
        for r in QUERIES["parts_sorted_neighborhood"]
        .spark(spark, sf_dir)
        .collect()
    }
    # lev('blue bolt','blue bolts')=1, ('blue bolt','blue colt')=1,
    # ('blue bolts','blue colt')=2; zz-names differ by their 3-digit
    # index (lev<=3 within the W-neighborhood) — assert the planted
    # trio exactly and that no zz-name ever pairs with a blue-name
    assert out[(1, 2)] == 1 and out[(1, 3)] == 1 and out[(2, 3)] == 2
    assert not any((a < 10) != (b < 10) for a, b in out)


def test_k_anonymity_planted(spark, tmp_path):
    """A 2-member group violates k; a 12-member all-positive-balance
    group violates l only; a 12-member mixed group is absent."""
    rows = (
        [Row(c_custkey=i, c_nationkey=1, c_mktsegment="A",
             c_acctbal=float(i)) for i in range(2)]
        + [Row(c_custkey=100 + i, c_nationkey=2, c_mktsegment="B",
               c_acctbal=50.0 + i) for i in range(12)]
        + [Row(c_custkey=200 + i, c_nationkey=3, c_mktsegment="C",
               c_acctbal=(-1.0 if i % 2 else 1.0) * (1 + i)) for i in range(12)]
    )
    sf_dir = _write(spark, tmp_path, "customer", rows)
    out = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in QUERIES["dq_k_anonymity"].spark(spark, sf_dir).collect()
    }
    assert set(out) == {(1, "A"), (2, "B")}
    assert out[(1, "A")]["k_violation"] is True
    assert out[(2, "B")]["k_violation"] is False
    assert out[(2, "B")]["l_violation"] is True


def test_winnowing_planted_shared_passage(spark, tmp_path):
    """Two docs embed the same 30-token passage at different offsets
    (surrounded by unique text); winnowing's guarantee — any shared
    run ≥ w+k−1 tokens yields a shared fingerprint — must fire well
    past the m=3 reporting floor. The all-unique doc matches nobody.
    (ids avoid multiples of 5 — the query seeds clones for those.)"""
    passage = " ".join(f"p{i}" for i in range(30))
    rows = [
        Row(doc_id=1, text=" ".join(f"a{i}" for i in range(10))
            + f" {passage} " + " ".join(f"x{i}" for i in range(10))),
        Row(doc_id=2, text=f"{passage} " + " ".join(f"b{i}" for i in range(20))),
        Row(doc_id=3, text=" ".join(f"c{i}" for i in range(40))),
    ]
    sf_dir = _write(spark, tmp_path, "documents", rows)
    out = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in QUERIES["text_winnowing_matches"].spark(spark, sf_dir).collect()
    }
    assert (1, 2) in out and out[(1, 2)] >= 3
    assert not any(3 in p for p in out)


def test_entity_resolution_planted(spark, tmp_path):
    """'red ring' ↔ 'rad ring' ↔ 'rad rang'? No — chain within one
    block: red ring ~ rad ring (lev 1); 'chartreuse ring' too far from
    both; 'small bolt'/'smell bolt' (lev 1) a second entity. Golden
    key = min p_partkey in each cluster; record counts sum the
    duplicate rows."""
    rows = [
        Row(p_partkey=7, p_name="red ring"),
        Row(p_partkey=2, p_name="red ring"),
        Row(p_partkey=3, p_name="rad ring"),
        Row(p_partkey=4, p_name="chartreuse ring"),
        Row(p_partkey=5, p_name="small bolt"),
        Row(p_partkey=6, p_name="smell bolt"),
    ]
    sf_dir = _write(spark, tmp_path, "part", rows)
    out = {
        r["canonical_name"]: r
        for r in QUERIES["parts_entity_resolution"].spark(spark, sf_dir).collect()
    }
    assert set(out) == {"rad ring", "small bolt"}
    ring = out["rad ring"]  # min("red ring", "rad ring") lexicographic
    assert (ring["n_names"], ring["n_records"], ring["golden_key"]) == (2, 3, 2)
    bolt = out["small bolt"]
    assert (bolt["n_names"], bolt["n_records"], bolt["golden_key"]) == (2, 2, 5)
