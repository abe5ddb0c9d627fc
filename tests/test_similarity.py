"""Structural tests for similarity search (brute force + LSH ANN)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.operators import similarity
from tests.conftest import SF_SMOKE


def test_bruteforce_topk_shape(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = similarity.cosine_topk(emb, 0, 10).collect()
    assert len(out) == 10
    sims = [r.cosine_sim for r in out]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)
    assert all(r.vec_id != 0 for r in out)


def test_lsh_ann_subset_of_bucket_and_sims_exact(spark):
    """ANN results must (a) be ≤ k rows, (b) exclude the query, (c) report
    the same cosine as brute force for the ids it returns."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    ann = similarity.lsh_bucketed_ann(emb, 0, 10, n_planes=4).collect()
    assert 0 < len(ann) <= 10
    brute = {
        r.vec_id: r.cosine_sim
        for r in similarity.cosine_topk(emb, 0, k=10_000).collect()
    }
    for r in ann:
        assert r.vec_id != 0
        assert abs(brute[r.vec_id] - r.cosine_sim) < 1e-9


def test_lsh_ann_deterministic(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = sorted((r.vec_id, r.cosine_sim) for r in
               similarity.lsh_bucketed_ann(emb, 0, 10, n_planes=4).collect())
    b = sorted((r.vec_id, r.cosine_sim) for r in
               similarity.lsh_bucketed_ann(
                   emb.repartition(5), 0, 10, n_planes=4).collect())
    assert a == b


def test_bruteforce_stays_jvm_side(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = (
        similarity.cosine_topk(emb, 0, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
