"""Planted-graph semantics for operators/kcore."""

from __future__ import annotations

from pyspark.sql import Row

from data_ingestion_py_spark.operators.kcore import kcore_alive, kcore_degrees


def _sym(spark, und_edges):
    rows = [Row(u=a, v=b) for a, b in und_edges] + [
        Row(u=b, v=a) for a, b in und_edges
    ]
    return spark.createDataFrame(rows)


def test_clique_survives_tail_peels(spark):
    # K4 on {1,2,3,4} plus a tail 4-5-6: the tail must peel away in
    # CASCADE (6 first, then 5) — one round is not enough, which is
    # exactly what iterative peeling exists for
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (5, 6)]
    alive = {
        r.node for r in kcore_alive(_sym(spark, k4 + tail), k=3, rounds=4).collect()
    }
    assert alive == {1, 2, 3, 4}
    degs = {
        r.node: r.core_degree
        for r in kcore_degrees(_sym(spark, k4 + tail), k=3, rounds=4).collect()
    }
    assert degs == {1: 3, 2: 3, 3: 3, 4: 3}  # tail edge of 4 excluded


def test_whole_graph_can_peel_to_empty(spark):
    # a cycle has uniform degree 2 → the 3-core is empty
    cyc = [(1, 2), (2, 3), (3, 1)]
    assert kcore_alive(_sym(spark, cyc), k=3, rounds=3).count() == 0


def test_extra_rounds_are_noops(spark):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    a2 = {r.node for r in kcore_alive(_sym(spark, k4), k=3, rounds=2).collect()}
    a6 = {r.node for r in kcore_alive(_sym(spark, k4), k=3, rounds=6).collect()}
    assert a2 == a6 == {1, 2, 3, 4}
