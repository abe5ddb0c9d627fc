"""Triangle counting: id vs degree orientation must agree everywhere —
including the planted-hub graphs the degree orientation exists for.
The registry query (degree-oriented) is separately hash-gated against
the id-canonical DuckDB oracle in test_oracle_parity."""

from __future__ import annotations

from data_ingestion_py_spark.operators.triangles import (
    triangle_counts,
    undirected_edges,
)


def _counts(spark, edges, orient):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = triangle_counts(undirected_edges(df), orient=orient)
    return {r.node: r.n_triangles for r in out.collect()}


def _both_equal(spark, edges):
    a = _counts(spark, edges, "id")
    b = _counts(spark, edges, "degree")
    assert a == b, f"{a} vs {b} on {edges}"
    return a


def test_single_triangle_and_isolated_edge(spark):
    got = _both_equal(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1}  # 10/11 are in no triangle


def test_k4_every_node_in_three(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _both_equal(spark, k4)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_hub_with_fan_triangles(spark):
    # hub 0 connected to 1..40; consecutive leaves also connected —
    # 39 triangles (0, i, i+1), each leaf in <=2, hub in all 39. The
    # shape where id orientation funnels every wedge through node 0.
    edges = [(0, i) for i in range(1, 41)]
    edges += [(i, i + 1) for i in range(1, 40)]
    got = _both_equal(spark, edges)
    assert got[0] == 39
    assert got[1] == 1 and got[40] == 1
    assert all(got[i] == 2 for i in range(2, 40))


def test_direction_and_duplicate_edges_ignored(spark):
    got = _both_equal(
        spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 3)]
    )
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_free_graph_empty(spark):
    # star + path: no triangles at all
    edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12)]
    assert _both_equal(spark, edges) == {}
