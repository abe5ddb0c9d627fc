"""Label-propagation unit semantics on planted graphs.

The registry query is hash-gated vs the DuckDB unrolled-CTE replay;
these pin the operator contract the gate can't see: community
separation on a planted two-clique graph, tie determinism, and the
self-weight damping of synchronous-LPA oscillation.
"""

from __future__ import annotations

from data_ingestion_py_spark.operators.labelprop import label_propagation


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def _labels(spark, e, **kw):
    return {
        r.node: r.label for r in label_propagation(e, **kw).collect()
    }


def test_two_cliques_weak_bridge_separate(spark):
    # cliques {0,1,2} and {10,11,12} with strong internal edges, one
    # weak bridge 2-10: each clique converges to its min label
    tri = lambda a, b, c, w: [(a, b, w), (b, c, w), (a, c, w)]
    e = _edges(spark, tri(0, 1, 2, 10) + tri(10, 11, 12, 10) + [(2, 10, 1)])
    out = _labels(spark, e, n_rounds=5)
    assert out[0] == out[1] == out[2] == 0
    assert out[10] == out[11] == out[12] == 10


def test_tie_goes_to_lower_label(spark):
    # node 5 pulled equally by 0 and 9 → lower label wins
    e = _edges(spark, [(0, 5, 3), (9, 5, 3)])
    out = _labels(spark, e, n_rounds=3)
    assert out[5] == 0


def test_self_weight_damps_two_node_oscillation(spark):
    # bare two-node graph: with self_weight=0 synchronous LPA swaps
    # labels forever (known oscillation); the default self-vote makes
    # the neighbor vote tie against inertia, tie → lower label, so
    # both settle on 0
    e = _edges(spark, [(0, 1, 1)])
    out = _labels(spark, e, n_rounds=4)
    assert out == {0: 0, 1: 0}
