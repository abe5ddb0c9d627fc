"""Unit properties for the Bloom filter and BFS operators.

The registry queries (`corpus_bloom_decontaminate`,
`graph_bfs_distances`, `events_cms_heavy_hitters`) are hash-gated by
the oracle-parity mirror; these tests pin the operator-level contracts
the gate can't see — Bloom's no-false-negative guarantee on planted
members, BFS frontier semantics on planted graphs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_py_spark.operators.bfs import bfs_distances
from data_ingestion_py_spark.operators.bloom import (
    BLOOM_BITS,
    BLOOM_HASHES,
    bloom_build,
    bloom_probe,
)


def _grams(spark, words):
    return spark.createDataFrame([(w,) for w in words], "g string")


def test_bloom_no_false_negatives(spark):
    members = [f"gram-{i}" for i in range(500)]
    filt = bloom_build(_grams(spark, members))
    probed = bloom_probe(
        _grams(spark, members).withColumn("doc_id", F.lit(1)),
        filt,
        ["doc_id"],
    )
    assert probed.where(~F.col("bloom_hit")).count() == 0


def test_bloom_fp_rate_near_design(spark):
    """Probe 4000 NON-members against a 500-member filter: observed FP
    rate must sit within 3× of the (1-exp(-kn/m))^k design rate (and
    be nonzero-capable without failing when it is zero)."""
    import math

    members = [f"gram-{i}" for i in range(500)]
    others = [f"other-{i}" for i in range(4000)]
    filt = bloom_build(_grams(spark, members))
    probed = bloom_probe(
        _grams(spark, others).withColumn("doc_id", F.lit(1)), filt, ["doc_id"]
    )
    fp = probed.where(F.col("bloom_hit")).count()
    design = (1 - math.exp(-BLOOM_HASHES * 500 / BLOOM_BITS)) ** BLOOM_HASHES
    assert fp / 4000 <= 3 * design + 0.01, (fp, design)


def test_bloom_filter_table_bounded(spark):
    filt = bloom_build(_grams(spark, [f"g{i}" for i in range(5000)]))
    assert filt.count() <= BLOOM_BITS // 32


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _sources(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_bfs_chain_distances(spark):
    # undirected chain 0-1-2-3, plus disconnected 9-10
    pairs = [(0, 1), (1, 2), (2, 3), (9, 10)]
    und = pairs + [(b, a) for a, b in pairs]
    out = {
        r.node: r.dist
        for r in bfs_distances(_edges(spark, und), _sources(spark, [0])).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}  # 9,10 unreachable → absent


def test_bfs_multi_source_nearest(spark):
    # chain 0-1-2-3-4 with seeds {0, 4}: node 2 is 2 hops from both
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    und = pairs + [(b, a) for a, b in pairs]
    out = {
        r.node: r.dist
        for r in bfs_distances(
            _edges(spark, und), _sources(spark, [0, 4])
        ).collect()
    }
    assert out == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_cycle_terminates(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    und = pairs + [(b, a) for a, b in pairs]
    out = {
        r.node: r.dist
        for r in bfs_distances(_edges(spark, und), _sources(spark, [0])).collect()
    }
    assert out == {0: 0, 1: 1, 2: 1}


def test_bellman_ford_weighted_beats_direct_edge(spark):
    """Planted graph where the cheap 3-hop detour (1+1+1) beats the
    direct cost-5 edge — distinguishes min-plus from hop-count BFS."""
    from data_ingestion_py_spark.operators.bfs import bellman_ford_rounds

    pairs = [(0, 3, 5), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    und = pairs + [(b, a, c) for a, b, c in pairs]
    e = spark.createDataFrame(und, "u long, v long, cost long")
    out = {
        r.node: r.dist
        for r in bellman_ford_rounds(e, _sources(spark, [0]), 5).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}
    # hop-count BFS on the same graph settles node 3 at the direct edge
    bfs_out = {
        r.node: r.dist
        for r in bfs_distances(
            e.select("u", "v"), _sources(spark, [0])
        ).collect()
    }
    assert bfs_out[3] == 1


def test_bellman_ford_preconvergence_is_deterministic(spark):
    """With too few rounds the result is NOT converged but IS exact
    per the fixed unroll — the property the oracle hash gate relies
    on (chain 0-1-2-3, 1 round: only node 1 settled besides the seed)."""
    from data_ingestion_py_spark.operators.bfs import bellman_ford_rounds

    pairs = [(0, 1, 2), (1, 2, 2), (2, 3, 2)]
    und = pairs + [(b, a, c) for a, b, c in pairs]
    e = spark.createDataFrame(und, "u long, v long, cost long")
    out = {
        r.node: r.dist
        for r in bellman_ford_rounds(e, _sources(spark, [0]), 1).collect()
    }
    assert out == {0: 0, 1: 2}


def test_bfs_per_seed_matches_independent_runs(spark):
    """The combined (seed, node)-keyed sweep must equal running
    bfs_distances independently from each seed — including a
    disconnected component (seeds 0 and 10 never see each other)."""
    from data_ingestion_py_spark.operators.bfs import bfs_distances_per_seed

    pairs = [(0, 1), (1, 2), (10, 11)]
    und = pairs + [(b, a) for a, b in pairs]
    e = _edges(spark, und)
    seeds = spark.createDataFrame([(0,), (2,), (10,)], "seed long")
    got = {
        (r.seed, r.node): r.dist
        for r in bfs_distances_per_seed(e, seeds).collect()
    }
    want = {}
    for s in (0, 2, 10):
        for r in bfs_distances(e, _sources(spark, [s])).collect():
            want[(s, r.node)] = r.dist
    assert got == want
