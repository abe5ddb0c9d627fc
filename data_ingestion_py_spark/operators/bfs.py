"""Multi-source BFS shortest hop distances — frontier expansion.

The third iterative-graph shape in the kit, next to fixpoint labeling
(``components.py``) and weighted diffusion (``pagerank.py``): level-
synchronous breadth-first search. Per round the plan is one shuffle
join (frontier ⋈ edges on the source endpoint) plus one left-anti join
against the settled set — both keyed equi-joins AQE handles — and the
per-round state is the FRONTIER (nodes first reached this round), not
the whole graph, so late rounds on high-diameter graphs cost only the
fringe. ``localCheckpoint`` truncates lineage per round (house pattern
from ``components.py``); the loop stops on the first empty frontier —
one ``isEmpty`` scalar action per round, the standard driver-side
control loop of Pregel-style algorithms.

Scale notes: distances/frontiers shuffle on node id; edges shuffle on
the join key only (and AQE can pick a broadcast when a frontier is
small). Unreached nodes simply never enter the output — the caller
left-joins if "unreachable" rows are wanted. For weighted shortest
paths the same skeleton carries (node, dist) with a min-aggregate
instead of an anti-join (Bellman-Ford rounds); BFS is the hop-count
special case where a node's first reach IS its minimum, which is what
makes the anti-join (cheaper than a min over all reaches) sufficient.

The reference (`data_ingestion.py`) has no graph surface; this is
north-star corpus-analysis capability (e.g. link-distance from a
trusted seed set as a quality prior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "u",
    dst: str = "v",
    node: str = "node",
    max_iter: int = 30,
) -> DataFrame:
    """(node, dist) for every node reachable from ``sources``.

    ``edges`` is DIRECTED as given — pass both orientations for an
    undirected graph. ``sources`` rows are distance-0 seeds (multi-
    source: dist = hops to the NEAREST seed). ``dist`` is LongType.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    dist = (
        sources.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    for i in range(1, max_iter + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(i).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return dist


def bellman_ford_rounds(
    edges: DataFrame,
    sources: DataFrame,
    n_rounds: int,
    src: str = "u",
    dst: str = "v",
    weight: str = "cost",
    node: str = "node",
) -> DataFrame:
    """(node, dist) after exactly ``n_rounds`` min-plus relaxations —
    WEIGHTED shortest paths from the seed set (non-negative integer
    weights).

    Deliberately a FIXED unroll, not a convergence loop: both engines
    run the same round count, so the result is bit-identical even on
    inputs where ``n_rounds`` has not yet converged — the same design
    choice as ``pagerank_integer`` (`bellman_ford_oracle_sql` replays
    it as chained CTEs). Rounds ≥ the hop count of the longest
    shortest path ⇒ exact distances. Per round: one shuffle join
    (settled ⋈ edges on the source endpoint) + one keyed min — state
    is the settled (node, dist) table, node-cardinality-sized, lineage
    truncated per round. Integer weights ⇒ no float summation drift.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("cost")
    ).localCheckpoint()
    dist = (
        sources.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    for _ in range(n_rounds):
        relaxed = dist.join(e, dist["node"] == e["u"]).select(
            F.col("v").alias("node"),
            (F.col("dist") + F.col("cost")).cast("long").alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist


def bellman_ford_oracle_sql(
    edges_cte: str, sources_cte: str, n_rounds: int
) -> str:
    """DuckDB SQL replaying ``bellman_ford_rounds`` exactly: the same
    fixed min-plus rounds unrolled as chained CTEs over an
    ``e(u, v, cost)`` CTE body and a ``srcs(node)`` seed CTE. Returns
    (node, dist) — callers wrap it for naming/joins."""
    its = []
    prev = "r0"
    # AS MATERIALIZED is load-bearing: each round references the
    # previous round's CTE twice, so default CTE INLINING doubles the
    # plan per round — 2^n copies of the edge build by round n. The
    # Spark side has the same shape and the same fix (localCheckpoint
    # per round); MATERIALIZED is DuckDB's spelling of it.
    for i in range(1, n_rounds + 1):
        its.append(
            f"""it{i} AS MATERIALIZED (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.v AS node, r.dist + e.cost AS dist
        FROM {prev} r JOIN e ON e.u = r.node
    ) GROUP BY node
)"""
        )
        prev = f"it{i}"
    joined = ",\n".join(its)
    return f"""
WITH e AS MATERIALIZED ({edges_cte}),
srcs AS ({sources_cte}),
r0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM srcs),
{joined}
SELECT node, CAST(dist AS BIGINT) AS dist FROM {prev}
"""


def bfs_distances_per_seed(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "u",
    dst: str = "v",
    seed: str = "seed",
    max_iter: int = 30,
) -> DataFrame:
    """(seed, node, dist) — independent BFS from EVERY seed in one
    level-synchronous sweep (the all-sources generalization behind
    closeness/harmonic centrality and landmark distance features).

    State is keyed (seed, node): per round ONE join of the combined
    frontier against the edge list on the node endpoint serves every
    seed simultaneously — k BFS runs cost the same number of ROUNDS as
    one (the graph diameter), with k× the per-round rows. That's the
    right shape for a landmark set (k ≪ n); for ALL nodes as seeds on
    a big graph the state is O(n²) and the honest swap is sampling
    landmarks or HyperBall-style sketched neighborhoods (documented,
    not implemented). Same empty-frontier stop + per-round
    ``localCheckpoint`` as ``bfs_distances``.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    dist = (
        seeds.select(F.col(seed).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"))
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = dist.select("seed", "node")
    for i in range(1, max_iter + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select("seed", F.col("v").alias("node"))
            .distinct()
            .join(dist, ["seed", "node"], "left_anti")
            .withColumn("dist", F.lit(i).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("seed", "node")
    return dist
