"""Label propagation (community detection) — fixed-round, integer-
deterministic, oracle-replayable.

The fourth iterative-graph shape in the kit (min-fixpoint components,
sum-diffusion PageRank, min-plus BFS/Bellman-Ford — and now MODE: each
node adopts the label carrying the greatest incident edge weight among
its neighbors). Community structure is the corpus-analysis complement
to components: components answers "which docs are literally linked",
communities answers "which sources/domains cluster together".

Determinism design: classic async LPA is order-dependent and
rand-seeded — un-oracle-able. This is the SYNCHRONOUS variant with a
total tie order: per round every node simultaneously adopts
``argmax_(label) (sum of incident edge weight, tie -> lower label)``,
including its own current label weighted by ``self_weight`` (the
inertia term that damps the oscillation synchronous LPA is known for
on bipartite-ish structures). A FIXED round count replays bit-for-bit
in DuckDB as unrolled MATERIALIZED CTEs (pagerank pattern) — converged
or not, both engines agree.

Scale shape, per round: edges ⋈ labels on the neighbor endpoint (one
keyed shuffle join), a (node, label)-keyed weight sum, and a per-node
argmax via ``max_by`` over the scalar key ``vote * label_bound -
label`` (ties → lower label; labels must sit in [0, label_bound),
which node-id labels on dimension-sized graphs do — at web scale swap
the scalar key for a max-then-min two-pass agg, same plan shape) —
all keyed aggs at edge/node cardinality, no driver data, lineage
truncated per round
(``localCheckpoint``). Hub nodes skew the label-sum key space exactly
like PageRank's contribution sum — AQE splits them; the argmax itself
is per-node and cannot hot-spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    n_rounds: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    self_weight: int = 1,
    label_bound: int = 1024,
) -> DataFrame:
    """(node, label) after ``n_rounds`` synchronous LPA rounds over the
    UNDIRECTED view of ``edges`` (both orientations are propagated).

    Labels start as the node ids; ``self_weight`` adds the node's own
    current label into the vote with that weight. Ties -> lower label.
    Integer weights only (float votes would drift by sum order).
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w")
    )
    und = (
        e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
        .localCheckpoint()
    )
    nodes = und.select(F.col("u").alias("node")).distinct().localCheckpoint()
    # The scalar argmax key ``vote * label_bound - label`` is only a
    # correct (vote DESC, label ASC) total order when every label sits
    # in [0, label_bound). Labels are node ids, so validate the id
    # domain up front (one cheap min/max agg) rather than silently
    # mis-ranking votes on graphs with ids outside the bound.
    lo, hi = nodes.agg(F.min("node"), F.max("node")).first()
    if hi is not None and (lo < 0 or hi >= label_bound):
        raise ValueError(
            f"label_propagation: node ids must lie in [0, label_bound="
            f"{label_bound}) for the scalar argmax key to order "
            f"correctly; got id range [{lo}, {hi}]. Raise label_bound "
            f"(and mirror it in the oracle SQL) or remap node ids."
        )
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(n_rounds):
        votes = (
            und.join(labels, und["v"] == labels["node"])
            .select("u", "label", "w")
            .unionByName(
                labels.select(
                    F.col("node").alias("u"),
                    "label",
                    F.lit(self_weight).cast("long").alias("w"),
                )
            )
            .groupBy("u", "label")
            .agg(F.sum("w").alias("vote"))
        )
        labels = (
            votes.groupBy(F.col("u").alias("node"))
            .agg(
                F.max_by(
                    F.col("label"),
                    F.col("vote") * label_bound - F.col("label"),
                ).alias("label")
            )
            .localCheckpoint()
        )
    return labels


def label_propagation_oracle_sql(
    edges_cte: str,
    n_rounds: int = 5,
    self_weight: int = 1,
    label_bound: int = 1024,
) -> str:
    """DuckDB SQL replaying ``label_propagation`` exactly: unrolled
    MATERIALIZED CTEs over an ``edges(src, dst, w)`` body; per round
    the argmax key is the scalar ``vote * label_bound - label``
    (DuckDB ``arg_max`` accepts only scalar keys), identical to the
    Spark side — vote first, then lower label wins."""
    its = []
    prev = "l0"
    for i in range(1, n_rounds + 1):
        its.append(
            f"""v{i} AS MATERIALIZED (
    SELECT u, label, sum(w) AS vote FROM (
        SELECT und.u, p.label, und.w
        FROM und JOIN {prev} p ON und.v = p.node
        UNION ALL
        SELECT node AS u, label, {self_weight} AS w FROM {prev}
    ) GROUP BY u, label
),
l{i} AS MATERIALIZED (
    SELECT u AS node, arg_max(label, vote * {label_bound} - label) AS label
    FROM v{i} GROUP BY u
)"""
        )
        prev = f"l{i}"
    joined = ",\n".join(its)
    return f"""
WITH e0 AS MATERIALIZED ({edges_cte}),
und AS MATERIALIZED (
    SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
        SELECT src AS u, dst AS v, w FROM e0 WHERE src <> dst
        UNION ALL
        SELECT dst, src, w FROM e0 WHERE src <> dst
    ) GROUP BY u, v
),
nodes AS (SELECT DISTINCT u AS node FROM und),
l0 AS (SELECT node, node AS label FROM nodes),
{joined}
SELECT node, CAST(label AS BIGINT) AS label FROM {prev}
"""
