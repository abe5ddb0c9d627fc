"""Deterministic integer-quantized k-means (Lloyd's iterations).

The clustering primitive the similarity layer assumes: ``ivf_topk`` and
``semantic_dedup_pairs`` take a cluster assignment as given (the
fixture's ``label`` column stands in); this operator produces that
assignment for real — companion to ``operators/pagerank.py`` as the
second oracle-replayable iterative algorithm.

Determinism design (same family as pagerank's integer fixed-point):
embedding components quantize to integer micro-units
(``floor(x·1e6)``, the ``embedding_label_centroids`` convention), so

- squared-L2 distances ``v·v − 2·v·c + c·c`` are sums of integer
  products ≤ ~2.6e14 < 2^53 — EXACT in double arithmetic in any
  engine, no summation-order drift;
- centroid updates are exact integer sums + floor division
  (``(s − pmod(s, n)) / n``, identical to DuckDB's
  ``(s − ((s % n) + n) % n) / n``);
- seeds are the k lowest ``vec_id`` rows (no RNG), ties in the argmin
  break on the lower cid

— so the full iteration replays bit-identically as unrolled DuckDB
CTEs and sits under the registry's hard hash gate.

Scale shape, per round: centroids are k×dim — ALWAYS broadcastable
(one 1-row array crossJoin, the tiny-broadcast pattern); assignment is
one narrow map over the corpus (argmin via ``array_min`` over k
(distance, cid) structs — JVM column algebra, no UDF); the update is
posexplode → one hash-agg keyed (cid, pos) with map-side integer
partial sums. Per-round ``localCheckpoint`` of the k-row centroid
table keeps plan depth constant; the quantized corpus pins once
(``materialize.pin`` — pass ``storage_level="DISK_ONLY"`` at 100 TB).
Empty clusters keep their previous centroid (standard Lloyd's guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_ingestion_py_spark.operators.materialize import pin
from data_ingestion_py_spark.operators.similarity import dot

SCALE = 1_000_000


def _centroid_array(cents: DataFrame) -> DataFrame:
    """k-row (cid, cvec) table → 1-row array<struct<cid, cvec, cc>>
    ordered by cid, with each centroid's self-dot precomputed."""
    return cents.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("_cs")
    ).select(
        F.transform(
            "_cs",
            lambda s: F.struct(
                s["cid"].alias("cid"),
                s["cvec"].alias("cvec"),
                dot(s["cvec"], s["cvec"]).alias("cc"),
            ),
        ).alias("cents")
    )


def _assign(vq: DataFrame, cent_row: DataFrame) -> DataFrame:
    """(vec_id, v) × centroid array → (vec_id, v, cid) by exact
    squared-L2 argmin, ties to the lower cid (array_min over
    struct<d, cid> is lexicographic)."""
    vv = dot(F.col("v"), F.col("v"))
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (vv - 2 * dot(F.col("v"), c["cvec"]) + c["cc"]).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return vq.crossJoin(F.broadcast(cent_row)).select(
        "vec_id", "v", best["cid"].alias("cid")
    )


def kmeans_integer(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    storage_level: str | None = None,
) -> DataFrame:
    """(vec_id, cid) after ``n_iter`` assignment rounds (with
    ``n_iter − 1`` centroid updates between them) of deterministic
    integer Lloyd's k-means. ``cid`` is 0..k−1 by seed order (the k
    lowest vec_ids)."""
    vq = pin(
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.transform(
                vec_col,
                lambda x: F.floor(x.cast("double") * SCALE)
                .cast("long")
                .cast("double"),
            ).alias("v"),
        ),
        storage_level,
    )
    seeds = vq.orderBy("vec_id").limit(k)
    # cid = position in the vec_id-sorted seed array (posexplode index)
    cents = (
        seeds.agg(
            F.array_sort(F.collect_list(F.struct("vec_id", "v"))).alias("_s")
        )
        .select(F.posexplode(F.col("_s")).alias("cid", "s"))
        .select(
            F.col("cid").cast("int").alias("cid"), F.col("s")["v"].alias("cvec")
        )
        .localCheckpoint(eager=True)
    )
    assigned = _assign(vq, _centroid_array(cents))
    for _ in range(n_iter - 1):
        n = F.count(F.lit(1))
        s = F.sum("val").cast("long")
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                ((s - F.pmod(s, n)) / n).cast("long").cast("double").alias("m")
            )
        )
        newc = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda st: st["m"],
            ).alias("cvec")
        )
        # empty clusters keep their previous centroid
        cents = (
            cents.select("cid", F.col("cvec").alias("_old"))
            .join(newc, "cid", "left")
            .select("cid", F.coalesce("cvec", "_old").alias("cvec"))
            .localCheckpoint(eager=True)
        )
        assigned = _assign(vq, _centroid_array(cents))
    return assigned.select("vec_id", "cid")


def kmeans_ctes(
    embeddings_rel: str = "embeddings",
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[str, str]:
    """The unrolled k-means CTE chain, composable into larger oracle
    queries. Returns (ctes, final_assignment_name): the caller prepends
    its own CTEs (e.g. a planted-dup corpus) and selects from the
    returned assignment relation (vec_id, v, cid)."""
    d2 = (
        "(list_dot_product(q.v, q.v) - 2 * list_dot_product(q.v, c.cvec)"
        " + list_dot_product(c.cvec, c.cvec))"
    )
    parts = [
        f"""vq AS (
    SELECT {id_col} AS vec_id,
           list_transform({vec_col}, x ->
               CAST(CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)
                    AS DOUBLE)) AS v
    FROM {embeddings_rel}
)""",
        f"""c0 AS (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
           v AS cvec
    FROM (SELECT vec_id, v FROM vq ORDER BY vec_id LIMIT {k})
)""",
    ]
    prev_c = "c0"
    for i in range(1, n_iter + 1):
        parts.append(
            f"""a{i} AS (
    SELECT q.vec_id, q.v,
           (SELECT c.cid FROM {prev_c} c
            ORDER BY {d2}, c.cid LIMIT 1) AS cid
    FROM vq q
)"""
        )
        if i < n_iter:
            parts.append(
                f"""m{i} AS (
    SELECT cid, pos,
           CAST(CAST((s - ((s % n) + n) % n) / n AS BIGINT) AS DOUBLE) AS m
    FROM (
        SELECT cid, u.pos AS pos, CAST(sum(u.q) AS BIGINT) AS s,
               count(*) AS n
        FROM (
            SELECT cid,
                   unnest(list_transform(generate_series(1, len(v)),
                       j -> {{'pos': j - 1, 'q': CAST(v[j] AS BIGINT)}})) AS u
            FROM a{i})
        GROUP BY cid, u.pos)
)""",
            )
            parts.append(
                f"""c{i} AS (
    SELECT p.cid, coalesce(nc.cvec, p.cvec) AS cvec
    FROM {prev_c} p
    LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS cvec
               FROM m{i} GROUP BY cid) nc USING (cid)
)"""
            )
            prev_c = f"c{i}"
    return ",\n".join(parts), f"a{n_iter}"


def kmeans_oracle_sql(
    embeddings_rel: str = "embeddings",
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB SQL replaying ``kmeans_integer`` exactly — quantize,
    seed, then alternate assignment (correlated argmin over the k
    centroids, ties to lower cid) and floor-division centroid update,
    unrolled as chained CTEs."""
    ctes, final = kmeans_ctes(embeddings_rel, k, n_iter, vec_col, id_col)
    return f"""
WITH {ctes}
SELECT vec_id, cid FROM {final}
"""
