"""Corpus-relationship queries: record linkage, cross-source overlap,
feature standardization, and leakage-safe splitting.

Four capabilities a training-data pipeline needs once it has more than
one corpus and more than one model run (none exist in the reference —
egorji/data_ingestion.py stops at single-collection CRUD):

- ``parts_fuzzy_matches``     — blocked record linkage (entity
  resolution): block on a cheap key, verify Levenshtein only within
  blocks, and verify over DISTINCT values so the edit-distance cost is
  bounded by distinct-value pairs, never record pairs.
- ``corpus_source_overlap``   — pairwise 8-gram Jaccard between
  sources: one gram-keyed shuffle, never a corpus×corpus join.
- ``embedding_standardize``   — feature-wise z-scores in the repo's
  exact-integer style: micro-unit quantization → integer sums → z as a
  deterministic float function of exact integers (same device as
  ``embedding_label_centroids``), so the hash gate holds across
  engines and partial-aggregation orders.
- ``dataset_split_leakage_safe`` — the split every dedup-aware corpus
  build needs: near-dup CLUSTERS (LSH pairs → connected components)
  are assigned to train/val/test atomically, so no near-duplicate pair
  ever straddles a split boundary (eval contamination by construction
  zero; the query PROVES it with a leaked-pairs counter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.operators import dedup
from data_ingestion_py_spark.queries import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Record linkage: blocked fuzzy matching over part names
# ---------------------------------------------------------------------------

_LEV_MAX = 3  # unit-cost edit distance; identical in Spark and DuckDB


@register(
    "parts_fuzzy_matches",
    f"""
WITH recs AS (
    SELECT p_partkey, p_name,
           string_split(p_name, ' ')[-1] AS block
    FROM part
), names AS (
    SELECT block, p_name, count(*) AS cnt
    FROM recs GROUP BY block, p_name
), blocks AS (
    SELECT block, sum(cnt) AS n_parts,
           sum(cnt * (cnt - 1) // 2) AS same_name_pairs
    FROM names GROUP BY block
), xmatch AS (
    SELECT a.block, sum(a.cnt * b.cnt) AS cross_pairs
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
    GROUP BY a.block
)
SELECT b.block,
       CAST(b.n_parts AS BIGINT) AS n_parts,
       CAST(b.n_parts * (b.n_parts - 1) // 2 AS BIGINT) AS n_pairs,
       CAST(b.same_name_pairs + coalesce(x.cross_pairs, 0) AS BIGINT)
           AS n_matches
FROM blocks b LEFT JOIN xmatch x ON b.block = x.block
""",
    tags=("linkage", "fuzzy"),
)
def q_parts_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked record linkage over part names: block = last name token,
    candidate pairs exist only within a block, match = Levenshtein ≤ 3.

    Scale shape: the expensive verify (edit distance) runs over
    DISTINCT (block, name) pairs, not record pairs — records collapse
    to (name, cnt) first, matched name pairs expand back by cnt·cnt
    arithmetic. With V distinct values per block the cost is O(V²) per
    block regardless of how many records share a name, and the whole
    query is one shuffle on the block key (a skewed block wants the
    same salting as any hot join key — operators/skew.py). The
    reference's only matching is exact name equality
    (data_ingestion.py:302-315); this is the fuzzy generalization.
    """
    recs = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    )
    names = recs.groupBy("block", "p_name").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    blocks = names.groupBy("block").agg(
        F.sum("cnt").cast("long").alias("n_parts"),
        F.sum(
            (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long")
        ).alias("same_name_pairs"),
    )
    a, b = names.alias("a"), names.alias("b")
    xmatch = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= _LEV_MAX
        )
        .groupBy(F.col("a.block").alias("block"))
        .agg((F.sum(F.col("a.cnt") * F.col("b.cnt"))).alias("cross_pairs"))
    )
    return (
        blocks.join(xmatch, "block", "left")
        .select(
            "block",
            F.col("n_parts").cast("long").alias("n_parts"),
            (F.col("n_parts") * (F.col("n_parts") - 1) / 2)
            .cast("long")
            .alias("n_pairs"),
            (
                F.col("same_name_pairs")
                + F.coalesce(F.col("cross_pairs"), F.lit(0))
            )
            .cast("long")
            .alias("n_matches"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source n-gram overlap matrix
# ---------------------------------------------------------------------------

_OVERLAP_K = 8  # same gram order as the contamination / repeated-gram suite


@register(
    "corpus_source_overlap",
    f"""
WITH toks AS (
    SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), grams AS (
    SELECT DISTINCT source,
           unnest(list_distinct(list_transform(
               generate_series(0, len(t) - {_OVERLAP_K}),
               i -> array_to_string(t[i+1 : i+{_OVERLAP_K}], ' ')))) AS g
    FROM toks WHERE len(t) >= {_OVERLAP_K}
), per_src AS (
    SELECT source, count(*) AS n_grams FROM grams GROUP BY source
), inter AS (
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS n_common
    FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b, i.n_common,
       round(CAST(i.n_common AS DOUBLE)
             / (pa.n_grams + pb.n_grams - i.n_common), 6) AS jaccard
FROM inter i
JOIN per_src pa ON i.source_a = pa.source
JOIN per_src pb ON i.source_b = pb.source
""",
    tags=("dedup", "overlap", "provenance"),
)
def q_corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 8-gram Jaccard between SOURCES — the corpus-level
    companion to per-document dedup: which crawls/feeds are rehashing
    each other's content (and should be down-weighted or dropped
    before training).

    Scale shape: per-source distinct grams (one keyed agg), then a
    self-join ON THE GRAM — each gram contributes |sources(g)|² pair
    rows, so cost is Σ_g s(g)², never corpus². Boilerplate grams that
    appear in nearly every source are the skew term; the production
    swap (documented, not applied — this query is exact) drops grams
    with s(g) > cap first, which only affects pairs already known to
    overlap everywhere. Jaccard is a ratio of exact integer counts
    rounded at 6 dp — deterministic across engines and partial-agg
    orders."""
    from data_ingestion_py_spark.functions.text import tokens

    d = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    grams = (
        d.select("source", t.alias("t"))
        .where(F.size("t") >= _OVERLAP_K)
        .select(
            "source",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(0), F.size("t") - F.lit(_OVERLAP_K)
                        ),
                        lambda i: F.array_join(
                            F.slice("t", i + 1, _OVERLAP_K), " "
                        ),
                    )
                )
            ).alias("g"),
        )
        .distinct()
    )
    per_src = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    pa = per_src.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("na")
    )
    pb = per_src.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("nb")
    )
    return (
        inter.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Feature-wise embedding standardization (exact-integer z-scores)
# ---------------------------------------------------------------------------

_STD_Q = 10000  # micro-unit scale; q² sums stay far inside BIGINT


@register(
    "embedding_standardize",
    f"""
WITH ex AS (
    SELECT vec_id, s.pos AS pos, s.q AS q
    FROM (SELECT vec_id,
                 unnest(list_transform(
                     generate_series(1, len(embedding)),
                     i -> {{'pos': i - 1,
                           'q': CAST(floor(CAST(embedding[i] AS DOUBLE)
                                           * {_STD_Q}) AS BIGINT)}}))
                     AS s
          FROM embeddings)
), st AS (
    SELECT pos, count(*) AS n, sum(q) AS s1, sum(q * q) AS s2
    FROM ex GROUP BY pos
)
SELECT ex.vec_id, CAST(ex.pos AS INT) AS pos,
       CASE WHEN st.n * st.s2 = st.s1 * st.s1 THEN 0.0
            ELSE round((st.n * ex.q - st.s1)
                       / sqrt(CAST(st.n * st.s2 - st.s1 * st.s1
                                   AS DOUBLE)), 4) + 0.0
       END AS z
FROM ex JOIN st ON ex.pos = st.pos
""",
    tags=("similarity", "normalize"),
)
def q_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-wise z-score standardization of the embedding matrix —
    the preprocessing step before cosine/k-means when features have
    unequal scales (and the whitening primitive PCA/JL pipelines start
    from).

    Exact-integer device (same as embedding_label_centroids): elements
    quantize to integer micro-units q = floor(x·1e4); per-dimension
    count/Σq/Σq² are EXACT integer aggregates, immune to partial-agg
    order; z = (n·q − Σq) / √(n·Σq² − (Σq)²) is then a deterministic
    float function of exact integers, so round(z, 4) is bit-identical
    in Spark and DuckDB — EXCEPT the sign of zero: DuckDB's round of a
    tiny negative yields -0.0, Spark's yields +0.0, hence the explicit
    `+ 0.0` normalization on both sides. With |q| ≤ 1e4·|x| and dims ≤ 64, n·Σq² fits
    BIGINT up to ~10¹⁰ rows per dimension — scale headroom documented
    rather than hoped.

    Scale shape: posexplode → one keyed agg on pos (≤ dim rows) →
    broadcast the dim-row stats back over the exploded table (narrow
    map). No data-sized shuffle except the explode itself."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * _STD_Q)
        .cast("long")
        .alias("q"),
    )
    st = ex.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    return ex.join(F.broadcast(st), "pos").select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.when(
            F.col("n") * F.col("s2") == F.col("s1") * F.col("s1"), F.lit(0.0)
        )
        .otherwise(
            F.round(
                (F.col("n") * F.col("q") - F.col("s1"))
                / F.sqrt(
                    (
                        F.col("n") * F.col("s2")
                        - F.col("s1") * F.col("s1")
                    ).cast("double")
                ),
                4,
            )
            # + 0.0 normalizes IEEE -0.0 → +0.0 (DuckDB's round keeps
            # the sign of a tiny negative, Spark's BigDecimal round does
            # not; the r07 driver hash caught exactly one such row).
            + F.lit(0.0)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split (near-dup clusters stay together)
# ---------------------------------------------------------------------------


def _leakage_oracle_sql() -> str:
    from data_ingestion_py_spark.queries_pipeline import _cc_chain_sql

    bucket = (
        "(('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 4))::BIGINT"
        " % 100)"
    )
    return (
        _cc_chain_sql()
        + f"""
, grouped AS (
    SELECT c.doc_id, coalesce(comp.cluster_id, c.doc_id) AS group_id
    FROM corpus c LEFT JOIN comp ON c.doc_id = comp.doc_id
), sp AS (
    SELECT doc_id, group_id,
           CASE WHEN {bucket} < 80 THEN 'train'
                WHEN {bucket} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM grouped
), rep AS (
    SELECT split, count(*) AS n_docs, count(DISTINCT group_id) AS n_groups
    FROM sp GROUP BY split
), leaks AS (
    SELECT count(*) AS leaked_pairs
    FROM verified v
    JOIN sp a ON v.doc_a = a.doc_id
    JOIN sp b ON v.doc_b = b.doc_id
    WHERE a.split <> b.split
)
SELECT rep.split, rep.n_docs, rep.n_groups, leaks.leaked_pairs
FROM rep CROSS JOIN leaks
"""
    )


@register(
    "dataset_split_leakage_safe",
    _leakage_oracle_sql(),
    tags=("sampling", "split", "dedup"),
)
def q_dataset_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split: near-duplicate CLUSTERS (LSH
    pairs → connected components), not documents, are the unit of
    assignment — hash the cluster representative, and every member
    follows it. A plain per-doc split leaks eval answers into training
    whenever a near-dup pair straddles the boundary; here that count
    is ZERO by construction, and the query returns it (``leaked_pairs``)
    so the guarantee is measured, not asserted.

    Composition: _corpus_with_near_dups → near_duplicates_minhash →
    connected_components → md5-bucket split on the component id →
    per-split rollup + a 1-row leak counter broadcast onto the 3-row
    report (deliberate tiny-broadcast, allow-listed in test_plans).
    All stages are the already-linted operators; the only new work is
    one left join (docs × components) and one 3-row crossJoin.

    Scale shape: identical to dedup_connected_components plus a narrow
    map — the split adds no data-sized shuffle. The oracle replays the
    same pipeline with DuckDB's recursive transitive closure."""
    from data_ingestion_py_spark.operators.components import (
        connected_components,
    )
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups
    from data_ingestion_py_spark.queries_pipeline import assign_split

    corpus = _corpus_with_near_dups(_docs(spark, sf_dir))
    pairs = dedup.near_duplicates_minhash(corpus, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    cc = connected_components(pairs)  # (node, component)
    grouped = (
        corpus.select("doc_id")
        .join(cc, corpus["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("group_id"),
        )
    )
    sp = grouped.select(
        "doc_id", "group_id", assign_split(F.col("group_id")).alias("split")
    )
    rep = sp.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("group_id").alias("n_groups"),
    )
    sa = sp.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = sp.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    leaks = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .agg(F.count(F.lit(1)).alias("leaked_pairs"))
    )
    return rep.crossJoin(F.broadcast(leaks)).select(
        "split", "n_docs", "n_groups", "leaked_pairs"
    )


# ---------------------------------------------------------------------------
# Exact substring-cut dedup: WHERE to cut, not just how duplicated
# ---------------------------------------------------------------------------

_CUT_K = 8  # same gram order as corpus_repeated_ngrams / contamination


def _substring_cuts_oracle_sql() -> str:
    from data_ingestion_py_spark.queries_ext import NEAR_DUP_CORPUS_CTE

    k = _CUT_K
    return (
        NEAR_DUP_CORPUS_CTE
        + f"""
, toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM corpus
), posg AS (
    SELECT doc_id, s.i AS i, s.g AS g
    FROM (SELECT doc_id,
                 unnest(list_transform(
                     generate_series(0, len(t) - {k}),
                     i -> {{'i': i,
                           'g': array_to_string(t[i+1 : i+{k}], ' ')}}))
                     AS s
          FROM toks WHERE len(t) >= {k})
), gdocs AS (
    SELECT g, count(*) AS nd
    FROM (SELECT DISTINCT doc_id, g FROM posg) GROUP BY g
), flagged AS (
    SELECT posg.doc_id, posg.i
    FROM posg JOIN gdocs USING (g) WHERE gdocs.nd >= 2
), lagged AS (
    SELECT doc_id, i,
           lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev_i
    FROM flagged
), isl AS (
    SELECT doc_id, i,
           sum(CASE WHEN prev_i IS NULL OR i > prev_i + {k}
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i
                     ROWS UNBOUNDED PRECEDING) AS island
    FROM lagged
)
SELECT doc_id, min(i) AS cut_start, max(i) + {k} - 1 AS cut_end,
       count(*) AS n_flagged_grams
FROM isl GROUP BY doc_id, island
"""
    )


@register(
    "corpus_substring_cuts",
    _substring_cuts_oracle_sql(),
    tags=("dedup", "ngram", "cuts"),
)
def q_corpus_substring_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup that answers WHERE to cut, not just how
    duplicated a document is (the actionable half of Lee et al.'s
    ExactSubstr: the pipeline removes the duplicated SPANS and keeps
    the rest). Every token position whose 8-gram occurs in ≥ 2
    distinct documents is flagged; overlapping/adjacent flagged
    windows merge into maximal cut intervals [cut_start, cut_end]
    (token indices) via gaps-and-islands.

    Scale shape: positional gram explode (narrow), distinct (doc,
    gram) → one gram-keyed count, one gram-keyed join back, then a
    PER-DOCUMENT window (partitioned by doc_id — never a global
    sort) for the interval merge. The gram table is corpus-sized and
    never broadcast, same posture as corpus_repeated_ngrams; runs on
    the seeded near-dup corpus so planted clone spans provably merge
    into document-scale cuts."""
    from pyspark.sql.window import Window

    from data_ingestion_py_spark.functions.text import shingles, tokens
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups

    k = _CUT_K
    corpus = _corpus_with_near_dups(_docs(spark, sf_dir))
    toks = corpus.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= k
    )
    posg = toks.select(
        "doc_id", F.posexplode(shingles(F.col("t"), k)).alias("i", "g")
    )
    gdocs = (
        posg.select("doc_id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    flagged = (
        posg.join(gdocs.where(F.col("nd") >= 2).select("g"), "g")
        .select("doc_id", F.col("i").cast("long").alias("i"))
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    lagged = flagged.withColumn("prev_i", F.lag("i").over(w))
    isl = lagged.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_i").isNull() | (F.col("i") > F.col("prev_i") + k),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("i").alias("cut_start"),
        (F.max("i") + k - 1).alias("cut_end"),
        F.count(F.lit(1)).alias("n_flagged_grams"),
    ).drop("island").select("doc_id", "cut_start", "cut_end", "n_flagged_grams")


# ---------------------------------------------------------------------------
# Exact set-similarity join via prefix filtering (PPJoin-style)
# ---------------------------------------------------------------------------

_PF_T = 0.5  # same Jaccard threshold as the MinHash-LSH pair query


def _prefix_filter_oracle_sql() -> str:
    from data_ingestion_py_spark.operators.dedup import SHINGLE_K
    from data_ingestion_py_spark.queries_ext import (
        NEAR_DUP_CORPUS_CTE,
        _sql_shingles,
    )

    t = _PF_T
    return (
        NEAR_DUP_CORPUS_CTE
        + _sql_shingles(SHINGLE_K)
        + f"""
, shset AS (
    SELECT doc_id, list_distinct(sh) AS s FROM shingled
), sh1 AS (
    SELECT doc_id, unnest(s) AS sh FROM shset
), dfreq AS (
    SELECT sh, count(*) AS df FROM sh1 GROUP BY sh
), keyed AS (
    SELECT sh1.doc_id,
           lpad(CAST(df AS VARCHAR), 10, '0') || ':' || sh AS k
    FROM sh1 JOIN dfreq USING (sh)
), lists AS (
    SELECT doc_id, list_sort(list(k)) AS ks, count(*) AS n
    FROM keyed GROUP BY doc_id
), pref AS (
    SELECT doc_id, n,
           unnest(ks[1 : CAST(n - ceil({t} * n) + 1 AS BIGINT)]) AS k
    FROM lists
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pref a JOIN pref b ON a.k = b.k AND a.doc_id < b.doc_id
    WHERE a.n * {t} <= b.n AND b.n * {t} <= a.n
)
SELECT doc_a, doc_b,
       round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
FROM cand
JOIN shset sa ON cand.doc_a = sa.doc_id
JOIN shset sb ON cand.doc_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / len(list_distinct(list_concat(sa.s, sb.s))) >= {t}
"""
    )


@register(
    "dedup_prefix_filter_pairs",
    _prefix_filter_oracle_sql(),
    tags=("dedup", "exact", "prefix-filter"),
)
def q_dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join at Jaccard ≥ 0.5 over 3-gram
    shingle sets — prefix filtering (PPJoin family: Chaudhuri et al.
    SSJoin, Xiao et al. PPJoin): order each doc's shingles globally by
    ascending document frequency (rarest first, ties by shingle), and
    two sets with J ≥ t MUST share a token inside each other's first
    n − ⌈t·n⌉ + 1 tokens — so candidates are pairs colliding on a
    PREFIX token, verified with exact Jaccard. No hashing, no recall
    loss: this is the exact complement to dedup_minhash_lsh_pairs
    (identical output schema and threshold), and the LSH result is
    provably a subset (pinned by test — measuring LSH recall against
    exact truth instead of assuming it).

    Scale shape: one shingle-keyed shuffle for document frequencies,
    one keyed join back, per-doc sort of its OWN shingle list (narrow),
    prefix explode (≈ half the shingles, and the RAREST half, so
    collisions are skewed toward true near-dups), one prefix-token
    keyed self-join, verify at candidate cardinality. The frequency
    order is the whole trick: frequent/boilerplate shingles never
    enter a prefix, which is what keeps the candidate count near the
    true-pair count instead of Σ_g df(g)². The global order string
    (zero-padded df + shingle) is engine-portable, so DuckDB replays
    the identical prefix choice."""
    from data_ingestion_py_spark.functions.text import shingles, tokens
    from data_ingestion_py_spark.operators.dedup import SHINGLE_K
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups

    t = _PF_T
    corpus = _corpus_with_near_dups(_docs(spark, sf_dir))
    sh1 = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(tokens(F.col("text")), SHINGLE_K))
        ).alias("sh"),
    )
    dfreq = sh1.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    keyed = sh1.join(dfreq, "sh").select(
        "doc_id",
        F.concat(
            F.lpad(F.col("df").cast("string"), 10, "0"), F.lit(":"), F.col("sh")
        ).alias("k"),
    )
    lists = keyed.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("k")).alias("ks"),
        F.count(F.lit(1)).alias("n"),
    )
    pref = lists.select(
        "doc_id",
        "n",
        F.explode(
            F.slice(
                F.col("ks"),
                1,
                (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int"),
            )
        ).alias("k"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter (J ≥ t ⇒ max(|x|,|y|) ≤ min(|x|,|y|)/t): prunes
            # candidates whose set sizes alone already rule the pair out
            & (F.col("a.n") * t <= F.col("b.n"))
            & (F.col("b.n") * t <= F.col("a.n")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    shset = sh1.groupBy("doc_id").agg(F.collect_set("sh").alias("s"))
    sa = shset.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = shset.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")) / F.size(
        F.array_union("sa", "sb")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= t)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood record linkage (the complement to blocking)
# ---------------------------------------------------------------------------

_SNM_W = 10  # neighborhood width (rank distance < W compares)


@register(
    "parts_sorted_neighborhood",
    f"""
WITH ranked AS (
    SELECT p_partkey, p_name,
           row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
    FROM part
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS lev
FROM ranked a JOIN ranked b
  ON b.rnk - a.rnk BETWEEN 1 AND {_SNM_W - 1}
WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
""",
    tags=("linkage", "fuzzy", "snm"),
)
def q_parts_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández-Stolfo): sort all
    records by a key (name, id tie-break), compare only records whose
    GLOBAL rank differs by < W — the classic complement to blocking
    when no clean blocking key exists (typos at the block key's
    position break blocking but barely move the sort position).

    Scale shape: the global sort position comes from
    operators/ranking.with_global_rank (two-phase range shuffle —
    never a single-partition window), then the W-neighborhood is an
    EQUI-join: each record re-keys to bucket ⌊(rnk−1)/W⌋, the right
    side explodes to its own and previous bucket, and the rank-distance
    filter runs after the bucket join — candidates per record are
    bounded by W by construction, so the whole pass is O(n·W) verifies
    behind two keyed shuffles. The oracle replays with a plain
    row_number window + range join (fine at oracle scale, the exact
    plan Spark must NOT use)."""
    from data_ingestion_py_spark.operators.ranking import with_global_rank

    recs = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    ranked = with_global_rank(
        recs, [F.col("p_name"), F.col("p_partkey")], rank_col="rnk"
    ).select(
        "p_partkey",
        "p_name",
        "rnk",
        ((F.col("rnk") - 1) / _SNM_W).cast("long").alias("b"),
    )
    left = ranked.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("rnk").alias("rnk_a"),
        F.col("b").alias("jb"),
    )
    right = ranked.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("rnk").alias("rnk_b"),
        F.explode(F.array(F.col("b"), F.col("b") - 1)).alias("jb"),
    )
    return (
        left.join(right, "jb")
        .where(
            (F.col("rnk_b") - F.col("rnk_a") >= 1)
            & (F.col("rnk_b") - F.col("rnk_a") <= _SNM_W - 1)
        )
        .where(F.levenshtein("name_a", "name_b") <= _LEV_MAX)
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("lev"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

_KANON_K = 10  # groups smaller than k are re-identification risks
_LDIV_L = 2  # sensitive attr must take ≥ l values per group


@register(
    "dq_k_anonymity",
    f"""
WITH g AS (
    SELECT c_nationkey, c_mktsegment,
           count(*) AS n,
           count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                               ELSE 'nonneg' END) AS l_div
    FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, n, CAST(l_div AS BIGINT) AS l_div,
       (n < {_KANON_K}) AS k_violation,
       (l_div < {_LDIV_L}) AS l_violation
FROM g WHERE n < {_KANON_K} OR l_div < {_LDIV_L}
""",
    tags=("dq", "privacy"),
)
def q_dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a dataset release: quasi-identifier groups
    (nation × market segment) violating k-anonymity (fewer than k=10
    members — re-identifiable) or l-diversity (the sensitive attribute,
    account-balance sign, takes < 2 values — attribute disclosure even
    when k holds). One keyed agg; the release pipeline suppresses or
    generalizes exactly the rows this report lists.

    Scale shape: a single hash agg on the quasi-identifier tuple —
    combiner-friendly counts, no shuffle beyond the one keyed exchange;
    output is bounded by the quasi-identifier domain, not the data."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.when(F.col("c_acctbal") < 0, "neg").otherwise("nonneg")
        )
        .cast("long")
        .alias("l_div"),
    )
    return g.where(
        (F.col("n") < _KANON_K) | (F.col("l_div") < _LDIV_L)
    ).select(
        "c_nationkey",
        "c_mktsegment",
        "n",
        "l_div",
        (F.col("n") < _KANON_K).alias("k_violation"),
        (F.col("l_div") < _LDIV_L).alias("l_violation"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer-Wilkerson-Aiken / MOSS)
# ---------------------------------------------------------------------------

_WIN_K = 3  # gram order under each fingerprint
_WIN_W = 4  # winnowing window: any shared run of >= w+k-1 tokens MUST match
_WIN_M = 3  # report doc pairs sharing >= m distinct fingerprints
_WIN_POS = 1 << 20  # position packing radix (docs < 1M grams)


def _winnow_oracle_sql() -> str:
    from data_ingestion_py_spark.queries_ext import NEAR_DUP_CORPUS_CTE

    k, w, m, P = _WIN_K, _WIN_W, _WIN_M, _WIN_POS
    return (
        NEAR_DUP_CORPUS_CTE
        + f"""
, toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM corpus
), posg AS (
    SELECT doc_id, s.i AS i,
           ('0x' || substr(md5(s.g), 1, 8))::BIGINT AS h
    FROM (SELECT doc_id,
                 unnest(list_transform(
                     generate_series(0, len(t) - {k}),
                     i -> {{'i': i,
                           'g': array_to_string(t[i+1 : i+{k}], ' ')}}))
                     AS s
          FROM toks WHERE len(t) >= {k})
), keyed AS (
    SELECT doc_id, i, h * {P} + ({P - 1} - i) AS key,
           count(*) OVER (PARTITION BY doc_id) AS n
    FROM posg
), sel AS (
    SELECT DISTINCT doc_id,
           min(key) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND {w - 1} FOLLOWING) // {P} AS fph
    FROM keyed WHERE i <= n - {w}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM sel a JOIN sel b ON a.fph = b.fph AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {m}
"""
    )


@register(
    "text_winnowing_matches",
    _winnow_oracle_sql(),
    tags=("dedup", "fingerprint", "winnowing"),
    bench=True,
)
def q_text_winnowing_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken,
    SIGMOD'03 — the MOSS plagiarism detector): hash every 3-gram, and
    in each window of 4 consecutive hashes select the minimum (ties →
    rightmost). The selected ~n/w fingerprints carry a GUARANTEE no
    random sampling has: any shared token run of length ≥ w+k−1 = 6
    produces at least one shared fingerprint. Doc pairs sharing ≥ 3
    distinct fingerprints are reported — local-similarity detection
    that catches shared passages whole-doc MinHash dilutes away.

    The tie rule and the window minimum are made engine-exact by
    packing (hash, position) into one BIGINT — h·2²⁰ + (2²⁰−1−i) —
    so min() alone implements "smallest hash, rightmost position";
    both engines then agree bit-for-bit with no min_by/struct-order
    semantics in play.

    Scale shape: narrow gram hash, PER-DOCUMENT sliding-window min
    (doc-partitioned window, never global), distinct → the join runs
    on the 1/w-sampled fingerprint table, shuffled on the fingerprint
    hash — the same Σ collisions² bound as every other candidate join
    here, on a table w× smaller than the gram table."""
    from pyspark.sql.window import Window

    from data_ingestion_py_spark.functions.text import shingles, tokens
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups

    k, w, m, P = _WIN_K, _WIN_W, _WIN_M, _WIN_POS
    corpus = _corpus_with_near_dups(_docs(spark, sf_dir))
    toks = corpus.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= k
    )
    posg = toks.select(
        "doc_id", F.posexplode(shingles(F.col("t"), k)).alias("i", "g")
    ).select(
        "doc_id",
        F.col("i").cast("long").alias("i"),
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    keyed = posg.select(
        "doc_id",
        "i",
        (F.col("h") * P + (F.lit(P - 1) - F.col("i"))).alias("key"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n"),
    )
    wmin = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    sel = (
        keyed.where(F.col("i") <= F.col("n") - w)
        .select(
            "doc_id", (F.min("key").over(wmin) / P).cast("long").alias("fph")
        )
        .distinct()
    )
    a, b = sel.alias("a"), sel.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fph") == F.col("b.fph"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= m)
    )


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: candidates → clusters → golden records
# ---------------------------------------------------------------------------


def _er_oracle_sql() -> str:
    return f"""
WITH RECURSIVE recs AS (
    SELECT p_partkey, p_name,
           string_split(p_name, ' ')[-1] AS block
    FROM part
), names AS (
    SELECT block, p_name, count(*) AS cnt, min(p_partkey) AS min_key
    FROM recs GROUP BY block, p_name
), pairs AS (
    SELECT a.p_name AS src, b.p_name AS dst
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
), edges AS (
    SELECT src, dst FROM pairs
    UNION
    SELECT dst AS src, src AS dst FROM pairs
), reach AS (
    SELECT src, src AS node FROM edges
    UNION
    SELECT r.src, e.dst AS node FROM reach r JOIN edges e ON e.src = r.node
), comp AS (
    SELECT src AS p_name, min(node) AS canonical FROM reach GROUP BY src
), grouped AS (
    SELECT coalesce(comp.canonical, names.p_name) AS canonical_name,
           names.cnt, names.min_key
    FROM names LEFT JOIN comp ON names.p_name = comp.p_name
)
SELECT canonical_name,
       count(*) AS n_names,
       CAST(sum(cnt) AS BIGINT) AS n_records,
       min(min_key) AS golden_key
FROM grouped GROUP BY canonical_name
HAVING count(*) > 1
"""


@register(
    "parts_entity_resolution",
    _er_oracle_sql(),
    tags=("linkage", "fuzzy", "clusters"),
)
def q_parts_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END: blocked fuzzy candidates (the
    parts_fuzzy_matches stage, at distinct-name grain) → connected
    components over the name-match graph (operators/components.py —
    string node ids, min = lexicographic canonical) → one GOLDEN
    RECORD per resolved entity: canonical name, member-name count,
    total record count, and the surviving key (min p_partkey). Only
    multi-name entities are reported — the rows a master-data system
    would actually merge. Same composition pattern as SemDeDup e2e:
    every stage is an already-linted operator, chained in one
    oracle-gated query (DuckDB replays clustering with a recursive
    transitive closure).

    Scale shape: candidate generation is the distinct-value blocked
    join (cost ∝ V² per block); CC runs at name-graph cardinality
    (vastly smaller than records); the final rollup is one keyed agg.
    """
    from data_ingestion_py_spark.operators.components import (
        connected_components,
    )

    recs = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    )
    names = recs.groupBy("block", "p_name").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("p_partkey").alias("min_key")
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).where(
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= _LEV_MAX
    ).select(
        F.col("a.p_name").alias("src"), F.col("b.p_name").alias("dst")
    )
    cc = connected_components(pairs, src="src", dst="dst")
    grouped = (
        names.join(cc, names["p_name"] == cc["node"], "left")
        .select(
            F.coalesce(F.col("component"), F.col("p_name")).alias(
                "canonical_name"
            ),
            "cnt",
            "min_key",
        )
    )
    return (
        grouped.groupBy("canonical_name")
        .agg(
            F.count(F.lit(1)).alias("n_names"),
            F.sum("cnt").cast("long").alias("n_records"),
            F.min("min_key").alias("golden_key"),
        )
        .where(F.col("n_names") > 1)
    )


# ---------------------------------------------------------------------------
# Numeric correlation matrix (single-pass Pearson over the fact table)
# ---------------------------------------------------------------------------

_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
]


@register(
    "lineitem_corr_matrix",
    "SELECT "
    + ", ".join(
        f"round(corr({a}, {b}), 4) AS r_{a[2:]}_{b[2:]}"
        for a, b in _CORR_PAIRS
    )
    + " FROM lineitem",
    tags=("analytics", "profile"),
)
def q_lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the fact table's numeric
    columns in ONE aggregation pass — the feature-screening /
    data-profiling step before any modeling on warehouse facts. All
    six pairs ride the same partial-aggregate shuffle (each corr is
    five combiner-friendly sufficient statistics); rounded at 4 dp so
    partial-aggregation order cannot flip the hash (the float-agg
    rounding contract from queries.py's module header — sub-1e-10
    relative drift vs a 1e-4 bucket)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"r_{a[2:]}_{b[2:]}")
            for a, b in _CORR_PAIRS
        ]
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (proximity to a seed set, not global authority)
# ---------------------------------------------------------------------------

_PPR_SEEDS = [0]  # nation 0 — single-seed proximity ranking


def _ppr_oracle_sql() -> str:
    from data_ingestion_py_spark.operators.pagerank import pagerank_oracle_sql
    from data_ingestion_py_spark.queries_graph import _TRADE_EDGES_CTE

    return f"""
SELECT n.n_name AS nation, pr.rank_micro
FROM (
{pagerank_oracle_sql(_TRADE_EDGES_CTE, n_iter=5, damping_pct=85,
                     seeds=_PPR_SEEDS)}
) pr
JOIN nation n ON n.n_nationkey = pr.node
"""


@register(
    "graph_ppr_nation",
    _ppr_oracle_sql(),
    tags=("graph", "iterative", "personalized"),
)
def q_graph_ppr_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank over the nation trade graph: all teleport
    mass (and dangling redistribution) returns to the seed nation, so
    ``rank_micro`` measures trade-flow PROXIMITY to the seed rather
    than global authority — the related-entities / graph-similarity
    primitive (recommendations, source-affinity weighting) that plain
    PageRank cannot express. Same integer fixed-point iteration and
    unrolled-CTE oracle as graph_pagerank; the only new plan content
    is a per-node seed-membership CASE (driver literals, no join)."""
    from data_ingestion_py_spark.operators.pagerank import pagerank_integer

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            s["s_nationkey"].alias("src"), c["c_nationkey"].alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ranks = pagerank_integer(
        edges, n_iter=5, damping_pct=85, seeds=_PPR_SEEDS
    )
    return ranks.join(
        F.broadcast(n), ranks["node"] == F.col("n_nationkey")
    ).select(F.col("n_name").alias("nation"), "rank_micro")


# ---------------------------------------------------------------------------
# Multimodal: PNG chunk inventory (container walk, not just the header)
# ---------------------------------------------------------------------------


@register(
    "multimodal_png_chunks",
    """
WITH base AS (
    SELECT doc_id,
           CAST(doc_id % 7 + 3 AS INT) AS txt_len,
           CAST(doc_id % 11 + 1 AS INT) AS idat_len
    FROM documents
)
SELECT doc_id AS media_id, 0 AS ord, 'IHDR' AS chunk_type,
       13 AS chunk_len FROM base
UNION ALL
SELECT doc_id, 1, 'tEXt', txt_len FROM base
UNION ALL
SELECT doc_id, 2, 'IDAT', idat_len FROM base
UNION ALL
SELECT doc_id, 3, 'IEND', 0 FROM base
""",
    tags=("multimodal", "decode"),
)
def q_multimodal_png_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG CONTAINER WALK end-to-end: construct complete multi-chunk
    PNGs in column algebra (signature, IHDR, a tEXt metadata chunk and
    an IDAT pixel stream with doc_id-derived lengths, IEND), push the
    binary through the Arrow ``mapInPandas`` seam, and enumerate every
    chunk back with the byte-level walker
    (sources/multimodal.png_chunks) — the media-inventory profile
    (which ancillary metadata exists, how large the pixel stream is) a
    lake runs before committing to pixel decode. The oracle recomputes
    the planted chunk table arithmetically, so a walker that misreads
    big-endian lengths, skips CRCs wrong, or misses the IEND stop
    hash-mismatches immediately. Row-EXPANDING kernel: one input
    payload yields one row per chunk (the shape frame extraction and
    page splitting share)."""
    d = load_table(spark, sf_dir, "documents")
    txt_len = (F.col("doc_id") % 7 + 3).cast("int")
    idat_len = (F.col("doc_id") % 11 + 1).cast("int")
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),  # signature
        F.lit("0000000D49484452"),  # IHDR len 13 + type
        F.lit("00000010000000100806000000"),  # 16x16 RGBA8 IHDR data
        F.lit("DEADBEEF"),  # IHDR CRC filler (inventory, not integrity)
        F.lpad(F.hex(txt_len), 8, "0"),
        F.lit("74455874"),  # tEXt
        F.lit("4300"),  # key "C" + NUL
        F.expr("repeat('41', cast(doc_id % 7 + 1 as int))"),  # value
        F.lit("DEADBEEF"),
        F.lpad(F.hex(idat_len), 8, "0"),
        F.lit("49444154"),  # IDAT
        F.expr("repeat('00', cast(doc_id % 11 + 1 as int))"),
        F.lit("DEADBEEF"),
        F.lit("0000000049454E44AE426082"),  # IEND + real CRC
    )
    from data_ingestion_py_spark.sources import multimodal as mm

    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(png_hex).alias("payload"),
    )
    return mm.chunk_inventory(media)


# ---------------------------------------------------------------------------
# Incremental view maintenance for a JOIN view (delta joins, no recompute)
# ---------------------------------------------------------------------------


@register(
    "orders_view_incremental_maintenance",
    """
SELECT o.o_orderkey, o.o_custkey,
       round(CASE WHEN c.c_custkey % 20 = 0
                  THEN c.c_acctbal + 100 ELSE c.c_acctbal END, 2)
           AS acctbal,
       round(o.o_totalprice, 2) AS totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
    tags=("warehouse", "ivm", "incremental"),
)
def q_orders_view_incremental_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental maintenance of a denormalized JOIN view under
    deltas on BOTH inputs — new orders (keys ≡ 0 mod 10) arrive and a
    slice of customers (keys ≡ 0 mod 20) changes balance. Instead of
    re-joining the world, the maintained view is assembled from three
    delta terms:

        V' = (V_old ⊳ Δcust)            -- untouched rows, anti join
           ∪ (orders_base ⋈ Δcust)      -- rows whose DIM side changed
           ∪ (Δorders ⋈ cust_new)       -- newly arrived FACT rows

    The ORACLE is the full recompute (new orders ⋈ new customers) —
    an independent evaluation strategy, so the hash gate proves the
    incremental plan reaches exactly the recomputed view, the property
    every IVM deployment needs audited. Same family as
    events_incremental_rollup (algebraic-partial aggregates); this is
    the JOIN-view sibling.

    Scale shape: every term is keyed on the join key; the anti join
    and affected-key recompute touch |Δ|-proportional state on the
    delta side (the whole point — a daily batch costs Δ-sized joins
    against indexed/bucketed tables, never a full view rebuild)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    c_new = c.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 20 == 0, F.col("c_acctbal") + 100
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    delta_c = c_new.where(F.col("c_custkey") % 20 == 0)
    o_base = o.where(F.col("o_orderkey") % 10 != 0)
    delta_o = o.where(F.col("o_orderkey") % 10 == 0)

    def view(orders_df, cust_df):
        return orders_df.join(
            cust_df, orders_df["o_custkey"] == cust_df["c_custkey"]
        ).select(
            "o_orderkey",
            "o_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )

    old_view = view(o_base, c)  # what the warehouse already has
    untouched = old_view.join(
        delta_c.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_anti",
    ).select("o_orderkey", "o_custkey", "acctbal", "totalprice")
    dim_changed = view(o_base, delta_c)
    fact_new = view(delta_o, c_new)
    return untouched.unionByName(dim_changed).unionByName(fact_new)


# ---------------------------------------------------------------------------
# Marketing attribution: first/last-touch click per purchase (7d lookback)
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 86_400 * 1_000_000


@register(
    "events_purchase_attribution",
    f"""
WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu FROM events
), marked AS (
    SELECT event_id, user_id, event_type, tsu,
           max(CASE WHEN event_type = 'click' THEN tsu END)
               OVER (PARTITION BY user_id ORDER BY tsu
                     RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                           AND 1 PRECEDING) AS last_ts,
           min(CASE WHEN event_type = 'click' THEN tsu END)
               OVER (PARTITION BY user_id ORDER BY tsu
                     RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                           AND 1 PRECEDING) AS first_ts,
           count(CASE WHEN event_type = 'click' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY tsu
                     RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                           AND 1 PRECEDING) AS n_clicks_7d
    FROM ev
), clicks AS (
    SELECT user_id, tsu, max(event_id) AS click_id
    FROM ev WHERE event_type = 'click' GROUP BY user_id, tsu
)
SELECT m.event_id, m.user_id, CAST(m.n_clicks_7d AS BIGINT) AS n_clicks_7d,
       f.click_id AS first_click_id, l.click_id AS last_click_id
FROM marked m
LEFT JOIN clicks f ON m.user_id = f.user_id AND m.first_ts = f.tsu
LEFT JOIN clicks l ON m.user_id = l.user_id AND m.last_ts = l.tsu
WHERE m.event_type = 'purchase'
""",
    tags=("analytics", "attribution"),
)
def q_events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: every purchase is linked
    to the earliest and latest click by the same user in a strict
    7-day lookback (exclusive of the purchase instant), plus the click
    count — the marketing-warehouse query behind every conversion
    report. Two engine-portable passes: a per-user RANGE window over
    microsecond timestamps finds the first/last click TIME (no
    struct-ordering semantics in play), then a (user, ts) lookup join
    resolves ids, same-instant ties broken by max(event_id) on both
    engines.

    Scale shape: per-user windows (partitioned, never global), one
    keyed self-join at click cardinality. The 7-day RANGE frame is
    resolved inside the window operator — no self-join on the
    inequality, which is what keeps this linear instead of events²."""
    from pyspark.sql.window import Window

    from data_ingestion_py_spark.functions.time import ts_us

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", ts_us(F.col("ts")).alias("tsu")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsu")
        .rangeBetween(-_ATTR_WINDOW_US, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("tsu"))
    marked = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.max(click_ts).over(w).alias("last_ts"),
        F.min(click_ts).over(w).alias("first_ts"),
        F.count(click_ts).over(w).alias("n_clicks_7d"),
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "tsu")
        .agg(F.max("event_id").alias("click_id"))
    )
    first = clicks.select(
        "user_id",
        F.col("tsu").alias("first_ts"),
        F.col("click_id").alias("first_click_id"),
    )
    last = clicks.select(
        "user_id",
        F.col("tsu").alias("last_ts"),
        F.col("click_id").alias("last_click_id"),
    )
    return (
        marked.where(F.col("event_type") == "purchase")
        .join(first, ["user_id", "first_ts"], "left")
        .join(last, ["user_id", "last_ts"], "left")
        .select(
            "event_id",
            "user_id",
            F.col("n_clicks_7d").cast("long").alias("n_clicks_7d"),
            "first_click_id",
            "last_click_id",
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time (temporal) join against SCD2 dimension history
# ---------------------------------------------------------------------------

_PIT_CUTOVER = "1998-01-01"


@register(
    "orders_point_in_time_segment",
    f"""
WITH versions AS (
    SELECT c_custkey, c_mktsegment AS seg,
           TIMESTAMP '1995-01-01' AS valid_from,
           CASE WHEN c_custkey % 3 = 0
                THEN TIMESTAMP '{_PIT_CUTOVER}' END AS valid_to
    FROM customer
    UNION ALL
    SELECT c_custkey, 'MIGRATED' AS seg,
           TIMESTAMP '{_PIT_CUTOVER}' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to
    FROM customer WHERE c_custkey % 3 = 0
)
SELECT o.o_orderkey, o.o_custkey, v.seg AS seg_at_order
FROM orders o
JOIN versions v
  ON o.o_custkey = v.c_custkey
 AND o.o_orderdate >= v.valid_from
 AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
""",
    tags=("warehouse", "scd2", "temporal"),
)
def q_orders_point_in_time_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: every order resolves the
    customer-dimension VERSION that was valid on its order date — the
    query SCD2 history exists for (joining facts to the CURRENT dim
    row silently rewrites history; this is the correct-as-of-then
    lookup). A third of customers migrate segment at the cutover, so
    orders before and after the same customer's cutover land in
    different versions.

    Scale shape: the version predicate rides ON TOP of the custkey
    equi-join — Spark plans a hash/sort-merge join on the key with the
    interval conditions as residual filters, never a nested loop
    (pinned below); versions-per-key is small (≤2 here, bounded by
    change frequency in general), so the residual fan-out is bounded.
    The interval-bucketing swap for high-churn dimensions is
    operators/rangejoin.py."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cut = F.to_timestamp(F.lit(_PIT_CUTOVER))
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.to_timestamp(F.lit("1995-01-01")).alias("valid_from"),
        F.when(F.col("c_custkey") % 3 == 0, cut).alias("valid_to"),
    )
    v2 = c.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("MIGRATED").alias("seg"),
        cut.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    versions = v1.unionByName(v2)
    return (
        o.join(
            versions,
            (o["o_custkey"] == versions["c_custkey"])
            & (o["o_orderdate"] >= versions["valid_from"])
            & (
                versions["valid_to"].isNull()
                | (o["o_orderdate"] < versions["valid_to"])
            ),
        )
        .select("o_orderkey", "o_custkey", F.col("seg").alias("seg_at_order"))
    )


# ---------------------------------------------------------------------------
# Dedup observability: cluster-size histogram (incl. singletons)
# ---------------------------------------------------------------------------

_SIZE_BUCKET_SQL = """CASE WHEN sz = 1 THEN '1'
                WHEN sz = 2 THEN '2'
                WHEN sz <= 4 THEN '3-4'
                WHEN sz <= 8 THEN '5-8'
                WHEN sz <= 16 THEN '9-16'
                ELSE '17+' END"""


def _cluster_histogram_oracle_sql() -> str:
    from data_ingestion_py_spark.queries_pipeline import _cc_chain_sql

    return (
        _cc_chain_sql()
        + f"""
, sizes AS (
    SELECT cluster_id, count(*) AS sz FROM comp GROUP BY cluster_id
    UNION ALL
    SELECT c.doc_id AS cluster_id, 1 AS sz
    FROM corpus c LEFT JOIN comp ON c.doc_id = comp.doc_id
    WHERE comp.doc_id IS NULL
)
SELECT {_SIZE_BUCKET_SQL} AS size_bucket,
       count(*) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs
FROM sizes GROUP BY 1
"""
    )


@register(
    "dedup_cluster_size_histogram",
    _cluster_histogram_oracle_sql(),
    tags=("dedup", "clusters", "observability"),
)
def q_dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup run's shape report: near-dup cluster sizes (LSH pairs
    → connected components) bucketed 1 / 2 / 3-4 / 5-8 / 9-16 / 17+,
    singletons included — the distribution that tells an operator
    whether dedup found the expected twin-heavy corpus (planted here:
    a spike at 2) or a pathological mega-cluster (boilerplate/LSH
    misconfiguration: mass at 17+), and how many docs survive
    canonical-only retention. Buckets are a pure integer CASE — no
    log2 float edge between engines. Cost on top of the CC pass: one
    keyed count + a left-anti for singletons + a 6-row rollup."""
    from data_ingestion_py_spark.operators.components import (
        connected_components,
    )
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups

    corpus = _corpus_with_near_dups(_docs(spark, sf_dir))
    pairs = dedup.near_duplicates_minhash(corpus, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    cc = connected_components(pairs)  # (node, component)
    clustered = cc.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    singles = (
        corpus.select("doc_id")
        .join(cc, corpus["doc_id"] == cc["node"], "left_anti")
        .select(F.lit(1).alias("sz"))
    )
    sizes = clustered.select("sz").unionByName(singles)
    bucket = (
        F.when(F.col("sz") == 1, "1")
        .when(F.col("sz") == 2, "2")
        .when(F.col("sz") <= 4, "3-4")
        .when(F.col("sz") <= 8, "5-8")
        .when(F.col("sz") <= 16, "9-16")
        .otherwise("17+")
    )
    return (
        sizes.select(bucket.alias("size_bucket"), "sz")
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Join-key fan-out profile (skew / cardinality input to join planning)
# ---------------------------------------------------------------------------


@register(
    "dq_join_fanout_profile",
    """
WITH ol AS (
    SELECT o.o_orderkey, count(l.l_orderkey) AS cnt
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
), co AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
SELECT 'orders->lineitem' AS edge,
       count(*) AS n_parents,
       CAST(sum(cnt) AS BIGINT) AS n_children,
       CAST(count(*) FILTER (WHERE cnt = 0) AS BIGINT) AS n_childless,
       max(cnt) AS max_fanout,
       round(CAST(sum(cnt) AS DOUBLE) / count(*), 4) AS avg_fanout
FROM ol
UNION ALL
SELECT 'customer->orders', count(*), CAST(sum(cnt) AS BIGINT),
       CAST(count(*) FILTER (WHERE cnt = 0) AS BIGINT),
       max(cnt), round(CAST(sum(cnt) AS DOUBLE) / count(*), 4)
FROM co
""",
    tags=("dq", "profile", "join"),
)
def q_dq_join_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FK-edge fan-out profile: parents, children, childless
    parents, max and average fan-out — the cardinality facts that
    drive join planning (a max/avg ratio far above 1 is the skewed-key
    signal that sends a join to operators/skew.salted_join or AQE
    skew-split; childless counts catch silent referential decay). One
    keyed count per edge plus a 1-row rollup; ratios are exact-int
    quotients rounded at 4 dp."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")

    def profile(parent, pk, child, fk, edge):
        cnts = (
            parent.join(child, parent[pk] == child[fk], "left")
            .groupBy(parent[pk])
            .agg(F.count(child[fk]).alias("cnt"))
        )
        return cnts.agg(
            F.lit(edge).alias("edge"),
            F.count(F.lit(1)).alias("n_parents"),
            F.sum("cnt").cast("long").alias("n_children"),
            F.sum((F.col("cnt") == 0).cast("long"))
            .cast("long")
            .alias("n_childless"),
            F.max("cnt").alias("max_fanout"),
            F.round(
                F.sum("cnt").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_fanout"),
        )

    return profile(o, "o_orderkey", li, "l_orderkey", "orders->lineitem").unionByName(
        profile(c, "c_custkey", o, "o_custkey", "customer->orders")
    )


# ---------------------------------------------------------------------------
# Per-source quality calibration (percentile thresholds, not global)
# ---------------------------------------------------------------------------

_CAL_DROP_PCT = 0.2  # drop the bottom 20% of each source


def _quality_calibration_oracle_sql() -> str:
    from data_ingestion_py_spark.queries_ext import (
        _SQL_STOP_LIST,
        _SQL_TOKS,
    )

    return f"""
WITH t AS (
    SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents
), f AS (
    SELECT doc_id, source,
           len(toks) AS n,
           len(list_distinct(toks)) AS n_uniq,
           len(list_filter(toks, t -> list_contains({_SQL_STOP_LIST}, t)))
               AS stop_hits
    FROM t WHERE len(toks) > 0
), scored AS (
    SELECT doc_id, source,
           round(least(n / 100.0, 1.0) * 0.4 + (n_uniq / n) * 0.4
                 + (stop_hits / n) * 0.2, 6) AS quality_score
    FROM f
), ranked AS (
    SELECT doc_id, source, quality_score,
           row_number() OVER (PARTITION BY source
                              ORDER BY quality_score, doc_id) AS src_rank,
           count(*) OVER (PARTITION BY source) AS src_n
    FROM scored
)
SELECT doc_id, source, quality_score,
       CAST(src_rank AS BIGINT) AS src_rank,
       round(CAST(src_rank AS DOUBLE) / src_n, 6) AS src_pct,
       (CAST(src_rank AS DOUBLE) / src_n > {_CAL_DROP_PCT}) AS keep
FROM ranked
"""


@register(
    "corpus_quality_percentile_by_source",
    _quality_calibration_oracle_sql(),
    tags=("curation", "quality", "calibration"),
)
def q_corpus_quality_percentile_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-SOURCE quality calibration: each document's composite
    quality score becomes its percentile WITHIN ITS SOURCE, and the
    keep gate drops the bottom 20% of every source — the fix for the
    standard curation failure where a single global threshold wipes
    out entire low-scoring-but-wanted sources (transcripts, forums)
    while keeping all of an easy one. Rank is a source-PARTITIONED
    window over a total order (score, doc_id) — never a global sort;
    percentile = exact-int rank over exact-int count, rounded.

    Cost on top of scoring: one shuffle on the source key. Skewed
    mega-sources want the same two-phase rank swap as any global
    order (operators/ranking.py, applied per source)."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    scored = (
        text_analysis_quality(d)
        .join(d.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "quality_score")
    )
    w = Window.partitionBy("source").orderBy("quality_score", "doc_id")
    wn = Window.partitionBy("source")
    ranked = scored.select(
        "doc_id",
        "source",
        "quality_score",
        F.row_number().over(w).cast("long").alias("src_rank"),
        F.count(F.lit(1)).over(wn).alias("src_n"),
    )
    pct = F.col("src_rank").cast("double") / F.col("src_n")
    return ranked.select(
        "doc_id",
        "source",
        "quality_score",
        "src_rank",
        F.round(pct, 6).alias("src_pct"),
        (pct > _CAL_DROP_PCT).alias("keep"),
    )


def text_analysis_quality(d: DataFrame) -> DataFrame:
    from data_ingestion_py_spark.operators import text_analysis

    return text_analysis.quality_scores(d)


# ---------------------------------------------------------------------------
# Bitext candidate mining (cross-language parallel-document detection)
# ---------------------------------------------------------------------------

_BTX_DF_MAX = 4  # anchor tokens must be corpus-rare
_BTX_MIN_ANCHORS = 2


@register(
    "corpus_bitext_candidates",
    f"""
WITH corpus AS (
    SELECT doc_id, lang,
           text || ' numa' || CAST(doc_id AS VARCHAR)
                || ' numb' || CAST(doc_id AS VARCHAR) AS text
    FROM documents
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, 'xx' AS lang,
           array_to_string(list_transform(
               list_filter(string_split(text, ' '), x -> x <> ''),
               tok -> 'zz' || tok), ' ')
               || ' numa' || CAST(doc_id AS VARCHAR)
               || ' numb' || CAST(doc_id AS VARCHAR) AS text
    FROM documents
    WHERE doc_id % 7 = 0
), u AS (
    SELECT DISTINCT doc_id, lang,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n,
           unnest(list_distinct(
               list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
    FROM corpus
), df AS (
    SELECT tok, count(*) AS df FROM u GROUP BY tok
), rare AS (
    SELECT u.doc_id, u.lang, u.n, u.tok
    FROM u JOIN df USING (tok) WHERE df BETWEEN 2 AND {_BTX_DF_MAX}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       a.lang AS lang_a, b.lang AS lang_b,
       count(*) AS n_anchors
FROM rare a JOIN rare b
  ON a.tok = b.tok AND a.doc_id < b.doc_id AND a.lang <> b.lang
WHERE a.n <= 2 * b.n AND b.n <= 2 * a.n
GROUP BY 1, 2, 3, 4
HAVING count(*) >= {_BTX_MIN_ANCHORS}
""",
    tags=("curation", "bitext", "multilingual"),
)
def q_corpus_bitext_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext candidate mining: find cross-LANGUAGE document pairs
    that are likely translations of each other by their shared RARE
    anchor tokens (numbers, names, codes — the tokens translation
    preserves), with a length-ratio sanity gate — the lexical-anchor
    first pass of parallel-corpus pipelines (the cheap filter before
    any embedding alignment). The fixture vocabulary has NO rare
    tokens (every word is corpus-common, df ≫ 4 — probed; frequent
    tokens can never be anchors), so the corpus plants the anchor
    class real bitext carries: every document ends with two
    doc-id-derived code tokens (the numbers/ids translation preserves
    verbatim), and every 7th document gets an 'xx'-language twin whose
    words are all rewritten but whose codes are inherited — true pairs
    share exactly those rare codes.

    Scale shape: anchors are tokens with 2 ≤ df ≤ 4 — the join key is
    RARE BY CONSTRUCTION, so candidate fan-out per token is bounded by
    df² ≤ 16; one token-keyed shuffle for df, one anchor-keyed
    self-join, one pair rollup. The frequent tokens that would blow up
    the join are excluded by the very definition of an anchor."""
    from data_ingestion_py_spark.functions.text import tokens

    d = _docs(spark, sf_dir)
    codes = F.concat(
        F.lit(" numa"),
        F.col("doc_id").cast("string"),
        F.lit(" numb"),
        F.col("doc_id").cast("string"),
    )
    base = d.select(
        "doc_id", "lang", F.concat(F.col("text"), codes).alias("text")
    )
    planted = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.lit("xx").alias("lang"),
        F.concat(
            F.array_join(
                F.transform(
                    tokens(F.col("text")),
                    lambda tok: F.concat(F.lit("zz"), tok),
                ),
                " ",
            ),
            codes,
        ).alias("text"),
    )
    corpus = base.unionByName(planted)
    u = corpus.select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).alias("n"),
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    ).distinct()
    df_tbl = u.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    rare = u.join(
        df_tbl.where(
            (F.col("df") >= 2) & (F.col("df") <= _BTX_DF_MAX)
        ).select("tok"),
        "tok",
    )
    a, b = rare.alias("a"), rare.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.lang") != F.col("b.lang")),
        )
        .where(
            (F.col("a.n") <= 2 * F.col("b.n"))
            & (F.col("b.n") <= 2 * F.col("a.n"))
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_anchors"))
        .where(F.col("n_anchors") >= _BTX_MIN_ANCHORS)
    )


# ---------------------------------------------------------------------------
# A/B experiment analysis (two-proportion z-test from exact counts)
# ---------------------------------------------------------------------------


@register(
    "events_ab_test",
    """
WITH users AS (
    SELECT user_id, user_id % 2 AS variant,
           CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END)
                     >= 10 THEN 1 ELSE 0 END AS conv
    FROM events GROUP BY user_id
), v AS (
    SELECT CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_a,
           CAST(sum(conv) FILTER (WHERE variant = 0) AS BIGINT) AS c_a,
           CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_b,
           CAST(sum(conv) FILTER (WHERE variant = 1) AS BIGINT) AS c_b
    FROM users
)
SELECT n_a, c_a, n_b, c_b,
       round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
       round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
       CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
            ELSE round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4)
       END AS z_score
FROM v
""",
    tags=("analytics", "experiment"),
)
def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: per-variant user counts, conversion
    rates (a user converts at ≥ 10 purchases — the every-user-buys
    fixture needs a splitting threshold; a real platform logs a
    conversion event), and the pooled two-proportion z-statistic — the experimentation-platform query
    run at every checkpoint of every test. Every aggregate is an
    exact integer (user-grain max + variant counts); the rates and z
    are deterministic float functions of those integers, rounded, so
    the hash gate holds.

    Scale shape: one user-keyed agg (combiner-friendly max), one
    4-value conditional rollup — a single row out regardless of event
    volume. Variant assignment here is the id parity stand-in for the
    experiment-assignment column a real platform logs."""
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        (
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 10
        )
        .cast("int")
        .alias("conv")
    ).select((F.col("user_id") % 2).alias("variant"), "conv")
    v = users.agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv"))).cast("long").alias("c_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv"))).cast("long").alias("c_b"),
    )
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    p = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ra - rb) / F.sqrt(
        p * (1 - p) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    conv_total = F.col("c_a") + F.col("c_b")
    users_total = F.col("n_a") + F.col("n_b")
    return v.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.when(
            (conv_total == 0) | (conv_total == users_total), F.lit(0.0)
        )
        .otherwise(F.round(z, 4))
        .alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Sketch mergeability: daily KMV synopses → weekly rollup ≡ direct sketch
# ---------------------------------------------------------------------------


def _kmv_merge_oracle_sql() -> str:
    from data_ingestion_py_spark.queries_timeseries import _KMV_K, _SQL_H32

    k = _KMV_K
    est = (
        f"round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)"
        f" ELSE ({k} - 1) * 4294967296.0"
        f" / max(CASE WHEN rn = {k} THEN h32 END) END, 2)"
    )
    return f"""
WITH h AS (
    SELECT DISTINCT event_type,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {_SQL_H32} AS h32
    FROM events
), daily_kmin AS (
    SELECT event_type, week, day, h32
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type, day
                                       ORDER BY h32) AS rn FROM h)
    WHERE rn <= {k}
), merged AS (
    SELECT event_type, week, {est} AS kmv_merged
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type, week
                                       ORDER BY h32) AS rn
          FROM (SELECT DISTINCT event_type, week, h32 FROM daily_kmin))
    WHERE rn <= {k} GROUP BY event_type, week
), direct AS (
    SELECT event_type, week, {est} AS kmv_direct,
           CAST(max(n_exact) AS BIGINT) AS exact_distinct
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type, week
                                       ORDER BY h32) AS rn,
                 count(*) OVER (PARTITION BY event_type, week) AS n_exact
          FROM (SELECT DISTINCT event_type, week, h32 FROM h))
    WHERE rn <= {k} GROUP BY event_type, week
)
SELECT d.event_type, d.week, d.exact_distinct, d.kmv_direct, m.kmv_merged,
       (d.kmv_direct = m.kmv_merged) AS merge_lossless
FROM direct d JOIN merged m
  ON d.event_type = m.event_type AND d.week = m.week
"""


@register(
    "events_kmv_rollup_merge",
    _kmv_merge_oracle_sql(),
    tags=("sketch", "cardinality", "mergeable"),
)
def q_events_kmv_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY, demonstrated rather than claimed: per-day
    KMV k-min synopses union into a weekly sketch whose estimate is
    BIT-IDENTICAL to the sketch built directly from the week's raw
    data (``merge_lossless`` is computed in-row and is true by the
    k-min-of-union theorem: the week's k smallest hashes each survive
    their own day's k-min cut). This is the property that lets 100 TB
    pipelines keep tiny per-partition synopses and roll them up
    arbitrarily — daily → weekly → yearly — without ever re-touching
    raw data; exact weekly distincts ride alongside for the error
    band.

    Scale shape: everything is (type, period)-keyed windows over
    DISTINCT 32-bit hashes — at production the daily k-min sets (k·8
    bytes each) are the only state crossing days."""
    from pyspark.sql.window import Window

    from data_ingestion_py_spark.queries_timeseries import _KMV_K

    k = _KMV_K
    e = load_table(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h32"),
    ).distinct()

    def est(df, keys):
        w = Window.partitionBy(*keys).orderBy("h32")
        wc = Window.partitionBy(*keys)
        ranked = df.select(
            *keys,
            "h32",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_exact"),
        ).where(F.col("rn") <= k)
        return ranked.groupBy(*keys).agg(
            F.max("n_exact").cast("long").alias("exact_distinct"),
            F.round(
                F.when(
                    F.max("n_exact") < k,
                    F.max("n_exact").cast("double"),
                ).otherwise(
                    (k - 1)
                    * 4294967296.0
                    / F.max(F.when(F.col("rn") == k, F.col("h32")))
                ),
                2,
            ).alias("kmv"),
        )

    daily_kmin = (
        h.select(
            "event_type",
            "week",
            "day",
            "h32",
            F.row_number()
            .over(Window.partitionBy("event_type", "day").orderBy("h32"))
            .alias("rn"),
        )
        .where(F.col("rn") <= k)
        .select("event_type", "week", "h32")
        .distinct()
    )
    merged = est(daily_kmin, ["event_type", "week"]).select(
        "event_type", "week", F.col("kmv").alias("kmv_merged")
    )
    direct = est(
        h.select("event_type", "week", "h32").distinct(),
        ["event_type", "week"],
    ).select(
        "event_type",
        "week",
        "exact_distinct",
        F.col("kmv").alias("kmv_direct"),
    )
    return direct.join(merged, ["event_type", "week"]).select(
        "event_type",
        "week",
        "exact_distinct",
        "kmv_direct",
        "kmv_merged",
        (F.col("kmv_direct") == F.col("kmv_merged")).alias("merge_lossless"),
    )


# ---------------------------------------------------------------------------
# Forecast backtesting: seasonal-naive baseline with exact-integer errors
# ---------------------------------------------------------------------------


@register(
    "orders_seasonal_backtest",
    """
WITH daily AS (
    SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
           date_trunc('day', o_orderdate) AS d,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders GROUP BY 1, 2
), paired AS (
    SELECT a.day, a.rev_cents AS actual, f.rev_cents AS forecast,
           abs(a.rev_cents - f.rev_cents) AS abs_err,
           CAST(floor(1000000.0 * abs(a.rev_cents - f.rev_cents)
                      / a.rev_cents) AS BIGINT) AS ape_micro
    FROM daily a JOIN daily f ON a.d = f.d + INTERVAL 7 DAY
    WHERE a.rev_cents > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       round(CAST(sum(abs_err) AS DOUBLE) / count(*) / 100.0, 2)
           AS mae_dollars,
       round(CAST(sum(ape_micro) AS DOUBLE) / count(*) / 1000000.0, 6)
           AS mape
FROM paired
""",
    tags=("timeseries", "forecast", "backtest"),
)
def q_orders_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST for the seasonal-naive baseline — forecast(t)
    = revenue(t − 7 days) — the yardstick every real forecasting model
    must beat before deploying, evaluated over the whole history: MAE
    and MAPE across all days with a 7-day-old ancestor. The week-lag
    pairing is a self-EQUI-join of the day-grain rollup on shifted
    dates (no global window, no allowlist entry); errors are exact
    integer cents and per-day APE quantizes to integer micro-units
    BEFORE averaging, so both metrics are engine-deterministic.

    Scale shape: one day-keyed rollup (combiner-friendly integer
    sums), one calendar-sized self-join, one scalar rollup."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias(
            "day"
        ),
        F.date_trunc("day", "o_orderdate").alias("d"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    a = daily.select("day", "d", F.col("rev_cents").alias("actual"))
    f = daily.select(
        F.expr("d + INTERVAL 7 DAY").alias("d"),
        F.col("rev_cents").alias("forecast"),
    )
    paired = (
        a.join(f, "d")
        .where(F.col("actual") > 0)
        .select(
            "day",
            "actual",
            "forecast",
            F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
            F.floor(
                1000000.0
                * F.abs(F.col("actual") - F.col("forecast"))
                / F.col("actual")
            )
            .cast("long")
            .alias("ape_micro"),
        )
    )
    return paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.sum("abs_err").cast("double") / F.count(F.lit(1)) / 100.0, 2
        ).alias("mae_dollars"),
        F.round(
            F.sum("ape_micro").cast("double") / F.count(F.lit(1)) / 1000000.0,
            6,
        ).alias("mape"),
    )


# ---------------------------------------------------------------------------
# Positional inverted index + phrase search (adjacency join, not regex scan)
# ---------------------------------------------------------------------------

_PHRASE = ("table", "hash")  # a phrase the fixture corpus actually contains


@register(
    "snippets_phrase_search",
    f"""
WITH pos AS (
    SELECT doc_id, s.p AS p, s.w AS w
    FROM (SELECT doc_id,
                 unnest(list_transform(
                     generate_series(1, len(toks)),
                     i -> {{'p': i - 1, 'w': toks[i]}})) AS s
          FROM (SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '')
                           AS toks
                FROM documents))
)
SELECT a.doc_id, count(*) AS n_hits,
       min(a.p) AS first_pos
FROM pos a JOIN pos b
  ON a.doc_id = b.doc_id AND b.p = a.p + 1
WHERE a.w = '{_PHRASE[0]}' AND b.w = '{_PHRASE[1]}'
GROUP BY a.doc_id
""",
    tags=("text", "search", "index"),
)
def q_snippets_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHRASE search the index-backed way: a positional inverted index
    (term → (doc, position) postings) answers "table hash" by joining
    the two terms' postings on doc and POSITION ADJACENCY — the
    classic IR phrase-query plan, touching only the two terms'
    postings instead of regex-scanning every document (the plan
    ``sql_keyword_search``'s LIKE scan cannot avoid). Output: per-doc
    hit count and first occurrence.

    Scale shape: term filters cut the postings BEFORE the join (two
    selective scans of an at-rest postings table, term-partitioned at
    100 TB so each query prunes to its terms' partitions); the
    adjacency join is keyed on (doc, position) — never a text scan.
    Both engines build identical postings from the same tokenizer."""
    from data_ingestion_py_spark.functions.text import tokens

    d = _docs(spark, sf_dir)
    pos = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("p", "w")
    )
    a = pos.where(F.col("w") == _PHRASE[0]).select(
        "doc_id", F.col("p").alias("pa")
    )
    b = pos.where(F.col("w") == _PHRASE[1]).select(
        "doc_id", F.col("p").alias("pb")
    )
    return (
        a.join(b, "doc_id")
        .where(F.col("pb") == F.col("pa") + 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("pa").cast("long").alias("first_pos"),
        )
    )


# ---------------------------------------------------------------------------
# Activity coverage periods (interval merge over per-customer order dates)
# ---------------------------------------------------------------------------

_ACT_HALF_WINDOW = 15  # each order marks the customer active ±15 days


@register(
    "customer_activity_periods",
    f"""
WITH iv AS (
    SELECT o_custkey AS k,
           date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
               - {_ACT_HALF_WINDOW} AS s,
           date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
               + {_ACT_HALF_WINDOW} AS e
    FROM orders
), lagd AS (
    SELECT k, s, e,
           max(e) OVER (PARTITION BY k ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pme
    FROM iv
), isl AS (
    SELECT k, s, e,
           sum(CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY k ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS island
    FROM lagd
), per AS (
    SELECT k, island, min(s) AS s, max(e) AS e FROM isl GROUP BY k, island
)
SELECT k AS o_custkey,
       CAST(count(*) AS BIGINT) AS n_periods,
       CAST(sum(e - s + 1) AS BIGINT) AS covered_days
FROM per GROUP BY k
""",
    tags=("analytics", "intervals", "coverage"),
)
def q_customer_activity_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity COVERAGE per customer: every order marks ±15 days of
    activity; overlapping/nested marks merge into maximal periods
    (operators/intervals.merge_intervals — running-max
    gaps-and-islands, per-key windows only), reported as period count
    and total covered days. The lifecycle view behind churn/dormancy
    scoring — 'how many distinct active stretches, how long' — which a
    plain first/last-order range overstates whenever activity pauses.

    Scale shape: a narrow map to integer day intervals, then the
    interval-merge operator's per-customer windows + one keyed rollup;
    nothing global anywhere."""
    from data_ingestion_py_spark.operators.intervals import merge_intervals

    o = load_table(spark, sf_dir, "orders")
    d = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    iv = o.select(
        F.col("o_custkey").alias("k"),
        (d - _ACT_HALF_WINDOW).cast("long").alias("start"),
        (d + _ACT_HALF_WINDOW).cast("long").alias("end"),
    )
    per = merge_intervals(iv, ["k"], merge_gap=0)
    return per.groupBy(F.col("k").alias("o_custkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.sum(F.col("end") - F.col("start") + 1)
        .cast("long")
        .alias("covered_days"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling) over the trade graph
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6  # fixed unroll; rounds after the fixpoint are no-ops
_KCORE_W_MIN = 110  # weight floor thins the dense trade graph first


def _kcore_oracle_sql() -> str:
    from data_ingestion_py_spark.queries_graph import _TRADE_EDGES_CTE

    k, r = _KCORE_K, _KCORE_ROUNDS
    parts = [
        f"""
WITH edges0 AS MATERIALIZED ({_TRADE_EDGES_CTE}),
und AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM edges0 WHERE src <> dst AND w >= {_KCORE_W_MIN}
),
sym AS MATERIALIZED (
    SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
),
alive0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym)"""
    ]
    prev = "alive0"
    for i in range(1, r + 1):
        # MATERIALIZED is load-bearing: each alive{i} references the
        # previous round THREE times (two IN-subqueries + the rollup's
        # reuse); un-materialized, DuckDB re-inlines the whole chain —
        # measured 179 s for this 25-node fixture vs ~1 s materialized.
        parts.append(
            f""",
alive{i} AS MATERIALIZED (
    SELECT u AS node FROM sym
    WHERE u IN (SELECT node FROM {prev})
      AND v IN (SELECT node FROM {prev})
    GROUP BY u HAVING count(*) >= {k}
)"""
        )
        prev = f"alive{i}"
    parts.append(
        f"""
SELECT s.u AS node, CAST(count(*) AS BIGINT) AS core_degree
FROM sym s
WHERE s.u IN (SELECT node FROM {prev})
  AND s.v IN (SELECT node FROM {prev})
GROUP BY s.u"""
    )
    return "".join(parts)


@register(
    "graph_kcore_nations",
    _kcore_oracle_sql(),
    tags=("graph", "iterative", "kcore"),
)
def q_graph_kcore_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-CORE decomposition (k=3) of the thinned trade graph:
    iteratively peel nodes with degree < k until the fixpoint — what
    survives is the maximal subgraph where everyone has ≥ k strong
    partners, the standard dense-community/spam-farm detector (and the
    graph-curation filter for seed quality). Peeling is unrolled a
    FIXED 6 rounds on both engines: rounds past the fixpoint are
    no-ops, so a fixed unroll replays exactly without a convergence
    flag (cheaper than the driver-side convergence count PageRank
    needs, because the peel is monotone).

    Scale shape per round: one semi-join of the symmetric edge list
    against the alive set on EACH endpoint + one degree agg — keyed
    shuffles at edge cardinality, lineage truncated per round
    (localCheckpoint), the components/pagerank posture."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    w_edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            s["s_nationkey"].alias("src"), c["c_nationkey"].alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .where((F.col("src") != F.col("dst")) & (F.col("w") >= _KCORE_W_MIN))
    )
    from data_ingestion_py_spark.operators.kcore import kcore_degrees

    und = w_edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    return kcore_degrees(sym, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Clustering coefficient (triangles over wedge capacity, per node)
# ---------------------------------------------------------------------------


def _clustering_oracle_sql() -> str:
    from data_ingestion_py_spark.queries_graph import _TRADE_EDGES_CTE

    return f"""
WITH edges AS ({_TRADE_EDGES_CTE}),
und AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM edges WHERE src <> dst
),
deg AS (
    SELECT node, count(*) AS d
    FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
    GROUP BY node
),
tri AS (
    SELECT e1.a, e1.b, e2.b AS c
    FROM und e1
    JOIN und e2 ON e1.b = e2.a
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcnt AS (
    SELECT node, count(*) AS n_tri
    FROM (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY node
)
SELECT deg.node, CAST(deg.d AS BIGINT) AS degree,
       CAST(coalesce(tcnt.n_tri, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d < 2 THEN 0.0
            ELSE round(2.0 * coalesce(tcnt.n_tri, 0)
                       / (deg.d * (deg.d - 1)), 6)
       END AS clustering_coef
FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node
"""


@register(
    "graph_clustering_coefficient",
    _clustering_oracle_sql(),
    tags=("graph", "triangles"),
)
def q_graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — triangles through the
    node over its wedge capacity d(d−1)/2: how much each nation's
    trade neighborhood closes into cliques (1.0 = my partners all
    trade with each other; ~0 = hub-and-spoke). Composes the
    degree-oriented triangle operator with the degree table; the
    ratio is a deterministic float of exact integers, rounded, with
    the d < 2 degenerate case pinned to 0.

    Scale shape: identical to graph_triangle_count (the O(√m)-bounded
    wedge joins dominate) plus one node-keyed degree agg and join."""
    from data_ingestion_py_spark.operators.triangles import (
        triangle_counts,
        undirected_edges,
    )

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            s["s_nationkey"].alias("src"), c["c_nationkey"].alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    und = undirected_edges(edges)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    tri = triangle_counts(und, orient="degree").withColumnRenamed(
        "n_triangles", "n_tri"
    )
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_triangles"),
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                2.0
                * F.coalesce(F.col("n_tri"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            )
        )
        .alias("clustering_coef"),
    )



# ---------------------------------------------------------------------------
# Multi-touch (linear) attribution
# ---------------------------------------------------------------------------

_MT_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback


@register(
    "events_multitouch_attribution",
    f"""
WITH p AS (
    SELECT event_id AS pid, user_id, epoch_us(ts) AS ptsu,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT event_id AS click_id, user_id, epoch_us(ts) AS ctsu
    FROM events WHERE event_type = 'click'
), pairs AS (
    SELECT p.pid, p.cents, c.click_id, c.ctsu,
           count(*) OVER (PARTITION BY p.pid) AS n,
           row_number() OVER (PARTITION BY p.pid
                              ORDER BY c.ctsu DESC, c.click_id DESC) AS rn
    FROM p JOIN c ON p.user_id = c.user_id
     AND c.ctsu BETWEEN p.ptsu - {_MT_WINDOW_US} AND p.ptsu - 1
), credited AS (
    SELECT click_id,
           cents * 10000 // n
           + CASE WHEN rn = 1
                  THEN cents * 10000 - n * (cents * 10000 // n)
                  ELSE 0 END AS credit
    FROM pairs
)
SELECT click_id, CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(credit) AS BIGINT) AS credit_micro
FROM credited GROUP BY 1
""",
    tags=("analytics", "attribution"),
)
def q_events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: every click in a purchase's
    strict 7-day lookback shares the revenue equally (micro-cent
    integer split; the division remainder goes to the LAST touch so
    per-purchase credit sums exactly to the revenue — deterministic,
    no float leakage). Complements ``events_purchase_attribution``
    (first/last-touch): that one links ids, this one splits money.

    Scale shape: the purchase×click pairing is the BANDED range join
    (operators/rangejoin trick — purchases probe 2 window-sized time
    bins per user, clicks build), never an unbounded inequality join;
    the per-purchase share windows partition by purchase id (bounded
    by clicks-per-purchase-window); final rollup is one keyed agg at
    click cardinality. The oracle uses DuckDB's native IEJoin for the
    same pairs — independent join algorithm, same credit ledger."""
    from data_ingestion_py_spark.functions.time import ts_us
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        ts_us(F.col("ts")).alias("ptsu"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        ts_us(F.col("ts")).alias("ctsu"),
        F.floor(ts_us(F.col("ts")) / _MT_WINDOW_US).alias("_bin"),
    )
    probe = p.select(
        "pid",
        "user_id",
        "ptsu",
        "cents",
        F.explode(
            F.array(
                F.floor(F.col("ptsu") / _MT_WINDOW_US) - 1,
                F.floor(F.col("ptsu") / _MT_WINDOW_US),
            )
        ).alias("_bin"),
    )
    pairs = probe.join(c, ["user_id", "_bin"]).where(
        (F.col("ctsu") >= F.col("ptsu") - _MT_WINDOW_US)
        & (F.col("ctsu") <= F.col("ptsu") - 1)
    )
    wn = Window.partitionBy("pid")
    wr = Window.partitionBy("pid").orderBy(
        F.col("ctsu").desc(), F.col("click_id").desc()
    )
    shared = pairs.select(
        "click_id",
        "cents",
        F.count(F.lit(1)).over(wn).alias("n"),
        F.row_number().over(wr).alias("rn"),
    )
    share = F.expr("cents * 10000 div n")
    credit = share + F.when(
        F.col("rn") == 1, F.col("cents") * 10000 - F.col("n") * share
    ).otherwise(F.lit(0))
    return (
        shared.select("click_id", credit.alias("credit"))
        .groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("credit").cast("long").alias("credit_micro"),
        )
    )
