"""Training-data-pipeline operators, wave 2: deterministic sampling /
dataset splits, PII redaction, merge/upsert, grouping sets, numeric
profile aggregates, per-group quantiles, n-gram stats.

Everything is oracle-checked; hash-based determinism (md5) is used for
anything random-looking so the DuckDB twin reproduces it bit-for-bit —
the same property that makes these operators resumable/retryable at
100 TB (a re-run or speculative task computes identical splits).

Reference tie-in: the reference has no sampling/cleaning layer at all;
these are the north-star extensions BASELINE.json asks for, built on
the same documents/events fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.queries import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Deterministic sampling + train/val/test split
# ---------------------------------------------------------------------------


def split_bucket(id_col, n_buckets: int = 100):
    """Stable bucket in [0, n_buckets): first 4 md5 hex digits of the id.

    Pure column algebra, identical in DuckDB — the foundation for
    reproducible sampling: re-runs, retries, and different engines all
    agree on every row's bucket, unlike rand()-based sampling.
    """
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10)
        .cast("long")
        % n_buckets
    )


def assign_split(id_col, train_pct: int = 80, val_pct: int = 10):
    b = split_bucket(id_col)
    return (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )


_SQL_BUCKET = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100)"
)


@register(
    "dataset_split_stratified",
    f"""
WITH s AS (
    SELECT lang,
           CASE WHEN {_SQL_BUCKET} < 80 THEN 'train'
                WHEN {_SQL_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
SELECT lang, split, count(*) AS n_docs
FROM s GROUP BY lang, split
""",
    tags=("sampling", "split"),
)
def q_dataset_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic 80/10/10 train/val/test split with per-lang
    counts (the stratification report every corpus build emits). At
    100 TB this is a narrow map + one rollup — no shuffle of the data
    itself, and the assignment is stable across re-runs and engines."""
    d = _docs(spark, sf_dir)
    return (
        d.select("lang", assign_split(F.col("doc_id")).alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "sample_deterministic_pct",
    f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_SQL_BUCKET} < 5
""",
    tags=("sampling",),
)
def q_sample_deterministic_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% deterministic sample: WHERE hash-bucket < 5. The predicate is
    pushed to the scan; the same rows come back on every run (unlike
    df.sample), which is what makes debugging a 100 TB pipeline sane."""
    d = _docs(spark, sf_dir)
    return d.where(split_bucket(F.col("doc_id")) < 5).select(
        "doc_id", "lang", "n_chars"
    )


# ---------------------------------------------------------------------------
# PII redaction / text cleaning
# ---------------------------------------------------------------------------

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
DIGITS9_RE = "[0-9]{9,}"


def redact_text(text):
    """Email + long-digit-run redaction, then whitespace normalization —
    the minimal PII scrub stage. RE2-compatible patterns (no lookarounds)
    so the DuckDB oracle and any engine swap run the same regexes."""
    t = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, DIGITS9_RE, "<NUM>")
    return F.trim(F.regexp_replace(t, "\\s+", " "))


@register(
    "text_redact_pii",
    f"""
WITH corpus AS (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN text || ' contact user' || doc_id
                     || '@example.com  id 123456789' || doc_id
                ELSE text END AS text
    FROM documents
), red AS (
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{DIGITS9_RE}', '<NUM>', 'g'),
               '\\s+', ' ', 'g')) AS clean_text
    FROM corpus
)
SELECT doc_id,
       md5(clean_text) AS clean_hash,
       CAST(len(string_split(clean_text, '<EMAIL>')) - 1 AS BIGINT)
           AS n_emails_redacted,
       CAST(len(string_split(clean_text, '<NUM>')) - 1 AS BIGINT)
           AS n_nums_redacted
FROM red
""",
    tags=("text", "pii"),
)
def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over a corpus seeded with planted emails + id numbers
    (every 4th doc), verified by content hash — so the oracle confirms
    the exact redacted text, not just counts. Pure codegen regexes."""
    d = _docs(spark, sf_dir)
    seeded = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com  id 123456789"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = seeded.select(
        "doc_id", redact_text(F.col("text")).alias("clean_text")
    )
    return clean.select(
        "doc_id",
        F.md5("clean_text").alias("clean_hash"),
        (F.size(F.split("clean_text", "<EMAIL>")) - 1)
        .cast("long")
        .alias("n_emails_redacted"),
        (F.size(F.split("clean_text", "<NUM>")) - 1)
        .cast("long")
        .alias("n_nums_redacted"),
    )


# ---------------------------------------------------------------------------
# Merge / upsert (the MERGE INTO shape, engine-agnostic)
# ---------------------------------------------------------------------------


@register(
    "documents_merge_upsert",
    """
WITH updates AS (
    SELECT doc_id, 'updated-' || lang AS lang, n_chars + 1000 AS n_chars
    FROM documents WHERE doc_id % 10 = 3
    UNION ALL
    SELECT doc_id + 5000000 AS doc_id, 'new' AS lang, 1 AS n_chars
    FROM documents WHERE doc_id % 50 = 0
), unioned AS (
    SELECT doc_id, lang, n_chars, 1 AS src FROM updates
    UNION ALL
    SELECT doc_id, lang, n_chars, 0 AS src FROM documents
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY src DESC)
               AS rk
    FROM unioned
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM ranked WHERE rk = 1
""",
    tags=("merge", "upsert"),
)
def q_documents_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without Delta: updates win over base rows
    via a per-key row_number (update every 10th doc, insert fresh ids).
    One shuffle on the merge key — at rest this is the partitioned-
    overwrite / MERGE pattern every incremental corpus build runs.
    Matched rows take the update's values; unmatched inserts append."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    updates = (
        d.where(F.col("doc_id") % 10 == 3)
        .select(
            "doc_id",
            F.concat(F.lit("updated-"), F.col("lang")).alias("lang"),
            (F.col("n_chars") + 1000).alias("n_chars"),
        )
        .unionByName(
            d.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 5000000).alias("doc_id"),
                F.lit("new").alias("lang"),
                F.lit(1).cast("long").alias("n_chars"),
            )
        )
    )
    from pyspark.sql.window import Window

    unioned = updates.withColumn("src", F.lit(1)).unionByName(
        d.withColumn("src", F.lit(0))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("src"))
    return (
        unioned.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    )


# ---------------------------------------------------------------------------
# Grouping sets / numeric profile / per-group quantiles / n-grams
# ---------------------------------------------------------------------------


@register(
    "events_grouping_sets",
    """
SELECT event_type,
       CAST(dayofweek(ts) AS BIGINT) AS dow,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (dayofweek(ts)))
""",
    tags=("agg", "grouping-sets"),
)
def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True GROUPING SETS (disjoint dimensions, not a rollup prefix):
    per-type totals and per-day-of-week totals in ONE Expand+HashAgg
    pass over the scan instead of two jobs. DuckDB's dayofweek is
    0-6 Sunday-first; Spark's dayofweek is 1-7 Sunday-first, so the
    Spark side subtracts 1."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("_ev_gs")
    return spark.sql(
        """
        SELECT event_type,
               CAST(dayofweek(ts) - 1 AS BIGINT) AS dow,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM _ev_gs
        GROUP BY GROUPING SETS ((event_type), ((dayofweek(ts) - 1)))
        """
    )


@register(
    "lineitem_numeric_profile",
    """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
       round(stddev_samp(l_extendedprice), 4) AS std_price,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def q_lineitem_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile statistics per group — corr/covar/stddev in one
    hash-agg pass (each is a tracked moment aggregate; no second scan).
    The numeric-drift check feature stores run before training."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
            "covar_qty_disc"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "events_group_quantiles",
    """
SELECT event_type,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99,
       count(*) AS n_events
FROM events
GROUP BY event_type
""",
    tags=("agg", "quantile"),
)
def q_events_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group continuous quantiles (Spark `percentile` ≙ DuckDB
    `quantile_cont`). At 100 TB swap to approx_percentile (t-digest) —
    same plan shape, bounded memory; exact keeps the oracle exact here."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "snippets_prose_mode",
    """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), prose AS (
    SELECT doc_id,
           array_to_string(
               list_transform(
                   generate_series(0, CAST(ceil(len(t)/7.0) AS INT) - 1),
                   i -> array_to_string(t[i*7+1 : i*7+7], ' ')),
               '. ') || '.' AS prose_text
    FROM toks WHERE len(t) > 0
), sent AS (
    -- independent splitter: sentinel replace + split (the Spark side
    -- uses a real lookbehind regex; both must recover the sentences)
    SELECT doc_id,
           string_split(replace(prose_text, '. ', '.' || chr(1)), chr(1))
               AS sentences
    FROM prose
), ex AS (
    SELECT doc_id, sentences,
           unnest(generate_series(0, len(sentences) - 1, 3)) AS s
    FROM sent WHERE len(sentences) > 0
)
SELECT doc_id,
       CAST(s // 3 + 1 AS INT) AS snippet_id,
       array_to_string(sentences[s+1 : s+5], ' ') AS snippet_text
FROM ex
""",
    tags=("T1", "T2", "prose"),
)
def q_snippets_prose_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prose-mode snippetization E2E: deterministic prose is synthesized
    from the fixture (7-token sentences joined with '. '), then the REAL
    punctuation sentence splitter — the spaCy-seam analog, a lookbehind
    regex split (operators/snippetize.sentences_from_punctuation,
    reference :171-176) — recovers sentences and the standard 5/3
    sliding windows apply. The oracle rebuilds sentences with a
    sentinel-replace split (different algorithm, same answer), so a
    regression in the regex path can't hide behind its own oracle."""
    from data_ingestion_py_spark.functions.text import tokens as _toks
    from data_ingestion_py_spark.operators.snippetize import snippetize

    d = _docs(spark, sf_dir)
    t = _toks(F.col("text"))
    nsent = F.ceil(F.size(t) / 7).cast("int")
    prose = F.concat(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), nsent - 1),
                lambda i: F.array_join(F.slice(t, i * 7 + 1, 7), " "),
            ),
            ". ",
        ),
        F.lit("."),
    )
    prose_docs = d.where(F.size(t) > 0).select(
        "doc_id", prose.alias("prose_text")
    )
    return snippetize(
        prose_docs, text_col="prose_text", mode="punctuation"
    ).select("doc_id", "snippet_id", "snippet_text")


# ---------------------------------------------------------------------------
# Keep-latest dedup / histogram / edit-distance verify
# ---------------------------------------------------------------------------


@register(
    "events_dedup_latest",
    """
SELECT user_id, event_type,
       event_id AS latest_event_id, ts AS latest_ts, value AS last_value
FROM (SELECT *, row_number() OVER (
          PARTITION BY user_id, event_type
          ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
""",
    tags=("dedup", "cdc"),
)
def q_events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup (the CDC compaction / upsert-read
    shape): newest event per (user, type), deterministic tie-break on
    event_id. One shuffle on the key; at rest this is the MERGE
    compaction every incremental table maintains."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "events_value_histogram",
    """
WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
SELECT bin, count(*) AS n
FROM (SELECT least(CAST(floor((value - lo) / ((hi - lo) / 20))
                        AS INT), 19) AS bin
      FROM events, b)
GROUP BY bin
""",
    tags=("profile", "histogram"),
)
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of `value`: one scalar min/max agg
    broadcast into a scan-side bin expression, then one count shuffle.
    The data-profiling primitive; identical double arithmetic on both
    engines makes bin edges engine-stable."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = e.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / 20)
            ).cast("int"),
            F.lit(19),
        ).alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))


@register(
    "dedup_levenshtein_verify",
    """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(
               list_filter(string_split(text, ' '), x -> x <> '')[4:], ' ')
               AS text
    FROM documents WHERE doc_id % 5 = 0
)
SELECT o.doc_id AS doc_a, v.doc_id AS doc_b,
       levenshtein(substr(o.text, 1, 200), substr(v.text, 1, 200))
           AS edit_distance,
       round(1.0 - CAST(levenshtein(substr(o.text, 1, 200),
                                    substr(v.text, 1, 200)) AS DOUBLE)
                   / greatest(len(substr(o.text, 1, 200)),
                              len(substr(v.text, 1, 200))), 6)
           AS similarity
FROM corpus o JOIN corpus v ON v.doc_id = o.doc_id + 1000000
""",
    tags=("dedup", "editdistance"),
)
def q_dedup_levenshtein_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification on known candidate pairs (doc vs its
    perturbed variant) — the character-level alternative to n-gram
    Jaccard for near-dup confirmation. Prefixes capped at 200 chars:
    Levenshtein is O(len²) per pair, so production verify stages bound
    the comparison window (or band the DP) — the cap IS the scale
    design, not a shortcut. Runs only at candidate cardinality."""
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups

    corpus = _corpus_with_near_dups(_docs(spark, sf_dir))
    a = corpus.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, 200).alias("ta"),
    )
    b = corpus.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, 200).alias("tb"),
    )
    pairs = a.join(b, F.col("doc_b") == F.col("doc_a") + 1000000)
    d = F.levenshtein("ta", "tb")
    return pairs.select(
        "doc_a",
        "doc_b",
        d.alias("edit_distance"),
        F.round(
            1.0
            - d.cast("double")
            / F.greatest(F.length("ta"), F.length("tb")),
            6,
        ).alias("similarity"),
    )


# ---------------------------------------------------------------------------
# Dedup cluster assembly (connected components over LSH pairs)
# ---------------------------------------------------------------------------


def _cc_chain_sql() -> str:
    """CTE chain ending at ``comp (doc_id, cluster_id)``: the LSH-pairs
    fragments (same as dedup_minhash_lsh_pairs) + a recursive min-label
    fixpoint. Shared by the connected-components oracle below and the
    leakage-safe split oracle (queries_linkage.py), which both need the
    component assignment mid-query."""
    from data_ingestion_py_spark.queries_ext import (
        NEAR_DUP_CORPUS_CTE,
        _sql_band_keys,
        _sql_minhash_sig,
        _sql_shingles,
    )

    return (
        NEAR_DUP_CORPUS_CTE.replace("WITH corpus", "WITH RECURSIVE corpus", 1)
        + _sql_shingles()
        + _sql_minhash_sig()
        + _sql_band_keys()
        + """
, verified AS (
    SELECT doc_a, doc_b
    FROM cand
    JOIN (SELECT doc_id, list_distinct(sh) AS dsh FROM shingled) sa
         ON cand.doc_a = sa.doc_id
    JOIN (SELECT doc_id, list_distinct(sh) AS dsh FROM shingled) sb
         ON cand.doc_b = sb.doc_id
    WHERE CAST(len(list_intersect(sa.dsh, sb.dsh)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.dsh, sb.dsh))) >= 0.5
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM verified
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM verified
), reach AS (
    SELECT src, src AS node FROM edges
    UNION
    SELECT r.src, e.dst AS node FROM reach r JOIN edges e ON e.src = r.node
), comp AS (
    SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY src
)
"""
    )


def _cc_oracle_sql() -> str:
    """LSH-pairs CTE chain + recursive min-label fixpoint — an
    INDEPENDENT clustering algorithm (transitive closure per node)
    against Spark's iterative label propagation: different algorithm,
    same components."""
    return (
        _cc_chain_sql()
        + """
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
"""
    )


@register(
    "dedup_connected_components",
    _cc_oracle_sql(),
    tags=("dedup", "clusters"),
)
def q_dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's last stage: LSH near-dup PAIRS → duplicate
    CLUSTERS via iterative min-label propagation
    (operators/components.py), canonical = min doc_id per component.
    Rows with doc_id != cluster_id are exactly the drop set. The oracle
    clusters the same pairs with a recursive transitive closure —
    a different algorithm that must land on the same components."""
    from data_ingestion_py_spark.operators.components import dedup_clusters
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups

    corpus = _corpus_with_near_dups(_docs(spark, sf_dir))
    from data_ingestion_py_spark.operators import dedup as _dedup

    pairs = _dedup.near_duplicates_minhash(corpus, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    return dedup_clusters(pairs)


# ---------------------------------------------------------------------------
# Eval-set contamination check (n-gram overlap vs the train split)
# ---------------------------------------------------------------------------

_CONTAM_K = 8  # 8-gram overlap: natural docs ≈ 0.04, planted clones ≈ 1.0


@register(
    "corpus_repeated_ngrams",
    f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), grams AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(0, len(t) - {_CONTAM_K}),
        i -> array_to_string(t[i+1 : i+{_CONTAM_K}], ' ')))) AS g
    FROM toks WHERE len(t) >= {_CONTAM_K}
), gcount AS (
    SELECT g, count(*) AS nd FROM grams GROUP BY g
)
SELECT grams.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN gcount.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup,
       round(CAST(sum(CASE WHEN gcount.nd >= 2 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS dup_frac
FROM grams JOIN gcount USING (g)
GROUP BY grams.doc_id
""",
    tags=("dedup", "ngram"),
)
def q_corpus_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring signal (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): for each document, the
    fraction of its distinct 8-grams that also occur in at least one
    OTHER document — the exact-substring duplication score that catches
    boilerplate/templates MinHash's whole-doc similarity misses.

    Scale shape: explode distinct per-doc grams (narrow), ONE shuffle
    keyed on the gram for the corpus-wide count (since grams are
    per-doc-distinct, count(*) = distinct docs), one keyed join back at
    gram cardinality, per-doc rollup. The gram table is corpus-sized at
    100 TB — deliberately never broadcast (same posture as the
    contamination join)."""
    from data_ingestion_py_spark.functions.text import shingles, tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= _CONTAM_K
    )
    grams = toks.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("t"), _CONTAM_K))).alias("g"),
    )
    gcount = grams.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        grams.join(gcount, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(dup).cast("bigint").alias("n_dup"),
            F.round(F.sum(dup) / F.count(F.lit(1)), 6).alias("dup_frac"),
        )
    )


@register(
    "contamination_eval_overlap",
    f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), tr AS (
    SELECT DISTINCT unnest(list_distinct(list_transform(
        generate_series(0, len(t) - {_CONTAM_K}),
        i -> array_to_string(t[i+1 : i+{_CONTAM_K}], ' ')))) AS g
    FROM toks
    WHERE {_SQL_BUCKET} < 80 AND len(t) >= {_CONTAM_K}
), ev AS (
    SELECT doc_id, t FROM toks WHERE {_SQL_BUCKET} >= 95
    UNION ALL
    SELECT doc_id + 3000000 AS doc_id, t[3:] AS t
    FROM toks WHERE {_SQL_BUCKET} < 80 AND doc_id % 20 = 0
), eg AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(0, len(t) - {_CONTAM_K}),
        i -> array_to_string(t[i+1 : i+{_CONTAM_K}], ' ')))) AS g
    FROM ev WHERE len(t) >= {_CONTAM_K}
)
SELECT eg.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hit,
       round(CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS overlap_frac,
       CAST(CASE WHEN CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*) >= 0.6
                 THEN 1 ELSE 0 END AS INT) AS is_contaminated
FROM eg LEFT JOIN tr ON eg.g = tr.g
GROUP BY eg.doc_id
""",
    tags=("contamination", "ngram"),
)
def q_contamination_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: for each eval doc, the fraction
    of its distinct 8-grams that appear anywhere in the train split.
    Eval = the natural top-5% hash buckets ∪ planted clones of train
    docs (first 2 tokens dropped, ids +3M) which MUST flag ≈1.0.

    Scale shape: both gram sets are explode → distinct → one shuffle
    join keyed on the gram string (never broadcast — the train-side
    n-gram set is corpus-sized at 100 TB); per-doc rollup after. The
    exact-match join is the standard decontamination pass (eval leakage
    detection) every corpus build runs before training."""
    from data_ingestion_py_spark.functions.text import shingles, tokens

    d = _docs(spark, sf_dir)
    b = split_bucket(F.col("doc_id"))
    t = tokens(F.col("text"))
    toks = d.select("doc_id", t.alias("t"), b.alias("b"))
    tr_grams = (
        toks.where((F.col("b") < 80) & (F.size("t") >= _CONTAM_K))
        .select(
            F.explode(
                F.array_distinct(shingles(F.col("t"), _CONTAM_K))
            ).alias("g")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev = toks.where(F.col("b") >= 95).select("doc_id", "t").unionByName(
        toks.where((F.col("b") < 80) & (F.col("doc_id") % 20 == 0)).select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.slice(
                F.col("t"), 3, F.greatest(F.size("t") - 2, F.lit(0))
            ).alias("t"),
        )
    )
    eg = ev.where(F.size("t") >= _CONTAM_K).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("t"), _CONTAM_K))).alias(
            "g"
        ),
    )
    frac = F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast(
        "double"
    ) / F.count(F.lit(1))
    return (
        eg.join(tr_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_hit"),
            F.round(frac, 6).alias("overlap_frac"),
            (frac >= 0.6).cast("int").alias("is_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition-based quality filters (Gopher-style)
# ---------------------------------------------------------------------------


@register(
    "text_repetition_filters",
    """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), tok AS (
    SELECT doc_id, unnest(t) AS tk FROM toks WHERE len(t) >= 2
), cnt AS (
    SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk
), tstats AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_token_frac,
           round(CAST(sum(c * len(tk)) AS DOUBLE) / sum(c), 6)
               AS mean_token_len
    FROM cnt GROUP BY doc_id
), bstats AS (
    SELECT doc_id,
           round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6)
               AS dup_bigram_frac
    FROM (SELECT doc_id,
                 list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1]) AS bg
          FROM toks WHERE len(t) >= 2)
)
SELECT tstats.doc_id, n_tokens, top_token_frac, mean_token_len,
       dup_bigram_frac,
       CAST(CASE WHEN top_token_frac <= 0.2 AND dup_bigram_frac <= 0.2
                  AND n_tokens BETWEEN 5 AND 10000
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM tstats JOIN bstats ON tstats.doc_id = bstats.doc_id
""",
    tags=("text", "quality", "repetition"),
)
def q_text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality gates per document: most-frequent
    -token fraction, duplicate-bigram fraction, mean token length, token
    count, and the resulting keep/drop flag.

    Scale shape: token frequencies via explode → ONE shuffle keyed
    (doc_id, token) → per-doc rollup (re-uses the same partitioning —
    doc_id prefix — so the second agg is shuffle-free under AQE);
    bigram stats are pure array algebra in the scan's map stage; one
    doc_id join merges the two. No Python anywhere."""
    from data_ingestion_py_spark.functions.text import tokens

    d = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    toks = d.select("doc_id", t.alias("t")).where(F.size("t") >= 2)
    cnt = (
        toks.select("doc_id", F.explode("t").alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tstats = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
            "top_token_frac"
        ),
        F.round(
            F.sum(F.col("c") * F.length("tk")).cast("double") / F.sum("c"), 6
        ).alias("mean_token_len"),
    )
    bg = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, x: F.concat(a, F.lit(" "), x),
    )
    bstats = toks.select(
        "doc_id",
        F.round(
            1.0
            - F.size(F.array_distinct(bg)).cast("double") / F.size(bg),
            6,
        ).alias("dup_bigram_frac"),
    )
    out = tstats.join(bstats, "doc_id")
    return out.select(
        "doc_id",
        "n_tokens",
        "top_token_frac",
        "mean_token_len",
        "dup_bigram_frac",
        (
            (F.col("top_token_frac") <= 0.2)
            & (F.col("dup_bigram_frac") <= 0.2)
            & F.col("n_tokens").between(5, 10000)
        )
        .cast("int")
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# Deterministic k-means clustering (full Lloyd's, oracle-replayed)
# ---------------------------------------------------------------------------


def _register_kmeans() -> None:
    from data_ingestion_py_spark.operators.kmeans import (
        kmeans_integer,
        kmeans_oracle_sql,
    )

    @register(
        "embedding_kmeans_assign",
        kmeans_oracle_sql(k=8, n_iter=3),
        tags=("similarity", "clustering", "iterative"),
    )
    def q_embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Integer-quantized Lloyd's k-means (k=8, 3 assignment rounds)
        over the embeddings table — the clustering pass that ivf_topk /
        semantic_dedup_pairs assume upstream, bit-exact against a DuckDB
        unrolled-CTE replay (``operators/kmeans.py``). Centroids stay
        k×dim (always broadcast); assignment is one narrow argmin map;
        updates are one (cid, pos)-keyed integer hash-agg per round."""
        return kmeans_integer(
            load_table(spark, sf_dir, "embeddings"), k=8, n_iter=3
        )


_register_kmeans()


# ---------------------------------------------------------------------------
# Per-label embedding centroids (the IVF / k-means training step)
# ---------------------------------------------------------------------------


@register(
    "embedding_label_centroids",
    """
WITH ex AS (
    SELECT label, s.pos AS pos, s.q AS q
    FROM (SELECT label,
                 unnest(list_transform(
                     generate_series(1, len(embedding)),
                     i -> {'pos': i - 1,
                           'q': CAST(floor(CAST(embedding[i] AS DOUBLE)
                                           * 1000000) AS BIGINT)}))
                     AS s
          FROM embeddings)
)
SELECT label, CAST(pos AS INT) AS pos,
       CAST((sum(q) - ((sum(q) % count(*)) + count(*)) % count(*))
            / count(*) AS BIGINT) AS centroid_micro,
       count(*) AS n_vecs
FROM ex GROUP BY label, pos
""",
    tags=("similarity", "centroids"),
)
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors — the k-means /
    IVF-training primitive (one Lloyd's-iteration M-step), in exact
    fixed-point: elements quantized to integer micro-units
    (floor(x·1e6)), summed exactly, mean via integer floor division.
    ``centroid_micro`` is therefore bit-identical regardless of
    partial-aggregation order, engine, or run — float sums would drift
    between engines AND between Spark runs, and even a final round()
    can land on a half-tie that Spark (HALF_UP on the exact binary
    expansion) and other engines resolve differently.

    Scale shape: posexplode → one hash-agg keyed (label, pos); at
    100 TB this is the standard centroid update (combiner-friendly:
    integer partial sums map-side)."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * 1000000).cast("long").alias("q"),
    )
    n = F.count(F.lit(1))
    s = F.sum("q")
    # exact floor division in integer algebra: (s - floormod(s, n)) / n
    return ex.groupBy("label", "pos").agg(
        ((s - F.pmod(s, n)) / n).cast("long").alias("centroid_micro"),
        n.alias("n_vecs"),
    )


@register(
    "text_top_bigrams",
    """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), bg AS (
    SELECT unnest(list_transform(
               generate_series(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1])) AS bigram
    FROM toks WHERE len(t) >= 2
)
SELECT bigram, count(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
    tags=("text", "ngram"),
)
def q_text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams: array-algebra bigram construction
    (zip each token with its successor — no Python), explode, one
    count shuffle, TakeOrdered. The n-gram LM / contamination-check
    primitive."""
    from data_ingestion_py_spark.functions.text import tokens

    d = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.where(F.size(t) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "text_inverted_index",
    """
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
    FROM documents
), tf AS (
    SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
    FROM toks GROUP BY term, doc_id
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
           FILTER (WHERE rn <= 20) AS postings_head
FROM (SELECT *, row_number() OVER (PARTITION BY term ORDER BY doc_id)
          AS rn FROM tf)
GROUP BY term
HAVING count(*) >= 25
""",
    tags=("text", "index"),
)
def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the retrieval-side primitive next to the
    similarity stack: per (term, doc) term frequencies, then per-term
    posting lists with document frequency and collection frequency.
    Two shuffles total (tf rollup keyed on term+doc, index rollup keyed
    on term) — the classic two-stage index build; the posting list
    itself is truncated to the first 20 doc ids (sorted ascending, the
    ``rn`` window runs PARTITIONED by term — never global) exactly like
    a real impact-ordered index keeps its head block. Emitted as a
    ``doc:tf`` CSV string so the oracle hash-compares byte-for-byte;
    the df >= 25 floor keeps the output at dictionary-head size."""
    from data_ingestion_py_spark.functions.text import tokens
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    tf = (
        d.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = tf.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= 20,
                            F.struct(
                                "doc_id",
                                F.concat_ws(
                                    ":", F.col("doc_id"), F.col("tf")
                                ).alias("s"),
                            ),
                        )
                    )
                ).getField("s"),
                ",",
            ).alias("postings_head"),
        )
        .where(F.col("df") >= 25)
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (broadcast bit-set probe, no corpus shuffle)
# ---------------------------------------------------------------------------

_BLOOM_P = "(('0x' || substr(md5(g || '|' || CAST(j AS VARCHAR)), 1, 8))::BIGINT % 65536)"


@register(
    "corpus_bloom_decontaminate",
    f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), ev AS (
    SELECT doc_id, t FROM toks
    WHERE {_SQL_BUCKET} >= 95 AND len(t) >= {_CONTAM_K}
), evg AS (
    SELECT DISTINCT unnest(list_distinct(list_transform(
        generate_series(0, len(t) - {_CONTAM_K}),
        i -> array_to_string(t[i+1 : i+{_CONTAM_K}], ' ')))) AS g
    FROM ev
), filt AS (
    SELECT p // 32 AS word,
           bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
    FROM (SELECT {_BLOOM_P} AS p
          FROM evg, generate_series(0, 3) AS js(j))
    GROUP BY 1
), probe_docs AS (
    SELECT doc_id, t FROM toks WHERE {_SQL_BUCKET} < 80
    UNION ALL
    SELECT doc_id + 5000000 AS doc_id, t[3:] AS t
    FROM toks WHERE {_SQL_BUCKET} >= 95 AND doc_id % 2 = 0
), pg AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(0, len(t) - {_CONTAM_K}),
        i -> array_to_string(t[i+1 : i+{_CONTAM_K}], ' ')))) AS g
    FROM probe_docs WHERE len(t) >= {_CONTAM_K}
), need AS (
    SELECT doc_id, g, {_BLOOM_P} // 32 AS word,
           bit_or(1::BIGINT << CAST({_BLOOM_P} % 32 AS INT)) AS need
    FROM pg, generate_series(0, 3) AS js(j)
    GROUP BY 1, 2, 3
), hits AS (
    SELECT n.doc_id, n.g,
           bool_and(f.bits IS NOT NULL AND (f.bits & n.need) = n.need)
               AS bloom_hit
    FROM need n LEFT JOIN filt f ON n.word = f.word
    GROUP BY 1, 2
), ex AS (SELECT g, 1 AS x FROM evg)
SELECT h.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN h.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bloom,
       CAST(sum(CASE WHEN ex.x IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact,
       CAST(sum(CASE WHEN h.bloom_hit AND ex.x IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(CASE WHEN sum(CASE WHEN h.bloom_hit THEN 1 ELSE 0 END) * 2
                      >= count(*)
                 THEN 1 ELSE 0 END AS INT) AS flagged
FROM hits h LEFT JOIN ex ON h.g = ex.g AND h.bloom_hit
GROUP BY 1
""",
    tags=("contamination", "bloom", "sketch"),
)
def q_corpus_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with the plan you'd run at 100 TB: build a
    65,536-bit / 4-hash Bloom filter over the EVAL suite's distinct
    8-grams (the small side — ≤2,048 words ≈ 16 KiB), broadcast it,
    and probe every TRAIN doc's grams in the scan's map stage; only
    bloom-POSITIVE grams continue to the exact verify join, so the
    ~98% negative gram mass never shuffles on the gram string at all
    (contrast ``contamination_eval_overlap``, which shuffles every
    gram). Planted clones of eval docs (ids +5M, first 2 tokens
    dropped) must flag; ``n_false_pos`` surfaces the filter's actual
    FP count next to its ~2% design rate — no false negatives by
    construction (``n_exact`` ≤ ``n_bloom`` always, per-gram verified
    in ``operators/bloom.py``). Filter build, probe, and verify are
    all md5 column algebra, so DuckDB replays the exact bits."""
    from data_ingestion_py_spark.functions.text import shingles, tokens
    from data_ingestion_py_spark.operators.bloom import bloom_build, bloom_probe

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        tokens(F.col("text")).alias("t"),
        split_bucket(F.col("doc_id")).alias("b"),
    )
    ev = toks.where((F.col("b") >= 95) & (F.size("t") >= _CONTAM_K))
    evg = (
        ev.select(
            F.explode(F.array_distinct(shingles(F.col("t"), _CONTAM_K))).alias("g")
        )
        .distinct()
    )
    filt = bloom_build(evg)
    probe_docs = toks.where(F.col("b") < 80).select("doc_id", "t").unionByName(
        ev.where(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 5000000).alias("doc_id"),
            F.slice(F.col("t"), 3, F.greatest(F.size("t") - 2, F.lit(0))).alias("t"),
        )
    )
    pg = probe_docs.where(F.size("t") >= _CONTAM_K).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("t"), _CONTAM_K))).alias("g"),
    )
    hits = bloom_probe(pg, filt, ["doc_id"])
    ex = evg.withColumn("x", F.lit(1))
    n_bloom = F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
    return (
        hits.join(ex, (hits["g"] == ex["g"]) & hits["bloom_hit"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            n_bloom.cast("long").alias("n_bloom"),
            F.sum(F.when(F.col("x").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_exact"),
            F.sum(
                F.when(F.col("bloom_hit") & F.col("x").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_false_pos"),
            (n_bloom * 2 >= F.count(F.lit(1))).cast("int").alias("flagged"),
        )
    )



# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth
# ---------------------------------------------------------------------------


@register(
    "corpus_heaps_law",
    """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
), doc_stats AS (
    SELECT doc_id, len(t) AS n_tokens FROM toks
), firsts AS (
    SELECT term, min(doc_id) AS first_doc FROM (
        SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks
    ) GROUP BY term
), new_terms AS (
    SELECT first_doc AS doc_id, count(*) AS n_new FROM firsts GROUP BY 1
), per_doc AS (
    SELECT d.doc_id, d.n_tokens, coalesce(n.n_new, 0) AS n_new
    FROM doc_stats d LEFT JOIN new_terms n ON d.doc_id = n.doc_id
), cum AS (
    SELECT doc_id,
           sum(n_tokens) OVER (ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens,
           sum(n_new) OVER (ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_vocab
    FROM per_doc
)
SELECT doc_id, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(cum_vocab AS BIGINT) AS cum_vocab
FROM cum WHERE doc_id % 50 = 0
""",
    tags=("text", "corpus-stats"),
)
def q_corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law curve: cumulative vocabulary size vs cumulative token
    count in doc_id order, sampled every 50th doc — the V(n) = K*n^b
    sublinear growth every tokenizer-budget / vocab-size decision reads
    off. The interesting scale move is the CUMULATIVE DISTINCT: a
    naive running countDistinct window is unshufflable (and Spark
    refuses it); instead each term contributes at its FIRST document
    (one groupBy min per term — the same first-touch trick
    ``dedup_exact`` uses for keeper election), turning running-distinct
    into a running SUM of per-doc first-touch counts, which
    ``with_global_rank``'s two-phase cumsum machinery handles with a
    range shuffle + partition-offset broadcast — no single-partition
    window over the corpus-sized table (lint-enforced)."""
    from data_ingestion_py_spark.functions.text import tokens
    from data_ingestion_py_spark.operators.ranking import with_global_rank

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    doc_stats = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    firsts = (
        toks.select("doc_id", F.explode(F.array_distinct("t")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    new_terms = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    per_doc = doc_stats.join(new_terms, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )
    cum = with_global_rank(
        per_doc,
        order_by=[F.col("doc_id")],
        cumsum={
            "cum_tokens": F.col("n_tokens"),
            "cum_vocab": F.col("n_new"),
        },
    )
    return cum.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
    )


@register(
    "corpus_classifier_filter",
    """
WITH scored AS (
    SELECT doc_id, source,
           list_sum(list_transform(
               list_filter(string_split(text, ' '), x -> x <> ''),
               w -> ((('0x' || substr(md5(w), 1, 8))::BIGINT % 1024)
                     * 2654435761) % 1997 - 998)) AS logit,
           len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_words
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(sum(CASE WHEN logit > 0 THEN n_words ELSE 0 END) AS BIGINT)
           AS kept_words
FROM scored
GROUP BY source
""",
    tags=("corpus", "curation", "classifier"),
)
def q_corpus_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the FineWeb-Edu-style curation
    step where a TRAINED classifier (not a heuristic) gates documents:
    a linear text classifier with hashed word features (the fastText
    architecture) applied entirely in column algebra. Each word hashes
    to one of 1024 buckets (md5 idiom shared with the mixture sampler),
    the bucket's integer weight comes from a deterministic formula
    standing in for trained parameters (at scale: a 1024-row broadcast
    weight table — same plan shape), and the document logit is the
    exact integer feature-weight sum; logit > 0 keeps the document.
    Per-source keep-rate rollup mirrors how curation runs report
    classifier yield. The oracle replays the identical hash+weight
    arithmetic. One narrow scan stage + one tiny groupBy on source —
    inference cost is the scan itself, which is what makes linear
    heads the only classifiers that survive 100 TB (transformer-based
    scoring runs as a sampled teacher to retrain this head, not on
    the full corpus)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    words = F.filter(F.split("text", " "), lambda x: x != "")
    bucket = lambda w: (  # noqa: E731
        F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % 1024
    )
    weight = lambda w: (bucket(w) * 2654435761) % 1997 - 998  # noqa: E731
    logit = F.aggregate(
        F.transform(words, weight), F.lit(0).cast("long"), lambda a, x: a + x
    )
    scored = d.select(
        "source",
        logit.alias("logit"),
        F.size(words).alias("n_words"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("logit") > 0).cast("long")).alias("n_kept"),
        F.sum(
            F.when(F.col("logit") > 0, F.col("n_words")).otherwise(0)
        ).alias("kept_words"),
    )
