"""Corpus-curation operators: the filter/clean/pack/mix stages a
large-scale LLM training-data pipeline runs between raw ingestion and
tokenization.

- quality cascade: combined keep/reject verdict with a first-match
  reject reason (all-integer gates — no float thresholds to drift
  between engines)
- line-level boilerplate removal (C4-style): drop lines whose document
  frequency crosses a threshold, reassemble documents in order
- sequence packing: contiguous token-budget chunking implemented the
  scalable way (per-range partial sums + tiny offset table) instead of
  one global single-partition window
- domain mixture sampling: deterministic per-source acceptance rates

Reference tie-in: the reference (data_ingestion.py) ingests and
snippetizes but never curates; these extend its pipeline surface the
way SURVEY.md §6 lays out. All hash-deterministic (md5 buckets), so
re-runs, speculative tasks, and the DuckDB oracle agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_py_spark.functions.text import STOPWORDS, tokens
from data_ingestion_py_spark.functions.ints import half_up_mean_sql
from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.queries import register
from data_ingestion_py_spark.queries_pipeline import _SQL_BUCKET, split_bucket


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Quality filter cascade
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "corpus_quality_cascade",
    f"""
WITH sig AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
           len(list_distinct(list_filter(string_split(text, ' '),
                                         x -> x <> ''))) AS n_distinct,
           len(list_filter(string_split(text, ' '),
                           x -> list_contains([{_STOP_SQL}], x))) AS n_stop
    FROM documents
)
SELECT doc_id, n_tokens,
       CASE WHEN n_tokens < 20 THEN 'too_short'
            WHEN n_tokens > 90 THEN 'too_long'
            WHEN n_stop = 0 THEN 'no_stopwords'
            WHEN 5 * n_distinct < 2 * n_tokens THEN 'repetitive'
            ELSE '' END AS reject_reason,
       CASE WHEN n_tokens >= 20 AND n_tokens <= 90 AND n_stop > 0
                 AND 5 * n_distinct >= 2 * n_tokens
            THEN 1 ELSE 0 END AS keep
FROM sig
""",
    tags=("curation", "quality"),
)
def q_corpus_quality_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate cascade with a first-match reject
    reason: length window, stopword presence, distinct-token ratio.
    Every gate is integer arithmetic (e.g. ``5*distinct < 2*n`` instead
    of ``distinct/n < 0.4``) so no float threshold can straddle engines.
    One narrow map over the scan — no shuffle, no UDF; at 100 TB this
    is bandwidth-bound, exactly what a filter stage should be."""
    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    sig = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(
            F.filter(toks, lambda t: t.isin(*STOPWORDS))
        ).alias("n_stop"),
    )
    reason = (
        F.when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("n_tokens") > 90, "too_long")
        .when(F.col("n_stop") == 0, "no_stopwords")
        .when(5 * F.col("n_distinct") < 2 * F.col("n_tokens"), "repetitive")
        .otherwise("")
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        reason.alias("reject_reason"),
        (reason == "").cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Line-level boilerplate removal (C4-style)
# ---------------------------------------------------------------------------

_BOILER_SQL = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0
                   THEN chr(10) || 'subscribe to our newsletter' ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                   THEN chr(10) || 'all rights reserved worldwide' ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN chr(10) || 'footer token ' || doc_id ELSE '' END
               AS text
    FROM documents
"""


def _corpus_with_boilerplate(d: DataFrame) -> DataFrame:
    """Seed known boilerplate: two high-document-frequency lines
    (%3, %4) that must be stripped and one unique footer (%5) that must
    survive. Mirrored verbatim by ``_BOILER_SQL`` so the oracle builds
    the identical corpus."""
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\nsubscribe to our newsletter"),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\nall rights reserved worldwide"),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit("\nfooter token "), F.col("doc_id")),
            ).otherwise(""),
        ).alias("text"),
    )


@register(
    "corpus_line_dedup",
    f"""
WITH corpus AS ({_BOILER_SQL}),
lines AS (
    SELECT doc_id, pos, line
    FROM (SELECT doc_id, generate_subscripts(string_split(text, chr(10)), 1)
                     AS pos,
                 unnest(string_split(text, chr(10))) AS line
          FROM corpus)
), blacklist AS (
    SELECT line FROM lines GROUP BY line
    HAVING count(DISTINCT doc_id) >= 50
), kept AS (
    SELECT l.* FROM lines l ANTI JOIN blacklist b ON l.line = b.line
), totals AS (
    SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
)
SELECT k.doc_id,
       string_agg(k.line, chr(10) ORDER BY k.pos) AS clean_text,
       CAST(count(*) AS INT) AS n_lines_kept,
       CAST(any_value(t.n_lines) - count(*) AS INT) AS n_lines_dropped
FROM kept k JOIN totals t ON k.doc_id = t.doc_id
GROUP BY k.doc_id
""",
    tags=("curation", "dedup", "boilerplate"),
)
def q_corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal: a line occurring in >= 50 documents
    is boilerplate; strip it everywhere and reassemble each document in
    original line order. The blacklist is, by construction, tiny (high
    document frequency => few distinct lines), so the strip is a
    broadcast anti-join — the full corpus shuffles once (the line-DF
    count), never for the join. Docs that were 100% boilerplate drop
    out (none here: fixture texts are unique)."""
    corpus = _corpus_with_boilerplate(_docs(spark, sf_dir))
    lines = corpus.select(
        "doc_id",
        F.posexplode(F.split("text", "\n")).alias("pos0", "line"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "line")
    blacklist = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= 50)
        .select("line")
    )
    kept = lines.join(F.broadcast(blacklist), "line", "left_anti")
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .join(totals, "doc_id")
        .select(
            "doc_id",
            "clean_text",
            F.col("n_kept").cast("int").alias("n_lines_kept"),
            (F.col("n_lines") - F.col("n_kept"))
            .cast("int")
            .alias("n_lines_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (contiguous token-budget chunking)
# ---------------------------------------------------------------------------

PACK_BUDGET = 512


@register(
    "corpus_pack_sequences",
    f"""
WITH toks AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
    FROM documents
), cum AS (
    SELECT doc_id, n,
           COALESCE(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM toks
)
SELECT CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM cum GROUP BY 1
""",
    tags=("curation", "packing"),
    bench=True,
)
def q_corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming concat-and-chunk sequence packing: documents in doc_id
    order fill {PACK_BUDGET}-token packs; a doc belongs to the pack its
    cumulative offset starts in (GPT-style contiguous packing, docs may
    straddle boundaries).

    The naive plan is a global ``sum() OVER (ORDER BY doc_id)`` — ONE
    partition holding the whole corpus. Implemented instead as the
    two-phase scan: per-range partial sums -> a tiny offsets table (one
    row per range, window over that only) broadcast back ->
    within-range cumsum. The range size is DERIVED (id-span / √n via
    one cheap count pass), so the offsets broadcast stays O(√n) rows at
    any corpus size — ~31k rows at 1e9 docs, never the 8M a fixed split
    would produce. Each range is an independent window partition, so
    the big table never single-partitions; the oracle recomputes it
    with the naive global window — different algorithm, same answer."""
    from data_ingestion_py_spark.operators.packing import with_pack_ids

    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
    cum = with_pack_ids(toks, PACK_BUDGET, id_col="doc_id", n_col="n")
    return (
        cum.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Domain mixture sampling
# ---------------------------------------------------------------------------


@register(
    "corpus_mixture_sample",
    f"""
WITH rated AS (
    SELECT doc_id, source,
           20 + 4 * CAST(substr(source, 4) AS INT) AS rate_pct
    FROM documents
)
SELECT source, CAST(any_value(rate_pct) AS INT) AS rate_pct,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN {_SQL_BUCKET} < rate_pct THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM rated GROUP BY source
""",
    tags=("curation", "sampling", "mixture"),
)
def q_corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: each source gets a deterministic
    acceptance rate (src0 -> 20% ... src19 -> 96%, standing in for the
    up/down-weighting table a training-mix config provides) and rows
    are kept by md5 bucket — stable across re-runs, retries, and
    engines, unlike rand()-based sampling. Narrow map + one small
    rollup; the sampled subset never materializes on the driver."""
    d = _docs(spark, sf_dir)
    rated = d.select(
        "doc_id",
        "source",
        (20 + 4 * F.substring("source", 4, 10).cast("int")).alias("rate_pct"),
    )
    return rated.groupBy("source").agg(
        F.first("rate_pct").cast("int").alias("rate_pct"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(
            (split_bucket(F.col("doc_id")) < F.col("rate_pct")).cast("int")
        )
        .cast("long")
        .alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Exact-n per-stratum sampling
# ---------------------------------------------------------------------------


@register(
    "corpus_stratified_fixed_n",
    """
SELECT doc_id, lang
FROM (SELECT doc_id, lang,
             row_number() OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
WHERE rn <= 10
""",
    tags=("curation", "sampling"),
)
def q_corpus_stratified_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n-per-stratum sampling (eval-set construction: 10 docs
    per language, every run, every engine): rank within each stratum by
    md5 of the id and keep the first 10. Unlike rate-based sampling
    this guarantees the count; unlike rand() it is reproducible. One
    shuffle on the stratum key; the window partitions by lang so no
    global sort exists — at 100 TB a heavily-skewed stratum bounds the
    task, which is acceptable because only ranks <= n survive the
    first-stage limit pushdown."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 10)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# End-to-end corpus build (quality -> near-dup dedup -> packing summary)
# ---------------------------------------------------------------------------


@register(
    "corpus_build_e2e",
    f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(
               list_filter(string_split(text, ' '), x -> x <> '')[4:], ' ')
               AS text
    FROM documents WHERE doc_id % 5 = 0
), sig AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM corpus
), gated AS (
    SELECT doc_id, toks, len(toks) AS n
    FROM sig
    WHERE len(toks) >= 20 AND len(toks) <= 90
      AND len(list_filter(toks, x -> list_contains([{_STOP_SQL}], x))) > 0
      AND 5 * len(list_distinct(toks)) >= 2 * len(toks)
), shingled AS (
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(0, len(toks) - 3),
               i -> array_to_string(toks[i+1 : i+3], ' '))) AS sh
    FROM gated
), dropped AS (
    SELECT v.doc_id
    FROM shingled v JOIN shingled o ON v.doc_id = o.doc_id + 1000000
    WHERE 2 * len(list_intersect(v.sh, o.sh))
          >= len(list_distinct(list_concat(v.sh, o.sh)))
), survivors AS (
    SELECT g.doc_id, g.n FROM gated g
    WHERE g.doc_id NOT IN (SELECT doc_id FROM dropped)
)
SELECT CAST((SELECT count(*) FROM corpus) AS BIGINT) AS n_input,
       CAST((SELECT count(*) FROM gated) AS BIGINT) AS n_after_quality,
       CAST(count(*) AS BIGINT) AS n_after_dedup,
       CAST(sum(n) AS BIGINT) AS n_tokens_kept,
       CAST((sum(n) - (SELECT n FROM survivors
                       ORDER BY doc_id DESC LIMIT 1)) // {PACK_BUDGET} + 1
            AS BIGINT) AS n_packs
FROM survivors
""",
    tags=("curation", "pipeline", "e2e"),
)
def q_corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus build as ONE composed pipeline under the hard gate:
    seeded raw corpus (originals + planted near-dup variants) →
    all-integer quality gates → shingle-Jaccard near-dup removal
    (variant dropped iff its surviving original overlaps ≥ 0.5,
    decided as ``2·|∩| ≥ |∪|`` — no float threshold) → pack-count
    summary at the {PACK_BUDGET}-token budget.

    Every stage is the registry operator's logic inlined on the same
    frame, so the oracle checks stage COMPOSITION — filters feeding
    joins feeding aggregates — not just each stage alone. Plan shape:
    one narrow quality scan, one candidate-cardinality join (variants ⋈
    originals by construction), one anti-join, three scalar aggregates.
    """
    from data_ingestion_py_spark.functions.text import shingles
    from data_ingestion_py_spark.queries_ext import _corpus_with_near_dups

    corpus = _corpus_with_near_dups(_docs(spark, sf_dir))
    toks = tokens(F.col("text"))
    sig = corpus.select("doc_id", toks.alias("toks"))
    gated = sig.where(
        (F.size("toks") >= 20)
        & (F.size("toks") <= 90)
        & (F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS))) > 0)
        & (5 * F.size(F.array_distinct("toks")) >= 2 * F.size("toks"))
    ).select("doc_id", "toks", F.size("toks").alias("n"))
    shingled = gated.select(
        "doc_id", F.array_distinct(shingles(F.col("toks"), 3)).alias("sh")
    )
    v, o = shingled.alias("v"), shingled.alias("o")
    dropped = (
        v.join(o, F.col("v.doc_id") == F.col("o.doc_id") + 1000000)
        .where(
            2 * F.size(F.array_intersect("v.sh", "o.sh"))
            >= F.size(F.array_distinct(F.concat(F.col("v.sh"), F.col("o.sh"))))
        )
        .select(F.col("v.doc_id").alias("doc_id"))
    )
    survivors = gated.join(dropped, "doc_id", "left_anti").select("doc_id", "n")

    n_input = corpus.agg(F.count(F.lit(1)).cast("long").alias("n_input"))
    n_quality = gated.agg(
        F.count(F.lit(1)).cast("long").alias("n_after_quality")
    )
    last_n = (
        survivors.orderBy(F.desc("doc_id")).limit(1).select(
            F.col("n").alias("last_n")
        )
    )
    summary = survivors.agg(
        F.count(F.lit(1)).cast("long").alias("n_after_dedup"),
        F.sum("n").cast("long").alias("n_tokens_kept"),
    )
    return (
        summary.crossJoin(F.broadcast(n_input))
        .crossJoin(F.broadcast(n_quality))
        .crossJoin(F.broadcast(last_n))
        .select(
            "n_input",
            "n_after_quality",
            "n_after_dedup",
            "n_tokens_kept",
            (
                F.expr(f"(n_tokens_kept - last_n) div {PACK_BUDGET}") + 1
            )
            .cast("long")
            .alias("n_packs"),
        )
    )


# ---------------------------------------------------------------------------
# Per-entity rate caps
# ---------------------------------------------------------------------------


@register(
    "events_per_user_daily_cap",
    """
WITH ranked AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
           row_number() OVER (
               PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
               ORDER BY ts, event_id) AS rn
    FROM events
)
SELECT user_id, CAST(d AS VARCHAR) AS day,
       CAST(sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked GROUP BY user_id, d
""",
    tags=("curation", "ratelimit"),
)
def q_events_per_user_daily_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity contribution cap: keep the first 5 events per
    (user, day) in arrival order — how a corpus build stops one hot
    source/user from dominating the mix. One shuffle on the composite
    key; the row_number window is bounded per key so no partition ever
    holds more than one user-day. Deterministic (ts, event_id)
    ordering makes retries reproduce the same kept set."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    d = F.date_trunc("day", F.col("ts")).cast("date")
    w = Window.partitionBy("user_id", d).orderBy("ts", "event_id")
    ranked = e.select(
        "user_id",
        d.alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    return ranked.groupBy("user_id", F.col("d").cast("string").alias("day")).agg(
        F.sum((F.col("rn") <= 5).cast("int")).cast("long").alias("n_kept"),
        F.sum((F.col("rn") > 5).cast("int")).cast("long").alias("n_dropped"),
    )


@register(
    "corpus_global_shuffle",
    """
WITH perm AS (
    SELECT doc_id,
           md5(concat('epoch-1|', CAST(doc_id AS VARCHAR))) AS k
    FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT)
           AS shuffle_pos
FROM perm
""",
    tags=("curation", "shuffle"),
    bench=True,
)
def q_corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL training-order shuffle — the last step of
    every corpus build: assign each document a position in a
    pseudo-random permutation so training reads are decorrelated from
    ingestion order. Permutation key = md5(epoch-salt | doc_id):
    reproducible across runs and engines, a new epoch is just a new
    salt, and no RNG state exists anywhere. The position comes from
    the two-phase global rank (``operators/ranking.py`` — range
    shuffle on the key + broadcast partition offsets), so there is NO
    single-partition sort: at 100 TB this is the difference between a
    shuffle that scales and a driver-shaped bottleneck. The oracle
    replays the permutation with a naive global window."""
    from data_ingestion_py_spark.operators.ranking import with_global_rank

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat(F.lit("epoch-1|"), F.col("doc_id").cast("string"))
        ).alias("k"),
    )
    ranked = with_global_rank(
        d,
        [F.asc("k"), F.asc("doc_id")],
        rank_col="shuffle_pos",
        total_col="_n",
    )
    return ranked.select(
        "doc_id", F.col("shuffle_pos").cast("long").alias("shuffle_pos")
    )


# ---------------------------------------------------------------------------
# Token-budget allocation (curriculum / mixture planning)
# ---------------------------------------------------------------------------


@register(
    "corpus_token_budget_allocation",
    """
WITH src AS (
    SELECT source,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    x -> x <> ''))) AS BIGINT) AS toks,
           ((2 * sum(len(list_filter(string_split(text, ' '),
                                     x -> x <> ''))) * 100 + count(*))
               // (2 * count(*))) AS prio
    FROM documents GROUP BY source
), budget AS (
    SELECT (sum(toks) * 6) // 10 AS b FROM src
), ranked AS (
    SELECT source, toks, prio,
           row_number() OVER (ORDER BY prio DESC, source) AS rnk,
           sum(toks) OVER (ORDER BY prio DESC, source
                           ROWS UNBOUNDED PRECEDING) AS cum
    FROM src
)
SELECT r.source, CAST(r.rnk AS INT) AS rnk, r.toks, CAST(r.cum AS BIGINT)
           AS cum_tokens,
       CAST(CASE WHEN r.cum <= b.b THEN r.toks
                 WHEN r.cum - r.toks < b.b THEN b.b - (r.cum - r.toks)
                 ELSE 0 END AS BIGINT) AS alloc_tokens
FROM ranked r, budget b
""",
    tags=("curation", "mixture", "budget"),
)
def q_corpus_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget allocation: sources ranked by a quality
    proxy (mean tokens/doc in integer 1e-2 units, ties → source name)
    consume a 60%-of-corpus token budget in rank order — full
    allocation while the budget lasts, a partial quota for the
    boundary source, zero after. The planning step before
    ``corpus_mixture_sample``/``corpus_temperature_mixture`` actually
    samples: every number here is an exact integer (half-up priority,
    integer cumsum, integer remainder), so the plan is reproducible
    across engines and retries. Scale: everything after the one
    per-source agg runs on the SOURCE-cardinality table (windows over
    ~1e2-1e4 rows, the 1-row budget broadcast via crossJoin) — the
    corpus is touched exactly once."""
    from data_ingestion_py_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    src = (
        d.select("source", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(
            F.sum("nt").cast("long").alias("toks"),
            F.expr(half_up_mean_sql("sum(nt)", "count(1)")).alias("prio"),
        )
    )
    budget = src.agg(
        F.expr("(sum(toks) * 6) div 10").cast("long").alias("b")
    )
    w = Window.orderBy(F.col("prio").desc(), "source")
    ranked = src.select(
        "source",
        "toks",
        "prio",
        F.row_number().over(w).alias("rnk"),
        F.sum("toks").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
    )
    alloc = (
        F.when(F.col("cum") <= F.col("b"), F.col("toks"))
        .when(F.col("cum") - F.col("toks") < F.col("b"),
              F.col("b") - (F.col("cum") - F.col("toks")))
        .otherwise(F.lit(0))
    )
    return ranked.crossJoin(F.broadcast(budget)).select(
        "source",
        F.col("rnk").cast("int").alias("rnk"),
        "toks",
        F.col("cum").cast("long").alias("cum_tokens"),
        alloc.cast("long").alias("alloc_tokens"),
    )


@register(
    "corpus_source_gini",
    """
WITH src AS (
    SELECT source,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    x -> x <> ''))) AS BIGINT) AS toks
    FROM documents GROUP BY source
), r AS (
    SELECT toks,
           row_number() OVER (ORDER BY toks, source) AS i,
           count(*) OVER () AS n,
           sum(toks) OVER () AS tot
    FROM src
)
SELECT CAST(max(n) AS BIGINT) AS n_sources,
       CAST(max(tot) AS BIGINT) AS total_tokens,
       CAST(sum((2 * i - n - 1) * toks) * 1000000 // (max(n) * max(tot))
            AS BIGINT) AS gini_micro
FROM r
""",
    tags=("curation", "mixture", "diagnostics"),
)
def q_corpus_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of token mass across sources — the one-number
    corpus-composition inequality dial (0 = perfectly balanced mixture,
    →1 = one source dominates) that the temperature-mixture and budget
    allocators exist to push down. Exact integer rank formula
    ``Σ(2i−n−1)·x_i · 10⁶ div (n·Σx)`` over the sorted source rollup —
    no floats until never. Windows run on the SOURCE-cardinality table
    (~1e2-1e4 rows at any corpus size; lint-allowlisted as bounded);
    the corpus is touched once by the token rollup."""
    from data_ingestion_py_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    src = (
        d.select("source", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("toks"))
    )
    w = Window.orderBy("toks", "source")
    wall = Window.partitionBy()
    r = src.select(
        "toks",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("toks").over(wall).alias("tot"),
    )
    return r.agg(
        F.max("n").cast("long").alias("n_sources"),
        F.max("tot").cast("long").alias("total_tokens"),
        F.expr(
            "sum((2 * i - n - 1) * toks) * 1000000 div (max(n) * max(tot))"
        )
        .cast("long")
        .alias("gini_micro"),
    )
