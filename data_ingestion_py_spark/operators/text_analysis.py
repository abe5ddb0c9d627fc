"""Text-analysis operators: quality scoring, language ID, token counts,
document fingerprinting. All pure column algebra (codegen, no shuffle
except where grouped), each with an exact DuckDB oracle twin.

These extend the reference's snippet pipeline (its only text analytics
is the empty-text OCR predicate, data_ingestion.py:131) into the
operators an LLM-training-data pipeline runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_ingestion_py_spark.functions.text import (
    STOPWORDS,
    shingles,
    token_subwords,
    tokens,
)


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score.

    Features: token count, distinct-token ratio (repetition signal),
    mean token length, stopword ratio. Score is a fixed linear blend —
    deterministic, monotone, and cheap to recompute at scale.
    """
    toks = tokens(F.col(text_col))
    d = docs.select("doc_id", "lang", toks.alias("toks"))
    n = F.size("toks")
    n_uniq = F.size(F.array_distinct("toks"))
    stop_hits = F.size(
        F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS))
    )
    avg_len = F.aggregate(
        F.transform(F.col("toks"), lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / n
    uniq_ratio = n_uniq / n
    stop_ratio = stop_hits / n
    score = (
        F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
        + uniq_ratio * 0.4
        + stop_ratio * 0.2
    )
    return d.where(n > 0).select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic n-gram/stopword language ID.

    Scores the text against tiny per-language marker sets and picks the
    argmax (threshold → 'und'). On the synthetic fixtures every doc is
    English-ish word soup, so the value is the deterministic machinery —
    the marker lists are swappable for real corpora.
    """
    markers = {
        "en": ("the", "a", "of", "and"),
        "es": ("el", "la", "de", "que"),
        "de": ("der", "die", "das", "und"),
    }
    toks = tokens(F.col(text_col))
    d = docs.select("doc_id", F.col("lang").alias("lang_label"), toks.alias("toks"))
    n = F.size("toks")

    def marker_score(m: tuple[str, ...]):
        # NB: must stay a 1-arg lambda — pyspark treats 2-arg HOF lambdas
        # (incl. default args) as (element, index).
        return F.size(F.filter(F.col("toks"), lambda t: t.isin(*m))) / n

    scores = {lang: marker_score(m) for lang, m in markers.items()}
    best_score = F.greatest(*scores.values())
    guess = F.when(best_score < 0.02, F.lit("und"))
    # deterministic tie-break: fixed language order
    for lang in ("en", "es", "de"):
        guess = guess.when(scores[lang] == best_score, F.lit(lang))
    return d.where(n > 0).select(
        "doc_id",
        "lang_label",
        F.round(scores["en"], 6).alias("score_en"),
        guess.alias("lang_guess"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-token and BPE-ish subword counts (ceil(len/4) per
    token — a deterministic stand-in for a learned tokenizer)."""
    toks = tokens(F.col(text_col))
    d = docs.select("doc_id", "lang", toks.alias("toks"), F.col("n_chars"))
    return d.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tokens"),
        F.aggregate(
            F.transform(F.col("toks"), lambda t: token_subwords(t)),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("n_subwords"),
        F.col("n_chars"),
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", top_n: int = 3
) -> DataFrame:
    """Top-N characteristic terms per document by smoothed TF-IDF.

    tfidf = tf · (ln((1+N)/(1+df)) + 1)  (sklearn-style smoothing).

    Shape at scale: explode → two hash aggs (term-frequency per doc,
    doc-frequency per term) → equi-join on term → per-doc top-N window.
    The doc count N is a 1-row broadcast. No ML-library dependency and
    no Python — the whole pipeline is codegen. Ordering ties break on
    the rounded score then term, so ranking is reproducible anywhere.
    """
    from data_ingestion_py_spark.functions.text import tokens
    from pyspark.sql.window import Window

    toks = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = toks.agg(F.countDistinct("doc_id").alias("nd"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((1.0 + F.col("nd")) / (1.0 + F.col("df"))) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .select("doc_id", "term", "tfidf")
    )


def fingerprints(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Winnowing-style document fingerprint: min/max md5 over k-gram
    shingles + shingle count. The min-hash pair is a compact content id
    robust to local edits; grouping by it finds near-identical docs."""
    sh = shingles(tokens(F.col(text_col)), k)
    d = docs.select("doc_id", sh.alias("sh"))
    hashed = F.transform(F.col("sh"), lambda s: F.md5(s))
    return d.where(F.size("sh") > 0).select(
        "doc_id",
        F.array_min(hashed).alias("fp_min"),
        F.array_max(hashed).alias("fp_max"),
        F.size("sh").alias("n_shingles"),
    )
