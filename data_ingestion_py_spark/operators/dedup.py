"""Deduplication operators for training-data pipelines.

All tiers shuffle-efficient and oracle-reproducible:

- exact:       md5(content) groupBy — one shuffle on the 128-bit hash.
- minhash-LSH: shingle → md5 min-hash signature → band keys → bucket
               self-join (candidates only) → exact Jaccard verify.
               At 100 TB the band-key groupBy replaces the O(n²)
               crossJoin: cost is proportional to bucket collisions.
- incremental: new-batch bands probe the existing corpus's banded
               signature table (the steady-state ingestion gate; the
               streaming twin lives in streaming/pipeline.py).
- simhash:     16-bit fingerprint from per-token md5 bits; near-dups
               share fingerprints (or differ in ≤ h bits).
- n-gram Jaccard: exact pairwise verify, for candidate sets only.

(Embedding-space tiers — sign-band LSH, SemDeDup cluster-bounded — live
in operators/similarity.py; k-means for the cluster assignment in
operators/kmeans.py.)

No Spark ML MinHashLSH: its hash family isn't reproducible in the
DuckDB oracle; the md5 construction is, and behaves identically.
(Reference contrast: the only dedup in egorji/data_ingestion.py is the
whole-collection name scan at data_ingestion.py:302-315.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_ingestion_py_spark.functions.text import (
    band_keys,
    minhash_signature,
    shingles,
    tokens,
)
from data_ingestion_py_spark.operators.materialize import pin

SHINGLE_K = 3
N_HASHES = 32


def lsh_params(
    threshold: float, n_hashes: int = N_HASHES, target_recall: float = 0.9
) -> tuple[int, int]:
    """Fit (bands, rows) to the Jaccard threshold via the LSH S-curve.

    Collision probability at similarity s is 1-(1-s^r)^b. Pick the
    LARGEST r (= fewest false candidates, cheapest verify join) whose
    recall at ``threshold`` still meets ``target_recall``. r=1 always
    satisfies any target (<1), so the loop terminates.

    The round-1 default (4 bands × 4 rows on 16 hashes) had ~40% recall
    at j=0.5 — fine for planted near-identical dups, under-recalls a
    real corpus; this fit gives (16, 2) there → 0.99 recall.
    """
    for r in range(n_hashes, 0, -1):
        b = n_hashes // r
        if 1.0 - (1.0 - threshold**r) ** b >= target_recall:
            return b, r
    return n_hashes, 1


BANDS, ROWS_PER_BAND = lsh_params(0.5, N_HASHES)  # (16, 2)


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content dedup: hash-groupBy on md5(text).

    Returns one row per distinct content with the canonical (min) id and
    copy count. At scale: single shuffle on the hash; AQE coalesces.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def with_shingles(docs: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    return docs.withColumn("shingles", shingles(tokens(F.col(text_col)), k))


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = SHINGLE_K,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """doc_id + minhash signature (ints; one md5 per shingle + integer
    mixing per seed — see functions.text.minhash_signature).

    Input is rebalanced to the cluster's parallelism first: corpora
    often arrive as few fat files (the fixture is ONE parquet file →
    2 tasks), and signature hashing is the CPU-bound stage worth
    spreading across every core.
    """
    spark = docs.sparkSession
    target = spark.sparkContext.defaultParallelism
    # Docs too short to shingle (size(tokens) < k → empty shingle array)
    # are dropped, matching the oracle's WHERE len(toks) >= k. Without
    # this they'd emit all-null signatures AND share identical band keys
    # ('0|','1|',...), forming one O(m²) candidate clique — a skew bomb
    # at corpus scale.
    #
    # The filter is phrased on the TOKEN count, before the repartition,
    # NOT as ``size(shingles) > 0`` after it: Catalyst pushes any
    # deterministic filter below the round-robin Exchange, and the
    # shingle-sized form drags the whole shingle-construction subtree
    # into the pre-shuffle stage — which is exactly the under-
    # parallelized stage the repartition exists to escape (measured:
    # the pushed-down shingle filter made the 2-task scan stage the
    # bottleneck, ~1.8 s of a 2.2 s signature build at sf0.1; the
    # token-count form costs one split per row there and leaves the
    # shingle transform in the post-shuffle 32-task stage).
    docs = docs.where(F.size(tokens(F.col(text_col))) >= k)
    # Rebalance only when the input arrives under-partitioned (the
    # fixture is ONE parquet file → 2 tasks); a multi-file corpus that
    # already spans the cluster must not pay a gratuitous full shuffle.
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    return (
        with_shingles(docs, text_col, k)
        .select(
            "doc_id",
            minhash_signature(F.col("shingles"), n_hashes).alias("sig"),
            F.col("shingles"),
        )
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = BANDS, rows: int = ROWS_PER_BAND
) -> DataFrame:
    """Bucket self-join on band keys → distinct candidate (a < b) pairs.

    The shuffle is on band_key — the LSH trick that keeps near-dedup
    linear-ish at 100 TB. Identical docs share all bands; the distinct
    collapses multi-band hits.
    """
    banded = sigs.select(
        F.col("doc_id"), F.explode(band_keys(F.col("sig"), bands, rows)).alias("band_key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingled: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keep >= threshold.

    Join-planned so only candidate rows rehydrate their shingle sets
    (two broadcast-able probes at candidate cardinality, not corpus
    cardinality).
    """
    sa = shingled.select(
        F.col("doc_id").alias("doc_a"),
        F.array_distinct("shingles").alias("sh_a"),
    )
    sb = shingled.select(
        F.col("doc_id").alias("doc_b"),
        F.array_distinct("shingles").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def near_duplicates_minhash(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = SHINGLE_K,
    n_hashes: int = N_HASHES,
    bands: int | None = None,
    rows: int | None = None,
    storage_level: str | None = None,
) -> DataFrame:
    """Full MinHash+LSH near-dedup: returns (doc_a, doc_b, jaccard).

    (bands, rows) default to the S-curve fit for ``threshold``
    (lsh_params), so recall at the threshold is ≥0.9 by construction.

    Signatures are materialized once (``operators/materialize.pin``):
    the plan references them three times (banding + both sides of the
    verify join) and would otherwise run the whole shingle/md5 pipeline
    3×. Unlike ``.cache()`` (which parks an entry in the CacheManager
    until someone remembers to unpersist — a leak in long-lived
    sessions), the default checkpoint blocks are released automatically
    when the DataFrame is garbage-collected after the consumer
    materializes. Eager, because a lazy checkpoint lets the three
    consumer branches race ahead of materialization and recompute the
    pipeline per branch (measured 2.4x on the LSH bench).

    At 100 TB the signature table is corpus-sized: pass
    ``storage_level="DISK_ONLY"`` (or ``"DISK_ONLY_2"`` on preemptible
    fleets) to keep it off executor storage memory and retain a
    recompute path — see ``materialize.pin``.
    """
    if bands is None or rows is None:
        bands, rows = lsh_params(threshold, n_hashes)
    sigs = pin(minhash_signatures(docs, text_col, k, n_hashes), storage_level)
    cands = lsh_candidate_pairs(sigs.select("doc_id", "sig"), bands, rows)
    return jaccard_verify(cands, sigs.select("doc_id", "shingles"), threshold)


def incremental_near_duplicates(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = SHINGLE_K,
    n_hashes: int = N_HASHES,
    bands: int | None = None,
    rows: int | None = None,
    storage_level: str | None = None,
) -> DataFrame:
    """New-batch vs existing-corpus near-dedup — the ingestion-time
    gate a production pipeline actually runs per batch (full-corpus
    self-dedup is the backfill job; this is the steady state). Returns
    (new_doc_id, corpus_doc_id, jaccard) for pairs ≥ threshold.

    Asymmetric LSH: both sides sign+band identically, but the
    candidate join is new-bands ⋈ corpus-bands only — cost tracks
    (batch × collision rate), never corpus². At 100 TB the corpus-side
    banded signature table is computed ONCE and kept at rest
    (partitioned by band_key, so each batch's probe join co-locates);
    here both sides build inline and pin via ``materialize.pin``
    (``storage_level="DISK_ONLY"`` for the corpus side at scale).
    """
    if bands is None or rows is None:
        bands, rows = lsh_params(threshold, n_hashes)
    new_sigs = pin(
        minhash_signatures(new_docs, text_col, k, n_hashes), storage_level
    )
    corp_sigs = pin(
        minhash_signatures(corpus_docs, text_col, k, n_hashes), storage_level
    )
    return incremental_pairs_from_signatures(
        new_sigs, corp_sigs, threshold, bands, rows
    )


def incremental_pairs_from_signatures(
    new_sigs: DataFrame,
    corp_sigs: DataFrame,
    threshold: float,
    bands: int,
    rows: int,
) -> DataFrame:
    """The band-probe + Jaccard-verify stage of incremental dedup, over
    ALREADY-COMPUTED signature tables (doc_id, sig, shingles) — shared
    by the batch operator above and the streaming pipeline (which keeps
    the corpus signature table as cross-batch state and must not
    re-sign the whole corpus every micro-batch)."""

    def _banded(sigs: DataFrame, out_id: str) -> DataFrame:
        return sigs.select(
            F.col("doc_id").alias(out_id),
            F.explode(band_keys(F.col("sig"), bands, rows)).alias("band_key"),
        )

    cands = (
        _banded(new_sigs, "new_doc_id")
        .join(_banded(corp_sigs, "corpus_doc_id"), "band_key")
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
    return verify_incremental_pairs(cands, new_sigs, corp_sigs, threshold)


def verify_incremental_pairs(
    cands: DataFrame,
    new_sigs: DataFrame,
    corp_sigs: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verify for asymmetric candidate pairs — shared by
    the in-session band probe above and the durable at-rest probe
    (``operators/band_index.BandIndex.probe``). Joins at candidate
    cardinality only."""
    sa = new_sigs.select(
        F.col("doc_id").alias("new_doc_id"),
        F.array_distinct("shingles").alias("sh_a"),
    )
    sb = corp_sigs.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.array_distinct("shingles").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(sa, "new_doc_id")
        .join(sb, "corpus_doc_id")
        .select(
            "new_doc_id",
            "corpus_doc_id",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", n_bits: int = 16
) -> DataFrame:
    """Per-doc SimHash fingerprint (n_bits wide, default 16).

    Bit b comes from hex digit b//4 of each token's md5; contribution
    +1/-1 per token occurrence; fingerprint bit = (sum > 0). Pure
    explode → groupBy(doc) — one shuffle keyed by doc_id, or zero once
    the pipeline is already partitioned by doc_id.
    """
    from data_ingestion_py_spark.functions.text import hexval

    tok = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(hexval(F.substring("h", b // 4 + 1, 1)), 3 - (b % 4))
                .bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(n_bits)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for b in range(n_bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))
