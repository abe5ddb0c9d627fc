"""Text-analysis column functions — pure Spark column algebra.

Every function here has an exact DuckDB-SQL twin (used by the oracle
strings in queries.py), which is why hashing is built on ``md5`` hex
strings (identical in both engines) rather than Spark's xxhash64 (which
DuckDB lacks). Fixed-width lowercase hex compares lexicographically in
numeric order, so ``array_min`` of md5 strings IS a min-hash.

Design note for 100 TB: everything is per-row array algebra inside
whole-stage codegen — a narrow map stage over the documents scan, no
shuffle, no Python. The only shuffles in the dedup pipeline are the
groupBy on band keys (LSH bucketing) and the final pair aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny English stopword set used by quality scoring / language ID.
#: Kept deliberately small so the oracle SQL can inline it.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def shingles(toks: Column, k: int) -> Column:
    """k-gram shingles (space-joined token windows, stride 1).

    size < k → empty array (document too short to shingle).
    """
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


import random as _random

#: Universal-hash mixing constants (a_j, b_j, c_j), fixed seed so the
#: DuckDB oracle can inline the very same numbers. Kept small enough
#: that a_j*h32 stays < 2^47 — no 64-bit overflow on either engine.
MINHASH_PRIME = 2147483647  # 2^31 - 1
_rng = _random.Random(7)
MINHASH_COEFFS: list[tuple[int, int, int]] = [
    (
        _rng.randrange(1, 32749),
        _rng.randrange(1, 32749),
        _rng.randrange(0, MINHASH_PRIME),
    )
    for _ in range(64)
]


def shingle_hash_pairs(shingle_arr: Column) -> Column:
    """ONE md5 per shingle → two 32-bit ints (hex halves).

    All ``n_hashes`` min-hashes derive from these by integer mixing —
    16× fewer md5 evaluations than hashing per (seed, shingle), which
    is the dominant cost at corpus scale.
    """
    return F.transform(
        F.transform(shingle_arr, lambda s: F.md5(s)),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("h2"),
        ),
    )


def minhash_signature(shingle_arr: Column, n_hashes: int) -> Column:
    """Array of ``n_hashes`` min-hashes: min_j over shingles of
    (a_j*h1 + b_j*h2 + c_j) mod (2^31-1). md5 is identical in Spark and
    DuckDB, making signatures oracle-reproducible (unlike Spark ML's
    MinHashLSH, whose hash family is JVM-private).

    Single-pass form: ONE ``aggregate`` over the shingle-hash pairs
    carrying all ``n_hashes`` running minima (zip_with against a
    literal coefficient array). The per-hash ``array_min(transform(…))``
    form re-traversed the pairs array n_hashes times — and because
    higher-order functions evaluate outside codegen (no subexpression
    elimination), each traversal re-evaluated the md5 subtree too:
    measured 14.6 s → single-pass ~4 s for the sf0.1 signature build.
    Values are bit-identical; callers filter empty shingle arrays
    upstream (an empty array yields the init sentinel here vs nulls
    before — neither ever reaches the pipeline).
    """
    pairs = shingle_hash_pairs(shingle_arr)
    coeffs = F.array(
        *[
            F.struct(
                F.lit(a).alias("a"), F.lit(b).alias("b"), F.lit(c).alias("c")
            )
            for a, b, c in MINHASH_COEFFS[:n_hashes]
        ]
    )
    init = F.array(
        *[F.lit(MINHASH_PRIME).cast("long") for _ in range(n_hashes)]
    )
    return F.aggregate(
        pairs,
        init,
        lambda acc, x: F.zip_with(
            acc,
            coeffs,
            lambda m, co: F.least(
                m, (x["h1"] * co["a"] + x["h2"] * co["b"] + co["c"]) % MINHASH_PRIME
            ),
        ),
    )


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: split the signature into ``bands`` groups of ``rows``
    hashes; each band key is 'b|h1|h2|...'. Docs sharing ANY band key
    become candidate pairs (the standard MinHash-LSH S-curve)."""
    return F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.element_at(sig, b * rows + r + 1).cast("string")
                    for r in range(rows)
                ],
            )
            for b in range(bands)
        ]
    )


def hexval(ch: Column) -> Column:
    """Hex char → 0..15, portable (instr into the hex alphabet)."""
    return (F.instr(F.lit("0123456789abcdef"), ch) - 1).cast("int")


def token_subwords(tok: Column, chars_per_subword: int = 4) -> Column:
    """BPE-ish subword count: ceil(len/4) — a deterministic stand-in for
    a learned tokenizer's piece count."""
    return F.ceil(F.length(tok) / F.lit(chars_per_subword)).cast("long")


def quality_keep_condition(toks) -> Column:
    """The corpus quality gate as one reusable predicate (the same
    all-integer gates corpus_quality_cascade reports reasons for):
    token count in [20, 90], at least one stopword, distinct-token
    ratio >= 0.4 decided as ``5*distinct >= 2*n``. The incremental
    curation stream filters with this predicate; its thresholds match
    corpus_quality_cascade's gates, so batch and stream keep exactly
    the same documents."""
    n = F.size(toks)
    return (
        (n >= 20)
        & (n <= 90)
        & (F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) > 0)
        & (5 * F.size(F.array_distinct(toks)) >= 2 * n)
    )
