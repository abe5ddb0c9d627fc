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


def minhash_one(shingle_arr: Column, seed: int) -> Column:
    """One min-hash: lexicographic min of md5(seed || ':' || shingle).

    Fixed-width hex ⇒ lexicographic min == numeric min; md5 is identical
    in Spark and DuckDB, making signatures oracle-reproducible (unlike
    Spark ML's MinHashLSH, whose hash family is JVM-private).
    """
    return F.array_min(
        F.transform(shingle_arr, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(shingle_arr: Column, n_hashes: int) -> Column:
    """Array of ``n_hashes`` min-hashes (seeds 0..n_hashes-1)."""
    return F.array(*[minhash_one(shingle_arr, j) for j in range(n_hashes)])


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: split the signature into ``bands`` groups of ``rows``
    hashes; each band key is 'b|h1|h2|...'. Docs sharing ANY band key
    become candidate pairs (the standard MinHash-LSH S-curve)."""
    return F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.element_at(sig, b * rows + r + 1) for r in range(rows)],
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
