"""Distributed Bloom filter — build once, broadcast, probe in the scan.

The 100 TB decontamination shape: eval/benchmark suites are tiny (MBs
of n-grams) while the train corpus is the 100 TB side, so the right
plan is NOT a corpus-sized shuffle join on the gram string (what
``contamination_eval_overlap`` does, correct but shuffle-heavy) — it
is: build a compact bit-set over the SMALL side's grams, broadcast it
to every executor, and answer "might this train gram be eval content?"
inside the map stage of the one corpus scan. Only the (rare) positive
grams continue to an exact verify; the ~99% negative mass never
shuffles at all. Same pattern Spark itself uses for runtime shuffle
pruning (`spark.sql.optimizer.runtime.bloomFilter.enabled`), rebuilt
here as *engine-replayable column algebra* so a DuckDB oracle can
replay the very same bits — which Spark's native `BloomFilterAggregate`
(xxhash64-based, sketch-internal state) cannot.

Geometry: ``m`` = 65,536 bits stored as 2,048 × 32-bit words (words
held in BIGINTs so ``1 << bit`` never touches the sign bit on either
engine), ``k`` = 4 hashes. Hash j of gram g = first 8 md5 hex digits
of ``g || '|' || j`` read as a 32-bit int, mod m — byte-identical in
Spark and DuckDB. For n eval grams the false-positive rate is
``(1 - exp(-k*n/m))^k``; at the fixture's n ≈ 7.5k that is ≈ 2%, and
the filter table is ≤ 2,048 rows ≈ 16 KiB — broadcast-trivial even at
m = 2^33 (1 GiB) for a billion-gram eval suite.

Scale notes:
- Build = one explode(k) + one groupBy(word) bit_or over the SMALL
  side only; the corpus never participates.
- Probe = narrow map (hash algebra) + broadcast hash join on ``word``
  (≤ k distinct words per gram) + one per-gram bool_and. No shuffle
  keyed on the gram string anywhere.
- Mergeable: filters over eval-suite shards union by ``bit_or`` on
  the same word key — the daily-synopsis property KMV has, for bits.

The reference (`data_ingestion.py`) has no dedup/contamination surface
at all; this is north-star capability from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Filter geometry — inlined into the DuckDB oracle, change both or neither.
BLOOM_BITS = 65536  # m: total bits
BLOOM_HASHES = 4  # k: hash functions
WORD_BITS = 32  # bits per stored word (BIGINT-held, sign-safe)

# _word_mask's pow(2.0, k)-as-long trick is only exact while every
# 2^k fits the long domain (k <= 31). Enforced HERE at import (a plain
# raise, not an assert, so `python -O` cannot strip it, and it runs
# once instead of per call).
if WORD_BITS > 32:
    raise ValueError(
        "pow(2.0, k)-as-long is only exact for WORD_BITS <= 32; "
        "use a literal-shift decomposition for wider words"
    )


def _bit_pos(gram: Column, j: int) -> Column:
    """Bit position of hash j for a gram: 32-bit read of md5(g||'|'||j)
    mod m. Identical arithmetic to the oracle's
    ``('0x' || substr(md5(g || '|' || j), 1, 8))::BIGINT % m``."""
    h = F.md5(F.concat(gram, F.lit(f"|{j}")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BLOOM_BITS
    )


def _word_mask(pos: Column) -> Column:
    """``1 << (pos % WORD_BITS)`` as a BIGINT, from the bit-position
    Column the caller passes in (not a hardcoded column name — binding
    by name would silently latch onto any unrelated ``p`` column).

    ``F.shiftleft`` takes only a literal shift amount, so the
    column-shift goes through ``F.expr``-free arithmetic: 2^(pos%32)
    is exact in the BIGINT domain for pos%32 in [0, 31].
    """
    # The pow-double trick is exact ONLY while every 2^k fits a double's
    # 53-bit mantissa and the long domain; 2^63 is not representable, so
    # a future WORD_BITS=64 would silently clamp/overflow on the cast.
    # Precondition enforced at module import (see the WORD_BITS guard).
    return F.pow(F.lit(2.0), (pos % WORD_BITS).cast("double")).cast("long")


def bloom_build(grams: DataFrame, gram_col: str = "g") -> DataFrame:
    """(word, bits) filter table from a gram set — the broadcast side.

    One row per touched 32-bit word; ``bits`` is the bit_or of every
    hash landing in that word. ≤ 2,048 rows regardless of input size.
    """
    pos = grams.select(
        F.explode(
            F.array(*[_bit_pos(F.col(gram_col), j) for j in range(BLOOM_HASHES)])
        ).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / WORD_BITS).cast("long").alias("word"),
            _word_mask(F.col("p")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    cands: DataFrame, filt: DataFrame, key_cols: list[str], gram_col: str = "g"
) -> DataFrame:
    """Append ``bloom_hit`` (boolean) to each (key, gram) candidate row.

    Per gram: its k bit positions collapse to per-word required masks
    (two hashes sharing a word merge into one row), broadcast-join the
    ≤2,048-row filter on ``word``, and the gram is positive iff EVERY
    required word exists with all required bits set. The join is
    broadcast by construction — the corpus side never shuffles.
    """
    probes = cands.select(
        *key_cols,
        gram_col,
        F.explode(
            F.array(*[_bit_pos(F.col(gram_col), j) for j in range(BLOOM_HASHES)])
        ).alias("p"),
    ).select(
        *key_cols,
        gram_col,
        (F.col("p") / WORD_BITS).cast("long").alias("word"),
        _word_mask(F.col("p")).alias("mask"),
    )
    need = probes.groupBy(*key_cols, gram_col, "word").agg(
        F.bit_or("mask").alias("need")
    )
    hit_word = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("need")) == F.col("need")
    )
    return (
        need.join(F.broadcast(filt), "word", "left")
        .withColumn("_word_ok", hit_word)
        .groupBy(*key_cols, gram_col)
        .agg(F.bool_and("_word_ok").alias("bloom_hit"))
    )
