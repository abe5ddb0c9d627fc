"""Count-min + HyperLogLog sketch column algebra — shared by the batch
queries (``events_cms_heavy_hitters``, ``events_hll_distinct``) and the
streaming maintainers, so both build bit-identical state from one
definition.

House hashing style: md5 column algebra (identical in DuckDB) rather
than a native salted sketch aggregate, which is what makes the batch
query oracle-checkable and the streamed state comparable cell-by-cell
to a batch rebuild.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sketch geometry — the DuckDB oracle inlines these; change both or neither.
CMS_W = 256  # counters per depth: over-estimate ≤ e·N/w w.h.p.
CMS_D = 3  # independent hash rows: bound holds w.p. 1 - e^-d


#: HyperLogLog geometry — b=8 index bits (first 2 md5 hex chars) →
#: m=256 registers; the rank window is the NEXT 40 bits (10 hex chars),
#: so ranks lie in [1, 41]. The DuckDB oracles inline these numbers.
HLL_M = 256
HLL_SUFFIX_HEX = 10
HLL_MAX_RANK = 4 * HLL_SUFFIX_HEX + 1
#: Standard bias constant alpha_m for m=256 — ONE Python-evaluated
#: literal shared by both engines (Spark uses the float, oracles embed
#: ``repr()`` of it), so the raw-estimate division is the same
#: double-precision op on both sides.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_register_index(h: Column) -> Column:
    """Register index 0..m-1 from an md5 hex column: first 2 hex chars."""
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def hll_rank(h: Column) -> Column:
    """Leading-zero rank (position of first 1-bit, 1-based) of the
    40-bit window after the index bits — pure integer/string algebra so
    DuckDB replays it exactly: strip leading '0' hex chars, then CASE
    the first surviving hex digit into its bit length. All-zero window
    → max rank 41 (the HLL convention for w=0)."""
    suffix = F.substring(h, 3, HLL_SUFFIX_HEX)
    trimmed = F.regexp_replace(suffix, "^0+", "")
    z_hex = F.lit(HLL_SUFFIX_HEX) - F.length(trimmed)
    d = (F.instr(F.lit("0123456789abcdef"), F.substring(trimmed, 1, 1)) - 1)
    bits = (
        F.when(d >= 8, F.lit(4))
        .when(d >= 4, F.lit(3))
        .when(d >= 2, F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        F.when(F.length(trimmed) == 0, F.lit(HLL_MAX_RANK))
        .otherwise(4 * z_hex + (F.lit(4) - bits) + 1)
        .cast("int")
    )


def hll_registers(df: DataFrame, key: Column, group_cols: list[str]) -> DataFrame:
    """Per-group HLL register table (group..., reg, r): max rank per
    register. Scale shape: one keyed groupBy whose map-side partial max
    bounds the shuffle at O(partitions · groups · m) rows no matter the
    input cardinality — the same partial-agg property CMS cells have.
    Registers MERGE by max: hll_registers(A ∪ B) ≡ per-register
    max(hll_registers(A), hll_registers(B)) — what the rollup-merge
    query and any streaming maintainer rely on."""
    h = F.md5(key)
    return (
        df.select(
            *group_cols,
            hll_register_index(h).alias("reg"),
            hll_rank(h).alias("r"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate_cols(agg_df: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., hll_estimate) from a register table. The harmonic sum
    is kept EXACT as the scaled integer S = Σ 2^(41-r) + V·2^41 (fits
    BIGINT: ≤ 256·2^40 + 256·2^41 < 2^50), so the only float ops are
    one literal/S division (raw path) or one ln (small-range linear
    counting) — single, order-independent ops both engines agree on."""
    v = F.lit(HLL_M) - F.count(F.lit(1))
    s_present = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_MAX_RANK} - r)")
    )
    s_total = s_present + v.cast("long") * F.lit(1 << HLL_MAX_RANK)
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * (1 << HLL_MAX_RANK)) / s_total
    est = F.when(
        (v > 0) & (raw <= F.lit(2.5 * HLL_M)),
        F.lit(float(HLL_M)) * F.log(F.lit(HLL_M).cast("double") / v),
    ).otherwise(raw)
    return agg_df.groupBy(*group_cols).agg(
        F.round(est, 1).alias("hll_estimate")
    )


def hll_estimate_sql(register_table: str, group_cols: str) -> str:
    """DuckDB replay of ``hll_estimate_cols`` over a register CTE
    ``register_table(group..., reg, r)`` — same scaled-integer S, same
    Python-literal alpha constant, same rounding."""
    v = f"({HLL_M} - count(*))"
    s_total = (
        f"(sum(CAST(1 AS BIGINT) << ({HLL_MAX_RANK} - r)) "
        f"+ CAST({v} AS BIGINT) * {1 << HLL_MAX_RANK})"
    )
    raw = f"({HLL_ALPHA * HLL_M * HLL_M * (1 << HLL_MAX_RANK)!r} / {s_total})"
    est = (
        f"CASE WHEN {v} > 0 AND {raw} <= {2.5 * HLL_M!r} "
        f"THEN {float(HLL_M)!r} * ln(CAST({HLL_M} AS DOUBLE) / {v}) "
        f"ELSE {raw} END"
    )
    return (
        f"SELECT {group_cols}, round({est}, 1) AS hll_estimate "
        f"FROM {register_table} GROUP BY {group_cols}"
    )


def hll_registers_sql(source_sql: str, key_sql: str, group_cols: str) -> str:
    """DuckDB replay of ``hll_registers``: per-group max rank per
    register over ``source_sql`` rows, hashing ``key_sql``."""
    h = f"md5({key_sql})"
    trimmed = f"regexp_replace(substr({h}, 3, {HLL_SUFFIX_HEX}), '^0+', '')"
    d = f"(strpos('0123456789abcdef', substr({trimmed}, 1, 1)) - 1)"
    bits = (
        f"CASE WHEN {d} >= 8 THEN 4 WHEN {d} >= 4 THEN 3 "
        f"WHEN {d} >= 2 THEN 2 ELSE 1 END"
    )
    rank = (
        f"CASE WHEN length({trimmed}) = 0 THEN {HLL_MAX_RANK} "
        f"ELSE 4 * ({HLL_SUFFIX_HEX} - length({trimmed})) "
        f"+ (4 - {bits}) + 1 END"
    )
    reg = f"CAST(('0x' || substr({h}, 1, 2))::BIGINT AS INT)"
    return (
        f"SELECT {group_cols}, {reg} AS reg, CAST(max({rank}) AS INT) AS r "
        f"FROM ({source_sql}) GROUP BY {group_cols}, reg"
    )


def cms_key(user_col: Column, ts_col: Column) -> Column:
    """(user, day) activity key — the thing whose frequency is sketched."""
    return F.concat(
        user_col.cast("string"), F.lit("@"), F.date_format(ts_col, "yyyy-MM-dd")
    )


def cms_bucket(key: Column, j: Column) -> Column:
    """Depth-j counter index: first 8 md5 hex digits of ``key#j`` mod w."""
    h = F.md5(F.concat(key, F.lit("#"), j.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_W


def cms_cells(events: DataFrame) -> DataFrame:
    """(j, bucket, cell) sketch cells for an event batch — the fixed
    d×w counter table. Build shape: one groupBy over ≤ d·w keys after
    a per-key count, so map-side partials bound the shuffle at
    O(partitions·d·w) regardless of distinct-key count. Cells MERGE by
    sum: cms_cells(A ∪ B) ≡ cellwise-sum(cms_cells(A), cms_cells(B)) —
    the property the streaming log relies on."""
    cnts = (
        events.select(cms_key(F.col("user_id"), F.col("ts")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j")
    return (
        cnts.select("k", "c", js)
        .select("c", "j", cms_bucket(F.col("k"), F.col("j")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.sum("c").cast("long").alias("cell"))
    )
