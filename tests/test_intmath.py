"""Integer-division parity: Spark `div` and DuckDB `//` must agree —
including NEGATIVE numerators. Round-3 ADVICE assumed DuckDB floors;
measured duckdb 1.0.0 truncates toward zero exactly like Spark's
`div` (-7 // 2 = -3 in both). These tests pin that equivalence so a
DuckDB upgrade that changes `//` semantics fails loudly instead of
silently skewing every integer-mean oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from data_ingestion_py_spark.functions.ints import half_up_mean_sql, trunc_div_sql


def test_spark_div_matches_duckdb_on_negatives(spark):
    cases = [(-7, 2), (-1, 3), (-10, 3), (7, 2), (0, 5), (-100, 7), (99, 10)]
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b", F.expr(trunc_div_sql("a", "b")).alias("d")
    )
    got = {(r.a, r.b): r.d for r in df.collect()}
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute(f"SELECT {a} // {b}").fetchone()[0]
        assert got[(a, b)] == want, f"{a}//{b}: spark {got[(a, b)]} duck {want}"


def test_half_up_mean_parity_with_negative_values(spark):
    """The integer HALF_UP mean form used by the gap-fill / winsorized
    queries, exercised on a fixture containing negative cent sums."""
    rows = [("a", -125), ("a", -250), ("a", 40), ("b", -1), ("b", -2)]
    agg = (
        spark.createDataFrame(rows, "k string, cents long")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .select(
            "k", (F.expr(half_up_mean_sql("s", "n")) / 10000.0).alias("m")
        )
    )
    got = {r.k: r.m for r in agg.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (k VARCHAR, cents BIGINT); INSERT INTO t VALUES "
        + ",".join(f"('{k}', {c})" for k, c in rows)
    )
    want = dict(
        con.execute(
            "SELECT k, ((2 * sum(cents) * 100 + count(*))"
            " // (2 * count(*))) / 10000.0 FROM t GROUP BY k"
        ).fetchall()
    )
    assert got == want
