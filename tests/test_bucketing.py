"""Bucketed-table co-located joins: the zero-shuffle repeated-join
layout (`io.write_bucketed`).

The fixture parquet is unbucketed, so every orders⋈customer /
lineitem⋈orders join in the registry exchanges both sides (fine
once). A pipeline that joins the same fact tables every day instead
bucket-writes them once and joins shuffle-free forever after — this
test pins that the executed plan really has ZERO Exchange operators
and identical results, so the SCALE.md claim stays evidenced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table, write_bucketed
from data_ingestion_py_spark.plans.explain import executed_plan
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_orders_customer(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    write_bucketed(o, "orders_b", ["o_custkey"], 8, str(base / "orders_b"))
    write_bucketed(c, "customer_b", ["c_custkey"], 8, str(base / "cust_b"))
    yield spark.table("orders_b"), spark.table("customer_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def _joined(o, c):
    return o.join(c, o["o_custkey"] == c["c_custkey"]).groupBy(
        "c_nationkey"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # integer cents: aggregation-order-proof equality across plans
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c"),
    )


def test_bucketed_join_has_zero_exchanges(spark, bucketed_orders_customer):
    o, c = bucketed_orders_customer
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(o, c)
        df.collect()
        plan = executed_plan(df)
        # neither join input exchanges (the bucketed layout IS the hash
        # partitioning); the only allowed exchange is the final small
        # groupBy on c_nationkey
        assert "Exchange hashpartitioning(o_custkey" not in plan, plan
        assert "Exchange hashpartitioning(c_custkey" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_both_sides(spark):
    """Control: the same join over plain parquet exchanges both sides
    — what bucketing removes."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_SMOKE, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        c = load_table(spark, SF_SMOKE, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
        df = _joined(o, c)
        df.collect()
        plan = executed_plan(df)
        assert "Exchange hashpartitioning(o_custkey" in plan
        assert "Exchange hashpartitioning(c_custkey" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_orders_customer):
    o, c = bucketed_orders_customer
    po = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    pc = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    a = sorted(map(tuple, _joined(o, c).collect()))
    b = sorted(map(tuple, _joined(po, pc).collect()))
    assert a == b
