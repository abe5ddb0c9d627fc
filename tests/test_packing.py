"""Property tests for the two-phase sequence packer: its distributed
cumulative sum must equal a clean-room sequential Python model for any
item sizes, ids, and range split."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_py_spark.operators.packing import with_pack_ids


def model_packs(
    items: list[tuple[int, int]], budget: int
) -> dict[int, tuple[int, int]]:
    """id-ordered sequential cumsum → {id: (cum_before, pack_id)}."""
    out, cum = {}, 0
    for doc_id, n in sorted(items):
        out[doc_id] = (cum, cum // budget)
        cum += n
    return out


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    id_stride=st.integers(min_value=1, max_value=40),
    budget=st.integers(min_value=1, max_value=512),
    range_size=st.one_of(st.none(), st.integers(min_value=1, max_value=50)),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_two_phase_packing_equals_sequential_model(
    spark, sizes, id_stride, budget, range_size
):
    items = [(i * id_stride, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(items, "doc_id long, n long")
    got = {
        r.doc_id: (r.cum_before, r.pack_id)
        for r in with_pack_ids(
            df, budget, range_size=range_size
        ).collect()
    }
    assert got == model_packs(items, budget)


def test_pack_ids_contiguous_and_token_preserving(spark):
    items = [(i, 10 + (i * 7) % 50) for i in range(200)]
    df = spark.createDataFrame(items, "doc_id long, n long")
    packed = with_pack_ids(df, 256, range_size=32)
    rows = packed.collect()
    pack_ids = sorted({r.pack_id for r in rows})
    assert pack_ids == list(range(len(pack_ids)))  # dense from 0
    assert sum(r.n for r in rows) == sum(n for _, n in items)
    per_pack = (
        packed.groupBy("pack_id").agg(F.sum("n").alias("t")).collect()
    )
    # every pack except the last spans at least its budget boundary
    # (an item may straddle, so totals can exceed 256 but never leave
    # a non-final pack short of the boundary)
    last = max(pack_ids)
    for r in per_pack:
        if r.pack_id != last:
            assert r.t >= 256 - 59  # max item size headroom


def test_derived_range_size_scales_with_sqrt_n(spark):
    # sparse ids over a wide span: the derived split must keep the
    # offsets table ~sqrt(n) rows, not span-sized or fixed
    items = [(i * 1000, 5) for i in range(400)]
    df = spark.createDataFrame(items, "doc_id long, n long")
    got = {
        r.doc_id: (r.cum_before, r.pack_id)
        for r in with_pack_ids(df, 64).collect()
    }
    assert got == model_packs(items, 64)
