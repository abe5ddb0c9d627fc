"""As-of and range join vs independent in-memory models.

The registry oracles already check these against DuckDB on the fixture
events; these tests add a third, structurally different check — pandas
``merge_asof`` and an O(n²) brute force — on a synthetic dataset with
adversarial shapes the fixture may lack: duplicate timestamps across
sides, keys with no right rows, bin-boundary gaps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_ingestion_py_spark.operators.asof import asof_join
from data_ingestion_py_spark.operators.rangejoin import time_proximity_pairs


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.default_rng(42)
    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            # second-granularity ts with intentional collisions
            "ts": pd.to_datetime(
                rng.integers(0, 3600, n) * 1_000_000_000 + 1_700_000_000_000_000_000
            ),
            "value": np.round(rng.uniform(0, 100, n), 2),
            "side": rng.choice(["L", "R"], n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_asof_matches_pandas_merge_asof(spark, synth):
    sdf, pdf = synth
    left_p = pdf[pdf["side"] == "L"].sort_values("ts")
    right_p = pdf[pdf["side"] == "R"].sort_values("ts")

    expected = pd.merge_asof(
        left_p,
        right_p[["user_id", "ts", "value"]].rename(
            columns={"ts": "asof_ts", "value": "asof_value"}
        ),
        left_on="ts",
        right_on="asof_ts",
        by="user_id",
        direction="backward",  # inclusive: right ts <= left ts
    )

    left_s = sdf.where(F.col("side") == "L").select(
        "event_id", "user_id", "ts", "value"
    )
    right_s = sdf.where(F.col("side") == "R").select("user_id", "ts", "value")
    got = (
        asof_join(left_s, right_s, on=["user_id"], ts_col="ts", payload_cols=["value"])
        .select("event_id", "asof_ts", "asof_value")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    exp = expected.set_index("event_id")[["asof_ts", "asof_value"]].sort_index()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_join_matches_bruteforce(spark, synth):
    sdf, pdf = synth
    gap_us = 120 * 1_000_000
    us = pdf["ts"].astype("int64") // 1000
    brute = set()
    for u in pdf["user_id"].unique():
        sub = pdf[pdf["user_id"] == u]
        ids = sub["event_id"].to_numpy()
        ts = (sub["ts"].astype("int64") // 1000).to_numpy()
        for i in range(len(sub)):
            for j in range(len(sub)):
                if ids[i] < ids[j] and abs(int(ts[i]) - int(ts[j])) <= gap_us:
                    brute.add((int(u), int(ids[i]), int(ids[j])))

    got = {
        (r.user_id, r.id_a, r.id_b)
        for r in time_proximity_pairs(sdf, max_gap_seconds=120).collect()
    }
    assert got == brute


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_directions_match_pandas(spark, synth, direction):
    """forward / nearest directions vs pandas merge_asof on the same
    adversarial synth (dup timestamps, right-less keys). pandas
    'nearest' breaks ties toward... either side; our contract is
    ties → backward, so nearest is checked against an explicit
    two-pass pick instead of pandas' tie rule."""
    sdf, pdf = synth
    left_p = pdf[pdf["side"] == "L"].sort_values("ts")
    right_p = pdf[pdf["side"] == "R"].sort_values("ts")
    rren = right_p[["user_id", "ts", "value"]].rename(
        columns={"ts": "asof_ts", "value": "asof_value"}
    )

    if direction == "forward":
        expected = pd.merge_asof(
            left_p, rren, left_on="ts", right_on="asof_ts",
            by="user_id", direction="forward",
        ).set_index("event_id")[["asof_ts", "asof_value"]]
    else:
        back = pd.merge_asof(
            left_p, rren.rename(columns={"asof_ts": "b_ts", "asof_value": "b_v"}),
            left_on="ts", right_on="b_ts", by="user_id", direction="backward",
        )
        fwd = pd.merge_asof(
            left_p, rren.rename(columns={"asof_ts": "f_ts", "asof_value": "f_v"}),
            left_on="ts", right_on="f_ts", by="user_id", direction="forward",
        )
        m = back.merge(fwd[["event_id", "f_ts", "f_v"]], on="event_id")
        # ties → backward; forward-at-equal-ts can't win because the
        # backward match at distance 0 always satisfies <=
        pick_b = m["f_ts"].isna() | (
            m["b_ts"].notna() & ((m["ts"] - m["b_ts"]) <= (m["f_ts"] - m["ts"]))
        )
        expected = pd.DataFrame(
            {
                "event_id": m["event_id"],
                "asof_ts": m["b_ts"].where(pick_b, m["f_ts"]),
                "asof_value": m["b_v"].where(pick_b, m["f_v"]),
            }
        ).set_index("event_id")

    left_s = sdf.where(F.col("side") == "L").select(
        "event_id", "user_id", "ts", "value"
    )
    right_s = sdf.where(F.col("side") == "R").select("user_id", "ts", "value")
    got = (
        asof_join(
            left_s, right_s, on=["user_id"], ts_col="ts",
            payload_cols=["value"], direction=direction,
        )
        .select("event_id", "asof_ts", "asof_value")
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    exp = expected.sort_index()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
