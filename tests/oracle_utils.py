"""Replicate the driver's Spark-vs-DuckDB comparison locally.

Compare row count, column names (sorted), and order-insensitive values:
both results → pandas → columns sorted by name → rows sorted by all
columns → exact equality (floats must already be rounded identically on
both sides; that is a registry invariant, not a tolerance here).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pandas as pd


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT repr — no rounding, no -0.0 masking.  The driver's
        # value-hash is bit-exact (it flagged a single -0.0 vs +0.0 row
        # in r07 that the old round(v,9)+0.0 normalization hid), so the
        # local gate must be at least as strict.  Registry invariant:
        # every float column is rounded identically on both sides AND
        # normalized with `+ 0.0` when the value can be a tiny negative.
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s, d = canonical(spark_pdf), canonical(duck_pdf)
    if s != d:
        diff = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
