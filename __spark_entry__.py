"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``data_ingestion_py_spark/queries.py``;
this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from data_ingestion_py_spark.queries import QUERIES  # noqa: E402
import data_ingestion_py_spark.queries_ext  # noqa: E402,F401  (extends QUERIES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Snippetize the documents table (the reference's core value-add,
    data_ingestion.py:170-224) and aggregate per language.
    """
    return QUERIES["snippet_stats_by_lang"].spark(spark, "/root/testdata/sf0.001")


def _sample_order() -> list[str]:
    """Registry names, never-yet-driver-verified first.

    The driver samples a prefix of this dict each round (50 names as of
    round 4), so ordering queries that no CORRECTNESS_r*.json has seen
    ahead of already-verified ones rotates fresh queries into every
    round's sample automatically — cumulative driver coverage grows
    instead of re-checking the same prefix. Within each group, registry
    order is preserved (deterministic)."""
    import json

    seen: set[str] = set()
    for path in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        try:
            seen |= set(json.loads(path.read_text()))
        except Exception:
            continue
    names = list(QUERIES)
    # Round-5 leftovers: registered before round 6 but never yet in a
    # driver sample. Round-6 additions registered in earlier-imported
    # modules would otherwise push some of these past the sample-size
    # horizon AGAIN — pin them to the very front until their rows land.
    legacy_first = [
        n
        for n in (
            "q8_market_share", "q9_profit_by_nation_year",
            "q16_supplier_variety", "q17_small_quantity_revenue",
            "q21_sole_late_supplier", "q22_dormant_rich_customers",
            "orders_analytic_functions", "events_pivot_by_type",
            "supplier_set_ops", "lang_doc_rollcall", "events_multi_rollup",
            "documents_profile", "text_regex_tokens", "events_gap_fill_locf",
            "orders_rolling_7d_revenue", "events_time_weighted_avg",
            "events_zscore_outliers", "orders_winsorized_stats",
            "events_kmv_distinct",
        )
        if n in QUERIES and n not in seen
    ]
    front = set(legacy_first)
    return (
        legacy_first
        + [n for n in names if n not in seen and n not in front]
        + [n for n in names if n in seen]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name].spark for name in _sample_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: QUERIES[name].oracle
        for name in _sample_order()
        if QUERIES[name].oracle is not None
    }
