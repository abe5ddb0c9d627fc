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
    """Registry names, STALEST driver row first.

    The driver samples a prefix of this dict each round (50 names as of
    round 4). Rounds 1-8 ordered never-yet-verified names first, which
    grew cumulative coverage to 212/212 by round 8 — making that rule a
    no-op. From round 9 the order is freshness-based: for each name,
    find the LATEST round whose CORRECTNESS_r*.json contains it, and
    sort ascending by that round (never-seen names, if any new ones
    appear, sort as round 0 and so still jump the queue). Each round
    therefore re-verifies the 50 longest-unchecked names against the
    CURRENT code — a rolling regression sweep instead of a frozen
    prefix. Ties (many names share a round) break by registry order,
    deterministically.

    (The round-9 pin on dp_noisy_counts is retired: its r09 driver row
    verified the post-rename schema, so plain freshness ordering now
    covers it like everything else.)"""
    import json
    import re

    latest_round: dict[str, int] = {}
    for path in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            names_in_round = json.loads(path.read_text())
        except Exception:
            continue
        for n in names_in_round:
            latest_round[n] = max(latest_round.get(n, 0), rnd)
    rest = list(QUERIES)
    rest.sort(key=lambda n: latest_round.get(n, 0))  # stable: registry order ties
    return rest


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
