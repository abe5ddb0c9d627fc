"""CLI smoke: list/oracle paths must work without a Spark session."""

from __future__ import annotations

import subprocess
import sys


def _run(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "data_ingestion_py_spark", *args],
        capture_output=True,
        text=True,
        timeout=120,
        check=True,
    )
    return out.stdout


def test_cli_list_and_tag_filter():
    full = _run("list")
    assert "q1_pricing_summary" in full
    dedup_only = _run("list", "--tag", "dedup")
    assert "dedup_exact" in dedup_only
    assert "q1_pricing_summary" not in dedup_only


def test_cli_oracle_prints_sql():
    sql = _run("oracle", "dedup_exact")
    assert "SELECT" in sql and "corpus" in sql


def test_cli_unknown_query_fails():
    p = subprocess.run(
        [sys.executable, "-m", "data_ingestion_py_spark", "oracle", "nope"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert p.returncode != 0
    assert "unknown query" in p.stderr
