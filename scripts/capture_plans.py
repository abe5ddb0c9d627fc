#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query into
plans/r15/<query>_<tag>.txt (tag = before/after; argv[1], default
'before'). Run on the bench session config at the bench SF so the plans
match what BENCH_r15 measures (guide §1: plan evidence beside every
number)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])  # optional query-name filter
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from data_ingestion_py_spark.plans.explain import formatted_plan
    from data_ingestion_py_spark.queries import QUERIES
    import data_ingestion_py_spark.queries_ext  # noqa: F401
    from data_ingestion_py_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    # untruncated rendering (same rationale as bench._plan_fingerprint)
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")

    out_dir = Path(_REPO) / "plans" / os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", "r16"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, q in QUERIES.items():
        # an explicit name list wins over the bench flag, so a plan for
        # a named NON-bench query can be captured too (advisor, r15)
        if (name not in only) if only else (not q.bench):
            continue
        try:
            plan = formatted_plan(q.spark(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print("wrote", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
