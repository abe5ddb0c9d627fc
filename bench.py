#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs the headline queries (``bench=True`` in the registry) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is fully materialized through the ``noop`` sink (measures
engine compute, not driver-side pandas conversion). Best of two runs
per query (first run pays JVM/codegen warmup).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from data_ingestion_py_spark.queries import QUERIES
    import data_ingestion_py_spark.queries_ext  # noqa: F401  (extends QUERIES)
    from data_ingestion_py_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in QUERIES.items() if q.bench}

    # Warm the JVM + parquet footer caches once.
    next(iter(bench_queries.values())).spark(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
