#!/usr/bin/env python
"""Time individual bench queries through the noop sink (guide §1.4)
with labeled jobs — the measure-first loop's quick isolate tool.
Usage: time_queries.py [n_runs] [name ...] (default: every bench query,
3 runs each, median+spread printed)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from data_ingestion_py_spark.queries import QUERIES
    import data_ingestion_py_spark.queries_ext  # noqa: F401
    from data_ingestion_py_spark.session import get_spark

    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    names = [
        nm for nm, q in QUERIES.items()
        if (q.bench if not only else nm in only)
    ]
    if not names:
        sys.exit(f"no matching queries: {sorted(only)}")
    # warmup
    try:
        QUERIES[names[0]].spark(spark, sf_dir).count()
    except Exception:
        pass
    for nm in names:
        q = QUERIES[nm]
        ts = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{nm} run{i}")
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2] if n % 2 else (ts[n // 2 - 1] + ts[n // 2]) / 2
        print(
            f"{nm}: med={med:.3f} min={ts[0]:.3f} max={ts[-1]:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
