"""Pre-driver gate: run EVERY registered query Spark-vs-DuckDB at the
driver's scale (sf0.01 by default) with the driver's compare semantics
(tests/oracle_utils.canonical). Usage:

    python scripts/parity_full.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import data_ingestion_py_spark.queries_ext  # noqa: F401
from data_ingestion_py_spark.queries import QUERIES
from data_ingestion_py_spark.session import get_spark
from tests.conftest import make_duck
from tests.oracle_utils import assert_frames_match


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    subs = sys.argv[2:]
    names = sorted(
        n
        for n in QUERIES
        if not subs or any(s in n for s in subs)
    )
    spark = get_spark(
        app_name="parity_full",
        master="local[16]",
        **{"spark.sql.shuffle.partitions": "16"},
    )
    duck = make_duck(sf_dir)
    failed = []
    for name in names:
        q = QUERIES[name]
        t0 = time.perf_counter()
        try:
            spark_pdf = q.spark(spark, sf_dir).toPandas()
            if q.oracle is None:
                print(f"  {name}: NO_ORACLE rows={len(spark_pdf)}")
                continue
            duck_pdf = duck.execute(q.oracle).fetchdf()
            assert_frames_match(spark_pdf, duck_pdf, name)
            print(
                f"  {name}: OK rows={len(spark_pdf)}"
                f" ({time.perf_counter() - t0:.1f}s)"
            )
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            msg = str(e).split("\n")[0][:300]
            print(f"  {name}: FAIL {msg}")
            if "--trace" in subs:
                traceback.print_exc()
    print(f"\n{len(names) - len(failed)}/{len(names)} green")
    if failed:
        print("FAILED:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
