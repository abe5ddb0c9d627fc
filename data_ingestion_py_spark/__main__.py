"""CLI: explore and run registry queries locally.

    python -m data_ingestion_py_spark list [--tag dedup]
    python -m data_ingestion_py_spark run <name> [--sf-dir DIR]
                                         [--limit N] [--explain]
    python -m data_ingestion_py_spark oracle <name>

``run`` executes a query against the parquet tables in ``--sf-dir``
(default sf0.01 fixtures) and prints the first rows; ``--explain``
prints the formatted physical plan instead — the loop ("is the filter
pushed down? did the dim broadcast?") this engine is tuned in.
``oracle`` prints the query's DuckDB twin for side-by-side debugging.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(prog="data_ingestion_py_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registry queries")
    ls.add_argument("--tag", default=None, help="filter by tag substring")

    run = sub.add_parser("run", help="run one query")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)
    run.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )

    orc = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orc.add_argument("name")

    args = p.parse_args()

    from data_ingestion_py_spark.queries import QUERIES
    import data_ingestion_py_spark.queries_ext  # noqa: F401  (extends QUERIES)

    if args.cmd == "list":
        for name, q in QUERIES.items():
            tags = ",".join(q.tags)
            if args.tag and args.tag not in tags:
                continue
            marker = "*" if q.bench else " "
            print(f"{marker} {name:45s} [{tags}]")
        return

    if args.name not in QUERIES:
        raise SystemExit(
            f"unknown query {args.name!r} — see `list` for the registry"
        )

    if args.cmd == "oracle":
        sql = QUERIES[args.name].oracle
        print(sql if sql is not None else "-- no SQL oracle (rows-only check)")
        return

    from data_ingestion_py_spark.session import get_spark

    spark = get_spark(app_name="cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.name].spark(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
