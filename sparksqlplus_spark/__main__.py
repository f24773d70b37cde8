"""Command-line front-end: DDL + query in, result (or plan) out.

Mirrors the reference's CLI entry point
(sqlplus-cli/src/main/java/sqlplus/cli/CliFrontend.java:40-102,
bin/sparksql-plus:1-8): `-d ddl.sql` registers the tables, the single
positional argument is the query file. Where the reference emits a
generated Scala program to `-o`, this Spark-native engine executes the
plan directly — `-o` writes the RESULT (parquet/csv/json), `--explain`
prints the chosen join tree / cyclic strategy without executing.

    python -m sparksqlplus_spark -d ddl.sql query.sql
    python -m sparksqlplus_spark -d ddl.sql --explain query.sql
    python -m sparksqlplus_spark -d ddl.sql -o out/ --format csv query.sql
    python -m sparksqlplus_spark -d ddl.sql -e "SELECT ..." --show 5
"""

from __future__ import annotations

import argparse
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m sparksqlplus_spark",
        description="SparkSQLPlus-on-PySpark: run a query over DDL-registered tables",
    )
    p.add_argument("query_file", nargs="?", help="file holding one SELECT statement")
    p.add_argument("-d", "--ddl", required=True, help="CREATE TABLE DDL file")
    p.add_argument("-e", "--execute", help="inline SQL (instead of query_file)")
    p.add_argument("--explain", action="store_true", help="print the plan, don't run")
    p.add_argument("--candidates", action="store_true",
                   help="print ranked candidate join trees as JSON, don't run")
    p.add_argument("-o", "--output", help="write the result to this path")
    p.add_argument(
        "--format", default="parquet", choices=["parquet", "csv", "json"],
        help="output format for -o (default parquet)",
    )
    p.add_argument("--show", type=int, default=20, metavar="N",
                   help="rows to print when no -o is given (default 20)")
    p.add_argument("--mode", default="auto",
                   choices=["auto", "cqc", "naive", "spark"])
    p.add_argument("--cyclic-strategy", default="auto",
                   choices=["auto", "break", "ghd", "naive"])
    p.add_argument("--master", default="local[*]", help="Spark master URL")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    if (args.query_file is None) == (args.execute is None):
        print("exactly one of query_file or -e/--execute is required",
              file=sys.stderr)
        return 2

    with open(args.ddl) as f:
        ddl_text = f.read()
    if args.execute is not None:
        query = args.execute
    else:
        with open(args.query_file) as f:
            query = f.read()

    from sparksqlplus_spark.api import SparkSQLPlus
    from sparksqlplus_spark.session import get_spark

    spark = get_spark(app_name="sparksqlplus-cli", master=args.master)
    eng = SparkSQLPlus(spark)
    eng.ddl(ddl_text)

    if args.candidates:
        import json

        print(json.dumps(eng.plan_candidates(query), indent=2))
        return 0
    if args.explain:
        print(eng.explain_tree(query, cyclic_strategy=args.cyclic_strategy))
        return 0

    df = eng.sql(query, mode=args.mode, cyclic_strategy=args.cyclic_strategy)
    if args.output:
        from sparksqlplus_spark.io import write_table

        write_table(df, args.output, fmt=args.format)
        print(f"wrote {args.output} ({args.format})")
    else:
        df.show(args.show, truncate=False)
        print(f"[{df.count()} rows]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
