"""Interactive SQL shell (SURVEY §3.3, entry point 3).

The reference ships ``spark-sql.sh`` — a spark-sql REPL with both the flat
and partitioned catalogs mounted (spark-sql.sh:13-24) for ad-hoc queries.
This is the PySpark-native equivalent:

  python -m iceberg_benchmark_java_spark.shell --sf-dir /root/testdata/sf0.01
      # interactive: SQL> prompt over the registered views
  python -m iceberg_benchmark_java_spark.shell --sf-dir ... -e "SELECT ..."
      # one-shot: run a statement, print rows, exit (exit code 1 on error)

With ``--partitioned-warehouse`` the partitioned fact layout is mounted
instead — the same two-layout surface the reference's shell exposes as two
catalogs.
"""

from __future__ import annotations

import argparse
import sys

from .catalog import register_views
from .session import SparkConfig, build_session


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ad-hoc SQL shell over the warehouse")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--partitioned-warehouse", default=None)
    p.add_argument("-e", "--execute", default=None, help="run one statement and exit")
    p.add_argument("--max-rows", type=int, default=50)
    return p


def run_statement(spark, sql_text: str, max_rows: int) -> int:
    try:
        df = spark.sql(sql_text)
        df.show(n=max_rows, truncate=False)
        return 0
    except Exception as e:  # noqa: BLE001 — shell surfaces any engine error
        print(f"ERROR: {e}", file=sys.stderr)
        return 1


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)
    spark = build_session(SparkConfig(app_name="ibx-shell"))
    register_views(spark, args.sf_dir, partitioned_dir=args.partitioned_warehouse)
    if args.execute:
        rc = run_statement(spark, args.execute, args.max_rows)
        spark.stop()
        return rc
    print("ibx SQL shell — ';'-terminated statements, 'exit;' to quit")
    buf: list[str] = []
    while True:
        try:
            line = input("SQL> " if not buf else "...> ")
        except EOFError:
            break
        buf.append(line)
        if line.rstrip().endswith(";"):
            stmt = "\n".join(buf).rstrip().rstrip(";")
            buf = []
            if stmt.strip().lower() in ("exit", "quit"):
                break
            if stmt.strip():
                run_statement(spark, stmt, args.max_rows)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
