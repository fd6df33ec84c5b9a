"""Dump .explain('formatted') for named registered queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [<query> ...]
Writes <out_dir>/<query>_<suffix>.txt — the judge-facing plan evidence
(plans/rNN/<query>_{before,after}.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_benchmark_java_spark.queries import all_queries
from iceberg_benchmark_java_spark.session import build_session, local_test_config


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(local_test_config("ibx-plans"))
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name, suffix, len(plan), "bytes")
    spark.stop()


if __name__ == "__main__":
    main()
