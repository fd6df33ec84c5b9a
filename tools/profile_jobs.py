"""Per-query job-level profiler (guide §1 / §7.3): run one registered
query through the noop sink and report every Spark job the action spawned
— count, per-job wall, sum-of-jobs vs wall (the gap is driver-side stage
planning / py4j time), and the job descriptions. Round-12 measurement
tool for the VERDICT r11 "cut driver-side job count" item.

Usage: python tools/profile_jobs.py <query> [<query> ...] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_benchmark_java_spark.queries import all_queries
from iceberg_benchmark_java_spark.session import build_session, local_test_config


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(local_test_config("ibx-profile"))
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId
    qs = all_queries()
    # warm
    qs["tpch_q06_revenue_forecast"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in args:
        for r in range(runs):
            before = {j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app}/jobs")}
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            jobs = [
                j
                for j in _get(f"{ui}/api/v1/applications/{app}/jobs")
                if j["jobId"] not in before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            total_job = 0.0
            lines = []
            for j in jobs:
                from datetime import datetime

                st = datetime.strptime(
                    j["submissionTime"][:-3], "%Y-%m-%dT%H:%M:%S.%f"
                )
                ct = datetime.strptime(
                    j["completionTime"][:-3], "%Y-%m-%dT%H:%M:%S.%f"
                )
                dur = (ct - st).total_seconds()
                total_job += dur
                lines.append(
                    f"    job {j['jobId']:>4} {dur:7.3f}s stages={len(j['stageIds'])} {j.get('description') or j['name'][:90]}"
                )
            print(
                f"{name} run{r}: wall={wall:.3f}s build={t_build:.3f}s "
                f"jobs={len(jobs)} sum_jobs={total_job:.3f}s gap={wall - total_job:.3f}s"
            )
            if r == runs - 1:
                print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
