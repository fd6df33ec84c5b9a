"""Benchmark entry: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Timing method mirrors the reference (IcebergBenchmark.java:179-190):
wall-clock around execute-and-discard via the noop sink — result
materialization excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_benchmark_java_spark.queries import all_queries
from iceberg_benchmark_java_spark.session import build_session, local_test_config

# Representative slice of the inventory: scan/agg, joins, subqueries,
# windows, rollup, set ops, and the pipeline extensions' scale paths.
HEADLINE = [
    "tpch_q01_pricing_summary",
    "tpch_q03_shipping_priority",
    "tpch_q05_local_supplier_volume",
    "tpch_q06_revenue_forecast",
    "tpch_q13_customer_distribution",
    "sub_in_having",
    "sub_exists_not_exists_theta",
    "win_rank_per_group",
    "win_cumulative_monthly",
    "win_sessionize_events",
    "agg_rollup_grouping",
    "agg_monthly_pivot",
    "set_union_all_reagg",
    "pipe_minhash_lsh_candidates",
    "pipe_dedup_clusters",
    "pipe_ann_cosine_topk",
    "pipe_ann_ivf_topk",
    "pipe_ann_recall",
    "pipe_embedding_near_dup",
    "pipe_text_quality",
    "pipe_events_hourly",
    # round-5 additions (new computation, disclosed in BENCH_DELTA_r05):
    "pipe_decontamination",
    "pipe_sequence_packing_sharded",
    "tpch_q08_market_share",
    "tpch_q21_waiting_supplier",
    # round-6 additions (new computation, disclosed in BENCH_DELTA_r06):
    "pipe_dup_span_coverage",
    "pipe_scd2_history",
    "pipe_prefix_filter_pairs",
    "pipe_semantic_dedup",
    "pipe_session_window_agg",
    # round-6 closing-session additions (new computation, disclosed in
    # BENCH_DELTA_r06):
    "pipe_image_near_dup",
    "pipe_sorted_neighborhood",
    "pipe_ann_sq8_recall",
    "pipe_zorder_pruning",
    # round-6 continuation additions (new computation, disclosed in
    # BENCH_DELTA_r06):
    "pipe_dsir_importance",
    "pipe_dedup_method_agreement",
    # round-7 additions (new computation, disclosed in BENCH_DELTA_r07):
    "pipe_semantic_dedup_two_level",
    # round-8 additions (new computation, disclosed in BENCH_DELTA_r08):
    "pipe_dup_span_removal",
    "pipe_embedding_near_dup_rp",
    "pipe_ann_two_level_recall_tuned",
    "pipe_ann_ivf_pq_topk",
    # round-9 additions (new computation, disclosed in BENCH_DELTA_r09):
    # serve-path twin of pipe_ann_ivf_pq_topk (reads the materialized
    # index — the build-vs-serve latency gap is the pair of these rows)
    # and the batch-ingest SemDeDup.
    "pipe_ann_ivf_pq_serve",
    "pipe_incremental_semantic_dedup",
    # round-10 addition (new computation, disclosed in BENCH_DELTA_r10):
    # serve-path twin of pipe_ann_two_level_recall_tuned (reads the
    # materialized two-level IVF-Flat index — the second build-vs-serve
    # row pair, covering the registered 0.80-recall production dial).
    "pipe_ann_two_level_serve",
    # round-11 addition (new computation, disclosed in BENCH_DELTA_r11):
    # serve-path twin of pipe_incremental_semantic_dedup (per-batch plan
    # reads the materialized corpus cells instead of re-deriving the
    # corpus seeding + argmax — the third build-vs-serve row pair).
    "pipe_incremental_semantic_dedup_served",
    # round-12 addition (new computation, disclosed in
    # OPTIMIZATION_r12.md / BENCH_DELTA_r12opt2): the deliberately
    # compute-bound core-scaling witness. After the r11 optimizations
    # every headline entry at sf0.1 is fixed-overhead-bound, so the
    # driver's 8-vs-32-core probe read ≈1.0 everywhere and flagged
    # suspect_cpus_ignored despite session.py honoring $SPARK_GRAFT_CPUS
    # — this row's ratio tracks cores directly (VERDICT r11 Next #2).
    "pipe_cpu_scaling_witness",
    # Verbatim reference corpus headliners (fixtures/ warehouse, fixed
    # scale): the marquee TPC-DS shapes named in the round-1 review plus
    # two verbatim TPC-H texts. These time the reference's own SQL files
    # end-to-end through spark.sql.
    "corpus_tpcds_q14_1",  # multi-CTE cross-channel INTERSECT chain
    "corpus_tpcds_q64",    # wide join chain w/ two CTE passes
    "corpus_tpcds_q67",    # 8-key ROLLUP + windowed top-k
    "corpus_tpcds_q72",    # 8-join chain w/ date arithmetic
    "corpus_tpcds_q95",    # multi-EXISTS over web order numbers
    "corpus_tpch_q01",
    "corpus_tpch_q21",
]

# Headline entries whose code or semantics changed THIS round (new rows
# plus operators whose registered output moved). Everything else is the
# code-stable subset: its round-over-round total is comparable without
# prose, which is what ``code_stable_total_sec`` reports (the r8 lesson:
# a ×1.3 probe shift made single-total deltas unreadable). The set is
# TAGGED with the round it describes and the tag is emitted in the
# artifact — compare_bench warns when the tag doesn't match the newer
# artifact's round, so a stale set can't silently shape the code-stable
# line (the r9 ADVICE fix).
CODE_TOUCHED_ROUND = "r12opt2"
# r12 optimization round 2 (see OPTIMIZATION_r12.md): the session-scoped
# load_table memo sits on EVERY non-corpus entry's build path (it is what
# makes the adaptive-dial probes hit across builds), so the whole
# tpch/agg/win/sub/set/pipe surface is code-touched this round; only the
# verbatim corpus_* entries (fixture registration path, untouched) remain
# code-stable. The probe (corpus_tpch_q01) is code-stable this round.
CODE_TOUCHED_THIS_ROUND = {q for q in HEADLINE if not q.startswith("corpus_")}


def main() -> None:
    # The result JSON must be the ONLY stdout line (the driver parses
    # stdout structurally). Re-point fd 1 at stderr for the whole run —
    # the JVM child inherits the redirected fd, so Spark/Ivy/log chatter
    # can never interleave — and keep the real stdout for the final line.
    real_stdout = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(local_test_config("ibx-bench"))
    queries = all_queries()

    # warm the JVM + parquet footers with one tiny action
    queries["tpch_q06_revenue_forecast"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Host-noise probe: ONE fixed, code-stable query (corpus_tpch_q01 —
    # byte-identical SQL since round 2). Round-over-round, a move in the
    # probe with no code change = environment shift, so compare_bench can
    # auto-classify host-noise vs real regression. One UNTIMED warm-up
    # first, then best-of-2 per bracket (the scaling tool's pattern): the
    # r10 shape — 3 timed pre + 3 timed post with a cold first run — spent
    # up to 2 min of a ~3 min bench re-measuring its own JIT warm-up; the
    # warmed best-of-2 is the same witness at a third of the cost.
    def _timed(name: str) -> float:
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    _timed("corpus_tpch_q01")  # untimed probe warm-up (codegen, footers)
    probe_runs = [_timed("corpus_tpch_q01") for _ in range(2)]  # pre-bracket

    # Best-of-2 per query: shared-host CPU variance swings single runs by
    # ±30%; the min of two runs is the standard stable estimator. ALL raw
    # runs are emitted (``runs``) so the best-of selection stays auditable.
    # Per-query error isolation mirrors the reference harness's A9 contract
    # (IcebergBenchmark.java:184-188): capture, truncate to 2000 chars,
    # CONTINUE — at 100 TB something always fails, and one bad query must
    # never zero the whole run. The try sits INSIDE the per-run loop: a
    # transient failure on run 2 must not discard run 1's valid timing.
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    failed: dict[str, str] = {}
    for name in HEADLINE:
        ok_runs: list[float] = []
        err: str | None = None
        for _ in range(2):
            try:
                ok_runs.append(_timed(name))
            except Exception as exc:  # noqa: BLE001 — A9: record and continue
                err = f"{type(exc).__name__}: {exc}"[:2000]
        if ok_runs:
            timings[name] = min(ok_runs)
            runs[name] = ok_runs
        else:
            failed[name] = err or "unknown"
    # Post-bracket probe: the same fixed code-stable query re-timed AFTER
    # the headline loop. A pre/post divergence means the host shifted
    # MID-SESSION (the r9 q72 lesson: a ×2.8 one-shot riser on an
    # untouched verbatim query) — compare_bench classifies it mechanically
    # from the two brackets instead of a human inferring it.
    probe_runs_after = [_timed("corpus_tpch_q01") for _ in range(2)]
    total = round(sum(timings.values()), 3)
    code_stable_total = round(
        sum(t for n, t in timings.items() if n not in CODE_TOUCHED_THIS_ROUND),
        3,
    )
    # corpus_* entries run against the committed fixtures/ warehouse at its
    # own fixed scale, not $SPARK_GRAFT_SF_DIR — label honestly so numbers
    # stay scale-comparable round-over-round.
    from iceberg_benchmark_java_spark.corpus_ref import corpus_fixture_scale

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    scales = {
        name: (corpus_fixture_scale() if name.startswith("corpus_") else sf_val)
        for name in HEADLINE
    }
    full = {
        "metric": "headline_total_wall_sec_noop_sink",
        "value": total,
        "unit": "sec",
        "code_stable_total_sec": code_stable_total,
        "code_touched_round": CODE_TOUCHED_ROUND,
        "code_touched_this_round": sorted(CODE_TOUCHED_THIS_ROUND),
        "queries": timings,
        "runs": runs,
        "probe": {
            "query": "corpus_tpch_q01",
            "runs": probe_runs,
            "best": min(probe_runs),
            "runs_after": probe_runs_after,
            "best_after": min(probe_runs_after),
        },
        "failed": failed,
        "query_sf": scales,
        "sf": sf_val,
    }
    # Full payload goes to a committed sidecar file; stdout carries ONE
    # compact line. Since round 12 the compact line carries EVERY
    # per-query best (2-decimal): the old top-10-slowest dict made the
    # driver's round-over-round PERF comparison fabricate
    # "dropped_from_bench" statuses whenever an entry got fast enough to
    # rotate out of the top 10 (r11: five phantom drops). 53 entries at
    # 2 decimals is ~1.9 kB — within the driver's stdout tail. Entries
    # are ordered slowest-first so any tail truncation costs the
    # cheapest rows, never the headline ones.
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_latest.json"
    )
    with open(local_path, "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    by_time = dict(
        (k, round(v, 2))
        for k, v in sorted(timings.items(), key=lambda kv: -kv[1])
    )
    line = json.dumps(
        {
            "metric": "headline_total_wall_sec_noop_sink",
            "value": total,
            "unit": "sec",
            "queries": by_time,
            "n_queries": len(timings),
            "probe": min(probe_runs),
            "n_failed": len(failed),
            "full": "BENCH_LOCAL_latest.json",
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    os.write(real_stdout, line.encode() + b"\n")
    os.close(real_stdout)
    spark.stop()


if __name__ == "__main__":
    main()
