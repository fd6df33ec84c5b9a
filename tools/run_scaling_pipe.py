"""Scaling-curve evidence for the LLM-pipeline headliners (dedup / ANN /
decontamination) — the measurement counterpart of tools/run_scaling.py for
the documents/embeddings tables.

Generates an N× documents+embeddings warehouse that preserves the base
corpus's STATISTICAL profile — unigram token distribution, doc-length
distribution, (lang, source) mix, per-label embedding Gaussians — while
planting duplicate structure at a FIXED RATE (exact dups ~0.2%, token-level
near-dups ~1.5%, embedding near-dups ~1%). Fixed-rate planting is the
point: naive replication of the base docs would make every doc a near-dup
of its copies, so candidate-pair counts would grow quadratically in the
replication factor from the DATA, poisoning the plan measurement. With the
profile held constant, a healthy bucketed/broadcast plan scales
sub-quadratically (target ≲ ~1.5× the data ratio); a quadratic candidate
stage or a broadcast flipping to a corpus shuffle shows up immediately.

Usage:  python tools/run_scaling_pipe.py [out_json] [scale ...]
Writes SCALING_r06_pipe.json (default) with per-query 1×/N× wall times,
ratios, and the no-corpus-shuffle / broadcast plan asserts at every scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_benchmark_java_spark.session import build_session, local_test_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SEED = 606

HEADLINERS = [
    "pipe_minhash_lsh_candidates",
    "pipe_dedup_clusters",
    "pipe_decontamination",
    "pipe_ann_ivf_topk",
    "pipe_embedding_near_dup_banded",
    "pipe_dup_span_coverage",
    # round-8: the excision twin — same gram-df + doc_id-keyed shape as
    # coverage, plus the per-row JVM excision fold
    "pipe_dup_span_removal",
    "pipe_containment_pairs",
    "pipe_bloom_decontamination",
    "pipe_boilerplate_removal",
    "pipe_textrank_keywords",
    # Since round 7, pipe_prefix_filter_pairs (like pipe_containment_pairs
    # and pipe_embedding_near_dup_banded above) is REGISTERED with the
    # corpus-size-adaptive dial (dedup.corpus_shingle_dial /
    # similarity.adaptive_sign_bits), so the roster measures the
    # production configuration directly; the *_fixed_* rows below retain
    # the fixed-dial saturation demonstration at small scales.
    "pipe_prefix_filter_pairs",
    "pipe_bm25_topk",
    "pipe_bpe_encode",
    "pipe_typo_pairs",
    "pipe_random_projection",
    "pipe_embedding_pca",
    # round-6 closing-session additions. pipe_image_near_dup is NOT here
    # for the same saturation reason as prefix_filter: the textured-PPM
    # formula has a FIXED class space (16 textures x 32 widths x 24
    # heights x 5 phases), so replicating docs grows identical-image
    # PAIRS quadratically in the data — a fixture artifact, not a plan
    # defect (the banded-join plan is the measured simhash shape). The
    # decode+fingerprint stage, which is the actual byte-touching cost,
    # is measured via pipe_image_phash.
    "pipe_image_phash",
    "pipe_sorted_neighborhood",
    "pipe_ann_sq8_recall",
    # round-6 continuation additions: DSIR is the bigram-explode /
    # bounded-bucket-aggregate shape, method-agreement composes three
    # dedup scale paths plus a flag self-join.
    "pipe_dsir_importance",
    "pipe_dedup_method_agreement",
    # round-7: SemDeDup at the production dial — ADAPTIVE k
    # (similarity.adaptive_centroids, k doubles with the corpus so
    # cluster occupancy stays flat) routed through the two-level
    # assignment (O(N*sqrt(k)) FLOPs). An earlier fixed-k=64 form of
    # this entry measured x15 wall at x10 (occupancy ~ N/k makes the
    # pair stage quadratic at fixed k — the very motivation for k ~ N);
    # the registered adaptive form is the scale-safe plan. The
    # semantic_dedup_scaled_k row below measures the k = 16*scale
    # schedule through the same route.
    "pipe_semantic_dedup_two_level",
    # round-8: the composed IVF-PQ path — IVF routing bounds vectors
    # touched, ADC bounds bytes per vector, exact refine of the 32-deep
    # shortlist; the scan cost should track the probed-list fraction of
    # the corpus, not the corpus itself.
    "pipe_ann_ivf_pq_topk",
    # round-9: the serve-path twin over the materialized index — run 1
    # at each scale pays the one-time parquet build (marker-protected),
    # run 2 is the pure query path, so best-of-2 IS the serve latency
    # and the runs array keeps the build cost visible.
    "pipe_ann_ivf_pq_serve",
    # round-9: IVF-PQ recall at the tuned dials (n_probe=6, refine_k=128
    # — the probe-sweep pick restoring recall@5 >= 0.8); includes the
    # exact brute-force baseline, which is linear in N for the fixed
    # 10-query panel.
    "pipe_ann_ivf_pq_recall_tuned",
    # round-9: batch-ingest SemDeDup — new batch (top 10% of ids) vs the
    # accumulated corpus; cost should track |batch| x bounded occupancy,
    # NOT the corpus pair space.
    "pipe_incremental_semantic_dedup",
    # round-10: the two-level serve twin over the materialized IVF-Flat
    # index — run 1 at each scale pays the one-time build (marker-
    # protected), run 2 is the pure query path: routing + 24
    # partition-pruned list scans + in-list re-rank (plus the fixed
    # 10-query brute-force recall baseline, linear in N).
    "pipe_ann_two_level_serve",
    # round-11: the batch-ingest serve twin — per-batch plan reads the
    # materialized corpus cells (fixtures/inc_sem_index); run 1 at each
    # scale pays the one-time build (marker-protected), run 2 is the
    # pure per-batch cost, which should track |batch| × occupancy with
    # no corpus seeding/argmax stage.
    "pipe_incremental_semantic_dedup_served",
]

EXACT_DUP_RATE = 0.002
NEAR_DUP_RATE = 0.015
EMB_NEAR_DUP_RATE = 0.01
MUTATION_RATE = 0.05  # fraction of tokens resampled in a near-dup

# Warehouse-generator version, recorded in the _complete marker alongside
# the scale: bumping it regenerates every cached pipe_x* warehouse. v2 =
# the r10 weak-row fix — doc ids beyond the base range skip multiples of
# 97, so the registered decontamination entries' eval split (doc_id % 97
# == 0) stays at FIXED ABSOLUTE SIZE as the corpus scales. Benchmarks
# don't grow with the training corpus; under v1's arange ids the
# force-broadcast eval side grew linearly with the data, violating the
# operator's own documented premise and producing the non-monotone
# x10/x32/x100 decontamination ratios in SCALING_r10_pipe.json.
GEN_VERSION = 2


def _pipe_marker_fresh(marker: str, scale: int) -> bool:
    """True when the _complete marker proves the cached warehouse was
    generated at the requested scale BY THIS GENERATOR VERSION (legacy
    scale-only markers read as v1 and force a regen)."""
    if not os.path.exists(marker):
        return False
    return open(marker).read().strip() == f"{scale}:g{GEN_VERSION}"


def _scaled_doc_ids(n_base: int, n: int) -> np.ndarray:
    """Doc ids for an n-row scaled corpus over an n_base-row base: the
    base-id range keeps arange (the eval suite doc_id % 97 == 0 lives
    entirely inside it), ids beyond it skip multiples of 97. Every scaled
    warehouse therefore carries EXACTLY the base corpus's eval-suite size
    — the fixed-dimension/growing-fact shape of the reference workload
    (runner.sh keeps dims constant while facts scale) applied to the
    benchmark-suite split."""
    extra = n - n_base
    cand = np.arange(n_base, n_base + extra + extra // 96 + 4)
    cand = cand[cand % 97 != 0][:extra]
    return np.concatenate([np.arange(n_base), cand])


def _gen_documents(out_path: str, scale: int, rng: np.random.Generator) -> int:
    base = pd.read_parquet(os.path.join(BASE_DIR, "documents.parquet"))
    token_lists = base["text"].str.split()
    all_tokens = np.concatenate([np.asarray(t, dtype=object) for t in token_lists])
    vocab, counts = np.unique(all_tokens.astype(str), return_counts=True)
    probs = counts / counts.sum()
    lengths = np.array([len(t) for t in token_lists])
    langsrc = base[["lang", "source"]].to_numpy()

    n = len(base) * scale
    out_len = rng.choice(lengths, n)
    offsets = np.concatenate([[0], np.cumsum(out_len)])
    flat = rng.choice(vocab, int(offsets[-1]), p=probs)
    texts = [
        " ".join(flat[offsets[i] : offsets[i + 1]]) for i in range(n)
    ]
    # plant duplicate structure at fixed rates against EARLIER docs only,
    # so the dup graph stays sparse and its density is scale-invariant
    n_exact = int(round(EXACT_DUP_RATE * n))
    n_near = int(round(NEAR_DUP_RATE * n))
    targets = rng.choice(np.arange(1, n), size=n_exact + n_near, replace=False)
    for j in targets[:n_exact]:
        texts[j] = texts[int(rng.integers(0, j))]
    for j in targets[n_exact:]:
        src = texts[int(rng.integers(0, j))].split()
        n_mut = max(1, int(len(src) * MUTATION_RATE))
        pos = rng.integers(0, len(src), n_mut)
        repl = rng.choice(vocab, n_mut, p=probs)
        for p_, r_ in zip(pos, repl):
            src[p_] = r_
        texts[j] = " ".join(src)
    ls = langsrc[rng.integers(0, len(base), n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(_scaled_doc_ids(len(base), n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(ls[:, 0], pa.string()),
            "source": pa.array(ls[:, 1], pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )
    _write_split(tbl, out_path, scale)
    return n


def _write_split(tbl: pa.Table, out_path: str, scale: int) -> None:
    """Write the table as a DIRECTORY of part files (one per data-multiple,
    min 8): a single parquet file gives Spark ONE scan task regardless of
    maxPartitionBytes (one row group), which would serialize the scaled
    runs on a single core and measure file layout, not plan scaling. Real
    corpora at scale are always many files."""
    import shutil

    n_files = max(8, scale)
    if os.path.isdir(out_path):
        shutil.rmtree(out_path)
    elif os.path.exists(out_path):
        os.remove(out_path)
    os.makedirs(out_path)
    n = tbl.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = tbl.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(
                chunk, os.path.join(out_path, f"part-{i:04d}.parquet")
            )


def _gen_embeddings(out_path: str, scale: int, rng: np.random.Generator) -> int:
    """N× embeddings preserving the per-label Gaussian mixture. Invariant
    relied on downstream (similarity.ivf_pq_topk's raw-sign index build):
    components are normal-range float32 Gaussians from non-zero vectors —
    never exact ±0.0 and never so small that x/||v|| underflows to a
    signed zero/denormal — so sign(raw x) == sign(normalized x) holds
    exactly on both engines."""
    base = pd.read_parquet(os.path.join(BASE_DIR, "embeddings.parquet"))
    X = np.stack(base["embedding"].to_numpy()).astype(np.float64)
    labels = base["label"].to_numpy()
    ulab, lab_counts = np.unique(labels, return_counts=True)
    means = np.stack([X[labels == u].mean(axis=0) for u in ulab])
    stds = np.stack([X[labels == u].std(axis=0) for u in ulab])

    n = len(base) * scale
    lab_idx = rng.choice(len(ulab), n, p=lab_counts / lab_counts.sum())
    V = means[lab_idx] + stds[lab_idx] * rng.standard_normal((n, X.shape[1]))
    n_near = int(round(EMB_NEAR_DUP_RATE * n))
    for j in rng.choice(np.arange(1, n), size=n_near, replace=False):
        src = int(rng.integers(0, j))
        V[j] = V[src] + 0.01 * rng.standard_normal(X.shape[1])
        lab_idx[j] = lab_idx[src]
    V32 = V.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(V32), pa.list_(pa.float32())),
            "label": pa.array(ulab[lab_idx].astype(np.int32), pa.int32()),
        }
    )
    _write_split(tbl, out_path, scale)
    return n


def gen_pipe_warehouse(out_dir: str, scale: int) -> None:
    """Marker-protected N× documents+embeddings warehouse (marker records
    the scale, mirroring fixtures.py's discipline)."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_complete")
    if _pipe_marker_fresh(marker, scale):
        return
    rng = np.random.default_rng(SEED + scale)
    _gen_documents(os.path.join(out_dir, "documents.parquet"), scale, rng)
    _gen_embeddings(os.path.join(out_dir, "embeddings.parquet"), scale, rng)
    with open(marker, "w") as f:
        f.write(f"{scale}:g{GEN_VERSION}")


# A cell whose own best-of runs disagree by more than this carries noise
# no host probe can attribute (the r10 lesson: a [13.98, 325.07] s
# decontamination cell shipped flagless because only CROSS-cell probe
# disagreement was checked). Flagged cells re-measure once automatically
# (third run, below) and the surviving flags land in cell_spread_flags.
SPREAD_FLAG_RATIO = 1.5


def _timed_runs(fn) -> tuple[list[float], float]:
    """Run fn twice, return (all wall times, min). BOTH runs land in the
    artifact — a transient-noise cell is then visible in place (one bad
    run next to a sane one) instead of needing an addendum file, the
    round-7 lesson (the x13.97 cell corrected post-hoc in
    SCALING_r07_*_addendum.json). If the two runs disagree by more than
    SPREAD_FLAG_RATIO the cell re-measures ONCE in place: a transient
    stall self-heals (min over 3 runs, all recorded), a genuinely bimodal
    cell stays visible and is flagged by :func:`cell_spread_flags`."""
    runs = []
    for _ in range(2):
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    if min(runs) > 0 and max(runs) / min(runs) > SPREAD_FLAG_RATIO:
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    return runs, min(runs)


def cell_spread_flags(result: dict) -> list[str]:
    """Every '<scale>:<row>' whose recorded runs still disagree by more
    than SPREAD_FLAG_RATIO after the automatic third run — the artifact's
    self-report that a ratio rests on an unstable measurement (the r10
    verdict's What's-wrong #2). '1:<row>' entries cover the shared 1x
    denominators."""
    flags: set[str] = set()

    def chk(label: str, runs) -> None:
        if (
            isinstance(runs, list)
            and len(runs) >= 2
            and min(runs) > 0
            and max(runs) / min(runs) > SPREAD_FLAG_RATIO
        ):
            flags.add(label)

    dial_rows = (
        "banded_rp_lifted_20bits",
        "semantic_dedup_scaled_k",
        "pq_adc_topk",
        "banded_near_dup_fixed_8bits",
        "prefix_filter_fixed_n3",
    )
    for s, cell in result.get("scales", {}).items():
        for q, row in cell.get("queries", {}).items():
            chk(f"{s}:{q}", row.get("runs"))
            chk(f"1:{q}", row.get("runs_1x"))
        for key in dial_rows:
            row = cell.get(key)
            if row:
                chk(f"{s}:{key}", row.get("runs"))
                chk(f"1:{key}", row.get("runs_1x"))
        chk(f"{s}:host_probe", (cell.get("host_probe") or {}).get("runs"))
    chk("1:host_probe", (result.get("host_probe_1x") or {}).get("runs"))
    return sorted(flags)


# Fixed host-noise witness, one per SCALE CELL (round-10): the same
# code-stable verbatim query bench.py brackets its sessions with, run
# against the committed corpus fixtures (whose size never varies with the
# pipe-warehouse scale), so every scale ratio in the artifact carries its
# own same-minute host measurement. The r9 lesson: untouched operators'
# x100 ratios roughly doubled round-over-round because the shared host
# collapsed DURING the measurement window — with per-cell probes the
# curve diff is mechanical (probe flat + ratio up = real; both up = host).
PROBE_QUERY = "corpus_tpch_q01"
PROBE_FLAG_RATIO = 1.5


def time_probe(spark, queries, sf_dir: str) -> dict:
    # One untimed warm-up execution first: the 1x probe is the FIRST real
    # work of a fresh session, and a cold JVM (codegen, footer reads,
    # shuffle spin-up) reads ~5-10x slow — which would make every warm
    # cell probe "disagree" and fire the flags inverted (observed in the
    # first r10 run: 1x probe 11.1s cold vs 1.5-2.5s warm cells).
    queries[PROBE_QUERY](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    best, runs = time_one(spark, queries, sf_dir, PROBE_QUERY)
    return {"query": PROBE_QUERY, "t_sec": best, "runs": runs}


def probe_flags(result: dict) -> list[str]:
    """Scale cells whose host probe disagrees with the MEDIAN of all
    recorded probes (1x + every cell) by more than PROBE_FLAG_RATIO in
    either direction — the mechanical 'this cell's ratio carries host
    noise' marker. Median, not the 1x probe: the JVM's profile-guided
    JIT keeps shaving a 2-3 s query over a session's first minutes, so
    an early 1x probe reads systematically slower than late cells
    without any host shift; disagreement AMONG the probes is the signal
    that matters."""
    import statistics

    probes = {}
    base = (result.get("host_probe_1x") or {}).get("t_sec")
    if base:
        probes["1"] = base
    for s, cell in result.get("scales", {}).items():
        t = (cell.get("host_probe") or {}).get("t_sec")
        if t:
            probes[s] = t
    if len(probes) < 2:
        return []
    med = statistics.median(probes.values())
    return sorted(
        (
            s
            for s, t in probes.items()
            if s != "1" and max(t / med, med / t) > PROBE_FLAG_RATIO
        ),
        key=int,
    )


def time_one(
    spark, queries, sf_dir: str, name: str
) -> tuple[float, list[float]]:
    runs, best = _timed_runs(
        lambda: queries[name](spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    print(
        f"[scaling-pipe] {sf_dir}: {name} = {best}s (runs {runs})",
        file=sys.stderr,
    )
    return best, runs


def time_headliners(
    spark, queries, sf_dir: str
) -> tuple[dict[str, float], dict[str, list[float]]]:
    best: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINERS:
        best[name], runs[name] = time_one(spark, queries, sf_dir, name)
    return best, runs


def time_banded_scaled_bits(
    spark, sf_dir: str, n_bits: int
) -> tuple[float, list[float]]:
    from iceberg_benchmark_java_spark.operators.similarity import (
        cosine_near_dup_pairs_banded,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    runs, best = _timed_runs(
        lambda: cosine_near_dup_pairs_banded(
            emb, threshold=0.25, n_bits=n_bits, n_bands=4
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    print(
        f"[scaling-pipe] {sf_dir}: banded_scaled_bits(n_bits={n_bits}) = "
        f"{best}s (runs {runs})",
        file=sys.stderr,
    )
    return best, runs


def time_pq_adc(spark, sf_dir: str) -> tuple[float, list[float]]:
    """Time the PQ-ADC path end-to-end (codebook train + encode + score
    top-5 for 10 queries). Training is a one-time corpus aggregation;
    scoring is the broadcast-LUT map-side fold — the row proves the whole
    chain stays sub-linear, not just the query-time half."""
    from pyspark.sql import functions as F

    from iceberg_benchmark_java_spark.operators.similarity import pq_adc_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    runs, best = _timed_runs(
        lambda: pq_adc_topk(emb, q, k=5)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    print(
        f"[scaling-pipe] {sf_dir}: pq_adc_topk = {best}s (runs {runs})",
        file=sys.stderr,
    )
    return best, runs


def time_semantic_dedup(
    spark, sf_dir: str, n_centroids: int
) -> tuple[float, list[float]]:
    """Time SemDeDup with an explicit centroid count. The flat entry
    fixes n_centroids=16; at scale the within-cluster pair stage is
    quadratic in cluster OCCUPANCY, so the production setting grows k with
    the corpus (k ~ N / target_cluster_size) to hold occupancy flat —
    this row measures exactly that dial at k = 16*scale, which routes
    through the two-level assignment (k > TWO_LEVEL_THRESHOLD) since
    round 7, dropping assignment FLOPs from O(N*k) to O(N*sqrt(k))."""
    from iceberg_benchmark_java_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    runs, best = _timed_runs(
        lambda: semantic_dedup(emb, n_centroids=n_centroids, threshold=0.2)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    print(
        f"[scaling-pipe] {sf_dir}: semantic_dedup(k={n_centroids}) = {best}s "
        f"(runs {runs})",
        file=sys.stderr,
    )
    return best, runs


def time_prefix_filter(
    spark, sf_dir: str, n: int
) -> tuple[float, list[float]]:
    """Time the PPJoin prefix-filter join at an explicit shingle width.
    The registered query fixes n=3; on this synthetic corpus the 31-word
    vocabulary saturates that shingle space as the corpus grows, so the
    production dial widens n with log_vocab(corpus) to keep prefix-token
    df flat — this row measures the dial doing its job."""
    from iceberg_benchmark_java_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    runs, best = _timed_runs(
        lambda: prefix_filter_pairs(d, n=n)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    print(
        f"[scaling-pipe] {sf_dir}: prefix_filter_pairs(n={n}) = {best}s "
        f"(runs {runs})",
        file=sys.stderr,
    )
    return best, runs


def plan_asserts(spark, queries, sf_dir: str) -> dict[str, str]:
    """The test_plans.py scale contracts, re-evaluated on this warehouse:
    no cartesian/BNLJ anywhere; decontamination broadcasts the eval side;
    IVF assignment never shuffles the corpus on vec_id; the banded
    near-dup explode does not retain the embedding vector."""
    import re

    from iceberg_benchmark_java_spark.operators.similarity import (
        ivf_assignments,
    )

    def plan_of(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    results: dict[str, str] = {}
    for name in HEADLINERS:
        errs = []
        plan = plan_of(queries[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            errs.append("CartesianProduct")
        if name == "pipe_decontamination" and "BroadcastHashJoin" not in plan:
            errs.append("eval side not broadcast")
        if (
            name == "pipe_bloom_decontamination"
            and plan.count("BroadcastHashJoin") < 3
        ):
            errs.append("bitmap/eval joins not all broadcast")
        if (
            name == "pipe_boilerplate_removal"
            and "BroadcastHashJoin" not in plan
        ):
            errs.append("boilerplate set not broadcast")
        if name == "pipe_sorted_neighborhood":
            bad_windows = [
                ln
                for ln in plan.splitlines()
                if "windowspecdefinition(" in ln and "pid#" not in ln
            ]
            if bad_windows:
                errs.append("unpartitioned global-rank window")
        # pipe_ann_sq8_recall: the 1-row stats crossJoin and the 10-row
        # query-side scoring join both compile to broadcast nested loops —
        # the intended shape; only a CartesianProduct (generic check above)
        # would flag a defect.
        if name == "pipe_dsir_importance" and "BroadcastHashJoin" not in plan:
            errs.append("bucket log-ratio table not broadcast")
        if name == "pipe_ann_ivf_pq_topk":
            if "Exchange hashpartitioning(vec_id" in plan:
                errs.append("corpus shuffled on vec_id")
            if "BroadcastHashJoin" not in plan:
                errs.append("probes/LUT/shortlist not broadcast")
        if name == "pipe_ann_ivf_pq_serve":
            # build-once/query-many contract at scale: stored index read,
            # no index-build stages in the query plan
            if "ivf_pq_index" not in plan:
                errs.append("stored index not scanned")
            if "posexplode" in plan:
                errs.append("codebook build stage in serve plan")
            if "keys=[bucket" in plan:
                errs.append("centroid seeding in serve plan")
        if name == "pipe_ann_two_level_serve":
            if "two_level_index" not in plan:
                errs.append("stored index not scanned")
            if "keys=[bucket" in plan:
                errs.append("orthant seeding in serve plan")
        if name == "pipe_incremental_semantic_dedup":
            if "windowspecdefinition(cent_id" in plan:
                errs.append("corpus-wide occupancy window in batch path")
            if "BroadcastHashJoin" not in plan:
                errs.append("occupancy/centroids not broadcast")
        if name == "pipe_incremental_semantic_dedup_served":
            if "inc_sem_index" not in plan:
                errs.append("stored corpus cells not scanned")
            if "keys=[bucket" in plan:
                errs.append("corpus seeding in serve plan")
            if "windowspecdefinition(cent_id" in plan:
                errs.append("corpus-wide occupancy window in batch path")
        if (
            name == "pipe_dedup_method_agreement"
            and "BroadcastNestedLoopJoin" in plan
        ):
            errs.append("BroadcastNestedLoopJoin")
        if name == "pipe_embedding_near_dup_banded":
            if "BroadcastNestedLoopJoin" in plan:
                errs.append("BroadcastNestedLoopJoin")
            gen = [ln for ln in plan.splitlines() if "Generate explode" in ln]
            for ln in gen:
                m = re.search(r"\[([^\]]*)\],\s*(?:false|true),\s*\[[^\]]*\]\s*$", ln)
                if not m or "embedding" in m.group(1):
                    errs.append("vector fanout through band explode")
        results[name] = "pass" if not errs else "; ".join(errs)
    # assignment-stage contract, on this warehouse's embeddings
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    for label, k in (("ivf_assignment_stage", 16), ("ivf_two_level_stage", 64)):
        _, assign = ivf_assignments(emb, n_centroids=k)
        ap = plan_of(assign)
        errs = []
        if "Exchange hashpartitioning(vec_id" in ap:
            errs.append("corpus shuffled on vec_id")
        if "windowspecdefinition(vec_id" in ap:
            errs.append("per-vector window argmax")
        results[label] = "pass" if not errs else "; ".join(errs)
    return results


def remeasure_rp_row(out_json: str, scales: list[int]) -> int:
    """Re-measure ONLY the banded_rp_lifted_20bits dial row and patch it
    into an existing artifact in place (runs recorded, min reported, the
    dependent max_ratio_scaled_dials recomputed). Exists for the round-8
    kernel fix: the xorshift weight mix changed the RP code after the
    full-roster artifact was recorded, and re-running the whole 2 h
    roster to refresh one dial row measures nothing new."""
    with open(out_json) as f:
        result = json.load(f)
    cfg = local_test_config("ibx-scaling-rp")
    cfg.extra_confs["spark.driver.memory"] = "24g"
    spark = build_session(cfg)
    try:
        t_1x, r_1x = time_banded_scaled_bits(spark, BASE_DIR, 20)
        for s in scales:
            d = os.path.join(REPO, "fixtures", f"pipe_x{s}")
            t, r = time_banded_scaled_bits(spark, d, 20)
            cell = result["scales"][str(s)]
            cell["banded_rp_lifted_20bits"] = {
                "n_bits": 20,
                "t_1x_sec": t_1x,
                "runs_1x": r_1x,
                "t_sec": t,
                "runs": r,
                "ratio": round(t / t_1x, 2),
            }
            # dial rows are absent from --only-style artifacts; tolerate
            # them so a long re-measure can't crash before json.dump
            ratios = [
                v["ratio"]
                for q, v in cell["queries"].items()
                if v.get("ratio")
            ] + [
                r["ratio"]
                for r in (cell.get("semantic_dedup_scaled_k"),)
                if r
            ] + [round(t / t_1x, 2)]
            cell["max_ratio_scaled_dials"] = max(ratios)
    finally:
        spark.stop()
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result["scales"][k]["banded_rp_lifted_20bits"]
                      for k in result["scales"]}))
    return 0


def patch_query_rows(names: list[str], out_json: str, scales: list[int]) -> int:
    """Re-measure ONLY the named roster entries (1× + every given scale)
    and patch them into an existing artifact in place — runs recorded,
    min reported, plan asserts refreshed, dependent max ratios
    recomputed. The in-place twin of --only: new or code-touched roster
    rows land in the round's ONE artifact instead of an addendum file."""
    unknown = [q for q in names if q not in HEADLINERS]
    if unknown:
        sys.exit(f"--patch names not in HEADLINERS: {', '.join(unknown)}")
    with open(out_json) as f:
        result = json.load(f)
    # Validate the artifact's shape UP FRONT — every requested scale and
    # the plan_asserts_1x map must already exist — so a mismatched
    # artifact fails before the Spark session / warehouse gen / 1x
    # timings, not via a KeyError after hours of completed work.
    if "plan_asserts_1x" not in result:
        sys.exit(f"--patch artifact {out_json} has no plan_asserts_1x map")
    missing_scales = [
        s for s in scales if str(s) not in result.get("scales", {})
    ]
    if missing_scales:
        sys.exit(
            f"--patch artifact {out_json} lacks scale cells "
            f"{missing_scales}; present: {sorted(result.get('scales', {}))}"
        )
    from iceberg_benchmark_java_spark.queries import all_queries

    cfg = local_test_config("ibx-scaling-patch")
    cfg.extra_confs["spark.driver.memory"] = "24g"
    spark = build_session(cfg)
    queries = all_queries()
    try:
        # Refresh the 1x host probe alongside the patched rows: a patch
        # session's timings are only comparable to the artifact's other
        # cells through the probe, so it must be from THIS session.
        result["host_probe_1x"] = time_probe(spark, queries, BASE_DIR)
        t1, r1 = {}, {}
        for n in names:
            t1[n], r1[n] = time_one(spark, queries, BASE_DIR, n)
        a1 = plan_asserts(spark, queries, BASE_DIR)
        result["plan_asserts_1x"].update({n: a1[n] for n in names})
        for s in scales:
            d = os.path.join(REPO, "fixtures", f"pipe_x{s}")
            gen_pipe_warehouse(d, s)
            a_s = plan_asserts(spark, queries, d)
            cell = result["scales"][str(s)]
            cell["host_probe"] = time_probe(spark, queries, d)
            for n in names:
                t, r = time_one(spark, queries, d, n)
                cell["queries"][n] = {
                    "t_1x_sec": t1[n],
                    "runs_1x": r1[n],
                    "t_sec": t,
                    "runs": r,
                    "ratio": round(t / t1[n], 2) if t1[n] else None,
                    "plan_asserts_at_scale": a_s[n],
                }
            # dial rows are absent from --only-style / pre-round-8
            # artifacts; tolerate them so hours of completed timings
            # can't be lost to a KeyError before json.dump
            q_ratios = [
                v["ratio"] for v in cell["queries"].values() if v.get("ratio")
            ]
            cell["max_ratio"] = max(q_ratios)
            cell["max_ratio_scaled_dials"] = max(
                q_ratios
                + [
                    r["ratio"]
                    for r in (
                        cell.get("semantic_dedup_scaled_k"),
                        cell.get("banded_rp_lifted_20bits"),
                    )
                    if r
                ]
            )
        result["plan_asserts_failed"] = sorted(
            {
                q
                for sc in result["scales"].values()
                for q, v in sc["queries"].items()
                if v["plan_asserts_at_scale"] != "pass"
            }
            | {
                lbl
                for sc in result["scales"].values()
                for lbl in ("ivf_assignment_stage", "ivf_two_level_stage")
                if sc[lbl] != "pass"
            }
        )
    finally:
        spark.stop()
    result["host_probe_flags"] = probe_flags(result)
    for s in result["host_probe_flags"]:
        print(
            f"[scaling-pipe] WARNING: scale cell {s} host probe "
            f"disagrees with the 1x session probe by more than "
            f"x{PROBE_FLAG_RATIO} — its ratios carry host noise",
            file=sys.stderr,
        )
    result["cell_spread_flags"] = cell_spread_flags(result)
    for lbl in result["cell_spread_flags"]:
        print(
            f"[scaling-pipe] WARNING: cell {lbl}'s own runs disagree by "
            f"more than x{SPREAD_FLAG_RATIO} after a third run — its "
            f"ratio rests on an unstable measurement",
            file=sys.stderr,
        )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({
        n: {s: result["scales"][s]["queries"][n] for s in result["scales"]}
        for n in names
    }))
    return 0


def main() -> int:
    args = sys.argv[1:]
    if "--rp-row" in args:
        args.remove("--rp-row")
        if not args:
            sys.exit(
                "usage: run_scaling_pipe.py --rp-row OUT_JSON [SCALE ...]"
            )
        return remeasure_rp_row(args[0], [int(s) for s in args[1:]])
    if "--patch" in args:
        i = args.index("--patch")
        if i + 1 >= len(args):
            sys.exit(
                "usage: run_scaling_pipe.py --patch NAME[,NAME...] "
                "OUT_JSON SCALE [SCALE ...]"
            )
        names = args[i + 1].split(",")
        rest = args[:i] + args[i + 2 :]
        if not rest:
            sys.exit(
                "usage: run_scaling_pipe.py --patch NAME[,NAME...] "
                "OUT_JSON SCALE [SCALE ...]"
            )
        return patch_query_rows(names, rest[0], [int(s) for s in rest[1:]])
    # --only a,b : time just the named roster entries (addendum runs at
    # expensive scales); dial rows (pq/semantic/prefix/scaled-bits) are
    # skipped since they belong to the full-roster artifact.
    only: list[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
        unknown = [q for q in only if q not in HEADLINERS]
        if unknown:
            # A misspelled --only name silently dropping the entry would
            # produce an addendum artifact claiming "measured" coverage
            # with the measurement missing — fail loudly instead.
            sys.exit(f"--only names not in HEADLINERS: {', '.join(unknown)}")
        HEADLINERS[:] = [q for q in HEADLINERS if q in only]
    out_json = args[0] if args else os.path.join(REPO, "SCALING_r06_pipe.json")
    scales = [int(s) for s in args[1:]] or [10, 32]

    for s in scales:
        gen_pipe_warehouse(os.path.join(REPO, "fixtures", f"pipe_x{s}"), s)

    from iceberg_benchmark_java_spark.queries import all_queries

    cfg = local_test_config("ibx-scaling-pipe")
    cfg.extra_confs["spark.driver.memory"] = "24g"
    spark = build_session(cfg)
    queries = all_queries()
    try:
        n_docs_1 = spark.read.parquet(
            os.path.join(BASE_DIR, "documents.parquet")
        ).count()
        probe_1x = time_probe(spark, queries, BASE_DIR)
        t1, r1 = time_headliners(spark, queries, BASE_DIR)
        if only is None:
            t_pq_1x, r_pq_1x = time_pq_adc(spark, BASE_DIR)
            t_sem_1x, r_sem_1x = time_semantic_dedup(spark, BASE_DIR, 16)
            t_pf_1x, r_pf_1x = time_prefix_filter(spark, BASE_DIR, 3)
            # lifted dial: 20 bits > BANDED_SLICE_MAX_BITS routes through
            # the random-hyperplane kernel — the width the adaptive dial
            # reaches past ~2M vectors, measured here at every scale
            t_rp_1x, r_rp_1x = time_banded_scaled_bits(spark, BASE_DIR, 20)
        asserts1 = plan_asserts(spark, queries, BASE_DIR)
        per_scale: dict[str, dict] = {}
        for s in scales:
            d = os.path.join(REPO, "fixtures", f"pipe_x{s}")
            n_docs = spark.read.parquet(
                os.path.join(d, "documents.parquet")
            ).count()
            # Since round 7 the registered banded/containment/prefix
            # entries carry the adaptive dial, so the full roster is
            # measured at every scale — the quadratic fixed-dial blowup
            # that used to force a skip above 32x lives only in the
            # *_fixed_* demonstration rows (capped at 10x).
            probe_s = time_probe(spark, queries, d)
            ts: dict[str, float] = {}
            rs: dict[str, list[float]] = {}
            for name in HEADLINERS:
                ts[name], rs[name] = time_one(spark, queries, d, name)
            asserts_s = plan_asserts(spark, queries, d)
            if only is not None:
                per_scale[str(s)] = {
                    "host_probe": probe_s,
                    "docs_rows": n_docs,
                    "data_ratio": round(n_docs / n_docs_1, 3),
                    "queries": {
                        q: {
                            "t_1x_sec": t1[q],
                            "runs_1x": r1[q],
                            "t_sec": ts.get(q),
                            "runs": rs.get(q),
                            "ratio": round(ts[q] / t1[q], 2)
                            if q in ts and t1[q]
                            else None,
                            "plan_asserts_at_scale": asserts_s[q],
                        }
                        for q in HEADLINERS
                    },
                    "ivf_assignment_stage": asserts_s["ivf_assignment_stage"],
                    "ivf_two_level_stage": asserts_s["ivf_two_level_stage"],
                    "max_ratio": max(
                        round(ts[q] / t1[q], 2) for q in ts if t1[q]
                    ),
                }
                continue
            t_pq, r_pq = time_pq_adc(spark, d)
            scaled_k = 16 * s
            t_sem, r_sem = time_semantic_dedup(spark, d, scaled_k)
            t_rp, r_rp = time_banded_scaled_bits(spark, d, 20)
            # Fixed-dial demonstration rows (the saturation the adaptive
            # defaults exist to prevent), capped at 10x — beyond that the
            # fixed dials grow quadratically (measured x43 at 32x / DNF at
            # 100x, SCALING_r06_pipe.json) and re-demonstrating costs
            # hours for no new information.
            fixed_rows = {}
            if s <= 10:
                t_bits8, r_bits8 = time_banded_scaled_bits(spark, d, 8)
                t_pf3, r_pf3 = time_prefix_filter(spark, d, 3)
                fixed_rows = {
                    "banded_near_dup_fixed_8bits": {
                        "n_bits": 8,
                        "t_1x_sec": t1["pipe_embedding_near_dup_banded"],
                        "t_sec": t_bits8,
                        "runs": r_bits8,
                        "ratio": round(
                            t_bits8 / t1["pipe_embedding_near_dup_banded"], 2
                        ),
                    },
                    "prefix_filter_fixed_n3": {
                        "shingle_n": 3,
                        "t_1x_sec": t_pf_1x,
                        "runs_1x": r_pf_1x,
                        "t_sec": t_pf3,
                        "runs": r_pf3,
                        "ratio": round(t_pf3 / t_pf_1x, 2),
                    },
                }
            per_scale[str(s)] = {
                "host_probe": probe_s,
                **fixed_rows,
                "banded_rp_lifted_20bits": {
                    "n_bits": 20,
                    "t_1x_sec": t_rp_1x,
                    "runs_1x": r_rp_1x,
                    "t_sec": t_rp,
                    "runs": r_rp,
                    "ratio": round(t_rp / t_rp_1x, 2),
                },
                "semantic_dedup_scaled_k": {
                    "n_centroids": scaled_k,
                    "t_1x_sec_k16": t_sem_1x,
                    "runs_1x": r_sem_1x,
                    "t_sec": t_sem,
                    "runs": r_sem,
                    "ratio": round(t_sem / t_sem_1x, 2),
                },
                "pq_adc_topk": {
                    "t_1x_sec": t_pq_1x,
                    "runs_1x": r_pq_1x,
                    "t_sec": t_pq,
                    "runs": r_pq,
                    "ratio": round(t_pq / t_pq_1x, 2),
                },
                "docs_rows": n_docs,
                "data_ratio": round(n_docs / n_docs_1, 3),
                "queries": {
                    q: {
                        "t_1x_sec": t1[q],
                        "runs_1x": r1[q],
                        "t_sec": ts.get(q),
                        "runs": rs.get(q),
                        "ratio": round(ts[q] / t1[q], 2)
                        if q in ts and t1[q]
                        else None,
                        "plan_asserts_at_scale": asserts_s[q],
                    }
                    for q in HEADLINERS
                },
                "ivf_assignment_stage": asserts_s["ivf_assignment_stage"],
                "ivf_two_level_stage": asserts_s["ivf_two_level_stage"],
                "max_ratio": max(
                    round(ts[q] / t1[q], 2) for q in ts if t1[q]
                ),
                # max ratio over the production dials: the registered
                # roster entries (now adaptive by default) plus the
                # scaled-k semantic-dedup row; fixed-dial demo rows are
                # excluded — they exist to SHOW the saturation the
                # adaptive defaults prevent.
                "max_ratio_scaled_dials": max(
                    [round(ts[q] / t1[q], 2) for q in ts if t1[q]]
                    + [round(t_sem / t_sem_1x, 2)]
                    + [round(t_rp / t_rp_1x, 2)]
                ),
            }
    finally:
        spark.stop()

    result = {
        "metric": "pipe_headliner_scaling_ratio",
        "base_dir": BASE_DIR,
        "host_probe_1x": probe_1x,
        "docs_rows_1x": n_docs_1,
        "planted_rates": {
            "exact_dup": EXACT_DUP_RATE,
            "near_dup": NEAR_DUP_RATE,
            "emb_near_dup": EMB_NEAR_DUP_RATE,
        },
        "plan_asserts_1x": asserts1,
        "scales": per_scale,
        "plan_asserts_failed": sorted(
            {
                q
                for s in per_scale.values()
                for q, v in s["queries"].items()
                if v["plan_asserts_at_scale"] != "pass"
            }
            | {
                lbl
                for s in per_scale.values()
                for lbl in ("ivf_assignment_stage", "ivf_two_level_stage")
                if s[lbl] != "pass"
            }
        ),
    }
    result["host_probe_flags"] = probe_flags(result)
    result["cell_spread_flags"] = cell_spread_flags(result)
    for lbl in result["cell_spread_flags"]:
        print(
            f"[scaling-pipe] WARNING: cell {lbl}'s own runs disagree by "
            f"more than x{SPREAD_FLAG_RATIO} after a third run — its "
            f"ratio rests on an unstable measurement",
            file=sys.stderr,
        )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
