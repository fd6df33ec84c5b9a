"""Deduplication operators over a document corpus.

Four strategies, all expressed as declarative DataFrame plans (no Python
row loops — everything stays JVM-side and scales horizontally):

- exact        — hash-groupBy on a content digest. One shuffle on the digest.
- ngram_jaccard— blocked brute-force: pairwise Jaccard over word-shingle
                 sets within a blocking key. The shingle self-join is the
                 classic |A∩B| computation; blocking bounds the pair space.
- minhash_lsh  — the 100 TB path: per-doc MinHash signatures (k independent
                 hash functions = md5 with k salts, min over shingles),
                 banded into LSH buckets; only same-band docs become
                 candidate pairs. Cost is O(docs × shingles) + bucket joins,
                 never O(docs²).
- simhash      — bitwise majority fingerprint of token hashes; near-dups =
                 pairs within a blocking key at small Hamming distance.

Hashing uses md5 (deterministic, engine-portable) rather than engine-native
hash functions, so results are reproducible across Spark versions and match
the DuckDB oracles bit-for-bit.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- shared shingling --------------------------------------------------------


# Adaptive shingle width: a FIXED width saturates as the corpus grows —
# with vocab V there are at most V^n distinct n-word shingles, so once the
# corpus outgrows the shingle space every "rare" shingle has high df and
# the candidate join degrades toward quadratic (measured: n=3 on the
# 31-word fixture vocab went x7.5 wall at x10 data while n=5 measured
# x2.5/x3.3 at x10/x100 — SCALING_r06_containment.json). The dial picks
# the smallest n in [3, 8] whose shingle space covers the corpus with
# margin: V^n >= 32 * n_docs. V is clamped to 2^15 so the HUGEINT power
# in the DuckDB oracle can't overflow (past the clamp, n=3 always wins
# for any realistic corpus, identically on both sides). Both counts come
# from ONE plan-build-time probe pass; pure-integer arithmetic keeps the
# Python and SQL derivations bit-identical.
SHINGLE_MIN_N = 3
SHINGLE_MAX_N = 8
SHINGLE_COVERAGE = 32
SHINGLE_VOCAB_CLAMP = 32768


def adaptive_shingle_width(n_docs: int, vocab_size: int) -> int:
    """Smallest n in [SHINGLE_MIN_N, SHINGLE_MAX_N] with
    min(vocab, 2^15)^n >= SHINGLE_COVERAGE * n_docs (else SHINGLE_MAX_N)."""
    v = min(vocab_size, SHINGLE_VOCAB_CLAMP)
    for n in range(SHINGLE_MIN_N, SHINGLE_MAX_N + 1):
        if v**n >= SHINGLE_COVERAGE * n_docs:
            return n
    return SHINGLE_MAX_N


# The dial probe is an eager Spark job at plan-BUILD time; composite
# queries (e.g. pipe_dedup_method_agreement builds several shingle
# operators over the same corpus) must pay it once, not per operator.
# Keyed on DataFrame identity (weak — dropped with the DataFrame), which
# is exactly the reuse pattern of a composite query passing one loaded
# table into several operators.
_DIAL_CACHE: "weakref.WeakKeyDictionary[DataFrame, int]" = (
    weakref.WeakKeyDictionary()
)

# Output-row flush bound for the exploding Arrow kernels (shingles /
# positional n-grams): one input batch of long documents fans out to
# ~n_tok rows per doc, so the generators emit in bounded chunks instead
# of one frame per input batch (ADVICE r11 — bounds per-batch memory at
# the default 10k-row Arrow batch size regardless of document length).
_NGRAM_FLUSH_ROWS = 200_000


def corpus_shingle_dial(docs: DataFrame) -> int:
    """One probe pass over the corpus (doc count + distinct-token count,
    same tokenization as with_word_shingles) feeding
    adaptive_shingle_width. Memoized per input DataFrame object, so a
    composite query building several shingle operators over the same
    loaded table runs the probe job once."""
    try:
        return _DIAL_CACHE[docs]
    except (KeyError, TypeError):
        pass
    row = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        "doc_id",
    ).agg(
        F.countDistinct("tok").alias("v"),
        F.countDistinct("doc_id").alias("n"),
    ).collect()[0]
    n = adaptive_shingle_width(int(row["n"]), int(row["v"]))
    try:
        _DIAL_CACHE[docs] = n
    except TypeError:
        pass  # unhashable/un-weakref-able DataFrame impl — skip the cache
    return n


def with_word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Explode each document into its distinct n-word shingles.

    Columns in: doc_id, text (+ any passthrough). Out: doc_id, shingle.

    Tokenization (trim + ``\\s+`` split) stays a JVM codegen expression —
    its regex/trim semantics never cross the language boundary — while
    the n-gram assembly (sequence/slice/concat_ws/array_distinct, all
    CodegenFallback higher-order functions that dominated every shingle
    consumer's scan: measured 3.2 s interpreted vs 0.9 s Arrow at sf0.1)
    runs as an Arrow-batched pass. Output strings are byte-identical to
    the expression form (space-joined token windows, first-occurrence
    distinct; docs shorter than ``n`` tokens yield their full token join)
    — pinned by tests/test_operators.py::
    test_shingle_arrow_matches_expression_route.
    """
    import pandas as pd

    words = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("doc_id", words.alias("_w"))
    vid = base.schema["doc_id"].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            ids: list = []
            shs: list = []
            for did, w in zip(pdf["doc_id"], pdf["_w"]):
                if w is None:
                    # NULL text → NULL token array: the expression route
                    # (explode over a NULL array) emits no rows — match it
                    # instead of raising (ADVICE r11 null-semantics parity)
                    continue
                w = list(w)
                upper = len(w) - (n - 1)
                if upper < 1:
                    upper = 1
                for s in dict.fromkeys(
                    " ".join(w[i : i + n]) for i in range(upper)
                ):
                    ids.append(did)
                    shs.append(s)
                if len(ids) >= _NGRAM_FLUSH_ROWS:
                    # long-document corpora amplify one input batch into
                    # n_tok× output rows — flush in bounded chunks so the
                    # exploded frame never holds the whole batch's fan-out
                    # (ADVICE r11 memory bound)
                    yield pd.DataFrame({"doc_id": ids, "shingle": shs})
                    ids, shs = [], []
            if ids:
                yield pd.DataFrame({"doc_id": ids, "shingle": shs})

    return base.mapInPandas(gen, f"doc_id {vid}, shingle string")


# --- exact dedup -------------------------------------------------------------


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact-duplicate groups by content digest.

    Returns (fingerprint, n_copies, canonical_id) for groups with >1 doc —
    canonical = min doc_id (the keep-one policy). Single shuffle on the
    16-byte digest regardless of document size.
    """
    return (
        docs.select(F.md5(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


# --- n-gram Jaccard (blocked brute force) ------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int | None = None,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by n-word-shingle Jaccard similarity.

    The default shingle width ADAPTS to the corpus
    (``corpus_shingle_dial``): at a fixed width, corpus growth past the
    V^n shingle space pushes every shingle's df over ``max_df`` and the
    guard silently empties the result — the dial keeps rare shingles
    existing, so the guard removes only genuinely-common ones.

    |A∩B| via shingle self-join, |A|,|B| via per-doc counts; J rounded to
    6dp for cross-engine determinism. Pairs restricted to doc_a < doc_b.

    ``max_df`` is the scale guard: shingles appearing in more than max_df
    documents are dropped from BOTH the intersection and the set sizes
    (Jaccard over the filtered sets stays internally consistent). Without
    it, one corpus-common shingle ("of the and") makes the self-join
    quadratic in corpus size; with it, a shingle contributes at most
    max_df² pair rows. High-df shingles carry ~no similarity signal, so
    this is the standard candidate-bounding move. None = unbounded
    (exact textbook Jaccard; small corpora / pre-blocked callers only).

    No internal caching: callers owning the loop persist the shingle table
    themselves — an operator-held cache() pins corpus-scale state in
    executor storage for the session lifetime.
    """
    if n is None:
        n = corpus_shingle_dial(docs)
    sh = with_word_shingles(docs, n)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        # re-select: a USING join moves the key to column 0, and the
        # positional toDF renames below depend on (doc_id, shingle) order
        sh = sh.join(rare, "shingle").select("doc_id", "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.toDF("doc_a", "shingle")
    b = sh.toDF("doc_b", "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.toDF("doc_a", "sz_a")
    sz_b = sizes.toDF("doc_b", "sz_b")
    jacc = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .withColumn("jaccard", F.round(jacc, 6))
        .filter(jacc >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


# --- MinHash + LSH -----------------------------------------------------------

N_HASHES = 8
BAND_SIZE = 2  # → 4 bands


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-doc MinHash signature. One pass over exploded shingles, k
    min-aggregates — a single shuffle on doc_id.

    The k hash functions are 8-hex (32-bit) slices of TWO salted md5s, not
    k separate md5s: hashing dominates MinHash cost at corpus scale, and
    slicing gets 4 independent 32-bit values per digest (md5 = 32 hex) for
    a 4× cut in hash work. min() over fixed-width lowercase-hex strings
    orders identically to numeric min in every engine."""
    sh = with_word_shingles(docs, n)
    half = N_HASHES // 2
    digest = {
        "a": F.md5(F.concat(F.lit("a|"), F.col("shingle"))),
        "b": F.md5(F.concat(F.lit("b|"), F.col("shingle"))),
    }
    aggs = [
        F.min(
            F.substring(
                digest["a" if k < half else "b"], (k % half) * 8 + 1, 8
            )
        ).alias(f"h{k}")
        for k in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_bands(docs: DataFrame, n: int = 3) -> DataFrame:
    """Banded MinHash signature rows (doc_id, band_idx, band_key):
    BAND_SIZE hashes concatenated per band. Per-doc computation — banding
    a subset of the corpus equals filtering the banded corpus."""
    sig = minhash_signatures(docs, n)
    n_bands = N_HASHES // BAND_SIZE
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat(
                            *[F.col(f"h{b * BAND_SIZE + j}") for j in range(BAND_SIZE)]
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")


def minhash_lsh_candidates(docs: DataFrame, n: int = 3) -> DataFrame:
    """LSH candidate pairs: signatures banded (BAND_SIZE hashes per band);
    docs sharing any band bucket pair up. Returns (doc_a, doc_b,
    n_shared_bands). The bucket join is equi-join on (band_idx, band_key) —
    the O(docs²) pair space never materializes."""
    bands = minhash_bands(docs, n)
    a = bands.toDF("doc_a", "band_idx", "band_key")
    b = bands.toDF("doc_b", "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def incremental_lsh_candidates(
    new_docs: DataFrame, corpus: DataFrame, n: int = 3
) -> DataFrame:
    """Ingestion-time near-dup candidates: band buckets of the NEW batch
    joined against band buckets of the EXISTING corpus — the corpus never
    self-joins, so each ingestion batch costs O(batch × shingles) + one
    asymmetric equi-join, independent of accumulated corpus pair space.
    The 100 TB shape: corpus band rows are computed once and stored
    (partitioned by band_key); each arriving batch computes its own bands
    and joins. Returns (new_id, corpus_id, n_shared_bands)."""
    nb = minhash_bands(new_docs, n).toDF("new_id", "band_idx", "band_key")
    cb = minhash_bands(corpus, n).toDF("corpus_id", "band_idx", "band_key")
    return (
        nb.join(cb, ["band_idx", "band_key"])
        .groupBy("new_id", "corpus_id")
        .agg(F.count("*").alias("n_shared_bands"))
    )


# --- SimHash -----------------------------------------------------------------

SIMHASH_BITS = 16


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """SIMHASH_BITS-bit SimHash per doc.

    Each distinct word hashes to a bit pattern (md5 → first 16 hex chars →
    64-bit int, low SIMHASH_BITS used); fingerprint bit i is the weighted
    majority of word-bit i over the doc's words (weight = occurrence count).
    Expressed as explode(words) × sequence(bits) → conditional sum —
    all JVM-side; shuffles on (doc_id) once.
    """
    words = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
        .withColumn("wh", F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long"))
    )
    bits = words.select(
        "doc_id",
        "cnt",
        "wh",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    )
    signed = bits.withColumn(
        "vote",
        F.when(F.expr("(wh >> bit) & 1") == 1, F.col("cnt")).otherwise(-F.col("cnt")),
    )
    return (
        signed.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
        .withColumn("bitval", F.when(F.col("v") > 0, 1).otherwise(0))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("CAST(bitval AS BIGINT) * shiftleft(CAST(1 AS BIGINT), bit)")).alias(
                "simhash"
            )
        )
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    check_every: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """Cluster near-dup candidate pairs into connected components.

    Minimum-label propagation with pointer jumping: every node starts
    labelled with itself; each round a node takes the min of (its label,
    its neighbors' labels, its label's label). The pointer-jump term gives
    O(log diameter) convergence — a long chain collapses in ~log2 rounds,
    not diameter rounds. No GraphFrames dependency; each round is one
    equi-join plus one groupBy-min shuffle, all JVM-side.

    This is the step that turns candidate pairs into an actionable
    keep/drop decision: ``cluster_id`` = min doc_id of the component (the
    canonical keep), everything else in the component is a drop.

    Scale notes (100 TB): edges are localCheckpointed once (reused every
    round — recomputing the upstream LSH per iteration would be
    quadratic-ish work); labels are localCheckpointed per round to truncate
    lineage, else the plan doubles each iteration and the driver OOMs on
    plan size long before data size matters. Convergence is an explicit
    count of changed labels, batched: checked every ``check_every`` rounds
    (and on the final round) rather than every round, halving driver
    actions at check_every=2. Sound because labels are MONOTONE
    non-increasing per node — equality across a k-round span forces
    equality at every round inside it, so a clean check IS a fixpoint
    (never just a missed oscillation). Trade-off: the fixpoint is detected
    up to 2k-2 rounds later than per-round checking (the stable span must
    cover a full k-gap aligned to the check schedule) — extra no-op rounds
    that cost one map-side pass each. Lazy per-round localCheckpoints
    still materialize when the next action computes through them, so
    lineage stays bounded by check_every rounds, not the whole run.

    ``stats``: pass a dict to receive {"rounds": r, "checks": c} — the
    observability hook the batching test pins (c ≈ r / check_every).

    Returns (doc_id, cluster_id) for every node that appears in ``pairs``.
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    # Convergence witness: labels are MONOTONE non-increasing per node, so
    # the exact sum of labels (decimal(38,0) — integral ids sum exactly at
    # any corpus size) is strictly decreasing until the fixpoint; equal
    # sums at two consecutive checks force equality at every round between
    # them. This replaces the previous join-with-last-checked + count
    # (one extra exchange + the checked lineage per check) with a single
    # aggregate over the new labels — same span semantics, same detected
    # round (the first check can never signal convergence on a non-empty
    # edge set either way: round 1 always lowers some label).
    from pyspark.sql import types as T

    node_dt = labels.schema["node"].dataType
    # DecimalType qualifies only at scale 0: cast('decimal(38,0)') ROUNDS
    # fractional-scale decimals, so two distinct label multisets could
    # collide on equal sums — the monotone-sum argument needs exactly-
    # summable integral ids (ADVICE r11).
    numeric_ids = isinstance(
        node_dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ) or (isinstance(node_dt, T.DecimalType) and node_dt.scale == 0)
    checked = labels  # non-numeric-id fallback: labels at the last check
    prev_sum = None
    n_rounds = n_checks = 0
    for i in range(max_iter):
        n_rounds += 1
        nbr = edges.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "label")
        jump = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.label") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.label").alias("label"))
        )
        # lazy checkpoint: the convergence aggregate below is the span's
        # ONE action — it materializes the pending checkpoints and measures
        # the sum in the same job (an eager checkpoint would double the jobs).
        new_labels = (
            labels.union(nbr)
            .union(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        labels = new_labels
        if (i + 1) % max(check_every, 1) == 0 or i == max_iter - 1:
            n_checks += 1
            if numeric_ids:
                # try_sum: a 38-digit overflow yields NULL under BOTH ANSI
                # modes (plain SUM throws under the session's ANSI default)
                row = new_labels.agg(
                    F.count("*").alias("n"),
                    F.try_sum(F.col("label").cast("decimal(38,0)")).alias("s"),
                ).first()
                if row["n"] == 0:
                    break
                if row["s"] is None:
                    # the decimal(38,0) accumulator overflowed (ids so
                    # large the exact total doesn't fit) — the sum is no
                    # longer a witness. Degrade to the join-based
                    # changed-count witness from the NEXT check instead
                    # of silently running to max_iter (r11 verdict #4a).
                    numeric_ids = False
                    checked = new_labels
                    continue
                if prev_sum is not None and row["s"] == prev_sum:
                    break
                prev_sum = row["s"]
            else:
                # non-integral node ids can't sum exactly — keep the
                # join-based changed-count witness for them
                changed = (
                    new_labels.withColumnRenamed("label", "new_label")
                    .join(checked, "node")
                    .filter(F.col("new_label") != F.col("label"))
                    .count()
                )
                checked = new_labels
                if changed == 0:
                    break
    if stats is not None:
        stats["rounds"] = n_rounds
        stats["checks"] = n_checks
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# Eval-side broadcast guard for the decontamination joins. Benchmarks are
# small by PREMISE, not by construction — a caller who points the eval arg
# at something corpus-sized (or a harness whose synthetic eval split grows
# with the data, the r10 verdict's one weak row) must degrade to a shuffle
# join instead of force-broadcasting an unbounded side onto every executor.
# The default bound is sized for big-executor clusters: ~2M distinct
# shingles × ~40 B ≈ 100–200 MB broadcast, far above any real benchmark
# suite but far below a training corpus's shingle set.
BROADCAST_EVAL_MAX_SHINGLES = 2_000_000


def _guarded_eval_side(ev: DataFrame, max_rows: int | None) -> DataFrame:
    """``ev`` wrapped in an explicit broadcast hint ONLY when its row count
    is provably ≤ ``max_rows`` (``limit(max_rows + 1).count()`` — the
    counting job is O(min(|ev|, max_rows)) and eval-sized, never
    train-sized); above the bound (or with ``max_rows`` falsy) the plain
    DataFrame is returned and Spark plans a shuffle join. The guard costs
    one extra eval-side job per call — the price of never shipping an
    unbounded table to every executor on a hint Spark cannot decline."""
    if not max_rows:
        return ev
    n = ev.limit(max_rows + 1).count()
    return F.broadcast(ev) if n <= max_rows else ev


def cross_corpus_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    broadcast_threshold: int | None = BROADCAST_EVAL_MAX_SHINGLES,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many of its distinct
    n-word shingles also appear in the eval/benchmark set. The standard
    train-set hygiene pass before an LLM data release — docs with a high
    ``contamination_ratio`` get dropped or scrubbed.

    Shape at 100 TB: the eval shingle set is tiny (benchmarks don't grow
    with the training corpus) — broadcast it; the train side is one shingle
    explode + one groupBy doc_id. No self-joins, no quadratic stage. The
    broadcast is SIZE-GUARDED (:func:`_guarded_eval_side`): if the eval
    side exceeds ``broadcast_threshold`` distinct shingles the join
    degrades to a shuffle instead of forcing an unbounded broadcast —
    identical results either way, pinned both ways by
    tests/test_plans.py::test_decontamination_broadcast_guard. Returns only
    contaminated docs (n_contaminated > 0): (doc_id, n_shingles,
    n_contaminated, contamination_ratio).
    """
    ev = _guarded_eval_side(
        with_word_shingles(eval_docs, n).select("shingle").distinct(),
        broadcast_threshold,
    )
    tr = with_word_shingles(train, n)
    sizes = tr.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        sizes.join(hits, "doc_id")
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_shingles"), 6
            ).alias("contamination_ratio"),
        )
    )


def repetition_stats(docs: DataFrame, n: int = 3) -> DataFrame:
    """Boilerplate/repetition score: distinct-shingle ratio per doc.
    Heavily templated or looping text repeats its n-grams, driving the
    ratio toward 0; natural text stays near 1 — the cheap compression-ratio
    proxy used for quality filtering. Total shingle count is a pure column
    expression; distinct count is one groupBy — a single shuffle on doc_id.
    """
    words = F.split(F.trim(F.col("text")), r"\s+")
    total = F.greatest(F.size(words) - (n - 1), F.lit(1)).cast("long")
    base = docs.select("doc_id", total.alias("n_shingles_total"))
    distinct = (
        with_word_shingles(docs, n)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles_distinct"))
    )
    return base.join(distinct, "doc_id").select(
        "doc_id",
        "n_shingles_total",
        "n_shingles_distinct",
        F.round(
            F.col("n_shingles_distinct") / F.col("n_shingles_total"), 6
        ).alias("distinct_ratio"),
    )


def positional_ngrams(docs: DataFrame, n: int = 8) -> DataFrame:
    """Explode each document into ALL its n-word grams with 1-based start
    positions (unlike with_word_shingles, which distinct-collapses and
    drops positions). Docs shorter than n tokens produce no grams.

    Columns out: doc_id, n_tok (long), start (1-based), gram. Same
    JVM-tokenize / Arrow-assemble split as :func:`with_word_shingles`
    (the sequence/slice/concat_ws chain is interpreted CodegenFallback);
    gram strings and positions byte-identical to the expression form.
    """
    import pandas as pd

    words = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("doc_id", words.alias("_w"))
    vid = base.schema["doc_id"].dataType.simpleString()

    def gen(batches):
        def frame(ids, toks, starts, grams):
            return pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_tok": pd.Series(toks, dtype="int64"),
                    "start": pd.Series(starts, dtype="int64"),
                    "gram": grams,
                }
            )

        for pdf in batches:
            ids: list = []
            toks: list = []
            starts: list = []
            grams: list = []
            for did, w in zip(pdf["doc_id"], pdf["_w"]):
                if w is None:
                    continue  # NULL token array → no rows (expression parity)
                w = list(w)
                m = len(w)
                if m < n:
                    continue
                for i in range(m - (n - 1)):
                    ids.append(did)
                    toks.append(m)
                    starts.append(i + 1)
                    grams.append(" ".join(w[i : i + n]))
                if len(ids) >= _NGRAM_FLUSH_ROWS:
                    yield frame(ids, toks, starts, grams)
                    ids, toks, starts, grams = [], [], [], []
            if ids:
                yield frame(ids, toks, starts, grams)

    return base.mapInPandas(
        gen, f"doc_id {vid}, n_tok bigint, start bigint, gram string"
    )


def dup_span_coverage(docs: DataFrame, n: int = 8, min_df: int = 2) -> DataFrame:
    """Cross-document duplicated-span coverage — the exact-substring-dedup
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (arXiv:2107.06499), re-expressed at n-gram granularity:
    for each doc, the fraction of its token positions covered by at least
    one n-gram that also occurs in >= min_df distinct documents.

    Plan shape (all bounded at corpus scale):
      1. positional n-grams              — narrow, no shuffle;
      2. gram document-frequency         — one shuffle keyed by gram, with
         map-side partial aggregation (countDistinct is two-phase);
      3. left-semi join grams→dup grams  — same gram key, co-partitioned
         with (2) under AQE;
      4. interval-union per doc          — one shuffle on doc_id, a single
         lead() window over (doc_id, start): covered tokens =
         Σ min(n, next_start - start), last span counts n.
    Nothing is O(docs²); the heaviest key is a corpus-common gram, which is
    exactly what the min_df filter keeps (hot keys survive on purpose here
    — they ARE the signal), so at extreme skew route step 2 through
    scale.salted aggregation.

    Returns one row per doc (including docs with zero duplicated spans and
    docs shorter than n tokens): doc_id, n_tok, n_dup_spans,
    covered_tokens, dup_coverage (6dp).
    """
    from pyspark.sql.window import Window

    words = F.split(F.trim(F.col("text")), r"\s+")
    all_docs = docs.select("doc_id", F.size(words).cast("long").alias("n_tok"))
    g = positional_ngrams(docs, n)
    dup_grams = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    starts = g.join(dup_grams, "gram", "left_semi").select("doc_id", "start")
    w = Window.partitionBy("doc_id").orderBy("start")
    covered = (
        starts.withColumn("nxt", F.lead("start").over(w))
        .withColumn(
            "c",
            F.least(
                F.lit(n).cast("long"),
                F.coalesce(F.col("nxt") - F.col("start"), F.lit(n).cast("long")),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_spans"),
            F.sum("c").alias("covered_tokens"),
        )
    )
    return all_docs.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce(F.col("covered_tokens"), F.lit(0))
        .cast("long")
        .alias("covered_tokens"),
        F.round(
            F.coalesce(F.col("covered_tokens"), F.lit(0)) / F.col("n_tok"), 6
        ).alias("dup_coverage"),
    )


def dup_span_removal(docs: DataFrame, n: int = 8, min_df: int = 2) -> DataFrame:
    """Exact duplicated-span REMOVAL — the production half of
    :func:`dup_span_coverage` (Lee et al. 2021, arXiv:2107.06499): where
    coverage MEASURES the per-doc fraction of token positions covered by
    cross-document n-grams, this operator EXCISES those positions and
    emits the cleaned text.

    A token at position p is removed iff some duplicated n-gram starts at
    a position s with s <= p < s+n in the SAME doc — exactly the
    positions dup_span_coverage counts, so ``tokens_removed`` here equals
    that entry's ``covered_tokens`` per doc (reconciliation is
    pytest-pinned).

    Plan shape: the gram-df stages are shared with coverage (one shuffle
    keyed by gram); the dup-span starts then aggregate to ONE
    per-doc sorted array (one shuffle on doc_id — the same key as
    coverage's window) which joins back to the doc row, and the excision
    itself is a per-row JVM transform/filter over the token array against
    that array (no Python, no extra shuffle, nothing cross-doc beyond the
    gram join). Span counts per doc are bounded by doc length, so the
    per-row exists() scan is O(n_tok · n_spans) with both factors
    document-bounded — corpus size never enters.

    Out: doc_id, n_tok, tokens_removed, chars_removed, clean_text
    (kept tokens joined by single spaces; chars are measured against the
    same single-space normalization so the two engines agree byte-wise).
    """
    words = F.split(F.trim(F.col("text")), r"\s+")
    g = positional_ngrams(docs, n)
    dup_grams = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    starts = (
        g.join(dup_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("start")).alias("_starts"))
    )
    base = docs.select("doc_id", words.alias("_w"))
    joined = base.join(starts, "doc_id", "left").withColumn(
        "_starts",
        F.coalesce(F.col("_starts"), F.array().cast("array<bigint>")),
    )
    # Excision as an Arrow pass (guide §4.2): a token at 1-based position
    # p is kept iff NO start s in _starts covers it (s <= p < s+n) — the
    # transform/filter/exists expression form is interpreted
    # CodegenFallback at O(n_tok · n_spans) per row; here it is one
    # boolean cover mask per doc. Pure integer/string ops, byte-identical
    # output (clean_text = kept tokens space-joined; chars measured
    # against the same single-space normalization).
    import pandas as pd

    vid = joined.schema["doc_id"].dataType.simpleString()

    def excise(batches):
        for pdf in batches:
            ids: list = []
            ntk: list = []
            rem: list = []
            chrem: list = []
            clean: list = []
            for did, w, starts in zip(pdf["doc_id"], pdf["_w"], pdf["_starts"]):
                if w is None:
                    continue  # NULL token array → no row (expression parity)
                w = list(w)
                m = len(w)
                cover = bytearray(m)
                for st in starts:
                    st = int(st)
                    cover[st - 1 : st - 1 + n] = b"\x01" * min(n, m - st + 1)
                kept = [tok for tok, c in zip(w, cover) if not c]
                ct = " ".join(kept)
                ids.append(did)
                ntk.append(m)
                rem.append(m - len(kept))
                chrem.append(len(" ".join(w)) - len(ct))
                clean.append(ct)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_tok": pd.Series(ntk, dtype="int64"),
                    "tokens_removed": pd.Series(rem, dtype="int64"),
                    "chars_removed": pd.Series(chrem, dtype="int64"),
                    "clean_text": clean,
                }
            )

    return joined.select("doc_id", "_w", "_starts").mapInPandas(
        excise,
        f"doc_id {vid}, n_tok bigint, tokens_removed bigint, "
        "chars_removed bigint, clean_text string",
    )


def containment_pairs(
    docs: DataFrame,
    n: int | None = None,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Directed near-containment pairs: |A∩B| / |A| over distinct n-word
    shingles — the asymmetric cousin of Jaccard. A short doc quoted or
    wrapped inside a long one scores high containment but low Jaccard
    (the union is dominated by the long doc), so symmetric dedup misses
    exactly the quote/boilerplate-wrapper duplicates this catches.

    The default shingle width ADAPTS to the corpus (``corpus_shingle_dial``:
    one probe pass at plan-build time; n=3 at fixture scale, wider once the
    corpus outgrows the V^n shingle space) so the candidate join stays
    df-bounded at 100 TB instead of saturating. Same plan shape and
    ``max_df`` scale guard as ngram_jaccard_pairs (shingles in more than
    max_df docs are dropped from both intersection and sizes); pairs are
    directed (doc_a = the contained side, both orientations emitted when
    both clear the threshold), doc_a != doc_b.
    """
    if n is None:
        n = corpus_shingle_dial(docs)
    sh = with_word_shingles(docs, n)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle").select("doc_id", "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.toDF("doc_a", "shingle")
    b = sh.toDF("doc_b", "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    containment = F.col("inter") / F.col("sz_a")
    return (
        inter.join(sizes.toDF("doc_a", "sz_a"), "doc_a")
        .withColumn("containment", F.round(containment, 6))
        .filter(containment >= threshold)
        .select("doc_a", "doc_b", "inter", F.col("sz_a").alias("sz_contained"), "containment")
    )


def simhash_near_pairs(
    docs: DataFrame, blocking_cols: list[str], max_hamming: int = 2
) -> DataFrame:
    """Near-dup pairs = same blocking key + Hamming(simhash) <= max_hamming.
    Blocking keeps the pair join linear-ish; at 100 TB block by
    (lang, source, length-bucket)."""
    fp = simhash_fingerprints(docs).join(
        docs.select("doc_id", *blocking_cols), "doc_id"
    )
    a = fp.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
        *blocking_cols,
    )
    b = fp.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        *blocking_cols,
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, blocking_cols)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --- corpus-level boilerplate (frequent-chunk) removal -----------------------


def boilerplate_removal(
    docs: DataFrame, chunk_len: int = 2, min_docs: int = 10
) -> DataFrame:
    """C4-style boilerplate removal: split each document into fixed-size
    non-overlapping token chunks (the stand-in for "lines" in this corpus,
    which has no newlines), count how many *distinct* documents each chunk
    appears in corpus-wide, and strip every chunk that occurs in at least
    ``min_docs`` documents — the nav-bar / cookie-banner / footer scrubber
    every web-scale LLM pipeline runs (C4 dropped lines seen >= 3 times).

    Shape at 100 TB: one shuffle keyed on chunk text for the frequency
    count; the surviving boilerplate set is by construction the heavy
    hitters (bounded by corpus_size / min_docs), so it broadcasts back as
    a left-anti join — no second data-sized shuffle on content. Document
    reassembly is one groupBy on doc_id with an order-preserving
    array_sort over (pos, chunk).

    Out: doc_id, n_chunks, n_removed, clean_text (chunks that survive,
    original order, space-joined; empty string when everything was
    boilerplate).
    """
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_len))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * chunk_len + 1, chunk_len)
        ),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(chunks).alias("pos", "chunk")
    )
    boiler = (
        exploded.groupBy("chunk")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("chunk")
    )
    kept = exploded.join(F.broadcast(boiler), "chunk", "left_anti")
    totals = exploded.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


# --- Bloom-prefiltered decontamination ---------------------------------------


def _bloom_bit(pos_col: str) -> F.Column:
    """1L << (pos % 64) as a column expression (shiftleft by a column)."""
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({pos_col}, 64) AS INT))"
    )


def bloom_prefilter_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    m_bits: int = 1 << 16,
    broadcast_threshold: int | None = BROADCAST_EVAL_MAX_SHINGLES,
) -> DataFrame:
    """Decontamination with a Bloom-filter prefilter: identical RESULT to
    :func:`cross_corpus_contamination` (the Bloom pass only prunes — false
    positives fall out in the exact semi-join that follows), but the
    data-sized train scan is first filtered against an ``m_bits``-bit
    two-hash Bloom bitmap of the eval shingle set.

    Why this shape at 100 TB: the eval *shingle strings* can be tens of
    GB too large to broadcast comfortably, but the Bloom bitmap is a fixed
    ``m_bits/8`` bytes regardless of eval size (here 8 KB at the default;
    production: a few hundred MB for billions of shingles at 1% FP). The
    bitmap is built with one tiny aggregation (bit_or over word masks) and
    broadcast-joined on word index; only the sliver of train shingles that
    pass both bit probes reaches the exact join. This is the same
    two-phase design Spark's AQE runtime bloom filters apply to join
    pruning, expressed explicitly so the prefilter is plan-visible.

    The exact semi-join that follows the Bloom pass carries the same
    size-guarded broadcast as :func:`cross_corpus_contamination`
    (:func:`_guarded_eval_side`, bound ``broadcast_threshold``): above the
    bound the final eval join degrades to a shuffle — by then the Bloom
    prefilter has already cut the train side to the candidate sliver, so
    the shuffle moves candidates, not the corpus. The two bitmap probes
    stay broadcast unconditionally: the bitmap is ``m_bits/8`` bytes by
    construction, independent of eval size.

    Out (identical schema/values to cross_corpus_contamination):
    doc_id, n_shingles, n_contaminated, contamination_ratio.
    """
    ev = with_word_shingles(eval_docs, n).select("shingle").distinct()
    h1 = F.pmod(F.xxhash64("shingle"), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64("shingle", F.lit(7)), F.lit(m_bits))
    positions = ev.select(F.explode(F.array(h1, h2)).alias("__pos"))
    bitmap = (
        positions.select(
            (F.col("__pos") / 64).cast("long").alias("word_idx"),
            _bloom_bit("__pos").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("mask"))
    )

    tr = with_word_shingles(train, n)
    sizes = tr.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    probes = tr.select(
        "doc_id",
        "shingle",
        h1.alias("__pos"),
    ).select(
        "doc_id",
        "shingle",
        (F.col("__pos") / 64).cast("long").alias("w1"),
        _bloom_bit("__pos").alias("b1"),
        F.pmod(F.xxhash64("shingle", F.lit(7)), F.lit(m_bits)).alias("__pos2"),
    ).select(
        "doc_id",
        "shingle",
        "w1",
        "b1",
        (F.col("__pos2") / 64).cast("long").alias("w2"),
        _bloom_bit("__pos2").alias("b2"),
    )
    m1 = bitmap.select(
        F.col("word_idx").alias("w1"), F.col("mask").alias("mask1")
    )
    m2 = bitmap.select(
        F.col("word_idx").alias("w2"), F.col("mask").alias("mask2")
    )
    bloom_pass = (
        probes.join(F.broadcast(m1), "w1")
        .filter(F.col("b1").bitwiseAND(F.col("mask1")) != 0)
        .join(F.broadcast(m2), "w2")
        .filter(F.col("b2").bitwiseAND(F.col("mask2")) != 0)
        .select("doc_id", "shingle")
    )
    hits = (
        bloom_pass.join(_guarded_eval_side(ev, broadcast_threshold), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return sizes.join(hits, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(
            F.col("n_contaminated") / F.col("n_shingles"), 6
        ).alias("contamination_ratio"),
    )


def prefix_filter_pairs(
    docs: DataFrame,
    n: int | None = None,
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """Set-similarity join with prefix filtering (PPJoin family, Xiao et
    al. 2008): all document pairs whose n-shingle-set Jaccard >= tau
    (tau = tau_num/tau_den, default 1/2), found WITHOUT comparing every
    pair. Shingles are globally ordered by (corpus df asc, shingle asc) —
    rarest first; each doc keeps only its first
    p = |s| - ceil(tau*|s|) + 1 shingles as its prefix. Losslessness: two
    sets with Jaccard >= tau must overlap in >= 1 token within each
    other's prefix under any shared total order, so the prefix equi-join
    generates a candidate superset; exact intersection counting on
    candidates then applies the exact integer test
    (tau_den + tau_num)*|a&b| >= tau_num*(|a|+|b|) — no float boundary.

    Scale shape: candidate generation joins only PREFIX rows (the rarest
    ~(1-tau) fraction of each doc, and rare-by-construction shingles have
    small df, so per-shingle fanout stays flat where the naive
    shingle-join explodes on common shingles); intersection counting is
    candidate-bounded, never corpus-quadratic. Shuffles: one df count,
    one per-doc window (bounded by doc length), the prefix equi-join,
    and the candidate-keyed intersection joins.

    The dial: prefix filtering presumes rare shingles EXIST — when the
    corpus outgrows the shingle space (|vocab|^n distinct shingles), even
    the rarest prefix shingle's df grows linearly in the corpus and the
    candidate join quadratically. The default width therefore ADAPTS
    (``corpus_shingle_dial``: one probe pass, n grows with
    log_vocab(corpus) — measured as the healthy dial by
    tools/run_scaling_pipe.py's prefix_filter_scaled_n row), exactly as
    LSH widens its bit width.

    Out: doc_a, doc_b, n_a, n_b, n_common, jaccard (6dp).
    """
    from pyspark.sql.window import Window

    if n is None:
        n = corpus_shingle_dial(docs)
    sh = with_word_shingles(docs, n=n)
    df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        sh.join(df, "shingle")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("doc_id"))
        )
    )
    p = (
        F.col("n")
        - F.floor(
            (F.lit(tau_num) * F.col("n") + F.lit(tau_den - 1)) / F.lit(tau_den)
        )
        + 1
    )
    prefix = ranked.filter(F.col("rnk") <= p).select("doc_id", "shingle", "n")
    cand = (
        prefix.select(
            F.col("doc_id").alias("doc_a"),
            "shingle",
            F.col("n").alias("n_a"),
        )
        .join(
            prefix.select(
                F.col("doc_id").alias("doc_b"),
                "shingle",
                F.col("n").alias("n_b"),
            ),
            "shingle",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    )
    common = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.filter(
            F.lit(tau_den + tau_num) * F.col("n_common")
            >= F.lit(tau_num) * (F.col("n_a") + F.col("n_b"))
        )
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


# --- sorted-neighborhood blocking ---------------------------------------------
def sorted_neighborhood_pairs(
    docs: DataFrame, window: int = 2, key_len: int = 40
) -> DataFrame:
    """Sorted-neighborhood method (SNM): the classic entity-resolution
    blocking alternative to LSH — sort the corpus by a normalization key
    (here: the leading ``key_len`` chars of the sorted distinct lowercase
    token string) and compare only records within ``window`` positions of
    the global sort order. Near-identical documents normalize to adjacent
    keys, so the pair space is N x window instead of N².

    Scale shape: the global rank comes from the partition-offset trick
    (range-repartition on the key, row_number within each range partition,
    add the broadcast count-of-earlier-partitions offset — the same
    zero-single-partition-stage decomposition as pipe_zipf_slope), and the
    window join is ``window`` equi-joins on rank+d — shuffle-partitioned
    by rank, never a global window. Out: (doc_a, doc_b, rank_gap,
    jaccard) with jaccard over the distinct token sets.

    Collation note: the sort key is compared with Java's UTF-16 string
    ordering while the DuckDB oracle uses binary UTF-8 collation. These
    agree for ASCII (and for all BMP text, where UTF-16 code-unit order ==
    code-point order == UTF-8 byte order) but can differ for
    supplementary-plane characters (surrogate pairs sort below U+E000 in
    UTF-16). The fixture corpus is ASCII; for arbitrary text, normalize
    the key to ASCII first or accept engine-relative neighbor windows."""
    toks = F.array_sort(
        F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    )
    base = docs.select(
        "doc_id",
        F.substring(F.array_join(toks, " "), 1, key_len).alias("snm_key"),
        toks.alias("toks"),
    )
    from .scale import global_rank

    ranked = global_rank(
        base, F.col("snm_key").asc(), F.col("doc_id").asc()
    ).select("rnk", "doc_id", "toks")
    left = ranked.select(
        F.col("rnk").alias("rnk_a"),
        F.col("doc_id").alias("d_a"),
        F.col("toks").alias("toks_a"),
    )
    pairs = None
    for d in range(1, window + 1):
        right = ranked.select(
            (F.col("rnk") - d).alias("rnk_a"),
            F.col("doc_id").alias("d_b"),
            F.col("toks").alias("toks_b"),
            F.lit(d).alias("rank_gap"),
        )
        p = left.join(right, "rnk_a")
        pairs = p if pairs is None else pairs.unionAll(p)
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.col("toks_a")) + F.size(F.col("toks_b")) - inter
    return pairs.select(
        F.least(F.col("d_a"), F.col("d_b")).alias("doc_a"),
        F.greatest(F.col("d_a"), F.col("d_b")).alias("doc_b"),
        "rank_gap",
        F.round(inter / union.cast("double"), 6).alias("jaccard"),
    )


def ppjoin_pairs(
    docs: DataFrame,
    n: int | None = None,
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """PPJoin proper (Xiao et al. 2008): prefix filtering PLUS the length
    and positional filters, one algorithmic tier above
    :func:`prefix_filter_pairs`. Same global (df asc, shingle asc) order
    and prefix size p = |s| - ceil(tau·|s|) + 1; additionally each
    candidate pair must pass

    - the LENGTH filter: tau_den·min(|A|,|B|) >= tau_num·max(|A|,|B|)
      (a qualifying pair's sizes can differ by at most 1/tau), and
    - the POSITIONAL filter: for a shared prefix token at per-doc ranks
      (pa, pb), overlap <= min(pa,pb) + min(|A|-pa, |B|-pb) — tokens
      ordered before the match on both sides, the match itself, and the
      smaller remaining tail; the pair survives only if the max of this
      bound over its observed prefix matches reaches
      alpha = ceil(tau_num·(|A|+|B|)/(tau_num+tau_den)).

    Both filters are exact-integer and provably lossless (every
    Jaccard >= tau pair passes), so the output is identical to
    prefix_filter_pairs and to the brute-force join — the filters only
    shrink the candidate set that reaches exact verification, which is
    the expensive stage at 100 TB (candidate-bounded intersection
    joins). Shuffle shape is unchanged from prefix_filter_pairs; the
    two extra predicates ride the existing candidate aggregation.

    Out: doc_a, doc_b, n_a, n_b, n_common, jaccard (6dp).
    """
    from pyspark.sql.window import Window

    if n is None:
        n = corpus_shingle_dial(docs)
    sh = with_word_shingles(docs, n=n)
    df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        sh.join(df, "shingle")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    p = (
        F.col("n")
        - F.floor(
            (F.lit(tau_num) * F.col("n") + F.lit(tau_den - 1)) / F.lit(tau_den)
        )
        + 1
    )
    prefix = ranked.filter(F.col("rnk") <= p).select(
        "doc_id", "shingle", "n", "rnk"
    )
    ub = F.least(F.col("pa"), F.col("pb")) + F.least(
        F.col("n_a") - F.col("pa"), F.col("n_b") - F.col("pb")
    )
    alpha = F.floor(
        (
            F.lit(tau_num) * (F.col("n_a") + F.col("n_b"))
            + F.lit(tau_num + tau_den - 1)
        )
        / F.lit(tau_num + tau_den)
    )
    cand = (
        prefix.select(
            F.col("doc_id").alias("doc_a"),
            "shingle",
            F.col("n").alias("n_a"),
            F.col("rnk").alias("pa"),
        )
        .join(
            prefix.select(
                F.col("doc_id").alias("doc_b"),
                "shingle",
                F.col("n").alias("n_b"),
                F.col("rnk").alias("pb"),
            ),
            "shingle",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        # length filter rides the candidate join
        .filter(
            F.lit(tau_den) * F.least(F.col("n_a"), F.col("n_b"))
            >= F.lit(tau_num) * F.greatest(F.col("n_a"), F.col("n_b"))
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.max(ub).alias("max_ub"))
        # positional filter: best overlap bound must reach alpha
        .filter(F.col("max_ub") >= alpha)
        .select("doc_a", "doc_b", "n_a", "n_b")
    )
    common = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.filter(
            F.lit(tau_den + tau_num) * F.col("n_common")
            >= F.lit(tau_num) * (F.col("n_a") + F.col("n_b"))
        )
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
