"""Property-based invariants (hypothesis) for the dedup/scale operators.

Each example drives real Spark jobs, so max_examples stays small — the
value is input diversity (adversarial doc shapes, arbitrary groupings),
not volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_benchmark_java_spark.operators import dedup, scale

WORDS = st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split())
DOC = st.lists(WORDS, min_size=1, max_size=12).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=2, max_size=12))
def test_exact_duplicates_complete_and_sound(spark, texts):
    """exact_duplicates reports exactly the text groups with >1 member,
    with min doc_id as canonical — for ANY corpus."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.fingerprint: (r.n_copies, r.canonical_id)
        for r in dedup.exact_duplicates(df).collect()
    }
    expect: dict = {}
    for i, t in enumerate(texts):
        expect.setdefault(t, []).append(i)
    import hashlib

    expected = {
        hashlib.md5(t.encode()).hexdigest(): (len(ids), min(ids))
        for t, ids in expect.items()
        if len(ids) > 1
    }
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group key
            st.integers(min_value=-1000, max_value=1000),  # value
        ),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.integers(min_value=1, max_value=5),
)
def test_salted_aggregate_invariant(spark, rows, n_salts):
    """salted_aggregate == plain groupBy for any grouping and salt count."""
    df = spark.createDataFrame(rows, ["k", "v"])
    plain = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    salted = {
        r.k: (r.s, r.c)
        for r in scale.salted_aggregate(
            df,
            ["k"],
            {"s": ("sum", F.sum("v")), "c": ("count", F.count("*"))},
            n_salts=n_salts,
        ).collect()
    }
    assert salted == plain


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=2, max_size=8))
def test_minhash_lsh_catches_every_exact_duplicate(spark, texts):
    """Identical texts agree on every MinHash band, so exact duplicates
    always surface as LSH candidates with all bands shared (recall=1 for
    true dups — the invariant that makes LSH safe for dedup)."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    cands = {
        (r.doc_a, r.doc_b): r.n_shared_bands
        for r in dedup.minhash_lsh_candidates(df).collect()
    }
    n_bands = dedup.N_HASHES // dedup.BAND_SIZE
    for i, a in enumerate(texts):
        for j in range(i + 1, len(texts)):
            if a == texts[j]:
                assert cands.get((i, j)) == n_bands, (i, j, cands)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    probe=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # key
            st.integers(min_value=0, max_value=50),   # ts
        ),
        min_size=1,
        max_size=20,
    ),
    build=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=20,
    ),
)
def test_asof_join_invariant(spark, probe, build):
    """asof_join_backward == the brute-force definition (latest build row
    with bts <= pts per key; build side pre-deduped per (key, ts)) for
    ANY probe/build frames."""
    from iceberg_benchmark_java_spark.operators.asof import asof_join_backward

    probe_rows = [(k, t, i) for i, (k, t) in enumerate(probe)]
    # dedupe build per (key, ts) keeping max id — the operator's contract
    bmap: dict = {}
    for i, (k, t) in enumerate(build):
        bmap[(k, t)] = max(bmap.get((k, t), -1), i + 100)
    build_rows = [(k, t, bid) for (k, t), bid in bmap.items()]
    p = spark.createDataFrame(probe_rows, ["k", "t", "pid"])
    b = spark.createDataFrame(build_rows, ["k", "t", "bid"])
    got = {
        r.pid: r.bid
        for r in asof_join_backward(p, b, key="k", ts="t", payload_cols=["bid"]).collect()
    }
    expect = {}
    for k, t, pid in probe_rows:
        cands = [(bt, bid) for bk, bt, bid in build_rows if bk == k and bt <= t]
        expect[pid] = max(cands)[1] if cands else None
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=2, max_size=14))
def test_contamination_ratio_bounded_and_complete(spark, texts):
    """cross_corpus_contamination: ratios in (0, 1], n_contaminated <=
    n_shingles, and a train doc TEXT-IDENTICAL to an eval doc always
    reports ratio 1.0 — for ANY corpus split."""
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ev = df.filter(F.col("doc_id") % 3 == 0)
    tr = df.filter(F.col("doc_id") % 3 != 0)
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination_ratio)
        for r in dedup.cross_corpus_contamination(tr, ev, n=3).collect()
    }
    ev_texts = {t for i, t in rows if i % 3 == 0}
    for doc_id, (n_sh, n_cont, ratio) in got.items():
        assert 0 < n_cont <= n_sh
        assert 0 < ratio <= 1.0
    for doc_id, t in rows:
        if doc_id % 3 != 0 and t in ev_texts:
            assert got[doc_id][2] == 1.0, (doc_id, t)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=1, max_size=14))
def test_repetition_ratio_bounds(spark, texts):
    """repetition_stats: distinct <= total, ratio in (0, 1], and a doc of
    one repeated word scores the minimum possible ratio for its length."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_shingles_total, r.n_shingles_distinct, r.distinct_ratio)
        for r in dedup.repetition_stats(df, n=3).collect()
    }
    assert set(got) == set(range(len(texts)))
    for total, distinct, ratio in got.values():
        assert 0 < distinct <= total
        assert 0 < ratio <= 1.0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=24
    ),
    n_shards=st.sampled_from([1, 2, 4]),
)
def test_pack_sequences_capacity_invariant(spark, docs, n_shards):
    """For ANY doc-length distribution and shard count: no bin exceeds
    capacity unless it holds exactly one (oversized) doc, every doc is
    assigned exactly once, and bin ids per group are dense from 0."""
    from iceberg_benchmark_java_spark.operators.text import pack_sequences

    capacity = 32
    rows = [(i, "en", " ".join("t" for _ in range(n))) for i, n in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = pack_sequences(
        df, capacity=capacity, group_cols=("lang",), n_shards=n_shards
    ).collect()
    assert len(out) == len(docs)
    groups: dict = {}
    for r in out:
        key = (r.lang, getattr(r, "shard", 0), r.bin_id)
        groups.setdefault(key, []).append(r.n_tokens)
    for members in groups.values():
        assert sum(members) <= capacity or len(members) == 1
    # dense bin ids from 0 within each (lang, shard)
    per_group: dict = {}
    for (lang, shard, bin_id), _m in groups.items():
        per_group.setdefault((lang, shard), set()).add(bin_id)
    for bins in per_group.values():
        assert bins == set(range(len(bins)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(st.lists(WORDS, min_size=1, max_size=14).map(" ".join),
                      min_size=2, max_size=10))
def test_dup_span_coverage_matches_reference(spark, texts):
    """dup_span_coverage(n=3) equals a pure-Python interval-union reference
    for ANY corpus: per doc, tokens covered by 3-grams occurring in >= 2
    distinct docs."""
    n = 3
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tok, r.n_dup_spans, r.covered_tokens)
        for r in dedup.dup_span_coverage(df, n=n).collect()
    }
    grams: dict = {}
    for i, t in enumerate(texts):
        w = t.split()
        for s in range(len(w) - n + 1):
            grams.setdefault(" ".join(w[s : s + n]), set()).add(i)
    expected = {}
    for i, t in enumerate(texts):
        w = t.split()
        starts = [
            s for s in range(len(w) - n + 1)
            if len(grams[" ".join(w[s : s + n])]) >= 2
        ]
        covered: set = set()
        for s in starts:
            covered.update(range(s, s + n))
        expected[i] = (len(w), len(starts), len(covered))
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=2, max_size=10))
def test_containment_pairs_matches_reference(spark, texts):
    """containment_pairs (no max_df) equals the set-theoretic definition
    |A∩B|/|A| >= t over distinct 3-shingles, for ANY corpus."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.sz_contained)
        for r in dedup.containment_pairs(df, n=3, threshold=0.5).collect()
    }
    sh = []
    for t in texts:
        w = t.split()
        k = max(len(w) - 2, 1)
        sh.append({" ".join(w[s : s + 3]) for s in range(k)})
    expected = {}
    for a in range(len(texts)):
        for b in range(len(texts)):
            if a == b:
                continue
            inter = len(sh[a] & sh[b])
            if inter / len(sh[a]) >= 0.5:
                expected[(a, b)] = (inter, len(sh[a]))
    assert got == expected
