"""Adaptive candidate-generation dials: Python/SQL derivation equivalence.

The registered near-dup entries derive their dials (sign-LSH bit width,
shingle width) from corpus counts at plan-build time, and the DuckDB
oracles re-derive the SAME dial in SQL. These tests pin the two
derivations to each other over a wide range of corpus sizes — a drift
here would silently change which plan the oracle models.
No SparkSession needed: the derivations are pure integer arithmetic.
"""

from __future__ import annotations

import duckdb
import pytest

from iceberg_benchmark_java_spark.operators.dedup import (
    SHINGLE_MAX_N,
    adaptive_shingle_width,
)
from iceberg_benchmark_java_spark.operators.similarity import (
    BANDED_MAX_BITS,
    adaptive_centroids,
    adaptive_sign_bits,
)

# SQL mirrors of the oracle fragments (pipeline._DUCK_NB /
# _DUCK_SHINGLE_DIAL) with the corpus counts injected as literals.
_NB_SQL = """
SELECT LEAST(32, 8 + COALESCE(MIN(t.e), 24)) AS bits
FROM generate_series(0, 40) t(e), (SELECT {n}::BIGINT AS n) c
WHERE 2000 * (1::BIGINT << t.e) >= c.n
"""

_DIAL_SQL = """
WITH vstats AS (SELECT CAST(LEAST({v}, 32768) AS HUGEINT) AS v,
                       CAST({n} AS HUGEINT) AS n)
SELECT COALESCE(MIN(t.nn), 8) AS sn
FROM (VALUES (3),(4),(5),(6),(7),(8)) t(nn), vstats
WHERE CASE t.nn
        WHEN 3 THEN v*v*v
        WHEN 4 THEN v*v*v*v
        WHEN 5 THEN v*v*v*v*v
        WHEN 6 THEN v*v*v*v*v*v
        WHEN 7 THEN v*v*v*v*v*v*v
        ELSE v*v*v*v*v*v*v*v END >= 32 * n
"""


def test_adaptive_sign_bits_values():
    assert adaptive_sign_bits(0) == 8
    assert adaptive_sign_bits(500) == 8  # fixture scale: historical dial
    assert adaptive_sign_bits(2000) == 8
    assert adaptive_sign_bits(2001) == 9  # first doubling
    assert adaptive_sign_bits(64000) == 13  # x32 warehouse
    assert adaptive_sign_bits(200000) == 15  # x100 warehouse
    # past 16 bits the banded route switches to random-hyperplane signs
    # (slice dims exhausted), so the cap is 32 — not dimensionality-bound
    assert adaptive_sign_bits(2_100_000) == 19  # RP territory
    assert adaptive_sign_bits(10**9) == 27
    assert adaptive_sign_bits(10**11) == BANDED_MAX_BITS  # = 32


def test_adaptive_shingle_width_values():
    assert adaptive_shingle_width(500, 31) == 3  # fixture: historical dial
    assert adaptive_shingle_width(5000, 31) == 4
    assert adaptive_shingle_width(50_000, 31) == 5  # x10 warehouse
    assert adaptive_shingle_width(500_000, 31) == 5  # x100 warehouse
    assert adaptive_shingle_width(10**12, 2) == SHINGLE_MAX_N  # degenerate
    # huge vocab: n=3 always suffices (clamp keeps SQL overflow-free)
    assert adaptive_shingle_width(10**9, 10**6) == 3


@pytest.mark.parametrize(
    "n", [0, 1, 499, 500, 1999, 2000, 2001, 4000, 4001, 63999, 64000,
          64001, 200000, 10**7, 10**12]
)
def test_sign_bits_matches_duckdb(n):
    got = duckdb.sql(_NB_SQL.format(n=n)).fetchone()[0]
    assert got == adaptive_sign_bits(n), f"n_vectors={n}"


# SQL mirror of the pipe_semantic_dedup_two_level oracle's bt CTE.
_KBITS_SQL = """
SELECT LEAST(16, 6 + COALESCE(MIN(t.e), 10)) AS bf,
       (LEAST(16, 6 + COALESCE(MIN(t.e), 10)) + 1) // 2 AS bc
FROM generate_series(0, 40) t(e), (SELECT {n}::BIGINT AS n) c
WHERE 2000 * (1::BIGINT << t.e) >= c.n
"""


@pytest.mark.parametrize(
    "n", [0, 500, 2000, 2001, 20000, 64000, 200000, 10**7, 10**13]
)
def test_adaptive_centroids_matches_duckdb(n):
    bf, bc = duckdb.sql(_KBITS_SQL.format(n=n)).fetchone()
    k = adaptive_centroids(n)
    assert k == 1 << bf, f"n={n}: k={k} vs SQL 2^{bf}"
    # the coarse width the Spark two-level route derives from k
    bits_f = max(k, 2) - 1
    assert (bits_f.bit_length() + 1) // 2 == bc, f"n={n}"


@pytest.mark.parametrize("v", [1, 2, 31, 100, 32768, 10**6])
@pytest.mark.parametrize(
    "n", [1, 500, 5000, 50_000, 500_000, 10**8, 10**12]
)
def test_shingle_width_matches_duckdb(v, n):
    got = duckdb.sql(_DIAL_SQL.format(v=v, n=n)).fetchone()[0]
    assert got == adaptive_shingle_width(n, v), f"vocab={v} n_docs={n}"


# --- SemDeDup occupancy bound: split fires + Spark/SQL equivalence -----------
# At fixture scale no cluster exceeds SEMDEDUP_OCC_BOUND (max occupancy
# 43 at sf0.01, k=16), so the registered entries alone never exercise the
# sub-split. These tests inflate the corpus (x16 replication with offset
# vec_ids) until clusters DO exceed the bound, then pin the Spark
# operator to the SAME oracle SQL the registered entry ships, run over an
# identically-inflated DuckDB view.
_INFLATE = 16
_OFFSET = 1_000_000


def test_occupancy_split_width_matches_duckdb():
    from iceberg_benchmark_java_spark.operators.similarity import (
        SEMDEDUP_OCC_BOUND,
        SEMDEDUP_SPLIT_MAX_E,
    )

    caps = ", ".join(
        str(SEMDEDUP_OCC_BOUND << i) for i in range(SEMDEDUP_SPLIT_MAX_E + 1)
    )
    for occ in [1, 63, 64, 65, 128, 129, 344, 4096, 10**9]:
        got = duckdb.sql(
            f"SELECT len(list_filter([{caps}]::BIGINT[], c -> c < {occ}))"
        ).fetchone()[0]
        # smallest e with occ <= bound * 2^e
        e = 0
        while (SEMDEDUP_OCC_BOUND << e) < occ:
            e += 1
        assert got == min(e, SEMDEDUP_SPLIT_MAX_E + 1), f"occ={occ}"


@pytest.mark.medium
def test_semantic_dedup_occupancy_split_vs_oracle(spark, duck):
    """Inflated corpus drives clusters past SEMDEDUP_OCC_BOUND so the
    sign-bit sub-split actually fires; Spark operator output must equal
    the registered oracle SQL over the same inflated view."""
    from pyspark.sql import functions as F

    from tools.check_correctness import compare
    from iceberg_benchmark_java_spark.operators import similarity
    from iceberg_benchmark_java_spark.queries.pipeline import (
        _duck_ivf_oracle,
        _semdedup_final,
    )
    from tests.conftest import SF_SMOKE

    base = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    inflated = base.crossJoin(
        spark.range(_INFLATE).select(F.col("id").alias("_r"))
    ).select(
        (F.col("vec_id") + F.col("_r") * _OFFSET).alias("vec_id"), "embedding"
    )
    # the split must actually fire: some cluster past the bound
    _, assign = similarity.ivf_assignments(inflated, 16)
    max_occ = (
        assign.groupBy("cent_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_occ > similarity.SEMDEDUP_OCC_BOUND, (
        f"test corpus too small to exercise the split (max occ {max_occ})"
    )
    sdf = similarity.semantic_dedup(
        inflated, n_centroids=16, threshold=0.2
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW embeddings AS
        SELECT vec_id + r * {_OFFSET} AS vec_id, embedding
        FROM read_parquet('{SF_SMOKE}/embeddings.parquet'),
             UNNEST(generate_series(0, {_INFLATE - 1})) t(r)"""
    )
    ddf = con.sql(_duck_ivf_oracle(0, _semdedup_final("4"))).df()
    errs = compare("semantic_dedup_occ_split", sdf, ddf)
    assert not errs, "; ".join(errs)


@pytest.mark.medium
def test_banded_rp_route_matches_duckdb(spark):
    """The lifted dial's route: banded near-dup at a FORCED 20-bit width
    (> BANDED_SLICE_MAX_BITS, so buckets come from the random-hyperplane
    kernel) must hash-match the DuckDB replay of the same fixed-point
    weight mix — proving the >16-bit territory the adaptive dial reaches
    past ~2M vectors is deterministic, not just available. The corpus is
    x4-replica-inflated: honest 20-bit hyperplane buckets only collide
    for near-identical vectors (per-bit agreement is 1 - angle/pi), and
    the base fixture has none — exact replicas guarantee a non-empty,
    hash-comparable candidate set."""
    from pyspark.sql import functions as F

    from tools.check_correctness import compare
    from iceberg_benchmark_java_spark.operators.similarity import (
        cosine_near_dup_pairs_banded,
    )
    from iceberg_benchmark_java_spark.queries.pipeline import (
        _duck_cos,
        _duck_rp_bucket,
    )
    from tests.conftest import SF_SMOKE

    base = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb = base.crossJoin(
        spark.range(4).select(F.col("id").alias("_r"))
    ).select(
        (F.col("vec_id") + F.col("_r") * _OFFSET).alias("vec_id"), "embedding"
    )
    sdf = cosine_near_dup_pairs_banded(
        emb, threshold=0.25, n_bits=20, n_bands=4
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW embeddings AS
        SELECT vec_id + r * {_OFFSET} AS vec_id, embedding
        FROM read_parquet('{SF_SMOKE}/embeddings.parquet'),
             UNNEST(generate_series(0, 3)) t(r)"""
    )
    ddf = con.sql(f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
               FROM embeddings),
    bands AS (
      SELECT vec_id, t.b AS band_idx,
             {_duck_rp_bucket("t.b", "20")} AS bucket
      FROM e, UNNEST(generate_series(0, 3)) AS t(b)),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id)
    SELECT c.vec_a, c.vec_b, {_duck_cos("ea.ee", "eb.ee")} AS sim
    FROM cand c
    JOIN e ea ON ea.vec_id = c.vec_a
    JOIN e eb ON eb.vec_id = c.vec_b
    WHERE {_duck_cos("ea.ee", "eb.ee")} >= 0.25
    """).df()
    assert len(ddf) > 0, "degenerate test: no RP candidate pairs at 20 bits"
    errs = compare("banded_rp_20bits", sdf, ddf)
    assert not errs, "; ".join(errs)


def test_rp_literal_route_equals_runtime_hash_route(spark):
    """sign_bucket_rp has two evaluation routes — driver-built literal
    weight arrays (the fast registered path; `dim` known) and the
    original per-element runtime hash mix (`dim=None` fallback). They
    must emit IDENTICAL buckets for every vector, band, and width,
    otherwise the round-8 optimization silently changed results."""
    from pyspark.sql import functions as F

    from iceberg_benchmark_java_spark.operators.similarity import (
        sign_bucket_rp,
    )
    from tests.conftest import SF_SMOKE

    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(80)
    )
    dim = len(emb.first()["embedding"])
    checks = emb.select(
        *[
            (
                sign_bucket_rp(F.col("embedding"), b, nb, dim=dim)
                == sign_bucket_rp(F.col("embedding"), b, nb)
            ).alias(f"eq_{b}_{nb}")
            for b in (0, 3)
            for nb in (17, 20, 32)
        ]
    )
    bad = checks.filter(~F.expr(" AND ".join(c for c in checks.columns)))
    assert bad.count() == 0, "literal and runtime RP routes disagree"


def test_rp_bucket_bit_balance_and_decorrelation():
    """Hyperplane signs must be roughly balanced per bit (each added bit
    halves expected occupancy) AND pairwise decorrelated — the first
    (multiplicative-only) weight mix was balanced per bit yet 0.99
    inter-bit correlated, because t·A for adjacent bits differs by a
    near-constant: buckets had ~15 effective bits of entropy and the
    x100 candidate stage blew up 380×. The xorshift rounds exist to
    break exactly that, so both properties are pinned here."""
    import numpy as np
    import pandas as pd

    from iceberg_benchmark_java_spark.operators.similarity import (
        RP_BIT_STRIDE,
        RP_DIM_STRIDE,
        RP_MASK_31,
        RP_MULT_1,
        RP_MULT_2,
    )

    def wmix(t):
        h = (t * RP_MULT_1) & RP_MASK_31
        h = h ^ (h >> 15)
        h = (h * RP_MULT_2) & RP_MASK_31
        h = h ^ (h >> 13)
        return (h & 131071) - 65536

    from tests.conftest import SF_SMOKE

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    fx = np.floor(X * 1_000_000).astype(np.int64)
    n, d = fx.shape
    bits = np.zeros((n, 24), dtype=np.float64)
    for j in range(24):
        t = (0 * RP_BIT_STRIDE + j) * RP_DIM_STRIDE + np.arange(
            d, dtype=np.int64
        )
        bits[:, j] = (fx @ wmix(t)) >= 0
        frac = bits[:, j].mean()
        assert 0.2 <= frac <= 0.8, f"bit {j} skewed: {frac}"
    corr = np.corrcoef(bits.T)
    np.fill_diagonal(corr, 0)
    assert np.abs(corr).max() < 0.6, (
        f"inter-bit correlation {np.abs(corr).max():.3f} — hyperplanes "
        f"not independent; bucket entropy collapses at scale"
    )
