"""Similarity search over an embedding column (array<float>).

Two paths, mirroring how ANN is deployed on large corpora:

- ``cosine_topk_bruteforce`` — exact baseline: query-set × corpus join with
  a JVM-side fold for the dot product. Correct at any scale but O(Q×N);
  use for small query sets / golden evaluation.
- ``cosine_topk_lsh``        — the scale path: sign-LSH bucketing (the sign
  bits of leading dimensions form the bucket key), candidates restricted to
  the query's bucket, exact re-rank within. One equi-join on the bucket key
  instead of a cross join.

Determinism: embeddings are float32; all arithmetic is promoted to double
(exact promotion), the sequential fold order is fixed by array order, and
similarities are rounded to 6dp with doc-id tie-breaks — so top-k sets are
stable across engines and partitionings.

No Python UDFs: dot products use F.zip_with + F.aggregate (Catalyst
HigherOrderFunctions, whole-stage codegen'd).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIM_SCALE = 6


def _dot(a: Column, b: Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``embeddings``: (vec_id, embedding); ``queries``: (query_id, q_embedding).
    Returns (query_id, vec_id, sim, rnk). Self-matches excluded.
    """
    joined = queries.crossJoin(embeddings).filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_embedding"), F.col("embedding")), SIM_SCALE).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "sim", "rnk")
    )


def sign_bucket(emb: Column, n_bits: int = 8) -> Column:
    """Sign-LSH bucket key: concatenated sign bits of the first n_bits dims.

    A degenerate but deterministic random-hyperplane LSH (hyperplanes =
    coordinate axes). At 100 TB: compute once, store as a partition column,
    and ANN queries prune to one bucket."""
    bits = F.transform(
        F.slice(emb, 1, n_bits),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def ivf_assignments(
    embeddings: DataFrame, n_centroids: int = 16, refine_iters: int = 0
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: deterministic centroids + nearest-centroid
    assignment.

    Centroids are the first ``n_centroids`` vectors by vec_id — a
    deterministic seeding; ``refine_iters > 0`` runs that many distributed
    Lloyd's iterations (:func:`kmeans_refine`) before assignment.
    Assignment is argmax cosine, ties to the lowest cent_id.

    At 100 TB: centroids are a broadcast table; assignment is a single
    O(N×C) map-side pass (no shuffle of the corpus); the assignment would
    be persisted as a partition column so queries prune to probed lists.
    Returns (centroids, assignments).
    """
    w_cent = Window.orderBy("vec_id")
    centroids = (
        embeddings.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            (F.row_number().over(w_cent) - 1).alias("cent_id"),
            F.col("embedding").alias("c_emb"),
        )
    )
    if refine_iters:
        centroids = kmeans_refine(embeddings, centroids, n_iters=refine_iters)
    scored = embeddings.select("vec_id", "embedding").crossJoin(
        F.broadcast(centroids)
    ).select(
        "vec_id",
        "embedding",
        "cent_id",
        F.round(cosine(F.col("embedding"), F.col("c_emb")), SIM_SCALE).alias("csim"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    assignments = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cent_id")
    )
    return centroids, assignments


def kmeans_refine(
    embeddings: DataFrame, centroids: DataFrame, n_iters: int = 2
) -> DataFrame:
    """Lloyd's-iteration refinement of IVF centroids, fully distributed:

    per iteration — (1) assign every vector to its nearest centroid
    (broadcast centroids, map-side argmax-cosine: no corpus shuffle);
    (2) recompute each centroid as the element-wise mean of its members
    (posexplode → groupBy (cent_id, dim) avg → rebuild array). Empty
    clusters keep their previous centroid. At 100 TB each iteration costs
    one broadcast pass + one (cent_id, dim)-key aggregation whose
    cardinality is C×D — tiny — so iterations are scan-bound, the same
    cost profile as MLlib's KMeans.

    Returns refined centroids (cent_id, c_emb) with c_emb array<double>.
    Refined centroids feed ivf_assignments/cosine_topk_ivf unchanged: the
    index structure is identical, only list balance/recall improves.
    """
    cents = centroids.select(
        "cent_id", F.transform("c_emb", lambda x: x.cast("double")).alias("c_emb")
    )
    for _ in range(n_iters):
        scored = embeddings.select("vec_id", "embedding").crossJoin(
            F.broadcast(cents)
        ).select(
            "vec_id",
            "embedding",
            "cent_id",
            F.round(cosine(F.col("embedding"), F.col("c_emb")), SIM_SCALE).alias("csim"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "cent_id")
        )
        means = (
            assigned.select(
                "cent_id", F.posexplode(F.col("embedding")).alias("pos", "val")
            )
            .groupBy("cent_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("mv"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                    lambda s: s.getField("mv"),
                ).alias("new_emb")
            )
        )
        cents = (
            cents.join(means, "cent_id", "left")
            .select(
                "cent_id",
                F.coalesce(F.col("new_emb"), F.col("c_emb")).alias("c_emb"),
            )
        )
    return cents


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-style ANN: nearest-centroid inverted lists, query probes the
    ``n_probe`` closest lists, exact cosine re-rank inside.

    The candidate set is bounded by the probed lists (≈ N·n_probe/C rows
    per query) instead of the corpus — the standard recall/latency dial.
    Join shape: broadcast(queries × probes) ⋈ assignments on cent_id.
    ``refine_iters``: k-means refinement passes for the centroids.
    """
    centroids, assignments = ivf_assignments(embeddings, n_centroids, refine_iters)
    q_scored = queries.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "q_embedding",
        "cent_id",
        F.round(cosine(F.col("q_embedding"), F.col("c_emb")), SIM_SCALE).alias("csim"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_embedding", "cent_id")
    )
    cand = probes.join(assignments, "cent_id").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_embedding"), F.col("embedding")), SIM_SCALE).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "sim", "rnk")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.25, n_bits: int = 8
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: self-join restricted to
    the sign-LSH bucket, exact cosine inside, keep pairs ≥ threshold.

    The dedup twin of ``cosine_topk_lsh``: instead of per-query top-k it
    yields all high-similarity pairs (vec_id < vec_id2 canonical order) for
    a downstream keep-one policy. At 100 TB: one shuffle on the bucket key;
    within-bucket pair counts are quadratic in bucket size, so raise
    ``n_bits`` (more, smaller buckets) as the corpus grows, or band over
    multiple sign-bit slices for recall like MinHash-LSH.
    """
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        sign_bucket(F.col("embedding"), n_bits).alias("bucket"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        sign_bucket(F.col("embedding"), n_bits).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), SIM_SCALE).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def cosine_topk_lsh(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 8
) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign bucket; exact cosine
    re-rank inside the bucket. Recall < 1.0 by design — the oracle defines
    the same bucketed semantics, so results are exactly comparable."""
    emb_b = embeddings.withColumn("bucket", sign_bucket(F.col("embedding"), n_bits))
    q_b = queries.withColumn("bucket", sign_bucket(F.col("q_embedding"), n_bits))
    joined = q_b.join(emb_b, "bucket").filter(F.col("query_id") != F.col("vec_id"))
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_embedding"), F.col("embedding")), SIM_SCALE).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "sim", "rnk")
    )
