"""Skew-handling utilities: salting for hot keys.

AQE's skew-join handling (spark.sql.adaptive.skewJoin, on by default in
session.py) covers sort-merge joins at runtime; these utilities cover the
two cases AQE does not: aggregation skew concentrated in a few groups, and
broadcast-infeasible joins against a replicable build side. Both are pure
DataFrame transformations — deterministic results, any partitioning.

Salting math: a hot key k spread over S salts turns one reducer processing
|k| rows into S reducers processing |k|/S — the straggler bound drops
linearly in S at the cost of an S-way replication (join) or a second
aggregation stage (agg).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt(n_salts: int) -> Column:
    """Deterministic-per-row-content salt would re-skew identical rows, so
    use a uniform row-position salt: monotonically_increasing_id is unique
    per row, and pmod spreads it evenly. (Any per-row value works — the
    salt only needs to partition rows of one key evenly; correctness never
    depends on its value.)"""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 aggregates on (keys + salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 re-aggregates the S partials per key.
    ``aggs`` maps output column name → ``(kind, expr)`` where ``kind`` names
    the *decomposable* aggregate ("sum" | "count" | "min" | "max") and
    ``expr`` is the stage-1 aggregate expression. The kind is explicit —
    inferring it from the expression's string form is unsound (e.g.
    ``count(DISTINCT x)`` renders like a count but its partials must NOT be
    summed) and relies on private APIs that break under Spark Connect.
    DISTINCT aggregates are rejected; use :func:`salted_count_distinct`.

    Note Spark's hash aggregate already does map-side partial aggregation,
    which de-skews most cases for free; explicit salting matters when the
    partial state itself is large or the combine ratio is poor.
    """
    stage2 = {
        "sum": F.sum,
        "count": F.sum,  # partial counts re-aggregate by summing
        "min": F.min,
        "max": F.max,
    }
    partial_cols = []
    final_cols = []
    for i, (out_name, (kind, expr)) in enumerate(aggs.items()):
        kind = kind.lower()
        if kind not in stage2:
            raise ValueError(
                f"{out_name}: only decomposable aggregates "
                f"({sorted(stage2)}) can be salted; got {kind!r}. "
                "For count-distinct use salted_count_distinct()."
            )
        pname = f"__p{i}"
        partial_cols.append(expr.alias(pname))
        final_cols.append(stage2[kind](pname).alias(out_name))
    return (
        df.withColumn(SALT_COL, _salt(n_salts))
        .groupBy(*keys, SALT_COL)
        .agg(*partial_cols)
        .groupBy(*keys)
        .agg(*final_cols)
    )


def salted_count_distinct(
    df: DataFrame, keys: Sequence[str], col: str, out_name: str = "n_distinct"
) -> DataFrame:
    """Skew-safe exact count-distinct: shuffle 1 dedupes on (keys, value) —
    a hot group key spreads over its distinct values, so no reducer sees
    more than one (key, value) pair's worth of state; shuffle 2 counts the
    surviving rows per key (at most |distinct values| rows per key, tiny).
    This is the correct decomposition that summing per-salt
    ``countDistinct`` partials silently gets wrong (a value seen under two
    salts would be counted twice)."""
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.col(col)).alias(out_name))
    )


def salted_join(
    skewed: DataFrame,
    replicated: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed probe side, replicate the other
    side once per salt, join on (keys + salt).

    For when the build side is too big to broadcast but cheap to replicate
    S times (S ≪ shuffle width). The hot key's probe rows land on S
    reducers instead of one. Row-multiplicity semantics are identical to
    the plain join — each probe row matches exactly the same build rows,
    under exactly one salt value.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # right/full would see each replicated build row as n_salts
        # distinct unmatched rows — semantics break; keep probe-side joins.
        raise ValueError(f"salted_join supports probe-side joins only, got {how}")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    build = replicated.select("*", salts)
    probe = skewed.withColumn(SALT_COL, _salt(n_salts))
    return probe.join(build, [*on, SALT_COL], how).drop(SALT_COL)


def global_rank(df: DataFrame, *order: Column) -> DataFrame:
    """Dense global 1-based rank WITHOUT a single-partition window — the
    partition-offset (zipWithIndex) decomposition, shared by the SNM
    blocking key sort (dedup.sorted_neighborhood_pairs) and the Zipf
    vocabulary rank (pipe_zipf_slope):

    1. range-repartition on the total order (each range partition holds a
       contiguous rank span, bounded at ~N/partitions rows),
    2. row_number WITHIN each range partition (window partitioned by
       spark_partition_id — never the whole frame on one task),
    3. add each partition's broadcast offset = count of rows in earlier
       ranges (a triangular self-join over the tiny per-partition counts).

    The sorted frame is localCheckpoint'd once so the counts branch and
    the rank branch read the SAME materialized partitioning — otherwise
    the two branches could range-sample differently and offsets would
    lie. ``order`` must be a total order (add a unique tiebreak column)
    or equal rows get arbitrary-but-consistent distinct ranks. Appends
    column ``rnk``; zero single-partition stages (plan-asserted in
    tests/test_plans.py for both call sites)."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    try:  # "auto" is a legal value under some AQE configs
        n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 2)
    except ValueError:
        n_parts = 32
    srt = (
        df.repartitionByRange(n_parts, *order)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pc = srt.groupBy("pid").agg(F.count("*").alias("pn"))
    a, b = pc.alias("a"), pc.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.coalesce(F.sum("b.pn"), F.lit(0)).alias("off"))
    )
    w_in = Window.partitionBy("pid").orderBy(*order)
    return (
        srt.withColumn("r_in", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "pid")
        .withColumn("rnk", F.col("r_in") + F.col("off"))
        .drop("pid", "r_in", "off")
    )


def quantile_buckets(
    df: DataFrame, col: str, n_buckets: int = 4, relative_error: float = 0.01
) -> DataFrame:
    """Scale path for global NTILE: approxQuantile cutoffs (Greenwald-Khanna
    sketch, driver gets n-1 numbers) + a bucket expression — no global
    sort, no single-partition window (cf. win_ntile_quartiles' scale
    note). Adds a ``bucket`` column in 1..n_buckets; bucket sizes are
    approximately equal within the sketch's relative_error."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.approxQuantile(col, probs, relative_error)
    bucket = F.lit(1)
    for c in cuts:
        bucket = bucket + F.when(F.col(col) > F.lit(c), 1).otherwise(0)
    return df.withColumn("bucket", bucket.cast("int"))


# --- data layout: Z-order (Morton) clustering for min/max file skipping ------
def interleave_bits(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    non-negative int columns — x at even positions, y at odd. Pure integer
    JVM arithmetic (the contributions occupy disjoint bits, so addition
    is bitwise OR); engine-portable, so oracles replay it verbatim."""
    z = F.lit(0)
    for k in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, k).bitwiseAND(F.lit(1)), 2 * k)
            + F.shiftleft(F.shiftright(y, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        )
    return z


def layout_pruning_report(
    df: DataFrame,
    x: Column,
    y: Column,
    box: tuple[int, int, int, int],
    n_buckets: int = 64,
    bits: int = 8,
) -> DataFrame:
    """Measured file-skipping effectiveness of Z-ORDER vs LINEAR layout for
    a 2-D box predicate — the data-layout decision that dominates scan
    cost at 100 TB (Iceberg/Delta sort orders; the reference's partition
    spec serves the same role for its date column).

    Both layouts assign each row to one of ``n_buckets`` "files" by VALUE
    RANGE (no global sort, no shuffle beyond two tiny bucket aggregates):
    z-order buckets on the Morton key (→ 2-D tiles), linear buckets on x
    alone (→ stripes). Per bucket, the min/max footer stats both table
    formats keep; a bucket is SCANNED iff its [min,max] envelope on BOTH
    dims overlaps the box — exactly the pruning a reader performs. Out,
    per layout: bucket/row counts, scanned counts, frac_scanned, and
    read_amplification = rows_scanned / rows_matched (the I/O multiplier
    the layout costs you; 1.0 = perfect clustering)."""
    x_lo, x_hi, y_lo, y_hi = box
    pts = df.select(x.alias("x"), y.alias("y"))
    z_step = (4**bits) // n_buckets
    x_step = (2**bits) // n_buckets
    both = pts.select(
        F.lit("zorder").alias("layout"),
        (interleave_bits(F.col("x"), F.col("y"), bits) / F.lit(z_step))
        .cast("long")
        .alias("bucket"),
        "x",
        "y",
    ).unionAll(
        pts.select(
            F.lit("linear").alias("layout"),
            (F.col("x") / F.lit(x_step)).cast("long").alias("bucket"),
            "x",
            "y",
        )
    )
    buckets = both.groupBy("layout", "bucket").agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.count("*").alias("n_rows"),
    )
    scanned = (
        (F.col("max_x") >= x_lo)
        & (F.col("min_x") <= x_hi)
        & (F.col("max_y") >= y_lo)
        & (F.col("min_y") <= y_hi)
    )
    matched = pts.filter(
        F.col("x").between(x_lo, x_hi) & F.col("y").between(y_lo, y_hi)
    ).agg(F.count("*").alias("rows_matched"))
    return (
        buckets.groupBy("layout")
        .agg(
            F.count("*").alias("n_partitions"),
            F.sum(F.when(scanned, 1).otherwise(0)).alias("n_scanned"),
            F.sum("n_rows").alias("rows_total"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0)).alias(
                "rows_scanned"
            ),
        )
        .crossJoin(F.broadcast(matched))
        .select(
            "layout",
            "n_partitions",
            "n_scanned",
            "rows_total",
            "rows_scanned",
            "rows_matched",
            F.round(F.col("n_scanned") / F.col("n_partitions"), 6).alias(
                "frac_scanned"
            ),
            F.when(
                F.col("rows_matched") > 0,
                F.round(F.col("rows_scanned") / F.col("rows_matched"), 6),
            ).alias("read_amplification"),  # NULL when the box matches nothing
        )
    )


# --- anti-entropy: merkle-style bucket digests for snapshot diff -------------
def bucket_digest(
    df: DataFrame, key: Column, payload: Column, n_buckets: int = 64
) -> DataFrame:
    """Per-bucket content summary of a snapshot: rows are hash-assigned to
    ``n_buckets`` buckets by key (operators/text.shard_of — md5-based,
    engine-portable), and each bucket folds to (row count, order-independent
    digest sum). The digest is each row's md5 60-bit value reduced mod 2^31
    before summing, so the BIGINT sum cannot overflow below ~4B rows per
    bucket in any engine. One narrow scan + one tiny aggregate."""
    from .text import shard_of

    h60 = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    return (
        df.select(
            shard_of(key, n_buckets).alias("bucket"),
            F.pmod(h60, F.lit(2_147_483_648)).alias("h31"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"), F.sum("h31").alias("digest"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: Column,
    payload: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """Merkle-style snapshot comparison: bucket digests of both sides,
    full-outer-joined on bucket, with a per-bucket verdict — the
    anti-entropy primitive that turns "did anything change between these
    two 100 TB snapshots, and WHERE?" into two narrow scans plus a
    64-row join, instead of a full-table equi-join. Buckets flagged
    ``differ``/``only_*`` are the only ones a re-sync or audit must
    re-read (n_buckets dials the re-read granularity). Out: (bucket,
    n_old, n_new, digest_old, digest_new, status)."""
    a = bucket_digest(old, key, payload, n_buckets).select(
        "bucket",
        F.col("n_rows").alias("n_old"),
        F.col("digest").alias("digest_old"),
    )
    b = bucket_digest(new, key, payload, n_buckets).select(
        "bucket",
        F.col("n_rows").alias("n_new"),
        F.col("digest").alias("digest_new"),
    )
    j = a.join(b, "bucket", "full_outer")
    status = (
        F.when(F.col("n_old").isNull(), "only_new")
        .when(F.col("n_new").isNull(), "only_old")
        .when(
            (F.col("n_old") == F.col("n_new"))
            & (F.col("digest_old") == F.col("digest_new")),
            "match",
        )
        .otherwise("differ")
    )
    return j.select(
        "bucket", "n_old", "n_new", "digest_old", "digest_new",
        status.alias("status"),
    )
