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
