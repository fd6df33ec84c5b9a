"""Aggregation operators (SURVEY §2-B "Aggregations").

ROLLUP with GROUPING(), re-aggregation of aggregates, count(DISTINCT),
stddev_samp coefficient-of-variation, SELECT DISTINCT, the 48-CASE pivot
shape, and the N-way scalar cross join — each cited to its corpus source.

Scale notes: ROLLUP in Spark is a single Expand+HashAggregate — one shuffle
for all grouping sets. The scalar cross joins at the end combine 1-row
aggregates (BroadcastNestedLoopJoin over single rows — constant cost at any
data scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import dsum, sql_dsum
from .registry import query


# --- ROLLUP + GROUPING() (tpcds/q22.sql:14, q18.sql:32, SURVEY §2-B) ---------
@query(
    "agg_rollup_grouping",
    oracle=f"""
    SELECT COALESCE(r.r_name, '__ALL__') AS region,
           COALESCE(n.n_name, '__ALL__') AS nation,
           CAST(GROUPING(r.r_name) AS INTEGER) + CAST(GROUPING(n.n_name) AS INTEGER)
             AS lvl,
           {sql_dsum("s.s_acctbal", "total_bal")},
           CAST(COUNT(*) AS BIGINT) AS n_supp
    FROM supplier s, nation n, region r
    WHERE s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP with GROUPING() markers (tpcds/q22.sql:14 rollup,
    tpcds/q36.sql:6 grouping-function usage). NULL group keys from the
    rollup are COALESCEd to a sentinel so they are distinguishable from
    data NULLs in the hash-compare."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name").cast("int") + F.grouping("n_name").cast("int")).alias("lvl"),
            dsum("s_acctbal", "total_bal"),
            F.count("*").alias("n_supp"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("__ALL__")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("__ALL__")).alias("nation"),
            "lvl",
            "total_bal",
            "n_supp",
        )
    )


# --- rank over GROUPING keys on a rollup (tpcds/q86.sql:6) -------------------
@query(
    "agg_rollup_grouping_window",
    oracle=f"""
    WITH results AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(GROUPING(r.r_name) AS INTEGER) AS g_region,
             CAST(GROUPING(n.n_name) AS INTEGER) AS g_nation,
             {sql_dsum("c.c_acctbal", "total_bal")}
      FROM customer c, nation n, region r
      WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      GROUP BY ROLLUP (r.r_name, n.n_name)
    )
    SELECT COALESCE(region, '__ALL__') AS region,
           COALESCE(nation, '__ALL__') AS nation,
           total_bal,
           CAST(RANK() OVER (
             PARTITION BY g_region + g_nation,
                          CASE WHEN g_nation = 0 THEN region END
             ORDER BY total_bal DESC, nation NULLS FIRST) AS INTEGER) AS rank_within_parent
    FROM results
    """,
)
def rollup_grouping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() partitioned by GROUPING() expressions computed over a ROLLUP —
    the q36/q70/q86 lineage shape (tpcds/q86.sql:4-24): rank of each nation
    within its parent region level."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    results = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            dsum("c_acctbal", "total_bal"),
        )
    )
    w = Window.partitionBy(
        F.col("g_region") + F.col("g_nation"),
        F.when(F.col("g_nation") == 0, F.col("r_name")),
    ).orderBy(F.desc("total_bal"), F.asc_nulls_first("n_name"))
    return results.select(
        F.coalesce(F.col("r_name"), F.lit("__ALL__")).alias("region"),
        F.coalesce(F.col("n_name"), F.lit("__ALL__")).alias("nation"),
        "total_bal",
        F.rank().over(w).cast("int").alias("rank_within_parent"),
    )


# --- stddev_samp / coefficient of variation (tpcds/q39_1.sql:10-31) ----------
@query(
    "agg_stddev_cov",
    oracle="""
    WITH stats AS (
      SELECT l_partkey AS partkey,
             ROUND(STDDEV_SAMP(l_quantity), 6) AS stdev,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mean
      FROM lineitem GROUP BY l_partkey
    )
    SELECT partkey, stdev, mean,
           CASE mean WHEN 0 THEN NULL ELSE ROUND(stdev / mean, 6) END AS cov
    FROM stats
    WHERE CASE mean WHEN 0 THEN NULL ELSE stdev / mean END > 0.5
    """,
)
def stddev_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV_SAMP + simple-CASE coefficient of variation
    (tpcds/q17.sql:7-16 stddev; tpcds/q39_1.sql:10,31 simple CASE on mean).

    stddev over doubles is near-deterministic here because each l_partkey
    group is small and single-partition after the shuffle; rounded to 6dp
    on both sides (quantities are small integers, so the 6th decimal of the
    stddev is far from any rounding boundary)."""
    l = load_table(spark, sf_dir, "lineitem")
    stats = l.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("stdev"),
        (F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double") / F.count("*")).alias(
            "mean"
        ),
    )
    cov_raw = F.when(F.col("mean") == 0, F.lit(None)).otherwise(
        F.col("stdev") / F.col("mean")
    )
    return (
        stats.withColumn("cov", F.round(cov_raw, 6))
        .filter(cov_raw > 0.5)
        .select("partkey", "stdev", "mean", "cov")
    )


# --- 12-bucket conditional pivot (tpcds/q66.sql:57-94 shape) -----------------
@query(
    "agg_monthly_pivot",
    oracle="""
    SELECT l_suppkey AS suppkey,
    """
    + ",\n".join(
        "CAST(ROUND(SUM(CAST(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = {m} "
        "THEN l_extendedprice ELSE 0 END AS DECIMAL(18,4))), 2) AS DOUBLE) AS m{m:02d}_sales".format(m=m)
        for m in range(1, 13)
    )
    + """
    FROM lineitem
    WHERE EXTRACT(YEAR FROM l_shipdate) = 1998
    GROUP BY l_suppkey
    """,
)
def monthly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-month sum(CASE) pivot per supplier — the 48-CASE shape of
    tpcds/q66.sql:57-94 (sum(CASE WHEN month THEN metric ELSE 0)).
    Done with sum(when), NOT groupBy().pivot(), per SURVEY §2-B note —
    a single hash aggregate, one shuffle, map-side combinable."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1998)
    aggs = [
        F.round(
            F.sum(
                F.when(F.month("l_shipdate") == m, F.col("l_extendedprice"))
                .otherwise(0)
                .cast("decimal(18,4)")
            ),
            2,
        )
        .cast("double")
        .alias(f"m{m:02d}_sales")
        for m in range(1, 13)
    ]
    return l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(*aggs)


# --- re-aggregation of aggregates (tpcds/q23_1.sql:18-33) --------------------
@query(
    "agg_reaggregation",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, {sql_dsum("o_totalprice", "cust_sales")}
      FROM orders GROUP BY o_custkey
    )
    SELECT ROUND(MAX(cust_sales), 2) AS max_sales,
           ROUND(MIN(cust_sales), 2) AS min_sales,
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM per_cust
    """,
)
def reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max/min over a grouped sum — nested aggregation
    (tpcds/q23_1.sql:18-33 max(csales) over tpcds_cmax)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(dsum("o_totalprice", "cust_sales"))
    return per_cust.agg(
        F.round(F.max("cust_sales"), 2).alias("max_sales"),
        F.round(F.min("cust_sales"), 2).alias("min_sales"),
        F.count("*").alias("n_cust"),
    )


# --- count(DISTINCT) + HAVING on count (tpcds/q08.sql:430, tpch/q16.sql:5) ---
@query(
    "agg_count_distinct_having",
    oracle="""
    SELECT l_suppkey AS suppkey,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(DISTINCT l_partkey) > 10
    """,
)
def count_distinct_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count(DISTINCT) in one aggregate + HAVING on the count
    (tpch/q16.sql:5; tpcds/q28.sql:5-7 multi-distinct; tpcds/q08.sql:430
    HAVING count(*)). Spark plans multi-distinct via Expand — one extra
    shuffle, still fully parallel."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count("l_quantity").alias("n_lines"),
        )
        .filter(F.col("n_parts") > 10)
    )


# --- SELECT DISTINCT (tpcds/q41.sql:1) ---------------------------------------
@query(
    "agg_select_distinct",
    oracle="""
    SELECT DISTINCT p_brand AS brand, p_type AS ptype
    FROM part WHERE p_size BETWEEN 10 AND 20
    """,
)
def select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a filtered projection (tpcds/q41.sql:1,
    q38.sql:4)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_size").between(10, 20))
        .select(F.col("p_brand").alias("brand"), F.col("p_type").alias("ptype"))
        .distinct()
    )


# --- N-way scalar cross join (tpcds/q88.sql:1-162) ---------------------------
@query(
    "agg_scalar_cross_join",
    oracle="""
    SELECT h1.cnt AS h0_6, h2.cnt AS h6_12, h3.cnt AS h12_18, h4.cnt AS h18_24,
           ROUND(CAST(h1.cnt AS DOUBLE) / NULLIF(h4.cnt, 0), 6) AS night_day_ratio
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM events WHERE EXTRACT(HOUR FROM ts) >= 0  AND EXTRACT(HOUR FROM ts) < 6) h1,
         (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM events WHERE EXTRACT(HOUR FROM ts) >= 6  AND EXTRACT(HOUR FROM ts) < 12) h2,
         (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM events WHERE EXTRACT(HOUR FROM ts) >= 12 AND EXTRACT(HOUR FROM ts) < 18) h3,
         (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM events WHERE EXTRACT(HOUR FROM ts) >= 18 AND EXTRACT(HOUR FROM ts) < 24) h4
    """,
)
def scalar_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of single-row aggregates — the 8-bucket shape of
    tpcds/q88.sql:1-162 / q90.sql:1-33 (amc/pmc ratio). Four 1-row DFs
    crossJoined → BroadcastNestedLoopJoin over single rows."""
    e = load_table(spark, sf_dir, "events")

    def bucket(lo: int, hi: int, alias: str) -> DataFrame:
        return (
            e.filter((F.hour("ts") >= lo) & (F.hour("ts") < hi))
            .agg(F.count("*").alias(alias))
        )

    h1 = bucket(0, 6, "h0_6")
    h2 = bucket(6, 12, "h6_12")
    h3 = bucket(12, 18, "h12_18")
    h4 = bucket(18, 24, "h18_24")
    return (
        h1.crossJoin(h2)
        .crossJoin(h3)
        .crossJoin(h4)
        .select(
            "h0_6",
            "h6_12",
            "h12_18",
            "h18_24",
            F.round(
                F.col("h0_6").cast("double") / F.nullif(F.col("h18_24"), F.lit(0)), 6
            ).alias("night_day_ratio"),
        )
    )


# --- GROUP BY expression (tpcds/q23_1.sql:15, tpch/q22.sql:32) ---------------
@query(
    "agg_group_by_expression",
    oracle="""
    SELECT SUBSTR(c_name, 16, 2) AS name_prefix,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
    FROM customer
    WHERE SUBSTR(c_name, 16, 2) IN ('00', '13', '25', '31', '49')
    GROUP BY SUBSTR(c_name, 16, 2)
    """,
)
def group_by_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY on a scalar expression + substr IN-list filter — the
    country-code shape of tpch/q22.sql:8,13 (substr of an id-bearing
    string) and the substr group key of tpcds/q23_1.sql:15."""
    c = load_table(spark, sf_dir, "customer")
    prefix = F.substring("c_name", 16, 2)
    return (
        c.filter(prefix.isin("00", "13", "25", "31", "49"))
        .groupBy(prefix.alias("name_prefix"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("bal"),
        )
    )


# --- day-of-week pivot with year-over-year ratios (tpcds/q59.sql) ------------
@query(
    "agg_weekly_pivot_yoy",
    oracle="""
    WITH weekly AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
             CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 0 THEN
               CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS sun_sales,
             CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 1 THEN
               CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS mon_sales,
             CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 6 THEN
               CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS sat_sales
      FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate))
    SELECT w1.yr AS yr, w2.yr AS next_yr,
           ROUND(w2.sun_sales / NULLIF(w1.sun_sales, 0), 4) AS sun_ratio,
           ROUND(w2.mon_sales / NULLIF(w1.mon_sales, 0), 4) AS mon_ratio,
           ROUND(w2.sat_sales / NULLIF(w1.sat_sales, 0), 4) AS sat_ratio
    FROM weekly w1, weekly w2 WHERE w2.yr = w1.yr + 1
    """,
)
def weekly_pivot_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week sum(CASE) pivot self-joined across consecutive years for
    ratio columns (tpcds/q59.sql:6-12 pivot, :44-52 period self-join).
    DuckDB dayofweek is 0=Sunday vs Spark dayofweek 1=Sunday — the Spark
    side maps (dayofweek-1) to align. Exact decimal sums feed plain double
    division, rounded at 4dp on both engines."""
    o = load_table(spark, sf_dir, "orders")

    def day_sum(dow_duck: int, alias: str):
        # Spark dayofweek: 1=Sunday ... 7=Saturday; duck: 0=Sunday.
        return (
            F.sum(
                F.when(
                    F.dayofweek("o_orderdate") - 1 == dow_duck,
                    F.col("o_totalprice").cast("decimal(18,4)"),
                ).otherwise(F.lit(0).cast("decimal(18,4)"))
            )
            .cast("double")
            .alias(alias)
        )

    weekly = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        day_sum(0, "sun_sales"), day_sum(1, "mon_sales"), day_sum(6, "sat_sales")
    )
    w1 = weekly.alias("w1")
    w2 = weekly.alias("w2")

    def ratio(col: str, alias: str):
        return F.round(
            F.col(f"w2.{col}") / F.nullif(F.col(f"w1.{col}"), F.lit(0.0)), 4
        ).alias(alias)

    return (
        w1.join(w2, F.col("w2.yr") == F.col("w1.yr") + 1)
        .select(
            F.col("w1.yr").alias("yr"),
            F.col("w2.yr").alias("next_yr"),
            ratio("sun_sales", "sun_ratio"),
            ratio("mon_sales", "mon_ratio"),
            ratio("sat_sales", "sat_ratio"),
        )
    )


# --- consecutive-quarter growth self-join (tpcds/q31.sql) --------------------
@query(
    "agg_quarter_growth_selfjoin",
    oracle="""
    WITH qs AS (
      SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
             EXTRACT(QUARTER FROM o.o_orderdate) AS qtr,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sales
      FROM orders o, customer c, nation n
      WHERE o.o_custkey = c.c_custkey AND c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3)
    SELECT q1.nation AS nation, CAST(q1.yr AS BIGINT) AS yr,
           ROUND(q2.sales / q1.sales, 6) AS growth
    FROM qs q1, qs q2
    WHERE q1.nation = q2.nation AND q1.yr = q2.yr
      AND q1.qtr = 1 AND q2.qtr = 2 AND q1.sales > 0
      AND q2.sales / q1.sales > 1.0
    """,
)
def quarter_growth_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth via aggregate-CTE self-join on
    (nation, year) with a growth-rate filter (tpcds/q31.sql shape). The
    grouped CTE is small (nations x years x quarters) — both self-join
    sides broadcastable at any fact scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    qs = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("sales")
        )
    )
    q1 = qs.filter((F.col("qtr") == 1) & (F.col("sales") > 0)).alias("q1")
    q2 = qs.filter(F.col("qtr") == 2).alias("q2")
    return (
        q1.join(
            q2,
            (F.col("q1.nation") == F.col("q2.nation"))
            & (F.col("q1.yr") == F.col("q2.yr")),
        )
        .filter(F.col("q2.sales") / F.col("q1.sales") > 1.0)
        .select(
            F.col("q1.nation").alias("nation"),
            F.col("q1.yr").cast("long").alias("yr"),
            F.round(F.col("q2.sales") / F.col("q1.sales"), 6).alias("growth"),
        )
    )


# --- CUBE (full grouping lattice; beyond-reference breadth) ------------------
@query(
    "agg_cube_status_priority",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '__ALL__') AS status,
           COALESCE(o_orderpriority, '__ALL__') AS priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) * 2
             + CAST(GROUPING(o_orderpriority) AS INTEGER) AS g,
           {sql_dsum("o_totalprice", "total_price")},
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — the full 2^k grouping lattice (ROLLUP's superset;
    the reference corpus stops at ROLLUP). Same Expand-based plan shape as
    rollup: one shuffle, 4 grouping sets. GROUPING() bits disambiguate
    subtotal rows from data NULLs."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus").cast("int") * 2
                + F.grouping("o_orderpriority").cast("int")
            ).alias("g"),
            dsum("o_totalprice", "total_price"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("__ALL__")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("__ALL__")).alias("priority"),
            "g",
            "total_price",
            "n_orders",
        )
    )


# --- explicit GROUPING SETS (arbitrary lattice subsets) ----------------------
@query(
    "agg_grouping_sets_mixed",
    oracle=f"""
    SELECT COALESCE(c_mktsegment, '__ALL__') AS segment,
           COALESCE(CAST(c_nationkey AS VARCHAR), '__ALL__') AS nation,
           {sql_dsum("c_acctbal", "total_bal")},
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — an arbitrary lattice subset that neither
    ROLLUP nor CUBE expresses: per-segment totals, per-nation totals, and
    the grand total in ONE pass (one Expand + one shuffle instead of three
    scans unioned). SQL form via spark.sql: GROUPING SETS has no DataFrame
    method, and Catalyst plans the same Expand either way."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "__ibx_gs_customer"
    )
    return spark.sql(
        """
        SELECT COALESCE(c_mktsegment, '__ALL__') AS segment,
               COALESCE(CAST(c_nationkey AS STRING), '__ALL__') AS nation,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_bal,
               COUNT(*) AS n_cust
        FROM __ibx_gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


# --- native DataFrame pivot (relational PIVOT operator) ----------------------
@query(
    "agg_native_pivot",
    oracle=f"""
    SELECT o_orderstatus AS status,
           {sql_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END", "p1_urgent")},
           {sql_dsum("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END", "p2_high")},
           {sql_dsum("CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END", "p3_medium")}
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def native_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame pivot() operator with an explicit value list (explicit
    values skip the extra distinct-scan Spark otherwise runs, and pin
    output columns — the scale-safe usage). Equivalent to CASE-sum
    pivoting (the oracle's form), planned as one hash aggregate."""
    o = load_table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2).cast("double"))
    )
    return pv.select(
        F.col("o_orderstatus").alias("status"),
        F.col("1-URGENT").alias("p1_urgent"),
        F.col("2-HIGH").alias("p2_high"),
        F.col("3-MEDIUM").alias("p3_medium"),
    )


# --- exact percentile / median aggregates ------------------------------------
@query(
    "agg_median_percentiles",
    oracle="""
    SELECT c_mktsegment AS segment,
           median(c_acctbal) AS med_bal,
           quantile_cont(c_acctbal, 0.25) AS p25_bal,
           quantile_cont(c_acctbal, 0.90) AS p90_bal,
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def median_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + linear-interpolation percentiles per group. Both
    engines define percentile as interpolation at rank (n-1)*p; the
    fixture's 2-decimal balances make (a + (b-a)*f) exact in doubles, so
    values hash-match with no rounding shim. Scale note: exact percentile
    state is O(group size) — at 100 TB use approx_percentile /
    quantile_buckets (operators.scale); this is the exact/oracle twin."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.median("c_acctbal").alias("med_bal"),
        F.percentile("c_acctbal", F.lit(0.25)).alias("p25_bal"),
        F.percentile("c_acctbal", F.lit(0.90)).alias("p90_bal"),
        F.count("*").alias("n_cust"),
    )
