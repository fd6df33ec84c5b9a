"""Window-function operators (SURVEY §2-B "Window functions" — all TPC-DS).

Covers every window shape the reference corpus exercises: global rank,
partitioned rank, window-aggregate-over-grouped-aggregate, ratio-to-report,
and the cumulative ROWS UNBOUNDED PRECEDING frame — each cited to its
TPC-DS source file.

Scale notes: a window with PARTITION BY shuffles once on the partition key
and sorts within partitions — fine at 100 TB when keys are well-distributed.
The two *global* windows here (rank with no PARTITION BY) are computed over
already-aggregated inputs (≤ thousands of rows after groupBy), never over raw
fact rows — the one place a global window is safe at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import dsum, dsum_expr, sql_dsum, sql_dsum_wide
from .registry import query


# --- rank() OVER (ORDER BY ...) — global best/worst (tpcds/q44.sql:12,40) ----
@query(
    "win_rank_global_best_worst",
    oracle=f"""
    WITH perf AS (
      SELECT l_suppkey AS suppkey, {sql_dsum_wide("l_extendedprice * (1 - l_discount)", "revenue")}
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT best.suppkey AS best_suppkey, best.rnk AS rnk, worst.suppkey AS worst_suppkey
    FROM (SELECT suppkey, RANK() OVER (ORDER BY revenue DESC, suppkey) AS rnk FROM perf) best,
         (SELECT suppkey, RANK() OVER (ORDER BY revenue ASC, suppkey) AS rnk FROM perf) worst
    WHERE best.rnk = worst.rnk AND best.rnk <= 10
    """,
)
def rank_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ascending + descending global ranks joined on rank position —
    the best/worst-performer shape of tpcds/q44.sql:1-45."""
    l = load_table(spark, sf_dir, "lineitem")
    perf = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    best = perf.select(
        F.col("suppkey").alias("best_suppkey"),
        F.rank().over(Window.orderBy(F.desc("revenue"), F.asc("suppkey"))).alias("rnk"),
    )
    worst = perf.select(
        F.col("suppkey").alias("worst_suppkey"),
        F.rank().over(Window.orderBy(F.asc("revenue"), F.asc("suppkey"))).alias("rnk"),
    )
    return (
        best.join(worst, "rnk")
        .filter(F.col("rnk") <= 10)
        .select("best_suppkey", "rnk", "worst_suppkey")
    )


# --- rank() OVER (PARTITION BY ... ORDER BY ...) (tpcds/q67.sql:14) ----------
@query(
    "win_rank_per_group",
    oracle=f"""
    WITH sales AS (
      SELECT n.n_name AS nation, c.c_custkey AS custkey,
             {sql_dsum("o.o_totalprice", "spend")}
      FROM customer c, orders o, nation n
      WHERE c.c_custkey = o.o_custkey AND c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_custkey
    )
    SELECT nation, custkey, spend, rk
    FROM (SELECT nation, custkey, spend,
                 RANK() OVER (PARTITION BY nation ORDER BY spend DESC, custkey) AS rk
          FROM sales) ranked
    WHERE rk <= 3
    """,
)
def rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition rank over a grouped aggregate, filtered to top-N per
    group (tpcds/q67.sql:6-44 shape: rank within category, keep rank<=N)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    sales = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_custkey").alias("custkey"))
        .agg(dsum("o_totalprice", "spend"))
    )
    w = Window.partitionBy("nation").orderBy(F.desc("spend"), F.asc("custkey"))
    return (
        sales.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("nation", "custkey", "spend", "rk")
    )


# --- avg(sum(x)) OVER (PARTITION BY ...) (tpcds/q53.sql:7) -------------------
@query(
    "win_avg_over_grouped_sum",
    oracle=f"""
    WITH monthly AS (
      SELECT p.p_brand AS brand,
             EXTRACT(YEAR FROM l.l_shipdate) AS yr,
             EXTRACT(MONTH FROM l.l_shipdate) AS mth,
             {sql_dsum("l.l_extendedprice", "sum_sales")}
      FROM lineitem l, part p
      WHERE l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, EXTRACT(YEAR FROM l.l_shipdate), EXTRACT(MONTH FROM l.l_shipdate)
    )
    SELECT brand, yr, mth, sum_sales,
           ROUND(AVG(sum_sales) OVER (PARTITION BY brand, yr), 6) AS avg_monthly_sales
    FROM monthly
    WHERE yr = 1998
    """,
)
def avg_over_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window aggregate stacked on a grouped aggregate — the
    avg(sum(x)) OVER (PARTITION BY ...) shape of tpcds/q53.sql:7 /
    q89.sql:12. AVG here runs over exact-decimal-derived doubles of a small
    grouped input and is rounded to 6dp on both sides."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    monthly = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mth"),
        )
        .agg(dsum("l_extendedprice", "sum_sales"))
    )
    w = Window.partitionBy("brand", "yr")
    return (
        monthly.withColumn("avg_monthly_sales", F.round(F.avg("sum_sales").over(w), 6))
        .filter(F.col("yr") == 1998)
        .select("brand", "yr", "mth", "sum_sales", "avg_monthly_sales")
    )


# --- ratio-to-report: sum(x)*100/sum(sum(x)) OVER (...) (tpcds/q98.sql:8) ----
@query(
    "win_ratio_to_report",
    oracle=f"""
    WITH by_type AS (
      SELECT p.p_type AS ptype, p.p_brand AS brand,
             {sql_dsum_wide("l.l_extendedprice * (1 - l.l_discount)", "itemrevenue")}
      FROM lineitem l, part p
      WHERE l.l_partkey = p.p_partkey
      GROUP BY p.p_type, p.p_brand
    )
    SELECT ptype, brand, itemrevenue,
           ROUND(itemrevenue * 100.0 / SUM(itemrevenue) OVER (PARTITION BY ptype), 6)
             AS revenueratio
    FROM by_type
    """,
)
def ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report via windowed total of a grouped sum
    (tpcds/q98.sql:8, q20.sql:8, q12.sql:8).

    The window SUM re-adds doubles, but its inputs are the exact decimal
    group sums and the per-partition group count is small (≤25 brands), and
    the unordered-window sum order is engine-stable; result rounded to 6dp."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    by_type = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_type").alias("ptype"), F.col("p_brand").alias("brand"))
        .agg(dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "itemrevenue"))
    )
    w = Window.partitionBy("ptype")
    return by_type.select(
        "ptype",
        "brand",
        "itemrevenue",
        F.round(F.col("itemrevenue") * 100.0 / F.sum("itemrevenue").over(w), 6).alias(
            "revenueratio"
        ),
    )


# --- cumulative frame ROWS UNBOUNDED PRECEDING (tpcds/q51.sql:6,19) ----------
@query(
    "win_cumulative_monthly",
    oracle=f"""
    WITH monthly AS (
      SELECT o_custkey AS custkey, DATE_TRUNC('month', o_orderdate) AS month,
             {sql_dsum("o_totalprice", "sales")}
      FROM orders GROUP BY o_custkey, DATE_TRUNC('month', o_orderdate)
    )
    SELECT custkey, CAST(month AS DATE) AS month, sales,
           ROUND(SUM(sales) OVER (PARTITION BY custkey ORDER BY month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cume_sales,
           ROUND(MAX(sales) OVER (PARTITION BY custkey ORDER BY month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS max_sales
    FROM monthly
    WHERE custkey <= 100
    """,
)
def cumulative_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running SUM and running MAX over an explicit
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW frame
    (tpcds/q51.sql:6,19,36-37). The frame order (custkey, month) is unique
    per partition row, so the cumulative sequence is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(dsum("o_totalprice", "sales"))
        .filter(F.col("custkey") <= 100)
    )
    w = (
        Window.partitionBy("custkey")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "custkey",
        F.col("month").cast("date").alias("month"),
        "sales",
        F.round(F.sum("sales").over(w), 6).alias("cume_sales"),
        F.round(F.max("sales").over(w), 6).alias("max_sales"),
    )


# --- lag + cumulative flag: sessionization (extension; uses events) ----------
@query(
    "win_sessionize_events",
    oracle="""
    WITH ev AS (
      -- truncate to microseconds to match Spark's timestamp precision
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
    ),
    seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
    ),
    sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM seq
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap sessions via LAG + cumulative SUM —
    a training-pipeline extension beyond the reference corpus (which uses
    no lead/lag, SURVEY §2-B windows "not present" note), expressed with
    the same windowed primitives. One shuffle on user_id serves both
    windows (same partition key)."""
    e = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # double epoch keeps sub-second precision (µs fits exactly in a double),
    # matching the oracle's INTERVAL comparison at full timestamp precision
    epoch = F.col("ts").cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(order)
    seq = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    cume = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = seq.withColumn("session_id", F.sum("new_session").over(cume))
    return sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))


# --- lead/lag order gaps (engine extension beyond reference windows) ---------
@query(
    "win_lead_lag_gaps",
    oracle="""
    SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS orderdate,
           CAST(LAG(o_orderdate) OVER w AS DATE) AS prev_orderdate,
           CAST(DATE_DIFF('day', LAG(CAST(o_orderdate AS DATE)) OVER w,
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE),
                          LEAD(CAST(o_orderdate AS DATE)) OVER w) AS BIGINT)
             AS days_to_next
    FROM orders
    WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def lead_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD inter-order gap analysis per customer — the reorder-cycle
    primitive (reference corpus has no lead/lag; SURVEY §2-B windows
    'not present' row). One shuffle on o_custkey serves both directions."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        d.alias("orderdate"),
        F.lag(d).over(w).alias("prev_orderdate"),
        F.datediff(d, F.lag(d).over(w)).cast("long").alias("gap_days"),
        F.datediff(F.lead(d).over(w), d).cast("long").alias("days_to_next"),
    )


# --- ntile quartiles ----------------------------------------------------------
@query(
    "win_ntile_quartiles",
    oracle="""
    SELECT quartile, CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM (SELECT c_acctbal,
                 CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INTEGER)
                   AS quartile
          FROM customer) x
    GROUP BY quartile
    """,
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) balance quartiles re-aggregated to per-bucket stats; the
    global ORDER BY ties broken on c_custkey so bucket edges are
    deterministic in both engines.

    Scale note: a global NTILE single-partitions the sort (WindowExec
    warns). At 100 TB the same semantics come from approxQuantile cutoffs
    + a bucket expression — keep this form for exact/oracle work only."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_acctbal", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


# --- scale-safe quartiles (no WindowExec) ------------------------------------
@query(
    "win_quartiles_scale",
    oracle="""
    WITH cuts AS (
      SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal) AS q1,
             percentile_disc(0.50) WITHIN GROUP (ORDER BY c_acctbal) AS q2,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal) AS q3
      FROM customer
    )
    SELECT quartile, CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM (SELECT c_acctbal,
                 CAST(1 + (c_acctbal > q1)::INT + (c_acctbal > q2)::INT
                        + (c_acctbal > q3)::INT AS INTEGER) AS quartile
          FROM customer, cuts) x
    GROUP BY quartile
    """,
)
def quartiles_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_ntile_quartiles' 100 TB twin: value-threshold quartiles from
    percentile_disc cutoffs + a bucket expression — NO WindowExec anywhere
    in the plan (global NTILE single-partitions the sort; this never
    sorts globally). The 1-row cutoff frame broadcast-joins onto the scan.

    percentile_disc picks an actual data value (smallest value whose
    cumulative distribution >= p) — identical definition in DuckDB, so the
    oracle matches exactly with no interpolation-ULP risk. Ties land in the
    lower bucket in both engines (strict > against the cutoff).

    At 100 TB the cutoff aggregate itself would move to approxQuantile
    (operators.scale.quantile_buckets, tested within 5%); the bucket +
    re-agg stages are identical. Plan shape asserted in test_plans.py."""
    c = load_table(spark, sf_dir, "customer")
    cuts = c.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal)").alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY c_acctbal)").alias("q2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal)").alias("q3"),
    )
    quartile = (
        F.lit(1)
        + (F.col("c_acctbal") > F.col("q1")).cast("int")
        + (F.col("c_acctbal") > F.col("q2")).cast("int")
        + (F.col("c_acctbal") > F.col("q3")).cast("int")
    )
    return (
        c.crossJoin(F.broadcast(cuts))
        .select("c_acctbal", quartile.alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


# --- first_value / last_value with full frame --------------------------------
@query(
    "win_first_last_value",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey,
           FIRST_VALUE(c_name) OVER w AS richest,
           LAST_VALUE(c_name) OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE with the default growing frame and LAST_VALUE with an
    explicit full-partition frame (the classic default-frame trap: without
    ROWS BETWEEN ... UNBOUNDED FOLLOWING, last_value is just the current
    row)."""
    c = load_table(spark, sf_dir, "customer")
    order = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        c.select(
            F.col("c_nationkey").alias("nationkey"),
            F.first("c_name").over(order).alias("richest"),
            F.last("c_name").over(full).alias("poorest"),
        )
        .distinct()
    )


# --- dense_rank vs rank over ties --------------------------------------------
@query(
    "win_dense_rank_ties",
    oracle="""
    SELECT DISTINCT c_mktsegment AS segment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal / 1000) DESC)
    """,
)
def dense_rank_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK vs DENSE_RANK over deliberately tied keys (1000-unit balance
    buckets): rank gaps after ties, dense_rank doesn't — both per
    segment."""
    c = load_table(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000).cast("long")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc(bucket))
    return (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            bucket.alias("bal_bucket"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .distinct()
    )
