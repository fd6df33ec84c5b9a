"""Set operations (SURVEY §2-B "Set operations").

UNION ALL feeding re-aggregation, UNION (distinct), INTERSECT, EXCEPT —
matching the reference corpus's channel-combination idioms. Note the
semantics called out in SURVEY: SQL INTERSECT/EXCEPT are DISTINCT-semantics
→ DataFrame ``intersect`` / ``subtract`` (not exceptAll).

Scale notes: UNION ALL is a no-shuffle concatenation; the distinct variants
shuffle once on the full row. The re-aggregation after UNION ALL keeps
partial aggregation per branch (map-side combine before the single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import sql_dsum
from .registry import query


def _channel(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    """A 'sales channel': orders of one status, keyed by customer."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == status).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("price"),
        F.year("o_orderdate").alias("yr"),
    )


# --- UNION ALL + re-aggregation (tpcds/q74.sql:18, q05.sql:20-133) -----------
@query(
    "set_union_all_reagg",
    oracle=f"""
    WITH all_channels AS (
      SELECT o_custkey AS custkey, o_totalprice AS price, 'open' AS channel
      FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT o_custkey AS custkey, o_totalprice AS price, 'finished' AS channel
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT channel, {sql_dsum("price", "total_sales")},
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM all_channels
    GROUP BY channel
    """,
)
def union_all_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of tagged channel branches, re-aggregated — the
    store/web/catalog combination idiom (tpcds/q74.sql:18, q05.sql:20-133)."""
    open_ch = _channel(spark, sf_dir, "O").withColumn("channel", F.lit("open"))
    fin_ch = _channel(spark, sf_dir, "F").withColumn("channel", F.lit("finished"))
    return (
        open_ch.unionByName(fin_ch)
        .groupBy("channel")
        .agg(
            F.round(F.sum(F.col("price").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_sales"),
            F.count("*").alias("n_orders"),
        )
    )


# --- UNION distinct (tpcds/q75.sql:28,43) ------------------------------------
@query(
    "set_union_distinct",
    oracle="""
    SELECT custkey, yr FROM (
      SELECT o_custkey AS custkey, EXTRACT(YEAR FROM o_orderdate) AS yr
      FROM orders WHERE o_orderstatus = 'O'
      UNION
      SELECT o_custkey AS custkey, EXTRACT(YEAR FROM o_orderdate) AS yr
      FROM orders WHERE o_orderstatus = 'F'
    ) u
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics (tpcds/q75.sql:28,43):
    DataFrame union + distinct."""
    a = _channel(spark, sf_dir, "O").select("custkey", "yr")
    b = _channel(spark, sf_dir, "F").select("custkey", "yr")
    return a.union(b).distinct()


# --- INTERSECT (tpcds/q38.sql:15,26; q08.sql:417) ----------------------------
@query(
    "set_intersect",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_loyal
    FROM (
      SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
    ) i
    """,
)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way INTERSECT (distinct semantics) + count — the
    customers-active-in-all-channels shape of tpcds/q38.sql:4-30."""
    o = load_table(spark, sf_dir, "orders")

    def active(yr: int) -> DataFrame:
        return o.filter(F.year("o_orderdate") == yr).select("o_custkey")

    return (
        active(1996)
        .intersect(active(1997))
        .intersect(active(1998))
        .agg(F.count("*").alias("n_loyal"))
    )


# --- EXCEPT (tpcds/q87.sql:16,28) --------------------------------------------
@query(
    "set_except",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lost
    FROM (
      SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
    ) e
    """,
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT with distinct semantics → DataFrame ``subtract``
    (tpcds/q87.sql:5-30; SURVEY §2-B: EXCEPT = distinct → subtract, not
    exceptAll)."""
    o = load_table(spark, sf_dir, "orders")
    y1996 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y1998 = o.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    return y1996.subtract(y1998).agg(F.count("*").alias("n_lost"))


# --- UNION-distinct channels + year-over-year decline (tpcds/q75.sql) --------
@query(
    "set_union_yoy_decline",
    oracle="""
    WITH all_sales AS (
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS yr, l.l_partkey AS item,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      FROM lineitem l, orders o
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'N'
      GROUP BY 1, 2
      UNION
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS yr, l.l_partkey AS item,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      FROM lineitem l, orders o
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      GROUP BY 1, 2)
    SELECT prev.yr AS prev_year, curr.yr AS cur_year, curr.item AS item,
           prev.qty AS prev_qty, curr.qty AS curr_qty
    FROM all_sales curr, all_sales prev
    WHERE curr.item = prev.item AND curr.yr = prev.yr + 1
      AND curr.qty < prev.qty
    """,
)
def union_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of per-channel aggregates self-joined across
    consecutive years, keeping declining items (tpcds/q75.sql:28-47 union,
    :49-68 YoY compare). The union dedups identical (yr,item,qty) rows
    across channels exactly as the reference's UNION does."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def channel(flag: str) -> DataFrame:
        return (
            l.filter(F.col("l_returnflag") == flag)
            .join(o, l.l_orderkey == o.o_orderkey)
            .groupBy(
                F.year("o_orderdate").alias("yr"), F.col("l_partkey").alias("item")
            )
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"))
        )

    all_sales = channel("N").union(channel("R")).distinct()
    curr = all_sales.alias("curr")
    prev = all_sales.alias("prev")
    return (
        curr.join(
            prev,
            (F.col("curr.item") == F.col("prev.item"))
            & (F.col("curr.yr") == F.col("prev.yr") + 1)
            & (F.col("curr.qty") < F.col("prev.qty")),
        )
        .select(
            F.col("prev.yr").alias("prev_year"),
            F.col("curr.yr").alias("cur_year"),
            F.col("curr.item").alias("item"),
            F.col("prev.qty").alias("prev_qty"),
            F.col("curr.qty").alias("curr_qty"),
        )
    )


# --- UNPIVOT / melt (wide → long; inverse of pivot) --------------------------
@query(
    "set_unpivot_measures",
    oracle="""
    SELECT o_orderstatus AS status, m AS measure, v AS val
    FROM (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_price,
             CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
      FROM orders GROUP BY o_orderstatus
    ) w
    CROSS JOIN (VALUES ('n_orders'), ('total_price'), ('min_price')) AS t(m)
    CROSS JOIN LATERAL (
      SELECT CASE m WHEN 'n_orders' THEN n_orders
                    WHEN 'total_price' THEN total_price
                    ELSE min_price END AS v
    ) x
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (DataFrame melt): a wide per-status measure frame turned
    long — the inverse of pivot, planned as one Expand (no join, no extra
    shuffle beyond the source aggregate). The oracle reconstructs the same
    long form relationally."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_price"),
        F.min("o_totalprice").cast("double").alias("min_price"),
    )
    return wide.unpivot(
        ["status"],
        ["n_orders", "total_price", "min_price"],
        "measure",
        "val",
    )
