"""TPC-H-family queries adapted to the fixture schema (SURVEY §2-B).

The reference's TPC-H corpus (`/root/reference/queries/tpch/q01-q22.sql`)
exercises scan→filter→aggregate, multi-way star joins, conditional
aggregation, and top-k patterns. The fixture warehouse (TESTDATA.md) carries
a reduced TPC-H schema (no partsupp, fewer columns), so each query here keeps
the reference query's *operator shape* and cites the file it derives from,
re-targeted at the available columns.

Scale notes (100 TB readiness), applied throughout:
- dimension joins (region/nation, filtered part/supplier) are explicitly
  broadcast — no shuffle of the fact table for dim joins;
- aggregates go through exact DECIMAL accumulation (see functions/):
  deterministic under any partitioning, so correct on 1000 executors;
- all filters are plain column predicates → pushed to the parquet/Iceberg
  scan by Catalyst (verified via .explain in tests);
- top-k = orderBy+limit → Spark plans TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import davg, dsum, dsum_expr, sql_davg, sql_dsum, sql_dsum_wide
from .registry import query


# --- Q1: pricing summary report (tpch/q01.sql:1-21) --------------------------
@query(
    "tpch_q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum_wide("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum_wide("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→filter→hash-aggregate with 8 aggregates (tpch/q01.sql:4-11).

    Flagship query: single wide aggregation, no join, fully map-side
    combinable — the partial aggregate runs per input partition and only
    6 groups shuffle.
    """
    from ..catalog import rebalance_starved_scan

    # Q1's 8 decimal aggregates are MAP-SIDE work: on a starved scan
    # (single-row-group fixture = one task) the whole pass serializes, so
    # the scan gets the adaptive parallelism floor (no-op at production
    # row-group counts; see catalog.rebalance_starved_scan).
    l = rebalance_starved_scan(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(disc_price, "sum_disc_price"),
            dsum_expr(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- Q3: shipping priority, join + top-k (tpch/q03.sql) ----------------------
@query(
    "tpch_q03_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS o_key,
           {sql_dsum_wide("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           CAST(o.o_orderdate AS DATE) AS orderdate
    FROM customer c, orders o, lineitem l
    WHERE c.c_mktsegment = 'BUILDING'
      AND c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate < DATE '1998-03-15'
      AND l.l_shipdate > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_key
    LIMIT 10
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi-join, grouped revenue, top-10 (tpch/q03.sql:1-23).

    Ties broken on orderkey so the top-k row set is deterministic.
    The customer side is filtered then joined — Catalyst/AQE picks broadcast
    when the filtered side is small; at 100 TB customer⋈orders shuffles on
    custkey and lineitem⋈orders on orderkey (both natural keys).
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("date")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("o_key"), F.col("o_orderdate"))
        .agg(dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("o_key", "revenue", F.col("o_orderdate").cast("date").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("o_key"))
        .limit(10)
    )


# --- Q5: local supplier volume, 6-way join (tpch/q05.sql) --------------------
@query(
    "tpch_q05_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum_wide("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join with same-nation constraint (tpch/q05.sql:1-24).

    region⋈nation (≤25 rows) and supplier are broadcast — the lineitem fact
    never shuffles for the dimension joins; only orders⋈customer⋈lineitem
    shuffle on their keys.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(dim, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- Q6: revenue forecast, scan→filter→global agg (tpch/q06.sql) -------------
@query(
    "tpch_q06_revenue_forecast",
    oracle=f"""
    SELECT {sql_dsum_wide("l_extendedprice * l_discount", "revenue")}
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1996-01-01' + INTERVAL 1 YEAR
      AND l_discount BETWEEN 0.05 - 0.01 AND 0.05 + 0.01
      AND l_quantity < 24
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global no-GROUP-BY aggregate over a pushed-down range+BETWEEN filter
    (tpch/q06.sql:1-9, incl. the derived BETWEEN bounds of :8 and the
    INTERVAL upper bound of :6-7)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (
                F.col("l_shipdate")
                < F.lit("1996-01-01").cast("date") + F.expr("INTERVAL '1' YEAR")
            )
            & F.col("l_discount").between(0.05 - 0.01, 0.05 + 0.01)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum_expr(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --- Q7: volume shipping, disjunctive pair join (tpch/q07.sql) ---------------
@query(
    "tpch_q07_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum_wide("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
      WHERE s.s_suppkey = l.l_suppkey
        AND o.o_orderkey = l.l_orderkey
        AND c.c_custkey = o.o_custkey
        AND s.s_nationkey = n1.n_nationkey
        AND c.c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair-symmetric OR join condition + EXTRACT(YEAR)
    (tpch/q07.sql:26-27 disjunctive pair predicate, :10 year extract).

    Implemented as two broadcast dim joins then the OR filter — keeps the
    disjunction out of the join condition so both joins stay equi-joins
    (a disjunctive equi-join would force a nested-loop at scale)."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum_expr(F.col("volume"), "revenue"))
    )


# --- Q10: returned items, join + top-k 20 (tpch/q10.sql) ---------------------
@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           {sql_dsum_wide("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS acctbal,
           n.n_name AS nation
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= DATE '1997-10-01'
      AND o.o_orderdate < DATE '1997-10-01' + INTERVAL 3 MONTH
      AND l.l_returnflag = 'R'
      AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report: 4-way join, group on customer, top-20
    (tpch/q10.sql:1-32; INTERVAL '3' MONTH bound as tpch/q15.sql:9)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("date"))
        & (
            F.col("o_orderdate")
            < F.expr("DATE '1997-10-01' + INTERVAL '3' MONTH")
        )
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double") / F.count("*")).alias("acctbal"),
        )
        .select("custkey", "name", "revenue", "acctbal", "nation")
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


# --- Q12: shipping-mode pivot via sum(CASE) (tpch/q12.sql) -------------------
@query(
    "tpch_q12_priority_pivot",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                          OR o.o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority <> '1-URGENT'
                         AND o.o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders o, lineitem l
    WHERE o.o_orderkey = l.l_orderkey
      AND l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1997-01-01' + INTERVAL 1 YEAR
    GROUP BY l.l_linestatus
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot via sum(CASE WHEN)) under a join
    (tpch/q12.sql:3-14). Deliberately sum(CASE), not groupBy().pivot(),
    per SURVEY §2-B aggregations note."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.expr("DATE '1997-01-01' + INTERVAL '1' YEAR"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q13: customer order-count distribution (tpch/q13.sql) -------------------
@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority NOT LIKE '%SPECIFIED%'
      GROUP BY c.c_custkey
    ) c_orders (c_custkey, c_count)
    GROUP BY c_count
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN with a non-key predicate inside the join condition, then
    null-skipping count(col) and re-aggregation of an aggregate
    (tpch/q13.sql:10-16 incl. the column-list alias of :16)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (~F.col("o_orderpriority").like("%SPECIFIED%"))
    per_cust = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .toDF("c_custkey", "c_count")  # column-list alias (tpch/q13.sql:16)
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q14: promo revenue ratio (tpch/q14.sql) ---------------------------------
@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT 100.00 * CAST(ROUND(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                    AS DECIMAL(38,12))), 2) AS DOUBLE)
                  / CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(38,12))), 2) AS DOUBLE) AS promo_revenue
    FROM lineitem l, part p
    WHERE l.l_partkey = p.p_partkey
      AND l.l_shipdate >= DATE '1997-06-01'
      AND l.l_shipdate < DATE '1997-06-01' + INTERVAL 1 MONTH
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched CASE inside an aggregate ratio (tpch/q14.sql:1-11)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("date"))
        & (F.col("l_shipdate") < F.expr("DATE '1997-06-01' + INTERVAL '1' MONTH"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                100.00
                * F.round(F.sum(promo.cast("decimal(38,12)")), 2).cast("double")
                / F.round(F.sum(disc.cast("decimal(38,12)")), 2).cast("double")
            ).alias("promo_revenue")
        )
    )


# --- Q19: disjunction of conjunction blocks (tpch/q19.sql) -------------------
@query(
    "tpch_q19_or_of_ands",
    oracle=f"""
    SELECT {sql_dsum_wide("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l, part p
    WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
           AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
           AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
           AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate blocks spanning both join sides
    (tpch/q19.sql:9-35). The common p_partkey = l_partkey conjunct is
    factored out (as Catalyst itself does) so the join stays an equi-join
    — the residual disjunction is a post-join filter."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    blocks = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(blocks)
        .agg(dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
