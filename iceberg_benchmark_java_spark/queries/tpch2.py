"""TPC-H corpus completion: the remaining reference query shapes
(q02, q08, q09, q11, q15, q16, q17, q20, q21, q22).

Together with queries/tpch.py (q01/03/05/06/07/10/12/13/14/19) and the
shape-twins sub_exists_semi (= q04) / sub_in_having (= q18), this gives the
engine a registered, oracle-checked equivalent for every query in the
reference's TPC-H corpus (/root/reference/queries/tpch/q01-q22.sql),
adapted to the fixture schema (TESTDATA.md: no partsupp, reduced columns —
partsupp-mediated part↔supplier links are re-expressed through lineitem).

Determinism rules (see functions/): exact DECIMAL accumulation for every
money sum, threshold comparisons kept in the decimal domain on both
engines, ties in top-k broken by unique keys.

Scale notes applied throughout:
- nation/region and filtered part/supplier sides are broadcast;
- correlated subqueries are hand-decorrelated into aggregate + equi-join on
  the correlation key (what Catalyst would emit, stated explicitly);
- semi/anti predicates use left_semi/left_anti (no row duplication, early
  short-circuit on the probe side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import davg, dsum, dsum_expr, sql_davg, sql_dsum, sql_dsum_wide
from .registry import query


# --- Q2: minimum-cost supplier (tpch/q02.sql) --------------------------------
@query(
    "tpch_q02_min_cost_supplier",
    oracle="""
    SELECT s.s_acctbal AS acctbal, s.s_name AS sname, n.n_name AS nation,
           p.p_partkey AS partkey, p.p_name AS pname
    FROM part p, supplier s, lineitem l, nation n, region r
    WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
      AND p.p_type = 'LARGE'
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (SELECT MIN(s2.s_acctbal)
                         FROM supplier s2, lineitem l2, nation n2, region r2
                         WHERE l2.l_partkey = p.p_partkey
                           AND s2.s_suppkey = l2.l_suppkey
                           AND s2.s_nationkey = n2.n_nationkey
                           AND n2.n_regionkey = r2.r_regionkey
                           AND r2.r_name = 'EUROPE')
    GROUP BY ALL
    ORDER BY acctbal DESC, sname, nation, partkey LIMIT 100
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-MIN subquery in WHERE (tpch/q02.sql:24-38), 5-way
    star join, mixed-direction ORDER BY + LIMIT (:39-43).

    partsupp is absent from the fixtures, so the part↔supplier link is the
    shipment fact (lineitem), and min supplycost becomes min s_acctbal.
    Decorrelated by hand: per-part regional minimum as an aggregate, then an
    equi-join on (partkey, acctbal) — identical to Catalyst's rewrite but
    lets us reuse one broadcast dim for both sides."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # suppliers in the region, with their nation name (≤ nations rows: broadcast)
    eu_sup = (
        s.join(F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # (part, regional supplier) candidates via the shipment link
    cand = (
        l.join(F.broadcast(eu_sup), l.l_suppkey == F.col("s_suppkey"))
        .select("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    min_bal = cand.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        cand.join(min_bal, ["l_partkey"])
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("sname"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("pname"),
        )
        .distinct()
        .orderBy(F.desc("acctbal"), "sname", "nation", "partkey")
        .limit(100)
    )


# --- Q4: order priority checking (tpch/q04.sql) ------------------------------
@query(
    "tpch_q04_order_priority",
    oracle="""
    SELECT o.o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT * FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority ORDER BY priority
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-windowed EXISTS semi join counted by priority
    (tpch/q04.sql:1-14; the late-delivery predicate re-expressed as
    l_returnflag = 'R', commit/receipt dates being absent). The
    key-correlated variant of sub_exists_semi, whose correlation adds a
    non-key comparison."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("order_count"))
        .orderBy("priority")
    )


# --- Q18: large-volume customers (tpch/q18.sql) ------------------------------
@query(
    "tpch_q18_large_volume",
    oracle=f"""
    SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_totalprice AS totalprice,
           {sql_dsum("l.l_quantity", "sum_qty")}
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150)
      AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, orderdate, orderkey
    LIMIT 100
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: IN over an aggregated-HAVING subquery, then
    re-join and top-100 by price (tpch/q18.sql:1-23 incl. the ORDER BY +
    LIMIT of :21-23; threshold scaled to the fixture's ~4-line orders).
    Ties broken on orderkey for a deterministic top-k set."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(dsum("l_quantity", "sum_qty"))
        .select(
            "name", "custkey", "orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "totalprice", "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "orderdate", "orderkey")
        .limit(100)
    )


# --- Q8: national market share (tpch/q08.sql) --------------------------------
@query(
    "tpch_q08_market_share",
    oracle="""
    SELECT o_year,
           CAST(ROUND(SUM(CAST(CASE WHEN nation = 'NATION_8' THEN volume ELSE 0 END
                    AS DECIMAL(38,12))), 2) AS DOUBLE)
         / CAST(ROUND(SUM(CAST(volume AS DECIMAL(38,12))), 2) AS DOUBLE) AS mkt_share
    FROM (SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n2.n_name AS nation
          FROM part p, supplier s, lineitem l, orders o, customer c,
               nation n1, nation n2, region r
          WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
            AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
            AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r.r_regionkey
            AND r.r_name = 'ASIA' AND s.s_nationkey = n2.n_nationkey
            AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
            AND p.p_type = 'ECONOMY') all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way join with two nation roles + conditional-aggregate share ratio
    (tpch/q08.sql:1-32; sum(CASE)/sum pattern of :3-6)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_dim = F.broadcast(
        n1.join(r, n1.n_regionkey == r.r_regionkey).select("n_nationkey")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    natl = F.when(F.col("nation") == "NATION_8", volume).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cust_dim, c.c_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.round(F.sum(natl.cast("decimal(38,12)")), 2).cast("double")
                / F.round(F.sum(volume.cast("decimal(38,12)")), 2).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q9: product-type profit (tpch/q09.sql) ----------------------------------
@query(
    "tpch_q09_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum_wide("amount", "sum_profit")}
    FROM (SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount)
                   - p.p_retailprice * l.l_quantity * 0.1 AS amount
          FROM part p, supplier s, lineitem l, orders o, nation n
          WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
            AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
            AND p.p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by nation×year with a LIKE-filtered part dim and an arithmetic
    measure spanning three tables (tpch/q09.sql:1-31; supplycost term
    re-expressed via p_retailprice, partsupp being absent)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum_expr(amount, "sum_profit"))
    )


# --- Q11: important stock value (tpch/q11.sql) -------------------------------
@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH scope AS (
      SELECT l.l_partkey AS partkey,
             CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(38,12)) AS val
      FROM lineitem l, supplier s, nation n
      WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
        AND n.n_name = 'NATION_8')
    SELECT partkey, CAST(ROUND(SUM(val), 2) AS DOUBLE) AS value
    FROM scope GROUP BY partkey
    HAVING SUM(val) > (SELECT SUM(val) * CAST(0.001 AS DECIMAL(10,6)) FROM scope)
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group sums filtered by a scalar subquery over the SAME scope in
    HAVING (tpch/q11.sql:14-26). The threshold comparison stays in the
    exact decimal domain on both engines, so the cut is bit-identical under
    any partitioning (value re-expressed as shipped value, partsupp being
    absent)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    scope = (
        l.join(F.broadcast(s.join(n, s.s_nationkey == n.n_nationkey)),
               l.l_suppkey == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("l_extendedprice") * F.col("l_quantity"))
            .cast("decimal(38,12)")
            .alias("val"),
        )
    )
    per_part = scope.groupBy("partkey").agg(F.sum("val").alias("sval"))
    threshold = scope.agg(
        (F.sum("val") * F.expr("CAST(0.001 AS DECIMAL(10,6))")).alias("thr")
    )
    return (
        per_part.join(F.broadcast(threshold))  # 1-row scalar: broadcast cross join
        .filter(F.col("sval") > F.col("thr"))
        .select("partkey", F.round("sval", 2).cast("double").alias("value"))
    )


# --- Q15: top supplier (tpch/q15.sql) ----------------------------------------
@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,12))), 2)
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey AS suppkey, s.s_name AS sname,
           CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier s, revenue0
    WHERE s.s_suppkey = supplier_no
      AND total_rev = (SELECT MAX(total_rev) FROM revenue0)
    ORDER BY suppkey
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-style CTE + scalar subquery on MAX of an aggregate
    (tpch/q15.sql:1-28, the revenue0 view and `total_revenue = (SELECT
    max...)` of :26). The max-equality runs on exact scale-2 decimals so
    both engines pick the same winner."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,12)")),
            2,
        ).alias("total_rev")
    )
    top = revenue0.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue0.join(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("sname"),
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


# --- Q16: supplier count by part attr (tpch/q16.sql) -------------------------
@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS psize,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey
      AND p.p_brand <> 'Brand#5' AND p.p_size IN (1,4,7,10,13,16,19,22)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY 1, 2, 3
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN exclusion subquery + <> + IN-list + count(DISTINCT)
    (tpch/q16.sql:4-20). The excluded-supplier side derives from a non-null
    key, so left_anti is exactly NOT IN here; the genuinely null-aware NAAJ
    form lives in sub_not_in_null_aware."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    l = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17: small-quantity-order revenue (tpch/q17.sql) ------------------------
@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AVG per part compared row-wise
    (tpch/q17.sql:10-17) + decimal-division output (:2 `/7.0`).
    Hand-decorrelated: per-part averages as an aggregate joined back on
    partkey — the exact plan Catalyst's RewriteCorrelatedScalarSubquery
    produces, with the aggregate computed once, broadcast when small."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    per_part_avg = l.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part_avg, l.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


# --- Q20: potential part promotion (tpch/q20.sql) ----------------------------
@query(
    "tpch_q20_potential_promo",
    oracle="""
    SELECT s.s_name AS sname, s.s_acctbal AS acctbal
    FROM supplier s, nation n
    WHERE s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_8'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
          AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 50)
    ORDER BY sname
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN-subqueries: IN over an aggregated-HAVING subquery whose
    scope is itself IN-filtered by a LIKE'd dimension (tpch/q20.sql:9-35;
    availqty threshold re-expressed as shipped-quantity threshold).
    Both INs become left_semi joins; the part probe is broadcast."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    forest_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    heavy_suppliers = (
        l.join(F.broadcast(forest_parts), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(heavy_suppliers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_name").alias("sname"), F.col("s_acctbal").alias("acctbal"))
        .orderBy("sname")
    )


# --- Q21: suppliers who kept orders waiting (tpch/q21.sql) -------------------
@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s.s_name AS sname, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s, lineitem l1, orders o, nation n
    WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT * FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT * FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND s.s_nationkey = n.n_nationkey
    GROUP BY s.s_name ORDER BY numwait DESC, sname LIMIT 100
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS self-joins with a theta (<>) correlation
    (tpch/q21.sql:14-32; the 'late' receipt predicate re-expressed as
    l_returnflag = 'R', commit/receipt dates being absent).

    Kept in SQL form: Catalyst's RewritePredicateSubquery turns both into
    semi/anti joins on l_orderkey with the <> residual — the same plan a
    hand build would produce, with null-safety handled by the engine."""
    for t in ("supplier", "lineitem", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT s.s_name AS sname, COUNT(*) AS numwait
        FROM supplier s, lineitem l1, orders o, nation n
        WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
          AND o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT * FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
          AND s.s_nationkey = n.n_nationkey
        GROUP BY s.s_name ORDER BY numwait DESC, sname LIMIT 100
        """
    )


# --- Q22: global sales opportunity (tpch/q22.sql) ----------------------------
@query(
    "tpch_q22_sales_opportunity",
    oracle="""
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS totacctbal
    FROM (SELECT SUBSTR(c.c_name, 18, 1) AS cntrycode, c.c_acctbal AS acctbal
          FROM customer c
          WHERE SUBSTR(c.c_name, 18, 1) IN ('1','2','3','4','5','6','7')
            AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                               WHERE c2.c_acctbal > 0.00
                                 AND SUBSTR(c2.c_name, 18, 1)
                                     IN ('1','2','3','4','5','6','7'))
            AND NOT EXISTS (SELECT * FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '1-URGENT')) custsale
    GROUP BY cntrycode
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substr-derived grouping key, uncorrelated scalar AVG threshold, and
    NOT EXISTS anti join (tpch/q22.sql:8-33; phone prefix re-expressed as a
    customer-name digit, 'no orders' as 'no urgent orders' since every
    fixture customer has orders)."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 18, 1)
    )
    in_codes = F.col("cntrycode").isin(*"1234567")
    avg_bal = (
        c.filter((F.col("c_acctbal") > 0.0) & in_codes)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.filter(in_codes)
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == urgent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
