"""Subquery & semi/anti-join operators (SURVEY §2-B "Joins" subquery rows).

The reference corpus leans heavily on correlated subqueries, EXISTS/NOT
EXISTS, IN/NOT IN (null-aware), and scalar subqueries in WHERE/HAVING.
Catalyst decorrelates these itself (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery — SURVEY §4), so per SURVEY's guidance the
correlated forms are kept in SQL where that is the natural expression, and
the semi/anti forms are also shown as native DataFrame left_semi/left_anti
joins.

Scale notes: every decorrelated subquery becomes an aggregate + equi-join on
the correlation key — same shuffle behavior as a hand-written join. The
null-aware NOT IN form is kept ONLY where its three-valued semantics are
wanted; it plans as a NAAJ (broadcast) and the subquery side here is a
filtered dimension (small), so it stays broadcastable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TPCH_TABLES, load_table, register_views
from ..functions import dsum_expr, sql_dsum, sql_dsum_wide
from .registry import query


# --- EXISTS semi join (tpch/q04.sql:9) ---------------------------------------
@query(
    "sub_exists_semi",
    oracle="""
    SELECT o.o_orderpriority AS orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-07-01'
      AND o.o_orderdate < DATE '1997-07-01' + INTERVAL 3 MONTH
      AND EXISTS (SELECT * FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left_semi join (tpch/q04.sql:1-14; correlation
    includes a non-key comparison l_shipdate > o_orderdate as in q04's
    commitdate/receiptdate predicate)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("date"))
        & (F.col("o_orderdate") < F.expr("DATE '1997-07-01' + INTERVAL '3' MONTH"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate)
    return (
        o.join(l, cond, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count("*").alias("order_count"))
    )


# --- NOT EXISTS anti join (tpch/q22.sql:23-30) -------------------------------
@query(
    "sub_not_exists_anti",
    oracle="""
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c, nation n
    WHERE c.c_nationkey = n.n_nationkey
      AND c.c_acctbal > 0.0
      AND NOT EXISTS (SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
    GROUP BY n.n_name
    """,
)
def not_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left_anti join: customers with positive balance and no
    orders (tpch/q22.sql:15-33 shape)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o.filter(F.col("o_orderstatus") == "P"), c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("totacctbal"),
        )
    )


# --- IN-subquery with HAVING (tpch/q18.sql:13-20) ----------------------------
@query(
    "sub_in_having",
    oracle=f"""
    SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_totalprice AS totalprice,
           {sql_dsum("l.l_quantity", "sum_qty")}
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
      AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-customer: IN over an aggregated-HAVING subquery →
    left_semi against the grouped/filtered side (tpch/q18.sql:1-23)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 180)
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
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2).cast("double").alias("sum_qty"))
    )


# --- null-aware NOT IN anti join (tpch/q16.sql:14-20) ------------------------
@query(
    "sub_not_in_null_aware",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey
      AND p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a subquery — null-aware anti-join semantics
    (tpch/q16.sql:1-25: NOT IN + <> + IN-list + count(DISTINCT)).

    Kept in SQL form: a DataFrame left_anti is NOT equivalent when the
    subquery can yield NULLs (SURVEY §2-B joins table); Spark plans this as
    a null-aware broadcast anti join."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l, part p
        WHERE p.p_partkey = l.l_partkey
          AND p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        """
    )


# --- correlated scalar subquery in WHERE (tpch/q17.sql:10-17) ----------------
@query(
    "sub_correlated_scalar_avg",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey
      AND p.p_brand = 'Brand#3'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
)
def correlated_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AVG subquery (tpch/q17.sql:1-17, also the
    per-group-average shape of tpcds/q01.sql:28-35). Kept in SQL —
    Catalyst decorrelates to an aggregate + join on l_partkey.

    The correlated AVG compares (not outputs) values, so double AVG
    differences below filter-threshold granularity are immaterial; the
    output aggregate itself is exact-decimal."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem l, part p
        WHERE p.p_partkey = l.l_partkey
          AND p.p_brand = 'Brand#3'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
        """
    )


# --- correlated MIN subquery (tpch/q02.sql:24-38) ----------------------------
@query(
    "sub_correlated_min",
    oracle="""
    SELECT s.s_name AS sname, n.n_name AS nname, s.s_acctbal AS acctbal
    FROM supplier s, nation n, region r
    WHERE s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2, nation n2
                         WHERE s2.s_nationkey = n2.n_nationkey
                           AND n2.n_regionkey = r.r_regionkey)
    """,
)
def correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated MIN-of-region scalar subquery — the min-supplycost shape
    of tpch/q02.sql:24-38 re-targeted at supplier balances."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT s.s_name AS sname, n.n_name AS nname, s.s_acctbal AS acctbal
        FROM supplier s, nation n, region r
        WHERE s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
          AND r.r_name = 'EUROPE'
          AND s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2, nation n2
                             WHERE s2.s_nationkey = n2.n_nationkey
                               AND n2.n_regionkey = r.r_regionkey)
        """
    )


# --- scalar subquery in HAVING (tpch/q11.sql:14-26) --------------------------
@query(
    "sub_scalar_in_having",
    oracle=f"""
    SELECT l_suppkey AS suppkey,
           {sql_dsum_wide("l_extendedprice * (1 - l_discount)", "value")}
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,12)))
           > (SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,12))) * 0.0105
              FROM lineitem)
    """,
)
def scalar_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING against an uncorrelated scalar-aggregate subquery
    (tpch/q11.sql:14-26). Both sides of the comparison are exact decimals,
    so the threshold cut is deterministic."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT l_suppkey AS suppkey,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,12))), 2) AS DOUBLE)
                 AS value
        FROM lineitem
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,12)))
               > (SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,12))) * 0.0105
                  FROM lineitem)
        """
    )


# --- scalar subquery vs aggregate: max-of-aggregate (tpch/q15.sql:26) --------
@query(
    "sub_max_of_aggregate",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum_wide("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01'
        AND l_shipdate < DATE '1997-01-01' + INTERVAL 3 MONTH
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS sname, r.total_revenue AS total_revenue
    FROM supplier s, revenue r
    WHERE s.s_suppkey = r.supplier_no
      AND r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def max_of_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-supplier: CTE revenue view + scalar MAX subquery over it
    (tpch/q15.sql:1-30). Exact-decimal totals make the argmax unambiguous."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.expr("DATE '1997-01-01' + INTERVAL '3' MONTH"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("sname"),
            "total_revenue",
        )
    )


# --- anti join with <> correlation (tpch/q21.sql shape) ----------------------
@query(
    "sub_exists_not_exists_theta",
    oracle="""
    SELECT s.s_name AS sname, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s, lineitem l1, orders o
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT * FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT * FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
)
def exists_not_exists_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waiting-supplier shape: EXISTS + NOT EXISTS, both correlated with a
    <> theta predicate (tpch/q21.sql:14-32). Kept in SQL; Catalyst plans
    semi + anti joins on l_orderkey with the <> as residual condition."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT s.s_name AS sname, COUNT(*) AS numwait
        FROM supplier s, lineitem l1, orders o
        WHERE s.s_suppkey = l1.l_suppkey
          AND o.o_orderkey = l1.l_orderkey
          AND o.o_orderstatus = 'F'
          AND EXISTS (SELECT * FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
        """
    )


# --- scalar subqueries as BETWEEN bounds (tpcds/q54.sql:47-59) ---------------
@query(
    "sub_scalar_between_bounds",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS orderdate, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate BETWEEN (SELECT MIN(o_orderdate) + INTERVAL 30 DAY FROM orders)
                          AND (SELECT MIN(o_orderdate) + INTERVAL 60 DAY FROM orders)
    GROUP BY o_orderdate
    """,
)
def scalar_between_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN whose bounds are scalar subqueries (tpcds/q54.sql:47-59
    d_month_seq+1 .. +3 shape)."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT CAST(o_orderdate AS DATE) AS orderdate, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate BETWEEN (SELECT MIN(o_orderdate) + INTERVAL '30' DAY FROM orders)
                              AND (SELECT MIN(o_orderdate) + INTERVAL '60' DAY FROM orders)
        GROUP BY o_orderdate
        """
    )


# --- disjunctive correlated EXISTS (tpcds/q10.sql:23-52) ---------------------
@query(
    "sub_disjunctive_exists",
    oracle="""
    SELECT c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'O')
      AND (EXISTS (SELECT * FROM orders o2 WHERE o2.o_custkey = c.c_custkey
                     AND o2.o_orderpriority = '1-URGENT')
        OR EXISTS (SELECT * FROM orders o3 WHERE o3.o_custkey = c.c_custkey
                     AND o3.o_totalprice > 100000))
    GROUP BY c.c_mktsegment
    """,
)
def disjunctive_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS ... AND (EXISTS ... OR EXISTS ...) — the disjunctive
    correlated-exists shape of tpcds/q10.sql:23-52 / q35.sql:26-55.
    Kept in SQL per SURVEY §2-B ("plans as semi joins + Or")."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment, COUNT(*) AS cnt
        FROM customer c
        WHERE EXISTS (SELECT * FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'O')
          AND (EXISTS (SELECT * FROM orders o2 WHERE o2.o_custkey = c.c_custkey
                         AND o2.o_orderpriority = '1-URGENT')
            OR EXISTS (SELECT * FROM orders o3 WHERE o3.o_custkey = c.c_custkey
                         AND o3.o_totalprice > 100000))
        GROUP BY c.c_mktsegment
        """
    )


# --- correlated COUNT compared to range (tpcds/q41.sql:5) --------------------
@query(
    "sub_correlated_count",
    oracle="""
    SELECT DISTINCT p.p_name AS pname
    FROM part p
    WHERE p.p_brand = 'Brand#5'
      AND (SELECT COUNT(*) FROM lineitem l WHERE l.l_partkey = p.p_partkey
             AND l.l_quantity > 45) > 2
    """,
)
def correlated_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated COUNT(*) subquery compared against a bound + SELECT
    DISTINCT (tpcds/q41.sql:1-15)."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT DISTINCT p.p_name AS pname
        FROM part p
        WHERE p.p_brand = 'Brand#5'
          AND (SELECT COUNT(*) FROM lineitem l WHERE l.l_partkey = p.p_partkey
                 AND l.l_quantity > 45) > 2
        """
    )


# --- IN-subquery under OR with IN-list (tpcds/q45.sql:14-20) -----------------
@query(
    "sub_in_or_inlist",
    oracle="""
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS numcust
    FROM customer c, nation n
    WHERE c.c_nationkey = n.n_nationkey
      AND (SUBSTR(c.c_name, 18, 1) IN ('1', '3', '5')
           OR c.c_nationkey IN (SELECT n2.n_nationkey FROM nation n2
                                WHERE n2.n_regionkey = 0))
    GROUP BY n.n_name
    """,
)
def in_or_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN-subquery disjoined with a literal IN-list
    (tpcds/q45.sql:14-20). A disjunction blocks the semi-join rewrite, so
    Catalyst plans the subquery as an ExistenceJoin feeding the OR filter —
    the subquery side here is a filtered dimension, kept broadcastable."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT n.n_name AS nation, COUNT(*) AS numcust
        FROM customer c, nation n
        WHERE c.c_nationkey = n.n_nationkey
          AND (SUBSTR(c.c_name, 18, 1) IN ('1', '3', '5')
               OR c.c_nationkey IN (SELECT n2.n_nationkey FROM nation n2
                                    WHERE n2.n_regionkey = 0))
        GROUP BY n.n_name
        """
    )


# --- CASE-wrapped scalar subqueries in SELECT (tpcds/q09.sql:2-17) -----------
@query(
    "sub_scalar_case_buckets",
    oracle="""
    SELECT CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 2000
                THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                             / COUNT(l_extendedprice)
                      FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
                ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                             / COUNT(l_discount)
                      FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) END AS bucket1,
           CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 2000
                THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                             / COUNT(l_extendedprice)
                      FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
                ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                             / COUNT(l_discount)
                      FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) END AS bucket2
    FROM region WHERE r_regionkey = 0
    """,
)
def scalar_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subqueries nested inside CASE in the projection
    (tpcds/q09.sql:2-17's bucket pattern). Each scalar is an independent
    1-row subplan Catalyst executes once and inlines — the 1-row driving
    table never multiplies work. Deterministic avg via decimal-sum/count."""
    register_views(spark, sf_dir, tables=TPCH_TABLES)
    return spark.sql(
        """
        SELECT CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 2000
                    THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                                 / COUNT(l_extendedprice)
                          FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
                    ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                                 / COUNT(l_discount)
                          FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) END AS bucket1,
               CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 2000
                    THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                                 / COUNT(l_extendedprice)
                          FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
                    ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                                 / COUNT(l_discount)
                          FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) END AS bucket2
        FROM region WHERE r_regionkey = 0
        """
    )
