-- FULL JOIN of cumulative window sums (shape of reference tpcds/q51.sql)
WITH o_cum AS (
  SELECT o_custkey AS custkey, o_orderdate AS d,
         sum(sum(o_totalprice)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
  FROM ${database}.${schema}.orders GROUP BY o_custkey, o_orderdate),
l_cum AS (
  SELECT o.o_custkey AS custkey, l.l_shipdate AS d,
         sum(sum(l.l_extendedprice)) OVER (PARTITION BY o.o_custkey ORDER BY l.l_shipdate
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
  FROM ${database}.${schema}.lineitem l, ${database}.${schema}.orders o WHERE l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, l.l_shipdate)
SELECT count(*) AS n_rows,
       sum(CASE WHEN o_cum.custkey IS NULL THEN 1 ELSE 0 END) AS only_ship,
       sum(CASE WHEN l_cum.custkey IS NULL THEN 1 ELSE 0 END) AS only_order
FROM o_cum FULL JOIN l_cum ON o_cum.custkey = l_cum.custkey AND o_cum.d = l_cum.d
