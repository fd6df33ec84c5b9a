-- Consecutive-period growth-rate comparison via CTE self-joins (shape of reference tpcds/q31.sql)
WITH qs AS (
  SELECT n.n_name AS nation, extract(year FROM o.o_orderdate) AS yr,
         extract(quarter FROM o.o_orderdate) AS qtr, sum(o.o_totalprice) AS sales
  FROM ${database}.${schema}.orders o, ${database}.${schema}.customer c, ${database}.${schema}.nation n
  WHERE o.o_custkey = c.c_custkey AND c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2, 3)
SELECT q1.nation, q1.yr, q2.sales / q1.sales AS q1_q2_increase
FROM qs q1, qs q2
WHERE q1.nation = q2.nation AND q1.yr = q2.yr
  AND q1.qtr = 1 AND q2.qtr = 2 AND q1.sales > 0
  AND q2.sales / q1.sales > 1.0
ORDER BY q1.nation, q1.yr
