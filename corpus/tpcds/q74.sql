-- Year-over-year CTE self-join, CASE ratio, ORDER BY ordinals (shape of reference tpcds/q74.sql)
WITH year_total AS (
  SELECT o_custkey AS custkey, extract(year FROM o_orderdate) AS yr,
         sum(o_totalprice) AS total
  FROM ${database}.${schema}.orders
  GROUP BY o_custkey, extract(year FROM o_orderdate))
SELECT t1.custkey, t1.total AS total_1997, t2.total AS total_1998
FROM year_total t1, year_total t2
WHERE t1.custkey = t2.custkey AND t1.yr = 1997 AND t2.yr = 1998
  AND CASE WHEN t1.total > 0 THEN t2.total / t1.total ELSE NULL END > 1.0
ORDER BY 1, 2, 3
LIMIT 100
