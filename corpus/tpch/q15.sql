-- Top supplier via CTE + max-of-aggregate scalar (shape of reference tpch/q15.sql)
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM ${database}.${schema}.lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, total_revenue
FROM ${database}.${schema}.supplier s, revenue0
WHERE s.s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
ORDER BY s.s_suppkey
