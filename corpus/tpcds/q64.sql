-- Self-joined aggregate CTE with <= count predicate (shape of reference tpcds/q64.sql)
WITH cross_sales AS (
  SELECT l_partkey AS item, l_linestatus AS status, count(*) AS cnt,
         sum(l_extendedprice) AS sales
  FROM ${database}.${schema}.lineitem GROUP BY l_partkey, l_linestatus)
SELECT cs1.item, cs1.sales AS s1, cs2.sales AS s2, cs1.cnt AS c1, cs2.cnt AS c2
FROM cross_sales cs1, cross_sales cs2
WHERE cs1.item = cs2.item AND cs1.status = 'O' AND cs2.status = 'F'
  AND cs2.cnt <= cs1.cnt
ORDER BY cs1.item LIMIT 100
