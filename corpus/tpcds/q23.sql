-- Chained CTEs + HAVING vs scalar-of-max CTE (shape of reference tpcds/q23_1.sql)
WITH frequent_parts AS (
  SELECT l_partkey, count(*) AS cnt
  FROM ${database}.${schema}.lineitem GROUP BY l_partkey HAVING count(*) > 4),
best_customers AS (
  SELECT o_custkey, sum(o_totalprice) AS csales
  FROM ${database}.${schema}.orders GROUP BY o_custkey),
max_sales AS (SELECT max(csales) AS tpcds_cmax FROM best_customers)
SELECT sum(l.l_extendedprice) AS sales
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.orders o
WHERE l.l_orderkey = o.o_orderkey
  AND l.l_partkey IN (SELECT l_partkey FROM frequent_parts)
  AND o.o_custkey IN (SELECT o_custkey FROM best_customers
                      WHERE csales > 0.5 * (SELECT tpcds_cmax FROM max_sales))
