-- Multi-CTE with 2-way INTERSECT feeding a semi filter (shape of reference tpcds/q14_1.sql)
WITH cross_items AS (
  SELECT p_partkey AS item
  FROM ${database}.${schema}.part, ${database}.${schema}.lineitem l1
  WHERE l1.l_partkey = p_partkey AND l1.l_returnflag = 'R'
  INTERSECT
  SELECT p_partkey AS item
  FROM ${database}.${schema}.part, ${database}.${schema}.lineitem l2
  WHERE l2.l_partkey = p_partkey AND l2.l_linestatus = 'F'),
avg_sales AS (
  SELECT avg(l_quantity * l_extendedprice) AS average_sales FROM ${database}.${schema}.lineitem)
SELECT l_linestatus, sum(l_quantity * l_extendedprice) AS sales
FROM ${database}.${schema}.lineitem
WHERE l_partkey IN (SELECT item FROM cross_items)
GROUP BY l_linestatus
HAVING sum(l_quantity * l_extendedprice) > (SELECT average_sales FROM avg_sales)
ORDER BY l_linestatus
