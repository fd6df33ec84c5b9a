-- Potential promotion: nested IN subqueries (shape of reference tpch/q20.sql)
SELECT s.s_name, s.s_acctbal
FROM ${database}.${schema}.supplier s, ${database}.${schema}.nation n
WHERE s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_8'
  AND s.s_suppkey IN (
    SELECT l_suppkey FROM ${database}.${schema}.lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM ${database}.${schema}.part WHERE p_name LIKE '%widget%')
      AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
ORDER BY s.s_name
