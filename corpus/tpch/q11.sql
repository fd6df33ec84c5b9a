-- Important parts: HAVING vs scalar subquery over same scope (shape of reference tpch/q11.sql)
SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS value
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.supplier s, ${database}.${schema}.nation n
WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_8'
GROUP BY l.l_partkey
HAVING sum(l.l_extendedprice * l.l_quantity) >
  (SELECT sum(l2.l_extendedprice * l2.l_quantity) * 0.001
   FROM ${database}.${schema}.lineitem l2, ${database}.${schema}.supplier s2, ${database}.${schema}.nation n2
   WHERE l2.l_suppkey = s2.s_suppkey AND s2.s_nationkey = n2.n_nationkey AND n2.n_name = 'NATION_8')
ORDER BY value DESC, l.l_partkey
