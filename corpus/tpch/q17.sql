-- Correlated scalar avg (shape of reference tpch/q17.sql)
SELECT sum(l.l_extendedprice) / 7.0 AS avg_yearly
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.part p
WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM ${database}.${schema}.lineitem l2
                      WHERE l2.l_partkey = p.p_partkey)
