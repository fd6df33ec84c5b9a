-- Null-aware NOT IN + count distinct (shape of reference tpch/q16.sql)
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.part p
WHERE p.p_partkey = l.l_partkey AND p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM ${database}.${schema}.supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
