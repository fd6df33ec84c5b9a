-- Min-cost supplier via correlated scalar MIN (shape of reference tpch/q02.sql)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
FROM ${database}.${schema}.part p, ${database}.${schema}.supplier s, ${database}.${schema}.lineitem l, ${database}.${schema}.nation n, ${database}.${schema}.region r
WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
  AND p.p_type = 'LARGE'
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE'
  AND s.s_acctbal = (SELECT min(s2.s_acctbal)
                     FROM ${database}.${schema}.supplier s2, ${database}.${schema}.lineitem l2, ${database}.${schema}.nation n2, ${database}.${schema}.region r2
                     WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
                       AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
                       AND r2.r_name = 'EUROPE')
GROUP BY s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
ORDER BY s.s_acctbal DESC, s.s_name, n.n_name, p.p_partkey
LIMIT 100
