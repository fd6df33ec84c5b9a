-- Returned items, top 20 (shape of reference tpch/q10.sql)
SELECT c.c_custkey, c.c_name,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
       avg(c.c_acctbal) AS acctbal, n.n_name
FROM ${database}.${schema}.customer c, ${database}.${schema}.orders o, ${database}.${schema}.lineitem l, ${database}.${schema}.nation n
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate >= DATE '1997-10-01'
  AND o.o_orderdate < DATE '1997-10-01' + INTERVAL '3' MONTH
  AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
