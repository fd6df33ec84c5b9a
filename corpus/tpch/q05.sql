-- Local supplier volume, 6-way join (shape of reference tpch/q05.sql)
SELECT n.n_name, sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM ${database}.${schema}.customer c, ${database}.${schema}.orders o, ${database}.${schema}.lineitem l, ${database}.${schema}.supplier s, ${database}.${schema}.nation n, ${database}.${schema}.region r
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1997-01-01'
GROUP BY n.n_name ORDER BY revenue DESC
