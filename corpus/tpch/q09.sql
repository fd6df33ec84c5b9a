-- Product-type profit (shape of reference tpch/q09.sql; supplycost via retailprice)
SELECT nation, o_year, sum(amount) AS sum_profit
FROM (SELECT n.n_name AS nation, extract(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity * 0.1 AS amount
      FROM ${database}.${schema}.part p, ${database}.${schema}.supplier s, ${database}.${schema}.lineitem l, ${database}.${schema}.orders o, ${database}.${schema}.nation n
      WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
        AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
        AND p.p_name LIKE '%widget%') profit
GROUP BY nation, o_year ORDER BY nation, o_year DESC
