-- Latency bucketing via sum(CASE datediff) (shape of reference tpcds/q50.sql)
SELECT s.s_name,
       sum(CASE WHEN datediff(o.o_orderdate, l.l_shipdate) >= -30 THEN 1 ELSE 0 END) AS d30,
       sum(CASE WHEN datediff(o.o_orderdate, l.l_shipdate) < -30
                 AND datediff(o.o_orderdate, l.l_shipdate) >= -60 THEN 1 ELSE 0 END) AS d60,
       sum(CASE WHEN datediff(o.o_orderdate, l.l_shipdate) < -60 THEN 1 ELSE 0 END) AS d_more
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.orders o, ${database}.${schema}.supplier s
WHERE l.l_orderkey = o.o_orderkey AND l.l_suppkey = s.s_suppkey
GROUP BY s.s_name ORDER BY s.s_name
