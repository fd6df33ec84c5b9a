-- Shipping priority pivot via sum(CASE) (shape of reference tpch/q12.sql)
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority = '1-URGENT' OR o.o_orderpriority = '2-HIGH'
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority <> '1-URGENT' AND o.o_orderpriority <> '2-HIGH'
                THEN 1 ELSE 0 END) AS low_line_count
FROM ${database}.${schema}.orders o, ${database}.${schema}.lineitem l
WHERE o.o_orderkey = l.l_orderkey
  AND l.l_shipdate >= DATE '1997-01-01'
  AND l.l_shipdate < DATE '1997-01-01' + INTERVAL '1' YEAR
GROUP BY l.l_linestatus ORDER BY l.l_linestatus
