-- Cross-status stddev/mean quality stats (shape of reference tpcds/q17.sql)
SELECT p.p_brand,
       count(l.l_quantity) AS qty_count,
       avg(l.l_quantity) AS qty_avg,
       stddev_samp(l.l_quantity) / avg(l.l_quantity) AS qty_cov
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.part p, ${database}.${schema}.orders o
WHERE l.l_partkey = p.p_partkey AND l.l_orderkey = o.o_orderkey
  AND o.o_orderstatus = 'F'
GROUP BY p.p_brand
HAVING avg(l.l_quantity) > 0 AND stddev_samp(l.l_quantity) / avg(l.l_quantity) > 0.5
ORDER BY p.p_brand LIMIT 100
