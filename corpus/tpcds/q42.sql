-- Dimension rollup of a filtered fact, top-k (shape of reference tpcds/q42.sql)
SELECT extract(year FROM l.l_shipdate) AS d_year, p.p_type, sum(l.l_extendedprice) AS sum_price
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.part p
WHERE l.l_partkey = p.p_partkey AND l.l_returnflag = 'N'
GROUP BY extract(year FROM l.l_shipdate), p.p_type
ORDER BY sum_price DESC, d_year, p.p_type LIMIT 100
