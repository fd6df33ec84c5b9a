-- Ratio-to-report window (shape of reference tpcds/q98.sql)
SELECT p.p_type, p.p_brand, sum(l.l_extendedprice) AS itemrevenue,
       sum(l.l_extendedprice) * 100.0
         / sum(sum(l.l_extendedprice)) OVER (PARTITION BY p.p_type) AS revenueratio
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.part p
WHERE l.l_partkey = p.p_partkey
GROUP BY p.p_type, p.p_brand
ORDER BY p.p_type, revenueratio DESC, p.p_brand
