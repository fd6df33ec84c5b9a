-- 4-key ROLLUP inventory stats (shape of reference tpcds/q22.sql)
SELECT p_brand, p_type, p_size, avg(p_retailprice) AS avg_price, count(*) AS n
FROM ${database}.${schema}.part
GROUP BY ROLLUP (p_brand, p_type, p_size)
ORDER BY avg_price DESC, p_brand NULLS FIRST, p_type NULLS FIRST, p_size NULLS FIRST
LIMIT 100
