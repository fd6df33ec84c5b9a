-- Window aggregate over grouped aggregate (shape of reference tpcds/q53.sql)
SELECT * FROM (
  SELECT p.p_brand, sum(l.l_extendedprice) AS sum_sales,
         avg(sum(l.l_extendedprice)) OVER (PARTITION BY p.p_brand) AS avg_brand_sales
  FROM ${database}.${schema}.lineitem l, ${database}.${schema}.part p
  WHERE l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_linestatus) x
WHERE CASE WHEN avg_brand_sales > 0
           THEN abs(sum_sales - avg_brand_sales) / avg_brand_sales ELSE NULL END > 0.1
ORDER BY avg_brand_sales, sum_sales LIMIT 100
