-- Day-of-week sum(CASE) pivot joined across periods (shape of reference tpcds/q59.sql)
WITH weekly AS (
  SELECT extract(year FROM o_orderdate) AS yr,
         sum(CASE WHEN dayofweek(o_orderdate) = 1 THEN o_totalprice ELSE 0 END) AS sun_sales,
         sum(CASE WHEN dayofweek(o_orderdate) = 2 THEN o_totalprice ELSE 0 END) AS mon_sales,
         sum(CASE WHEN dayofweek(o_orderdate) = 3 THEN o_totalprice ELSE 0 END) AS tue_sales,
         sum(CASE WHEN dayofweek(o_orderdate) = 7 THEN o_totalprice ELSE 0 END) AS sat_sales
  FROM ${database}.${schema}.orders GROUP BY extract(year FROM o_orderdate))
SELECT w1.yr, w2.yr AS next_yr,
       round(w2.sun_sales / nullif(w1.sun_sales, 0), 4) AS sun_ratio,
       round(w2.mon_sales / nullif(w1.mon_sales, 0), 4) AS mon_ratio,
       round(w2.tue_sales / nullif(w1.tue_sales, 0), 4) AS tue_ratio,
       round(w2.sat_sales / nullif(w1.sat_sales, 0), 4) AS sat_ratio
FROM weekly w1, weekly w2
WHERE w2.yr = w1.yr + 1
ORDER BY w1.yr
