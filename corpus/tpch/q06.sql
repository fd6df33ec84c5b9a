-- Revenue forecast (shape of reference tpch/q06.sql)
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM ${database}.${schema}.lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1996-01-01' + INTERVAL '1' YEAR
  AND l_discount BETWEEN 0.05 - 0.01 AND 0.05 + 0.01 AND l_quantity < 24
