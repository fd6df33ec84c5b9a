-- Promo revenue ratio with searched CASE (shape of reference tpch/q14.sql)
SELECT 100.00 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)) AS promo_revenue
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.part p
WHERE l.l_partkey = p.p_partkey
  AND l.l_shipdate >= DATE '1997-06-01'
  AND l.l_shipdate < DATE '1997-06-01' + INTERVAL '1' MONTH
