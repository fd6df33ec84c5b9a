-- Wide monthly sum(CASE) pivot with re-aggregation (shape of reference tpcds/q66.sql)
SELECT nation, sum(jan_sales) AS jan_sales, sum(feb_sales) AS feb_sales,
       sum(mar_sales) AS mar_sales, sum(apr_sales) AS apr_sales,
       sum(oct_net) AS oct_net, sum(nov_net) AS nov_net, sum(dec_net) AS dec_net
FROM (
  SELECT n.n_name AS nation,
         sum(CASE WHEN month(l.l_shipdate) = 1 THEN l.l_extendedprice * l.l_quantity ELSE 0 END) AS jan_sales,
         sum(CASE WHEN month(l.l_shipdate) = 2 THEN l.l_extendedprice * l.l_quantity ELSE 0 END) AS feb_sales,
         sum(CASE WHEN month(l.l_shipdate) = 3 THEN l.l_extendedprice * l.l_quantity ELSE 0 END) AS mar_sales,
         sum(CASE WHEN month(l.l_shipdate) = 4 THEN l.l_extendedprice * l.l_quantity ELSE 0 END) AS apr_sales,
         sum(CASE WHEN month(l.l_shipdate) = 10 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) AS oct_net,
         sum(CASE WHEN month(l.l_shipdate) = 11 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) AS nov_net,
         sum(CASE WHEN month(l.l_shipdate) = 12 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) AS dec_net
  FROM ${database}.${schema}.lineitem l, ${database}.${schema}.supplier s, ${database}.${schema}.nation n
  WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, year(l.l_shipdate)) x
GROUP BY nation ORDER BY nation
