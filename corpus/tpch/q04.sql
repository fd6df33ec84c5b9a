-- Order priority with EXISTS (shape of reference tpch/q04.sql)
SELECT o.o_orderpriority, count(*) AS order_count
FROM ${database}.${schema}.orders o
WHERE o.o_orderdate >= DATE '1997-07-01'
  AND o.o_orderdate < DATE '1997-07-01' + INTERVAL '3' MONTH
  AND EXISTS (SELECT * FROM ${database}.${schema}.lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
