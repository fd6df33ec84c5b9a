-- Waiting suppliers: EXISTS + NOT EXISTS with <> (shape of reference tpch/q21.sql)
SELECT s.s_name, count(*) AS numwait
FROM ${database}.${schema}.supplier s, ${database}.${schema}.lineitem l1, ${database}.${schema}.orders o
WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F'
  AND EXISTS (SELECT * FROM ${database}.${schema}.lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT * FROM ${database}.${schema}.lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 100
