-- Large volume customers, IN + HAVING (shape of reference tpch/q18.sql)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       sum(l.l_quantity) AS sum_qty
FROM ${database}.${schema}.customer c, ${database}.${schema}.orders o, ${database}.${schema}.lineitem l
WHERE o.o_orderkey IN (SELECT l_orderkey FROM ${database}.${schema}.lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderdate LIMIT 100
