-- Customer order distribution (shape of reference tpch/q13.sql)
SELECT c_count, count(*) AS custdist
FROM (SELECT c.c_custkey, count(o.o_orderkey)
      FROM ${database}.${schema}.customer c LEFT OUTER JOIN ${database}.${schema}.orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority NOT LIKE '%SPECIFIED%'
      GROUP BY c.c_custkey) AS c_orders (c_custkey, c_count)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
