-- Disjunctive correlated EXISTS (shape of reference tpcds/q10.sql)
SELECT c.c_mktsegment, count(*) AS cnt
FROM ${database}.${schema}.customer c
WHERE EXISTS (SELECT * FROM ${database}.${schema}.orders o WHERE o.o_custkey = c.c_custkey)
  AND (EXISTS (SELECT * FROM ${database}.${schema}.orders o2 WHERE o2.o_custkey = c.c_custkey
               AND o2.o_orderpriority = '1-URGENT')
    OR EXISTS (SELECT * FROM ${database}.${schema}.orders o3 WHERE o3.o_custkey = c.c_custkey
               AND o3.o_orderstatus = 'P'))
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
