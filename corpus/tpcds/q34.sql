-- Count-range filter then join back for detail rows (shape of reference tpcds/q34.sql)
SELECT c.c_name, big.o_custkey, big.cnt
FROM (SELECT o_custkey, count(*) AS cnt
      FROM ${database}.${schema}.orders
      GROUP BY o_custkey HAVING count(*) BETWEEN 8 AND 15) big, ${database}.${schema}.customer c
WHERE big.o_custkey = c.c_custkey
ORDER BY c.c_name, big.cnt DESC, big.o_custkey
