-- IN-list INTERSECT preferred set (shape of reference tpcds/q08.sql)
SELECT n.n_name, count(*) AS n_custs
FROM ${database}.${schema}.customer c, ${database}.${schema}.nation n
WHERE c.c_nationkey = n.n_nationkey
  AND c.c_mktsegment IN (
    SELECT c_mktsegment FROM ${database}.${schema}.customer WHERE c_mktsegment LIKE '%I%'
    INTERSECT
    SELECT c_mktsegment FROM ${database}.${schema}.customer WHERE c_acctbal > 0)
GROUP BY n.n_name ORDER BY n.n_name
