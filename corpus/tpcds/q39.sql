-- Self-joined CTE with stddev/mean CoV (shape of reference tpcds/q39_1.sql)
WITH inv AS (
  SELECT s_nationkey, l_linestatus AS bucket,
         stddev_samp(l_quantity) AS stdev, avg(l_quantity) AS mean
  FROM ${database}.${schema}.lineitem l, ${database}.${schema}.supplier s
  WHERE l.l_suppkey = s.s_suppkey
  GROUP BY s_nationkey, l_linestatus)
SELECT i1.s_nationkey, i1.bucket, i1.stdev, i1.mean,
       CASE i1.mean WHEN 0 THEN NULL ELSE i1.stdev / i1.mean END AS cov
FROM inv i1, inv i2
WHERE i1.s_nationkey = i2.s_nationkey AND i1.bucket = 'F' AND i2.bucket = 'O'
  AND i1.mean > 0 AND i1.stdev / i1.mean > 0.4
ORDER BY i1.s_nationkey, i1.bucket
