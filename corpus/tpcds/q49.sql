-- UNION of per-channel windowed ranks (shape of reference tpcds/q49.sql)
SELECT channel, item, rnk FROM (
  SELECT 'open' AS channel, l_partkey AS item,
         rank() OVER (ORDER BY sum(l_extendedprice) DESC, l_partkey) AS rnk
  FROM ${database}.${schema}.lineitem WHERE l_linestatus = 'O' GROUP BY l_partkey) x WHERE rnk <= 10
UNION
SELECT channel, item, rnk FROM (
  SELECT 'finished' AS channel, l_partkey AS item,
         rank() OVER (ORDER BY sum(l_extendedprice) DESC, l_partkey) AS rnk
  FROM ${database}.${schema}.lineitem WHERE l_linestatus = 'F' GROUP BY l_partkey) y WHERE rnk <= 10
ORDER BY channel, rnk, item
