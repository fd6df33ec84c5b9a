-- EXCEPT of channel customer sets (shape of reference tpcds/q87.sql)
SELECT count(*) AS n
FROM (SELECT DISTINCT o_custkey FROM ${database}.${schema}.orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT DISTINCT o_custkey FROM ${database}.${schema}.orders WHERE o_orderstatus = 'P') x
