-- Channel UNION ALL + INTERSECT (shapes of reference tpcds/q05/q38)
SELECT channel, sum(price) AS total
FROM (SELECT 'open' AS channel, o_totalprice AS price FROM ${database}.${schema}.orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'finished' AS channel, o_totalprice AS price FROM ${database}.${schema}.orders WHERE o_orderstatus = 'F')
GROUP BY channel ORDER BY channel
