-- Channel UNION ALL feeding re-aggregation with ROLLUP (shape of reference tpcds/q05.sql)
SELECT channel, status, sum(sales) AS sales, sum(cnt) AS cnt
FROM (SELECT 'open' AS channel, o_orderstatus AS status, o_totalprice AS sales, 1 AS cnt
      FROM ${database}.${schema}.orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'finished' AS channel, o_orderstatus AS status, o_totalprice AS sales, 1 AS cnt
      FROM ${database}.${schema}.orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'pending' AS channel, o_orderstatus AS status, o_totalprice AS sales, 1 AS cnt
      FROM ${database}.${schema}.orders WHERE o_orderstatus = 'P') x
GROUP BY ROLLUP (channel, status)
ORDER BY channel NULLS FIRST, status NULLS FIRST
