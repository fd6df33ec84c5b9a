-- GROUPING() inside window partition keys over ROLLUP (shape of reference tpcds/q36.sql)
SELECT ratio, nation, segment, lochierarchy, rank_within_parent FROM (
  SELECT sum(c_acctbal) / sum(1) AS ratio,
         n.n_name AS nation, c.c_mktsegment AS segment,
         grouping(n.n_name) + grouping(c.c_mktsegment) AS lochierarchy,
         rank() OVER (
           PARTITION BY grouping(n.n_name) + grouping(c.c_mktsegment),
                        CASE WHEN grouping(c.c_mktsegment) = 0 THEN n.n_name END
           ORDER BY sum(c_acctbal) DESC) AS rank_within_parent
  FROM ${database}.${schema}.customer c, ${database}.${schema}.nation n
  WHERE c.c_nationkey = n.n_nationkey
  GROUP BY ROLLUP (n.n_name, c.c_mktsegment)) x
ORDER BY lochierarchy DESC,
         CASE WHEN lochierarchy = 0 THEN nation END NULLS FIRST,
         rank_within_parent, segment NULLS FIRST
