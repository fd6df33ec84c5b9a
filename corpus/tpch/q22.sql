-- ROLLUP + GROUPING + window rank (shape of reference tpcds/q86.sql)
SELECT COALESCE(r.r_name, '__ALL__') AS region, COALESCE(n.n_name, '__ALL__') AS nation,
       sum(c.c_acctbal) AS total_bal,
       rank() OVER (PARTITION BY grouping(r.r_name) + grouping(n.n_name),
                    CASE WHEN grouping(n.n_name) = 0 THEN r.r_name END
                    ORDER BY sum(c.c_acctbal) DESC) AS rank_within_parent
FROM ${database}.${schema}.customer c, ${database}.${schema}.nation n, ${database}.${schema}.region r
WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY region, rank_within_parent
