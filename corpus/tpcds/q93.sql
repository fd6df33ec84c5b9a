-- Returns-adjusted sales via LEFT JOIN on compound key (shape of reference tpcds/q93.sql)
SELECT t.l_suppkey, sum(act_sales) AS sumsales
FROM (SELECT l1.l_suppkey,
             CASE WHEN r.l_orderkey IS NOT NULL
                  THEN (l1.l_quantity - r.ret_qty) * l1.l_extendedprice / nullif(l1.l_quantity, 0)
                  ELSE l1.l_extendedprice END AS act_sales
      FROM ${database}.${schema}.lineitem l1
      LEFT JOIN (SELECT l_orderkey, l_linenumber, sum(l_quantity) AS ret_qty
                 FROM ${database}.${schema}.lineitem WHERE l_returnflag = 'R'
                 GROUP BY l_orderkey, l_linenumber) r
        ON l1.l_orderkey = r.l_orderkey AND l1.l_linenumber = r.l_linenumber) t
GROUP BY t.l_suppkey ORDER BY sumsales DESC, t.l_suppkey LIMIT 100
