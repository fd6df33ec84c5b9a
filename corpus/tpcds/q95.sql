-- Self-join EXISTS on same table, <> key (shape of reference tpcds/q95.sql)
SELECT count(DISTINCT l1.l_orderkey) AS multi_supplier_orders
FROM ${database}.${schema}.lineitem l1
WHERE EXISTS (SELECT * FROM ${database}.${schema}.lineitem l2
              WHERE l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey)
