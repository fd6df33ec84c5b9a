-- Cross join of single-row aggregate buckets (shape of reference tpcds/q88.sql)
SELECT b1.cnt AS h1, b2.cnt AS h2, b3.cnt AS h3, b4.cnt AS h4
FROM (SELECT count(*) cnt FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 0 AND 12) b1,
     (SELECT count(*) cnt FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 13 AND 25) b2,
     (SELECT count(*) cnt FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 26 AND 38) b3,
     (SELECT count(*) cnt FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 39 AND 50) b4
