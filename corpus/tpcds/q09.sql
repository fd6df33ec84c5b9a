-- Bucketed CASE over scalar subqueries in SELECT (shape of reference tpcds/q09.sql)
SELECT CASE WHEN (SELECT count(*) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 1 AND 10) > 2000
            THEN (SELECT avg(l_extendedprice) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 1 AND 10)
            ELSE (SELECT avg(l_discount) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 1 AND 10) END AS bucket1,
       CASE WHEN (SELECT count(*) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 11 AND 20) > 2000
            THEN (SELECT avg(l_extendedprice) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 11 AND 20)
            ELSE (SELECT avg(l_discount) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 11 AND 20) END AS bucket2,
       CASE WHEN (SELECT count(*) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 21 AND 30) > 2000
            THEN (SELECT avg(l_extendedprice) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 21 AND 30)
            ELSE (SELECT avg(l_discount) FROM ${database}.${schema}.lineitem WHERE l_quantity BETWEEN 21 AND 30) END AS bucket3
FROM ${database}.${schema}.region WHERE r_regionkey = 0
