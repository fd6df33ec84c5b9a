-- UNION (distinct) of channel rows feeding year-over-year compare (shape of reference tpcds/q75.sql)
WITH all_sales AS (
  SELECT extract(year FROM o.o_orderdate) AS yr, l.l_partkey AS item,
         sum(l.l_quantity) AS qty, sum(l.l_extendedprice) AS amt
  FROM ${database}.${schema}.lineitem l, ${database}.${schema}.orders o
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'N'
  GROUP BY 1, 2
  UNION
  SELECT extract(year FROM o.o_orderdate) AS yr, l.l_partkey AS item,
         sum(l.l_quantity) AS qty, sum(l.l_extendedprice) AS amt
  FROM ${database}.${schema}.lineitem l, ${database}.${schema}.orders o
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  GROUP BY 1, 2)
SELECT prev.yr AS prev_year, curr.yr AS year, curr.item,
       prev.qty AS prev_qty, curr.qty AS curr_qty
FROM all_sales curr, all_sales prev
WHERE curr.item = prev.item AND curr.yr = prev.yr + 1
  AND curr.qty < prev.qty
ORDER BY prev_year, year, curr.item LIMIT 100
