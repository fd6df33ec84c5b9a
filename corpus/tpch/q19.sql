-- OR-of-ANDs predicate blocks (shape of reference tpch/q19.sql)
SELECT sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM ${database}.${schema}.lineitem l, ${database}.${schema}.part p
WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
       AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
       AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
       AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity >= 20 AND l.l_quantity <= 30)
