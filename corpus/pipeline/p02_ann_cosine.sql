-- Brute-force cosine top-k (engine extension)
WITH e AS (SELECT vec_id, transform(embedding, x -> cast(x AS DOUBLE)) AS v FROM ${database}.${schema}.embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
s AS (SELECT query_id, vec_id,
        round(aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (a, x) -> a + x)
          / (sqrt(aggregate(qv, 0D, (a, x) -> a + x * x))
             * sqrt(aggregate(v, 0D, (a, x) -> a + x * x))), 6) AS sim
      FROM q JOIN e ON query_id <> vec_id)
SELECT * FROM (SELECT query_id, vec_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
               FROM s) WHERE rnk <= 5 ORDER BY query_id, rnk
