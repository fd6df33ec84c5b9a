-- Marker-stopword language-ID confusion counts (engine extension)
SELECT lang AS actual,
       CASE WHEN size(filter(split(trim(text), '\\s+'), t -> t IN ('the','a','of','and')))
                 / cast(size(split(trim(text), '\\s+')) AS DOUBLE) >= 0.05
            THEN 'en' ELSE 'other' END AS predicted,
       count(*) AS n
FROM ${database}.${schema}.documents
GROUP BY 1, 2 ORDER BY 1, 2
