-- Per-language text-quality aggregates (engine extension)
SELECT lang,
       count(*) AS n_docs,
       round(avg(size(split(trim(text), '\\s+'))), 2) AS avg_tokens,
       round(avg(length(text)), 2) AS avg_chars
FROM ${database}.${schema}.documents
GROUP BY lang ORDER BY lang
