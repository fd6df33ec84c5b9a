-- Normalization-fingerprint duplicate clusters (engine extension)
SELECT md5(array_join(array_sort(array_distinct(split(trim(lower(text)), '\\s+'))), ' ')) AS fp,
       count(*) AS n_docs, min(doc_id) AS canonical_id
FROM ${database}.${schema}.documents
GROUP BY 1 HAVING count(*) > 1
ORDER BY n_docs DESC, canonical_id
