-- Curation funnel: raw -> stopword-density keep -> exact-dedup (engine extension)
WITH scored AS (
  SELECT doc_id, text,
         size(filter(split(trim(text), '\\s+'), t -> t IN ('the','a','of','and')))
           / cast(size(split(trim(text), '\\s+')) AS DOUBLE) AS sw_ratio
  FROM ${database}.${schema}.documents),
kept AS (SELECT doc_id, text FROM scored WHERE sw_ratio >= 0.05)
SELECT (SELECT count(*) FROM ${database}.${schema}.documents) AS n_raw,
       (SELECT count(*) FROM kept) AS n_lang,
       (SELECT count(DISTINCT md5(text)) FROM kept) AS n_unique
