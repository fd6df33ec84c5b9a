-- MinHash-LSH candidate pairs over documents (engine extension)
WITH words AS (SELECT doc_id, split(trim(text), '\\s+') AS w FROM ${database}.${schema}.documents),
sh AS (SELECT DISTINCT doc_id, shingle
       FROM words LATERAL VIEW explode(transform(sequence(1, greatest(size(w) - 2, 1)),
            i -> concat_ws(' ', slice(w, i, 3)))) t AS shingle),
sig AS (SELECT doc_id,
        min(md5(concat('0|', shingle))) AS h0, min(md5(concat('1|', shingle))) AS h1,
        min(md5(concat('2|', shingle))) AS h2, min(md5(concat('3|', shingle))) AS h3,
        min(md5(concat('4|', shingle))) AS h4, min(md5(concat('5|', shingle))) AS h5,
        min(md5(concat('6|', shingle))) AS h6, min(md5(concat('7|', shingle))) AS h7
        FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band_idx, concat(h0, h1) AS band_key FROM sig UNION ALL
  SELECT doc_id, 1, concat(h2, h3) FROM sig UNION ALL
  SELECT doc_id, 2, concat(h4, h5) FROM sig UNION ALL
  SELECT doc_id, 3, concat(h6, h7) FROM sig)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
