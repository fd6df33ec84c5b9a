"""iceberg_benchmark_java_spark — PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``ajayky-os/iceberg-benchmark-java`` (reference surveyed in SURVEY.md),
expressed Spark-first:

- ``session``   — SparkSession factory with the reference's conf surface
                  (Iceberg catalog wiring when the runtime jar is present,
                  parquet-view fallback otherwise).
- ``catalog``   — table registration / Iceberg bootstrap (SURVEY §7 M1).
- ``harness``   — benchmark harness operators A1-A15 (SURVEY §2-A):
                  query discovery, templating, timed noop execution,
                  metrics collection, results CSV publishing.
- ``queries``   — the relational operator inventory (SURVEY §2-B) as
                  composable DataFrame builders, each paired with an
                  ANSI-SQL oracle for DuckDB cross-checking.
- ``operators`` — large-scale training-data pipeline operators: dedup
                  (exact / minhash-LSH / simhash / n-gram Jaccard),
                  similarity search, text analysis, multimodal plumbing.
- ``streaming`` — Structured Streaming ingestion over the events table.
"""

__version__ = "0.1.0"
