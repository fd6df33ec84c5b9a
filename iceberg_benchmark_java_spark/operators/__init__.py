"""Large-scale training-data pipeline operators.

These are the engine's extensions beyond the reference's relational surface
(BASELINE.json north-star): deduplication, similarity search, text
analysis, and multimodal column plumbing — each designed Spark-first for
100 TB inputs and exposed as composable DataFrame transformations.

Modules:
- ``dedup``       — exact, MinHash+LSH, SimHash, n-gram Jaccard.
- ``similarity``  — brute-force cosine top-k; sign-LSH bucketed ANN.
- ``text``        — language-ID heuristic, quality scoring, token counts,
                    document fingerprinting.
- ``multimodal``  — binary media columns with typed metadata; decode /
                    feature-extract plumbing over mapInPandas (decode kernel
                    stubbed — media libs are not available in this env).
"""
