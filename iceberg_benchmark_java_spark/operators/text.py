"""Text-analysis operators for training-data curation.

All metrics are pure JVM column expressions (split / regexp / aggregate) —
no Python UDFs in the hot path — and every ratio is rounded to a fixed
scale so results are engine- and partitioning-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RATIO_SCALE = 6

# Tiny in-corpus stopword sets used by the language-ID heuristic. The
# fixture corpus is synthetic (English-ish vocabulary with a lang label),
# so the heuristic is calibrated to its vocabulary; for real corpora swap
# in per-language n-gram tables.
EN_MARKERS = ("the", "a", "of", "and")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the reference tokenizer for counting)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-ish proxy: word-piece count after splitting on word boundaries
    AND digit/letter transitions, ~ sub-word granularity without a
    vocabulary. Deterministic regex split, JVM-side."""
    pieces = F.split(
        F.trim(col), r"(\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z]))"
    )
    return F.size(pieces)


def stopword_ratio(col: Column, markers: tuple[str, ...] = EN_MARKERS) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return hits / F.size(toks)


def quality_metrics(docs: DataFrame) -> DataFrame:
    """Per-doc quality metrics: length, token stats, stopword ratio, a
    composite quality score, and a quality bucket."""
    t = F.col("text")
    n_tok = token_count(t)
    avg_tok_len = (F.length(F.regexp_replace(t, r"\s+", "")) / n_tok)
    sw = stopword_ratio(t)
    score = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.5
        + F.least(sw * 5.0, F.lit(1.0)) * 0.3
        + F.least(avg_tok_len / 8.0, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        "lang",
        F.length(t).alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        F.round(avg_tok_len, RATIO_SCALE).alias("avg_token_len"),
        F.round(sw, RATIO_SCALE).alias("stopword_ratio"),
        F.round(score, RATIO_SCALE).alias("quality_score"),
    )


def predict_lang(col: Column) -> Column:
    """Marker-stopword language-ID heuristic: high English-marker density →
    'en', else 'other'. (n-gram-table LID reduces to the same
    explode/score/argmax plan shape.)"""
    return F.when(stopword_ratio(col) >= 0.05, F.lit("en")).otherwise(F.lit("other"))


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Confusion counts of predicted vs labeled language."""
    return (
        docs.select(F.col("lang").alias("actual"), predict_lang(F.col("text")).alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count("*").alias("n"))
    )


def fingerprint(col: Column) -> Column:
    """Normalization fingerprint: lowercase, tokenize, distinct, sort,
    md5 — robust to word order and repetition (the classic fingerprint
    dedup key)."""
    toks = F.array_sort(F.array_distinct(tokens(F.lower(col))))
    return F.md5(F.array_join(toks, " "))


def fingerprint_clusters(docs: DataFrame) -> DataFrame:
    """Groups of docs sharing a normalization fingerprint (>1 member)."""
    return (
        docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )
