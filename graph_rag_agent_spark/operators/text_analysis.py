"""Text analysis operators for training-data curation — all pure Spark SQL
expressions (JVM-side, whole-stage codegen; no UDFs), each with an exact
DuckDB-SQL oracle equivalent in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic per-language marker words for the n-gram/stopword language-ID
# heuristic; tie order = alphabetical language code
LANG_MARKERS = {
    "de": ["der", "die", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "is", "with"],
    "es": ["el", "la", "que", "los", "una"],
    "fr": ["le", "la", "les", "est", "une"],
}


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_tokens, n_distinct_tokens, avg_token_len)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
            / F.size(toks)
        ).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ length / punctuation-ratio / stopword-ratio / distinct-ratio quality
    features + a boolean keep flag (the classic pre-training filters)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[\w\s]+", "")) / F.length(text_col)
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        n.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        n_stop.alias("n_stopword_types"),
        ((n >= 10) & (distinct_ratio > 0.2)).alias("keep"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, pred_lang): argmax of marker-word hits, ties → first
    language code alphabetically, no hits → 'und'."""
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(f"_s_{code}")
        for code, words in sorted(LANG_MARKERS.items())
    ]
    df = docs.select(F.col(id_col).alias("doc_id"), *scores)
    best = F.greatest(*[F.col(f"_s_{c}") for c in sorted(LANG_MARKERS)])
    pred = F.when(best == 0, F.lit("und"))
    for code in sorted(LANG_MARKERS):
        pred = pred.when(F.col(f"_s_{code}") == best, F.lit(code))
    return df.select("doc_id", pred.alias("pred_lang"))


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, fingerprint): md5 of the whitespace/case-normalized text —
    the canonical dedup fingerprint (stable across engines)."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.md5(normalized).alias("fingerprint")
    )
