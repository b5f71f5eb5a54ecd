"""Rule-based retrieval evaluation metrics as map-only DataFrame plans.

The structural (non-LLM) half of the reference's retrieval evaluation
framework (evaluation/metrics/retrieval_metrics.py):

- RetrievalPrecision._calculate_rule_precision (:100-131): per sample,
  a reference entity counts as matched when its lowercased string is a
  SUBSTRING of any lowercased retrieved entity (rule 1), or when its
  first digit-run appears in any retrieved string (rule 2); matched =
  max(rule1, rule2); score = max(0.3, 0.3 + 0.7·matched/|ref|) when
  matched > 0 else the 0.3 floor.
- RetrievalUtilization._calculate_rule_utilization (:280-316): the same
  two match rules, plus a partial-token fallback — when nothing matched
  but any >3-char whitespace token of a reference entity appears in the
  space-joined retrieved text, matched = 1 with a fixed 0.4 score.

The LLM-judged branches of both metrics are out of rebuild scope (same
boundary as every other LLM subsystem — see SURVEY §2 n/a rows).

Scale shape: one row per evaluated query with two bounded string arrays;
every rule is an array higher-order function (`exists`/`filter`/
`aggregate`) over those in-row arrays — whole-stage codegen, zero
shuffle, zero Python, embarrassingly parallel over 10⁹ eval rows. The
per-row work is O(|ref|·|retr|) on arrays that are top-k bounded by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _lower_arr(col: str):
    return F.transform(F.col(col), lambda x: F.lower(x))


def _substring_matched(refs, retrs):
    """rule 1: # of refs that are a substring of ANY retrieved string."""
    return F.size(
        F.filter(refs, lambda r: F.exists(retrs, lambda t: t.contains(r)))
    )


def _digit_matched(refs, retrs):
    """rule 2: # of refs whose first digit-run appears in ANY retrieved
    string (refs without digits never match — regexp_extract yields '')."""
    return F.size(
        F.filter(
            refs,
            lambda r: (F.regexp_extract(r, r"\d+", 0) != F.lit(""))
            & F.exists(
                retrs, lambda t: t.contains(F.regexp_extract(r, r"\d+", 0))
            ),
        )
    )


def retrieval_metrics(
    samples: DataFrame,
    query_col: str = "query_id",
    retrieved_col: str = "retrieved",
    reference_col: str = "reference",
) -> DataFrame:
    """(query_id, retrieved array<string>, reference array<string>) →
    (query_id, prec_matched, precision, util_matched, utilization) with the
    reference's exact rule arithmetic, rounded to 6 for cross-engine
    comparison."""
    refs = _lower_arr(reference_col)
    retrs = _lower_arr(retrieved_col)
    n_ref = F.size(refs)

    matched = F.greatest(
        _substring_matched(refs, retrs), _digit_matched(refs, retrs)
    )
    score = F.when(
        matched > 0,
        F.greatest(
            F.lit(0.3),
            F.lit(0.3) + F.lit(0.7) * matched.cast("double") / n_ref.cast("double"),
        ),
    ).otherwise(F.lit(0.3))

    # utilization fallback: any >3-char token of any ref inside the
    # space-joined retrieved text (reference :308-313) → matched 1, 0.4
    joined = F.array_join(retrs, " ")
    partial = F.exists(
        refs,
        lambda r: F.exists(
            F.filter(F.split(r, "\\s+"), lambda t: F.length(t) > 3),
            lambda t: joined.contains(t),
        ),
    )
    util_matched = F.when(matched > 0, matched).when(partial, F.lit(1)).otherwise(
        F.lit(0)
    )
    util_score = (
        F.when(matched > 0, score)
        .when(partial, F.lit(0.4))
        .otherwise(F.lit(0.3))
    )

    return samples.select(
        F.col(query_col).alias("query_id"),
        matched.alias("prec_matched"),
        F.round(score, 6).alias("precision"),
        util_matched.alias("util_matched"),
        F.round(util_score, 6).alias("utilization"),
    )


# the reference's key-phrase pattern (retrieval_metrics.py:506) with the
# CJK range as literal characters so the Java and RE2 engines parse the
# identical class; {4,} already enforces the reference's len>3 re-filter
_KEY_PHRASE_RE = "\\b[\\w一-龥]{4,}\\b"


def chunk_utilization(
    samples: DataFrame,
    chunks: DataFrame,
    query_col: str = "query_id",
    answer_col: str = "answer",
    chunk_ids_col: str = "chunk_ids",
    chunk_id_col: str = "chunk_id",
    text_col: str = "text",
) -> DataFrame:
    """ChunkUtilization's rule branch (reference retrieval_metrics.py:
    430-537, Neo4j-lookup path): per referenced chunk, key phrases =
    distinct ``\\b[\\w CJK]{4,}\\b`` matches in the chunk text; the chunk's
    ratio = fraction of those phrases appearing (lowercased substring) in
    the answer; per-sample score = mean ratio over chunks WITH text
    (phrase-less chunks count in the denominator, :518-526); samples whose
    reference list resolves to no chunk text score the 0.3 base
    (:447-459, :533-537). The LLM fallback branches are out of scope (same
    boundary as every LLM subsystem).

    Scale shape: one explode of the bounded per-sample chunk-id arrays,
    one key-partitioned join against the chunk table (the Cypher per-id
    lookup loop becomes a single hash join), phrase extraction and
    matching as in-row higher-order exprs, one groupBy back per sample.
    → (query_id, n_chunks, chunk_utilization)."""
    exploded = samples.select(
        F.col(query_col).alias("query_id"),
        F.lower(F.col(answer_col)).alias("_ans"),
        F.explode_outer(chunk_ids_col).alias("chunk_id"),
    )
    ch = chunks.select(
        F.col(chunk_id_col).alias("chunk_id"), F.col(text_col).alias("_text")
    )
    joined = exploded.join(ch, on="chunk_id", how="left")
    phrases = F.array_distinct(
        F.regexp_extract_all(F.col("_text"), F.lit(_KEY_PHRASE_RE), 0)
    )
    ratio = F.when(
        F.size(phrases) > 0,
        F.size(
            F.filter(phrases, lambda p: F.col("_ans").contains(F.lower(p)))
        ).cast("double")
        / F.size(phrases).cast("double"),
    ).otherwise(F.lit(0.0))
    per_chunk = joined.select(
        "query_id",
        F.when(F.col("_text").isNotNull(), ratio).alias("_ratio"),
    )
    agg = per_chunk.groupBy("query_id").agg(
        F.count("_ratio").alias("n_chunks"),
        F.sum("_ratio").alias("_total"),
    )
    return agg.select(
        "query_id",
        F.col("n_chunks").cast("int").alias("n_chunks"),
        F.round(
            F.when(
                F.col("n_chunks") > 0, F.col("_total") / F.col("n_chunks")
            ).otherwise(F.lit(0.3)),
            6,
        ).alias("chunk_utilization"),
    )
