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
