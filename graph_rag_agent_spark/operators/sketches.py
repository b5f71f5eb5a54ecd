"""Distinct-count sketches over grouped streams.

``kmv_distinct`` — the K-Minimum-Values sketch (Bar-Yossef et al. 2002;
the Theta-sketch family's simplest member): per group, retain only the k
smallest values of a uniform hash of the ids; the (k-1)/h_k estimator
(h_k = k-th smallest hash mapped into (0,1]) is unbiased with relative
error ≈ 1/√(k−2). Because the hash is md5 (engine-portable) and the
estimator is a pure function of the k-th order statistic, the WHOLE sketch
— not just its error bound — is deterministic and value-checked against a
DuckDB twin, something an HLL register array can never be.

Spark's production-grade counterpart, ``approx_count_distinct`` (HLL++,
map-side partial aggregation, tunable rsd), is exposed alongside for the
cases where a ±2% answer at lower shuffle cost beats checkability; the
pytest bounds its error against exact counts.

Scale shape: kmv first DISTINCTs (group, id) — one shuffle that also
dedups — then sorts only within each group's distinct-hash set to take the
k smallest (row_number window). On a real deployment with extreme groups a
TypedImperativeAggregate holding the k-min heap would replace the window
sort (partial-aggregating, O(k) state per group per task); the window form
keeps the plan pure-DataFrame and the estimator identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_HEX_DIGITS = 13               # 52 bits — exact in an IEEE double
_HEX_SPACE = float(16 ** _HEX_DIGITS)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """→ (group, n_retained, estimate): deterministic KMV distinct-count
    estimate per group; groups with fewer than k distinct ids report the
    EXACT count (the sketch is lossless below its capacity)."""
    d = (
        df.select(group_col, F.col(id_col).cast("string").alias("_id"))
        .distinct()
        .withColumn(
            "_h",
            F.conv(F.substring(F.md5(F.col("_id")), 1, _HEX_DIGITS), 16, 10)
            .cast("double") / F.lit(_HEX_SPACE),
        )
    )
    w = Window.partitionBy(group_col).orderBy(F.col("_h").asc(), F.col("_id").asc())
    kept = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (
        kept.groupBy(group_col)
        .agg(F.count("*").alias("n_retained"), F.max("_h").alias("_hk"))
        .select(
            group_col,
            F.col("n_retained").cast("long").alias("n_retained"),
            F.round(
                F.when(F.col("n_retained") < k, F.col("n_retained").cast("double"))
                .otherwise(F.lit(float(k - 1)) / F.col("_hk")),
                6,
            ).alias("estimate"),
        )
    )


def hll_distinct(
    df: DataFrame, group_col: str, id_col: str, rsd: float = 0.02
) -> DataFrame:
    """→ (group, approx_distinct): Spark's native HLL++ — map-side partial
    aggregation, O(registers) state, the production path when a bounded
    relative error beats the KMV's exact checkability."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(id_col, rsd).alias("approx_distinct")
    )
