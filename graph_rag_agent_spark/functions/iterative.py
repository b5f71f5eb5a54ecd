"""Checkpoint helper for iterative DataFrame algorithms.

``Dataset.localCheckpoint`` truncates the LINEAGE but (since Spark 3.4,
SPARK-40211 era behavior, still true in 4.x) the resulting ``LogicalRDD``
carries the ORIGIN plan's estimated statistics and constraints. In an
iterative algorithm this compounds catastrophically: every sweep's plan
joins the previous checkpoint several times, ``SizeInBytesOnlyStatsPlanVisitor``
multiplies the children's ``sizeInBytes``, and the checkpoint hands that
product to the next iteration as its leaf estimate. The estimate grows
geometrically — measured on a 24-node label-propagation loop, the
``sizeInBytes`` BigInt had 38,468 digits after 10 sweeps, and every
join-selection / AQE re-optimization pass then burns minutes in
``java.math.BigInteger`` Karatsuba/Toom-Cook multiplication (a 200×
slowdown of a sub-second sweep, observed via jstack).

``loop_checkpoint`` materializes the frame like ``localCheckpoint(eager)``
and then rebuilds the DataFrame directly over the checkpointed
``RDD[InternalRow]``, discarding the inherited stats: the new leaf reports
the honest default (``spark.sql.defaultSizeInBytes``), so per-iteration
planning cost stays CONSTANT. Join-strategy consequences are nil for the
loops using it — their joins are key-partitioned shuffles either way, and
AQE still sees exact runtime sizes at stage boundaries.

Falls back to the plain checkpoint if the private ``internalCreateDataFrame``
bridge disappears in a future Spark (the loops stay correct, just slower).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def loop_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint WITHOUT origin-stats inheritance — use inside
    iterative loops (CC, LPA, local-move) where checkpoints chain."""
    df = df.localCheckpoint(eager=True)
    try:
        jdf = df._jdf
        jrdd = jdf.queryExecution().toRdd()
        jspark = df.sparkSession._jsparkSession
        new_jdf = jspark.internalCreateDataFrame(jrdd, jdf.schema(), False)
        return DataFrame(new_jdf, df.sparkSession)
    except Exception:  # private-API drift: degrade to the stock behavior
        return df
