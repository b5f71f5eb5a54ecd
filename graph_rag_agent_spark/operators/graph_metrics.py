"""Graph-quality evaluation metrics.

Re-expression of the reference's evaluation framework graph metrics
(evaluation/metrics/graph_metrics.py — EntityCoverageMetric:1009,
RelationshipUtilizationMetric:1302, GraphCoverageMetric:635,
SubgraphQualityMetric:242, CommunityRelevanceMetric:6) as deterministic
DataFrame computations over the built tables; each returns a one-row
DataFrame (metric, value) so reports compose with unionByName.

The reference scores retrieval results against an LLM answer; our build-time
variants score the GRAPH itself — the same quantities its metrics derive
(coverage ratios, utilization, density) computed over the whole graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _one(spark, name: str, value: float) -> DataFrame:
    return spark.createDataFrame([(name, float(value))], "metric string, value double")


def entity_coverage(nodes: DataFrame, mentions: DataFrame) -> DataFrame:
    """Fraction of mentioned entity ids that exist in the nodes table
    (EntityCoverageMetric semantics: how much of what the corpus mentions
    the graph actually models)."""
    spark = nodes.sparkSession
    mentioned = mentions.select("entity_id").distinct()
    covered = mentioned.join(nodes.select("entity_id").distinct(), on="entity_id", how="left_semi")
    total = mentioned.count()
    return _one(spark, "entity_coverage", (covered.count() / total) if total else 1.0)


def relationship_utilization(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Fraction of entities participating in ≥1 relationship
    (RelationshipUtilizationMetric: isolated entities are dead weight)."""
    spark = nodes.sparkSession
    endpoints = (
        edges.select(F.col("subj").alias("entity_id"))
        .unionByName(edges.select(F.col("obj").alias("entity_id")))
        .distinct()
    )
    used = nodes.join(endpoints, on="entity_id", how="left_semi")
    total = nodes.count()
    return _one(spark, "relationship_utilization", (used.count() / total) if total else 1.0)


def graph_coverage(chunks: DataFrame, mentions: DataFrame) -> DataFrame:
    """Fraction of chunks contributing ≥1 mention (GraphCoverageMetric:
    silent chunks mean extraction missed content)."""
    spark = chunks.sparkSession
    all_chunks = chunks.select("chunk_id").distinct()
    covered = all_chunks.join(
        mentions.select("chunk_id").distinct(), on="chunk_id", how="left_semi"
    )
    total = all_chunks.count()
    return _one(spark, "graph_coverage", (covered.count() / total) if total else 1.0)


def community_relevance(membership: DataFrame, edges: DataFrame) -> DataFrame:
    """Mean intra-community edge ratio at level 0 (CommunityRelevanceMetric
    analogue: how much of the edge mass falls inside communities)."""
    spark = membership.sparkSession
    m = membership.filter(F.col("level") == 0).select(
        F.col("member_id"), F.col("community_id")
    )
    total = edges.count()
    if not total:
        return _one(spark, "community_relevance", 1.0)
    intra = (
        edges.join(m.withColumnRenamed("member_id", "subj"), on="subj")
        .join(
            m.withColumnRenamed("member_id", "obj").withColumnRenamed("community_id", "_c2"),
            on="obj",
        )
        .filter(F.col("community_id") == F.col("_c2"))
        .count()
    )
    return _one(spark, "community_relevance", intra / total)


def subgraph_quality(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Weighted mean of placeholder-free node ratio and parallel-edge-free
    edge ratio (SubgraphQualityMetric analogue: structural cleanliness)."""
    from graph_rag_agent_spark.config import UNKNOWN_ENTITY_TYPE

    spark = nodes.sparkSession
    n_total = nodes.count()
    n_known = nodes.filter(F.col("entity_type") != UNKNOWN_ENTITY_TYPE).count()
    e_total = edges.count()
    e_distinct = edges.select("subj", "pred", "obj").distinct().count()
    node_ratio = (n_known / n_total) if n_total else 1.0
    edge_ratio = (e_distinct / e_total) if e_total else 1.0
    return _one(spark, "subgraph_quality", 0.5 * node_ratio + 0.5 * edge_ratio)


def graph_quality_report(
    nodes: DataFrame,
    edges: DataFrame,
    mentions: DataFrame,
    chunks: DataFrame,
    membership: DataFrame,
) -> DataFrame:
    """All five metrics as one (metric, value) DataFrame."""
    return (
        entity_coverage(nodes, mentions)
        .unionByName(relationship_utilization(nodes, edges))
        .unionByName(graph_coverage(chunks, mentions))
        .unionByName(community_relevance(membership, edges))
        .unionByName(subgraph_quality(nodes, edges))
    )
