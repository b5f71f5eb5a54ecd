"""Parse wire-format extraction results → nodes / edges / mentions tables.

Reference: GraphWriter.convert_to_graph_document (graph_writer.py:36-131):
two regexes pull entity and relationship records out of the raw text,
relationship endpoints missing from the entity set get placeholder nodes
(type 未知), the node_cache keeps first-wins properties per entity id, and
every chunk's node set becomes MENTIONS provenance.

Spark mapping — everything JVM-side (regexp_extract_all + explode inside
whole-stage codegen; no Python in this stage):

- E4/E5 parse      → regexp_extract_all(raw, pattern, 0) → explode →
                     regexp_extract per group
- E6 placeholders  → endpoints LEFT ANTI JOIN declared entities → synth rows
- E7 first-wins    → row_number() over (partition by entity_id
                     order by chunk_id) == 1 (deterministic stand-in for the
                     reference's thread-completion-order cache; documented
                     deviation, same property set per name in practice)
- E8 mentions      → per-chunk node set (declared ∪ placeholder endpoints),
                     dropDuplicates

Scale notes: the only shuffles are the two dedup/groupBys on entity_id and
(chunk_id, entity_id) — both well-distributed keys. Edges stay partitioned
by chunk provenance; no driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_rag_agent_spark.config import (
    UNKNOWN_ENTITY_DESCRIPTION,
    UNKNOWN_ENTITY_TYPE,
)
from graph_rag_agent_spark.functions.wire_format import (
    ENTITY_PATTERN,
    RELATIONSHIP_PATTERN,
)


def parse_entities(results: DataFrame) -> DataFrame:
    """(chunk_id, raw_result) → (chunk_id, entity_id, entity_type, description),
    one row per entity record, first occurrence per (chunk, entity) kept."""
    rec = F.explode(
        F.regexp_extract_all(F.col("raw_result"), F.lit(ENTITY_PATTERN), F.lit(0))
    ).alias("rec")
    return (
        results.select("chunk_id", rec)
        .select(
            "chunk_id",
            F.regexp_extract("rec", ENTITY_PATTERN, 1).alias("entity_id"),
            F.regexp_extract("rec", ENTITY_PATTERN, 2).alias("entity_type"),
            F.regexp_extract("rec", ENTITY_PATTERN, 3).alias("description"),
        )
        .dropDuplicates(["chunk_id", "entity_id"])
    )


def parse_relationships(results: DataFrame) -> DataFrame:
    """(chunk_id, raw_result) → edges(subj, pred, obj, description, weight, chunk_id)."""
    rec = F.explode(
        F.regexp_extract_all(F.col("raw_result"), F.lit(RELATIONSHIP_PATTERN), F.lit(0))
    ).alias("rec")
    return (
        results.select("chunk_id", rec)
        .select(
            F.regexp_extract("rec", RELATIONSHIP_PATTERN, 1).alias("subj"),
            F.regexp_extract("rec", RELATIONSHIP_PATTERN, 3).alias("pred"),
            F.regexp_extract("rec", RELATIONSHIP_PATTERN, 2).alias("obj"),
            F.regexp_extract("rec", RELATIONSHIP_PATTERN, 4).alias("description"),
            F.regexp_extract("rec", RELATIONSHIP_PATTERN, 5)
            .cast("double")
            .alias("weight"),
            F.col("chunk_id"),
        )
        .filter(F.col("weight").isNotNull())
        # wire order is (src, tgt, type, ...) → (subj, obj, pred); reorder
        .select("subj", "pred", "obj", "description", "weight", "chunk_id")
    )


def synthesize_placeholder_nodes(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """Relationship endpoints never declared as entities → 未知 placeholder
    rows, attributed to the chunk that referenced them (graph_writer.py:74-98)."""
    endpoints = (
        edges.select(F.col("chunk_id"), F.col("subj").alias("entity_id"))
        .unionByName(edges.select(F.col("chunk_id"), F.col("obj").alias("entity_id")))
        .dropDuplicates(["chunk_id", "entity_id"])
    )
    missing = endpoints.join(
        entities.select("entity_id").dropDuplicates(["entity_id"]),
        on="entity_id",
        how="left_anti",
    )
    return missing.select(
        "chunk_id",
        "entity_id",
        F.lit(UNKNOWN_ENTITY_TYPE).alias("entity_type"),
        F.lit(UNKNOWN_ENTITY_DESCRIPTION).alias("description"),
    )


def build_graph_tables(results: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(chunk_id, raw_result) → (nodes, edges, mentions).

    nodes(entity_id, entity_type, description)       — first-wins per id
    edges(subj, pred, obj, description, weight, chunk_id)
    mentions(chunk_id, entity_id)
    """
    entities = parse_entities(results)
    edges = parse_relationships(results)
    placeholders = synthesize_placeholder_nodes(entities, edges)
    all_entities = entities.unionByName(placeholders)

    first_wins = Window.partitionBy("entity_id").orderBy("chunk_id")
    nodes = (
        all_entities.withColumn("_rn", F.row_number().over(first_wins))
        .filter(F.col("_rn") == 1)
        .select("entity_id", "entity_type", "description")
    )
    mentions = all_entities.select("chunk_id", "entity_id").dropDuplicates(
        ["chunk_id", "entity_id"]
    )
    return nodes, edges, mentions
