"""Consistency audits + repair (reference graph_consistency_validator.py:37-430)."""

from graph_rag_agent_spark.operators.consistency import (
    audit_broken_chains,
    audit_edge_endpoints,
    audit_empty_chunks,
    audit_orphan_entities,
    repair,
    validation_report,
)


def _fixtures(spark):
    chunks = spark.createDataFrame(
        [("d1", "c1", "hello", 1, "c1", 2),
         ("d1", "c2", "world", 2, "c1", 2),
         ("d2", "c3", "", 1, "c3", 0),          # empty chunk
         ("d3", "c4", "oops", 2, "c4", 1)],     # broken chain: starts at 2
        "doc_id string, chunk_id string, text string, position int, prev_chunk_id string, tokens int",
    )
    nodes = spark.createDataFrame(
        [("A", "t", "d"), ("B", "t", "d"), ("Orphan", "t", "d")],
        "entity_id string, entity_type string, description string",
    )
    mentions = spark.createDataFrame(
        [("c1", "A"), ("c2", "B"), ("cGONE", "B")],
        "chunk_id string, entity_id string",
    )
    edges = spark.createDataFrame(
        [("A", "p", "B", "d", 1.0, "c1"), ("A", "p", "Missing", "d", 1.0, "c1")],
        "subj string, pred string, obj string, description string, weight double, chunk_id string",
    )
    return chunks, nodes, mentions, edges


def test_audits(spark):
    chunks, nodes, mentions, edges = _fixtures(spark)
    assert {r.entity_id for r in audit_orphan_entities(nodes, mentions).collect()} == {"Orphan"}
    assert {r.chunk_id for r in audit_empty_chunks(chunks).collect()} == {"c3"}
    broken = {r.chunk_id for r in audit_broken_chains(chunks).collect()}
    assert "c4" in broken and "c1" not in broken and "c2" not in broken
    assert {r.obj for r in audit_edge_endpoints(edges, nodes).collect()} == {"Missing"}
    report = {r.check: r.violation_count for r in
              validation_report(nodes, edges, mentions, chunks).collect()}
    assert report["orphan_entities"] == 1
    assert report["dangling_mentions"] == 1
    assert report["edge_endpoints_missing"] == 1


def test_repair_restores_invariants(spark):
    chunks, nodes, mentions, edges = _fixtures(spark)
    n2, e2, m2 = repair(nodes, edges, mentions, chunks)
    report = {r.check: r.violation_count for r in
              validation_report(n2, e2, m2, chunks).collect()}
    assert report["orphan_entities"] == 0
    assert report["dangling_mentions"] == 0
    assert report["edge_endpoints_missing"] == 0
