"""Graph-quality metrics + online entity linking (D9)."""

from graph_rag_agent_spark.functions.embedder import embed_text
from graph_rag_agent_spark.operators.entity_linking import link_mention, string_recall
from graph_rag_agent_spark.operators.graph_metrics import graph_quality_report


def _tables(spark):
    nodes = spark.createDataFrame(
        [("DataLoader", "class", "class DataLoader"),
         ("HttpClient", "class", "class HttpClient"),
         ("Ghost", "未知", "No additional data")],
        "entity_id string, entity_type string, description string",
    )
    edges = spark.createDataFrame(
        [("DataLoader", "calls", "HttpClient", "d", 1.0, "c1"),
         ("DataLoader", "calls", "HttpClient", "d", 1.0, "c2")],
        "subj string, pred string, obj string, description string, weight double, chunk_id string",
    )
    mentions = spark.createDataFrame(
        [("c1", "DataLoader"), ("c1", "HttpClient"), ("c2", "DataLoader"),
         ("c2", "HttpClient"), ("c2", "Ghost")],
        "chunk_id string, entity_id string",
    )
    chunks = spark.createDataFrame(
        [("c1",), ("c2",), ("c3",)], "chunk_id string"
    )
    membership = spark.createDataFrame(
        [("0-0", 0, "DataLoader"), ("0-0", 0, "HttpClient"), ("0-1", 0, "Ghost")],
        "community_id string, level int, member_id string",
    )
    return nodes, edges, mentions, chunks, membership


def test_graph_quality_report(spark):
    nodes, edges, mentions, chunks, membership = _tables(spark)
    got = {r.metric: r.value for r in
           graph_quality_report(nodes, edges, mentions, chunks, membership).collect()}
    assert got["entity_coverage"] == 1.0
    assert abs(got["relationship_utilization"] - 2 / 3) < 1e-9  # Ghost isolated
    assert abs(got["graph_coverage"] - 2 / 3) < 1e-9            # c3 silent
    assert got["community_relevance"] == 1.0                    # both edges intra 0-0
    # nodes: 2/3 known; edges: 1/2 distinct → 0.5*(2/3) + 0.5*0.5
    assert abs(got["subgraph_quality"] - (0.5 * 2 / 3 + 0.25)) < 1e-9


def test_string_recall_and_link(spark):
    nodes, *_ = _tables(spark)
    emb = spark.createDataFrame(
        [(r.entity_id, [float(x) for x in embed_text(f"{r.entity_id} {r.description}")])
         for r in nodes.collect()],
        "entity_id string, embedding array<float>",
    )
    got = string_recall(nodes, "Data_Loader").collect()
    assert got and got[0].entity_id == "DataLoader"

    linked = link_mention(nodes, emb, "Data_Loader").collect()
    assert len(linked) == 1 and linked[0].entity_id == "DataLoader"
    assert linked[0].score >= 0.6

    # NIL: nothing close enough
    assert link_mention(nodes, emb, "zzzzzzz").collect() == []
