"""Community detection/summarization (reference G1-G10)."""

from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.communities import (
    community_membership,
    community_rank,
    detect_communities,
    label_propagation,
    summarize_communities,
    weighted_projection,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        [(s, "rel", o, "d", 1.0, f"c{i}") for i, (s, o) in enumerate(rows)],
        "subj string, pred string, obj string, description string, weight double, chunk_id string",
    )


def test_weighted_projection_collapses_parallel_edges(spark):
    edges = _edges(spark, [("A", "B"), ("B", "A"), ("A", "B"), ("B", "C"), ("A", "A")])
    got = {(r.s, r.d): r.weight for r in weighted_projection(edges).collect()}
    assert got == {("A", "B"): 3.0, ("B", "C"): 1.0}  # self-loop dropped


def test_label_propagation_two_cliques(spark):
    # two triangles joined by one weak edge → two communities
    rows = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
            ("b1", "b2"), ("b2", "b3"), ("b1", "b3"), ("a3", "b1")]
    edges = _edges(spark, rows)
    wp = weighted_projection(edges)
    verts = spark.createDataFrame(
        [(v,) for v in ["a1", "a2", "a3", "b1", "b2", "b3"]], "id string"
    )
    labels = {r.id: r.label for r in label_propagation(verts, wp).collect()}
    assert labels["a1"] == labels["a2"] == labels["a3"]
    assert labels["b1"] == labels["b2"] == labels["b3"]
    assert labels["a1"] != labels["b1"]


def test_degree_filtered_projection(spark):
    from graph_rag_agent_spark.operators.communities import (
        degree_filtered_projection,
    )

    # star around 'hub' plus an isolated pair → top-3 nodes are hub + 2 spokes
    rows = [("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("p1", "p2")]
    wp = weighted_projection(_edges(spark, rows))
    kept = degree_filtered_projection(wp, max_nodes=4)
    nodes_kept = {r.s for r in kept.collect()} | {r.d for r in kept.collect()}
    assert "hub" in nodes_kept
    assert kept.count() <= 4


def test_overlapping_label_propagation(spark):
    from graph_rag_agent_spark.operators.communities import (
        overlapping_label_propagation,
    )

    # two triangles sharing the bridge node x
    rows = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"), ("a3", "x"), ("x", "b1"),
            ("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    edges = _edges(spark, rows)
    wp = weighted_projection(edges)
    verts = spark.createDataFrame(
        [(v,) for v in ["a1", "a2", "a3", "b1", "b2", "b3", "x"]], "id string"
    )
    out = overlapping_label_propagation(verts, wp, max_iter=8, min_association=0.2)
    by_node = {}
    for r in out.collect():
        by_node.setdefault(r.id, set()).add(r.label)
    # every node belongs to at least one community; the bridge node's
    # memberships overlap with both sides' dominant labels
    assert all(by_node.get(v) for v in ["a1", "b1", "x"])
    assert len(by_node["x"]) >= 1
    dominant_a = by_node["a1"] | by_node["a2"]
    dominant_b = by_node["b1"] | by_node["b2"]
    assert by_node["x"] & (dominant_a | dominant_b)


def test_detect_and_summarize(spark):
    rows = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
            ("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    edges = _edges(spark, rows)
    nodes = spark.createDataFrame(
        [(v, "class", f"desc {v}") for v in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "entity_id string, entity_type string, description string",
    )
    mentions = spark.createDataFrame(
        [(f"ch{i}", v) for i, v in enumerate(["a1", "a2", "a3", "b1", "b1", "b2"])],
        "chunk_id string, entity_id string",
    )
    ec = detect_communities(nodes, edges, max_levels=2)
    rows_ec = ec.collect()
    assert all(len(r.communities) == 2 for r in rows_ec)
    membership = community_membership(ec)
    lvl0 = membership.filter(F.col("level") == 0)
    comms = {r.member_id: r.community_id for r in lvl0.collect()}
    assert comms["a1"] == comms["a2"] == comms["a3"]
    assert comms["a1"] != comms["b1"]
    rank = community_rank(membership, mentions)
    assert rank.filter(F.col("level") == 0).count() == 2
    summaries = summarize_communities(membership, nodes, edges, rank)
    got = summaries.collect()
    assert len(got) == 2
    assert all("Nodes are:" in r.full_content for r in got)
    assert all("Relationships are:" in r.full_content for r in got)
