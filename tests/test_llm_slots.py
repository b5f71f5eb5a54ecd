"""The pluggable LLM adjudication slots (D5 merge pick, D13 conflict
resolution, G9 community summarization) — tests inject non-trivial fakes
and assert the decisions actually route through the interface (reference
prompts: config/prompts/graph_prompts.py:97-156, entity_merger.py:165-311,
entity_disambiguation.py:158-276, summary/base.py:174-281)."""

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.canonicalize import canonicalize


@pytest.fixture(scope="module")
def merge_graph(spark):
    """Two near-duplicate entity names (lev 1, same block, cosine ≥ .9 under
    the trigram embedder) plus a bystander."""
    from graph_rag_agent_spark.operators.embeddings import embed_entities

    names = [
        "alphabetagammadeltaepsilonzetaetathetaiota",
        "alphabetagammadeltaepsilonzetaetathetaiotx",
        "unrelatedcompletelydifferententityname",
    ]
    nodes = spark.createDataFrame(
        [(n, "term", f"term {n}") for n in names],
        "entity_id string, entity_type string, description string",
    )
    edges = spark.createDataFrame(
        [
            (names[0], "cooccurs", names[2], "d", 1.0, "c1"),
            (names[1], "cooccurs", names[2], "d", 1.0, "c2"),
        ],
        "subj string, pred string, obj string, description string, weight double, chunk_id string",
    )
    mentions = spark.createDataFrame(
        [("c1", names[0]), ("c2", names[1]), ("c1", names[2])],
        "chunk_id string, entity_id string",
    )
    return names, nodes, edges, mentions, embed_entities(nodes)


@pytest.mark.parametrize("driver_threshold", [200_000, 0])
def test_adjudicator_changes_merge_pick(spark, merge_graph, driver_threshold):
    """Default rule merges to the MIN id; an injected adjudicator picking
    the MAX id must flip the canonical map — on BOTH the driver fast path
    and the distributed path (driver_threshold=0 forces distributed)."""
    names, nodes, edges, mentions, emb = merge_graph
    a, b = names[0], names[1]

    res_default = canonicalize(
        nodes, edges, mentions, emb, driver_threshold_entities=driver_threshold
    )
    default_map = {
        r.entity_id: r.canonical_id for r in res_default.merge_map.collect()
    }
    assert default_map == {b: a}  # min id survives

    calls = []

    def pick_max(members):
        calls.append(list(members))
        return max(members)

    res_adj = canonicalize(
        nodes, edges, mentions, emb,
        driver_threshold_entities=driver_threshold, adjudicator=pick_max,
    )
    adj_map = {r.entity_id: r.canonical_id for r in res_adj.merge_map.collect()}
    assert adj_map == {a: b}  # the injected pick inverted the merge
    if driver_threshold > 0:  # driver path runs the callable in-process
        assert calls == [[a, b]]
    # the canonical triple table reflects the pick
    triples = {(r.subj, r.obj) for r in res_adj.edges.collect()}
    assert (b, names[2]) in triples and (a, names[2]) not in triples


def test_adjudicator_bad_pick_falls_back(spark, merge_graph):
    names, nodes, edges, mentions, emb = merge_graph
    res = canonicalize(
        nodes, edges, mentions, emb, adjudicator=lambda ms: "not-a-member"
    )
    got = {r.entity_id: r.canonical_id for r in res.merge_map.collect()}
    assert got == {names[1]: names[0]}  # min-id fallback


@pytest.fixture(scope="module")
def disambig_graph(spark):
    """A 3-edit near-duplicate pair: similarity links them (cosine ≥ .9)
    but edit distance does NOT merge (lev 3) → disambiguation decides."""
    from graph_rag_agent_spark.operators.embeddings import embed_entities

    a = "persistentcolumnarstoragecompactionschedulerbackgroundmaintenanceworkerprocesspoolmanager"
    b = "persistentcolumnarstoragecompactixnschedulerbackgrxundmaintenanceworkerprxcesspoolmanager"
    nodes = spark.createDataFrame(
        [(n, "term", f"term {n}") for n in (a, b, "othernamed", "anothernamed")],
        "entity_id string, entity_type string, description string",
    )
    # give `a` degree 2 vs b's 1 (degrees count DISTINCT triples) → the
    # default max-degree rule picks a
    edges = spark.createDataFrame(
        [
            (a, "cooccurs", "othernamed", "d", 1.0, "c1"),
            (a, "cooccurs", "anothernamed", "d", 1.0, "c2"),
            ("othernamed", "cooccurs", b, "d", 1.0, "c3"),
        ],
        "subj string, pred string, obj string, description string, weight double, chunk_id string",
    )
    mentions = spark.createDataFrame(
        [("c1", a), ("c3", b)], "chunk_id string, entity_id string"
    )
    return a, b, nodes, edges, mentions, embed_entities(nodes)


@pytest.mark.parametrize("driver_threshold", [200_000, 0])
def test_resolver_changes_disambiguation(spark, disambig_graph, driver_threshold):
    a, b, nodes, edges, mentions, emb = disambig_graph

    res_default = canonicalize(
        nodes, edges, mentions, emb, driver_threshold_entities=driver_threshold
    )
    dmap = {r.entity_id: r.canonical_id for r in res_default.disambig_map.collect()}
    assert dmap == {b: a}  # max degree wins by default

    def pick_max_id(members, degrees):
        assert set(degrees) == set(members)  # slot receives the degree context
        return max(members)

    res_res = canonicalize(
        nodes, edges, mentions, emb,
        driver_threshold_entities=driver_threshold, resolver=pick_max_id,
    )
    dmap2 = {r.entity_id: r.canonical_id for r in res_res.disambig_map.collect()}
    assert dmap2 == {a: b}  # inverted by the injected resolver


def test_summarizer_slot_routes(spark):
    from graph_rag_agent_spark.operators.communities import (
        community_membership,
        community_rank,
        detect_communities,
        summarize_communities,
    )

    edges = spark.createDataFrame(
        [("a1", "r", "a2", "d", 1.0, "c1"), ("a2", "r", "a3", "d", 1.0, "c2")],
        "subj string, pred string, obj string, description string, weight double, chunk_id string",
    )
    nodes = spark.createDataFrame(
        [(v, "class", v) for v in ["a1", "a2", "a3"]],
        "entity_id string, entity_type string, description string",
    )
    mentions = spark.createDataFrame(
        [("c1", "a1"), ("c2", "a2")], "chunk_id string, entity_id string"
    )
    ec = detect_communities(nodes, edges, max_levels=2)
    membership = community_membership(ec)
    rank = community_rank(membership, mentions)

    default = summarize_communities(membership, nodes, edges, rank).collect()
    assert all(r.summary.startswith("Community ") for r in default)

    custom = summarize_communities(
        membership, nodes, edges, rank,
        summarizer=lambda fc: f"LLM[{len(fc)} chars]",
    ).collect()
    assert all(r.summary.startswith("LLM[") for r in custom)
    # full_content unchanged — only the summary routed through the slot
    assert {r.full_content for r in custom} == {r.full_content for r in default}