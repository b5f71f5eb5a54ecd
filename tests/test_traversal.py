"""seed_hop_distance: bounded multi-hop BFS over the projection — hop
semantics, max-hop bound, isolated seeds, and driver ≡ distributed parity."""

import pytest

from graph_rag_agent_spark.operators.search import seed_hop_distance


def _proj(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "s string, d string, weight double"
    )


def _seeds(spark, ids):
    return spark.createDataFrame([(x,) for x in ids], "entity_id string")


def _hops(df):
    return {r["entity_id"]: r["hops"] for r in df.collect()}


def test_path_graph_hops_and_bound(spark):
    # a-b-c-d-e path, seed a, max 3 hops: e (4 hops) must be absent
    proj = _proj(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = _hops(seed_hop_distance(proj, _seeds(spark, ["a"]), max_hops=3))
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_multi_seed_min_and_undirected(spark):
    # seeds at both ends; projection rows are undirected regardless of s/d order
    proj = _proj(spark, [("a", "b"), ("c", "b"), ("c", "d")])
    out = _hops(seed_hop_distance(proj, _seeds(spark, ["a", "d"]), max_hops=3))
    assert out == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_isolated_seed_is_hop_zero(spark):
    proj = _proj(spark, [("x", "y")])
    out = _hops(seed_hop_distance(proj, _seeds(spark, ["lonely"]), max_hops=2))
    assert out == {"lonely": 0}


def test_sampled_neighborhood_fanout_cap_and_determinism(spark):
    from graph_rag_agent_spark.operators.search import sampled_neighborhood

    # hub h with 5 neighbors of distinct weights: fanout=3 keeps the top 3
    proj = spark.createDataFrame(
        [("h", f"n{i}", float(w)) for i, w in enumerate([5, 4, 3, 2, 1])],
        "s string, d string, weight double",
    )
    out = sampled_neighborhood(proj, _seeds(spark, ["h"]), fanout=3, hops=1)
    rows = {(r["src"], r["dst"], r["hop"]) for r in out.collect()}
    assert rows == {("h", "n0", 1), ("h", "n1", 1), ("h", "n2", 1)}


def test_sampled_neighborhood_tie_break_and_visited(spark):
    from graph_rag_agent_spark.operators.search import sampled_neighborhood

    # equal weights → ties by dst asc; hop 2 frontier excludes the seed
    # (visited) even though it is every neighbor's heaviest edge
    proj = spark.createDataFrame(
        [("s0", "b", 1.0), ("s0", "a", 1.0), ("s0", "c", 1.0), ("a", "z", 0.5)],
        "s string, d string, weight double",
    )
    out = sampled_neighborhood(proj, _seeds(spark, ["s0"]), fanout=2, hops=2)
    by_hop = {}
    for r in out.collect():
        by_hop.setdefault(r["hop"], set()).add((r["src"], r["dst"]))
    assert by_hop[1] == {("s0", "a"), ("s0", "b")}  # tie → id order, c cut
    # hop-2 frontier = {a, b}: a samples its top-2 incl. the back-edge to
    # s0 (edges are sampled; only FRONTIER membership excludes visited)
    assert by_hop[2] == {("a", "s0"), ("a", "z"), ("b", "s0")}


def test_sampled_neighborhood_bounded_under_skew(spark):
    from graph_rag_agent_spark.operators.search import sampled_neighborhood

    # 100-neighbor hub: output stays fanout-bounded per frontier vertex
    proj = spark.createDataFrame(
        [("hub", f"v{i:03d}", 1.0) for i in range(100)],
        "s string, d string, weight double",
    )
    out = sampled_neighborhood(proj, _seeds(spark, ["hub"]), fanout=4, hops=2)
    rows = out.collect()
    hop1 = [r for r in rows if r["hop"] == 1]
    assert len(hop1) == 4
    assert {r["dst"] for r in hop1} == {"v000", "v001", "v002", "v003"}
    # each hop-2 frontier vertex (4 of them) samples ≤ 4 edges
    assert len([r for r in rows if r["hop"] == 2]) <= 16


def test_driver_and_distributed_paths_agree(spark):
    import random

    rng = random.Random(5)
    pairs = set()
    while len(pairs) < 40:
        a, b = rng.sample(range(25), 2)
        pairs.add((f"n{min(a,b):02d}", f"n{max(a,b):02d}"))
    proj = _proj(spark, sorted(pairs))
    seeds = _seeds(spark, ["n00", "n07"])
    drv = _hops(seed_hop_distance(proj, seeds, max_hops=3))
    dist = _hops(seed_hop_distance(proj, seeds, max_hops=3, driver_threshold=0))
    assert drv == dist
    assert drv  # non-trivial fixture
