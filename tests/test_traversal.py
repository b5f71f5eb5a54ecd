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
