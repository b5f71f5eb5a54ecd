"""Graph-structure metrics: density/connectivity report + triangle counts
(reference evaluation/metrics/graph_metrics.py:332-355, 964-1009)."""

from __future__ import annotations

import pytest

from graph_rag_agent_spark.operators.graph_metrics import k_core


def _kc(df):
    return {r["entity_id"]: r["core_degree"] for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, "REL", b) for a, b in pairs], "subj string, pred string, obj string"
    )


def test_k_core_k4_with_pendant_chain(spark):
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    chain = [("d", "e"), ("e", "f")]  # pendant path peels away at k=2
    out = _kc(k_core(_edges_df(spark, k4 + chain), k=2))
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_k_core_ring_survives_path_dissolves(spark):
    ring = [("r1", "r2"), ("r2", "r3"), ("r3", "r4"), ("r4", "r5"), ("r5", "r1")]
    out = _kc(k_core(_edges_df(spark, ring), k=2))
    assert out == {f"r{i}": 2 for i in range(1, 6)}
    path = [("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"), ("p5", "p6")]
    assert _kc(k_core(_edges_df(spark, path), k=2)) == {}


def test_k_core_driver_and_distributed_agree(spark):
    import random

    rng = random.Random(9)
    pairs = set()
    while len(pairs) < 60:
        a, b = rng.sample(range(30), 2)
        pairs.add((f"g{min(a,b):02d}", f"g{max(a,b):02d}"))
    e = _edges_df(spark, sorted(pairs))
    drv = _kc(k_core(e, k=2))
    dist = _kc(k_core(e, k=2, driver_threshold=0, max_rounds=30))
    assert drv == dist
    assert drv  # non-trivial fixture
from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.graph_metrics import (
    graph_structure_report,
    triangle_counts,
)


@pytest.fixture()
def k4_plus_pendant(spark):
    """K4 on a,b,c,d plus pendant e-a; node f is isolated."""
    edges = spark.createDataFrame(
        [
            ("a", "r", "b"), ("a", "r", "c"), ("a", "r", "d"),
            ("b", "r", "c"), ("b", "r", "d"), ("c", "r", "d"),
            ("e", "r", "a"),
            # duplicate pred + reverse direction must NOT create multi-edges
            ("b", "r2", "a"),
        ],
        "subj string, pred string, obj string",
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",), ("f",)], "entity_id string"
    )
    return nodes, edges


def test_triangle_counts_k4(spark, k4_plus_pendant):
    _, edges = k4_plus_pendant
    out = {r.entity_id: r for r in triangle_counts(edges).collect()}
    # K4: each vertex sits in C(3,2)=3 triangles; pendant e in none
    assert {v: out[v].triangles for v in "abcde"} == {
        "a": 3, "b": 3, "c": 3, "d": 3, "e": 0
    }
    assert out["a"].degree == 4 and out["e"].degree == 1
    # clustering: b has deg 3 and all 3 neighbor pairs closed → 1.0;
    # a has deg 4 with 3 of 6 pairs closed → 0.5
    assert out["b"].clustering == 1.0
    assert out["a"].clustering == 0.5
    assert out["e"].clustering == 0.0
    assert "f" not in out  # isolated vertices carry no edge row


def test_triangle_counts_no_triangles(spark):
    edges = spark.createDataFrame(
        [("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d")],
        "subj string, pred string, obj string",
    )
    rows = triangle_counts(edges).collect()
    assert all(r.triangles == 0 for r in rows)
    assert len(rows) == 4


def test_structure_report(spark, k4_plus_pendant):
    nodes, edges = k4_plus_pendant
    row = graph_structure_report(nodes, edges).collect()[0]
    assert row.n_nodes == 6 and row.n_triples == 8 and row.n_edges == 7
    # 7 distinct pairs of max C(6,2)=15; 5 of 6 nodes touch an edge
    assert row.density == pytest.approx(7 / 15)
    assert row.connectivity == pytest.approx(5 / 6)
    assert row.quality == pytest.approx(0.5 * 7 / 15 + 0.5 * 5 / 6)


def test_structure_report_empty_edges(spark):
    nodes = spark.createDataFrame([("a",), ("b",)], "entity_id string")
    edges = spark.createDataFrame([], "subj string, pred string, obj string")
    row = graph_structure_report(nodes, edges).collect()[0]
    assert (row.n_edges, row.density, row.connectivity, row.quality) == (0, 0.0, 0.0, 0.0)
