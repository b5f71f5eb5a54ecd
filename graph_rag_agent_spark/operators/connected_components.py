"""Iterative DataFrame connected components.

Replaces the reference's in-database ``gds.wcc.write`` (similar_entity.py:231-293).
No GraphFrames dependency: a driver-side loop of joins/aggregations —
min-label propagation fused with POINTER DOUBLING on the label table
(the star-contraction family of Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): each round every node (1) adopts the
minimum label in its closed neighborhood, then (2) jumps to its label's
label (``component ← component(component)``). Jumps compose, so the
distance covered per round roughly doubles — rounds ≈ log₂(diameter),
NOT diameter. A 2000-node path converges in ~11 rounds instead of ~2000
(asserted in tests/test_canonicalize.py); at 10⁹ nodes a diameter-100
co-occurrence component costs ~7 rounds instead of 100 full-edge shuffles.

Scale notes:
- each round is two key-partitioned shuffles (groupBy node for the
  neighbor min, self-join on the label value for the doubling step) over
  the label table — the edge list itself is scanned once per round, never
  exploded.
- invariant: ``component(u)`` is always the id of a vertex in u's
  component with ``component(u) ≤ u``; both steps only lower it, so the
  fixpoint is exactly min-reachable-id and termination is monotone.
- ``localCheckpoint`` every iteration cuts the lineage chain —
  without it the plan doubles per iteration and Catalyst planning time
  explodes (the classic iterative-DataFrame pitfall).
- convergence check is a cheap aggregate (sum of label changes), not a
  collect of the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_rag_agent_spark.config import CC_DRIVER_THRESHOLD, CC_MAX_ITERATIONS
from graph_rag_agent_spark.functions.iterative import loop_checkpoint


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = CC_MAX_ITERATIONS,
    driver_threshold: int = CC_DRIVER_THRESHOLD,
) -> DataFrame:
    """→ (id, component) with component = min reachable vertex id.

    Size-adaptive: below `driver_threshold` edges the component graph is
    collected and solved with a union-find on the driver (one job instead
    of ~3 per iteration — near-duplicate pair graphs are tiny relative to
    the corpus, exactly like GDS solves WCC in memory); above it, the
    distributed min-label-propagation loop runs. Both produce identical
    labels (min vertex id per component)."""
    # one job decides the path AND fetches the edges when small: take(N+1)
    # either proves the edge set exceeds the threshold or returns it whole
    sample = edges.select(src_col, dst_col).take(driver_threshold + 1)
    if len(sample) <= driver_threshold:
        return _driver_union_find(vertices, sample, vertex_col, src_col, dst_col)
    return _distributed_cc(vertices, edges, vertex_col, src_col, dst_col, max_iterations)


def _driver_union_find(
    vertices: DataFrame, edge_rows, vertex_col: str, src_col: str, dst_col: str
) -> DataFrame:
    parent: dict = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for row in edge_rows:
        ra, rb = find(row[src_col]), find(row[dst_col])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    pairs = [(v, find(v)) for v in parent]
    spark = vertices.sparkSession
    if pairs:
        active = spark.createDataFrame(pairs, f"{vertex_col} string, component string")
    else:
        active = spark.createDataFrame([], f"{vertex_col} string, component string")
    return (
        vertices.select(F.col(vertex_col).alias("id"))
        .join(active.withColumnRenamed(vertex_col, "id"), on="id", how="left")
        .withColumn("component", F.coalesce("component", F.col("id")))
    )


# rounds the last _distributed_cc call took to converge — observability for
# the log-diameter contract (tests assert a 2000-node path needs ≤ 15)
LAST_DISTRIBUTED_ROUNDS = 0


def _distributed_cc(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = CC_MAX_ITERATIONS,
) -> DataFrame:
    """→ (id, component) where component = min vertex id (string order)
    reachable in the undirected graph. Vertices with no edges keep their own
    id as component. Rounds ≈ log₂(diameter): each round is one 1-hop
    min-label propagation + one pointer-doubling jump (see module doc)."""
    global LAST_DISTRIBUTED_ROUNDS
    # undirected: both directions once
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .dropDuplicates(["a", "b"])
        .transform(loop_checkpoint)
    )

    labels = vertices.select(
        F.col(vertex_col).alias("id"), F.col(vertex_col).alias("component")
    ).transform(loop_checkpoint)

    for i in range(max_iterations):
        # step 1: min label in the closed neighborhood (1 hop)
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "b"), on="b", how="inner")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("_nbr"))
        )
        stepped = labels.join(neighbor_min, on="id", how="left").select(
            "id",
            F.col("component").alias("_orig"),
            F.least(
                F.col("component"), F.coalesce("_nbr", F.col("component"))
            ).alias("component"),
        )
        # step 2: pointer doubling — jump to the label's own label. component
        # values are vertex ids (invariant), so the lookup is a self-join on
        # the label table; jumps compose across rounds, giving the log bound
        ptr = stepped.select(
            F.col("id").alias("_pid"), F.col("component").alias("_pcomp")
        )
        jumped = F.least(
            F.col("component"), F.coalesce("_pcomp", F.col("component"))
        )
        new_labels = (
            stepped.join(ptr, stepped["component"] == ptr["_pid"], "left")
            .select(
                "id",
                jumped.alias("component"),
                (jumped < F.col("_orig")).alias("_changed"),
            )
        )
        # checkpoint every iteration: the convergence aggregate below is an
        # action anyway, and uncut lineage doubles the plan per iteration
        new_labels = new_labels.transform(loop_checkpoint)
        changed = new_labels.agg(
            F.sum(F.when(F.col("_changed"), 1).otherwise(0)).alias("n")
        ).collect()[0]["n"]
        labels = new_labels.drop("_changed")
        LAST_DISTRIBUTED_ROUNDS = i + 1
        if not changed:
            break
    return labels


def consecutive_component_ids(labels: DataFrame) -> DataFrame:
    """(id, component) → (id, component, wcc bigint) with dense 0-based ids,
    mirroring gds.wcc consecutiveIds=True (similar_entity.py:247-252).

    Id assignment is the distributed range-partitioned rank (operators/ids
    — no unpartitioned dense_rank window: that plan funnels every distinct
    component through ONE task). The join is left un-hinted: AQE broadcasts
    the id table while it is small and shuffles it at 10⁸ components."""
    from graph_rag_agent_spark.operators.ids import dense_ids

    distinct = dense_ids(labels.select("component").distinct(), "component", "wcc")
    return labels.join(distinct, on="component", how="inner")
