"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM-side zip_with/aggregate
— no Python), LSH-bucketed variant as the 100 TB scale path (candidates
from random-hyperplane sign buckets, exact re-rank inside buckets).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, score) top-k by cosine to a constant query vector.

    Entirely JVM-side: the query is a literal array, the dot product is a
    zip_with/aggregate expression, top-k is orderBy+limit
    (TakeOrderedAndProject — per-partition heap, no full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            cosine_col(F.col(vec_col), q).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, exact cosine only
    inside the query's buckets. At scale the bucket join prunes ~2^planes of
    the corpus per table; multiple tables recover recall."""
    dim = len(query_vec)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(np.float32)
    qv = np.asarray(query_vec, dtype=np.float32)
    q_keys = [
        f"{t}:" + "".join("1" if planes[t, p] @ qv >= 0 else "0" for p in range(n_planes))
        for t in range(n_tables)
    ]

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys = [], []
            for vid, emb in zip(pdf["vec_id"], pdf["emb"]):
                v = np.asarray(emb, dtype=np.float32)
                for t in range(n_tables):
                    sig = "".join(
                        "1" if planes[t, p] @ v >= 0 else "0" for p in range(n_planes)
                    )
                    ids.append(str(vid))
                    keys.append(f"{t}:{sig}")
            yield pd.DataFrame({"vec_id": ids, "bucket": keys})

    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    buckets = base.mapInPandas(bucketize, schema="vec_id string, bucket string")
    cands = (
        buckets.filter(F.col("bucket").isin(q_keys))
        .select("vec_id")
        .dropDuplicates(["vec_id"])
    )
    scored = cands.join(
        base.withColumn("vec_id", F.col("vec_id").cast("string")), on="vec_id"
    ).select(
        "vec_id",
        cosine_col(F.col("emb"), F.array(*[F.lit(float(x)) for x in query_vec])).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)


def pairwise_topk_per_label(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Blocked all-pairs: per-label numpy cosine matrix → per-vector top-k
    neighbors within the label block (applyInPandas, vectorized matmul)."""

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "score": []}).astype(
                {"vec_id": str, "neighbor_id": str, "score": float}
            )
        ids = pdf[id_col].astype(str).to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1
        mat = mat / norms
        sims = mat @ mat.T
        np.fill_diagonal(sims, -2.0)
        rows: List[tuple] = []
        for i in range(n):
            top = sorted(range(n), key=lambda j: (-float(sims[i, j]), ids[j]))[: min(k, n - 1)]
            rows.extend((ids[i], ids[j], float(sims[i, j])) for j in top)
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "score"])

    return embeddings.groupBy(label_col).applyInPandas(
        per_block, schema="vec_id string, neighbor_id string, score double"
    )
