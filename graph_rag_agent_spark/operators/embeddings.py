"""Entity / chunk embedding stage.

Reference: EntityIndexManager / ChunkIndexManager
(entity_indexer.py:53-298, chunk_indexer.py:54-120) — OpenAI-compatible
embedding calls batched 32 at a time, only over rows with no embedding yet.

Spark mapping: one Arrow-vectorized pandas UDF over
``concat(entity_id, ' ', description)``; incremental behavior (I4) is an
anti-join against the existing entity_embeddings table, not a flag column.
The embedder is pluggable; the default is the deterministic hash-projection
from functions/embedder.py (the oracle uses the identical function).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from graph_rag_agent_spark.config import EMBEDDING_DIM
from graph_rag_agent_spark.functions.embedder import embed_text


def embedding_text_col() -> F.Column:
    """The text embedded per entity — id + description
    (reference entity_indexer.py:53-56 text_node_properties=['id','description'])."""
    return F.concat_ws(" ", F.col("entity_id"), F.col("description"))


def _embed_rows(texts, dim: int, embedder=None) -> list:
    """Per-row embedding with the reference's failure semantics
    (entity_indexer.py:189-205): a row whose embed call raises degrades to
    the ZERO VECTOR and the batch continues — one poisoned row must never
    fail the task (at 10⁹ rows a per-task failure is a pipeline outage)."""
    fn = embedder or embed_text
    out = []
    for t in texts:
        try:
            vec = fn(t, dim)
            out.append([float(x) for x in vec])
        except Exception:
            out.append([0.0] * dim)
    return out


def embed_entities(
    nodes: DataFrame,
    existing: Optional[DataFrame] = None,
    dim: int = EMBEDDING_DIM,
    embedder=None,
) -> DataFrame:
    """nodes(entity_id, description, ...) →
    entity_embeddings(entity_id, embedding, text_sha).

    `existing` (previous entity_embeddings table) short-circuits rows whose
    embedded text is unchanged; a changed description re-embeds — the
    text-hash equivalent of the reference's needs_reembedding flag
    (embedding_manager.py:49-117). Embeddings of entities no longer in
    `nodes` are dropped. `embedder` is the pluggable text→vector slot (an
    OpenAI-compatible client in the reference); failures zero-vector the
    row, not the task."""
    cur = nodes.select(
        "entity_id",
        embedding_text_col().alias("_text"),
        F.sha2(embedding_text_col(), 256).alias("text_sha"),
    )
    valid = None
    if existing is not None and "text_sha" in existing.columns:
        valid = existing.select("entity_id", "embedding", "text_sha").join(
            cur.select("entity_id", "text_sha"),
            on=["entity_id", "text_sha"],
            how="left_semi",
        )
        todo = cur.join(valid.select("entity_id"), on="entity_id", how="left_anti")
    else:
        todo = cur

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = _embed_rows(pdf["_text"].fillna(""), dim, embedder)
            yield pd.DataFrame(
                {
                    "entity_id": pdf["entity_id"],
                    "embedding": embs,
                    "text_sha": pdf["text_sha"],
                }
            )

    # keep the UDF stage at full parallelism (AQE would coalesce the small
    # node shuffle to ~1 partition; embedding cost is per-row, not per-byte)
    n_part = nodes.sparkSession.sparkContext.defaultParallelism
    fresh = todo.repartition(n_part, "entity_id").mapInPandas(
        run, schema="entity_id string, embedding array<double>, text_sha string"
    )
    return fresh.unionByName(valid) if valid is not None else fresh


def embed_chunks(
    chunks: DataFrame,
    existing: Optional[DataFrame] = None,
    dim: int = EMBEDDING_DIM,
    embedder=None,
) -> DataFrame:
    """I2: chunks(chunk_id, text) → chunk_embeddings(chunk_id, embedding).

    chunk_id IS the text hash (sha1 of text, struct_builder.py:82), so the
    incremental anti-join on chunk_id alone is already text-change-aware —
    unlike entities, chunks never need re-embedding (reference
    chunk_indexer.py:54-120 embeds rows with embedding IS NULL)."""
    distinct = chunks.select("chunk_id", "text").dropDuplicates(["chunk_id"])
    if existing is not None:
        todo = distinct.join(existing.select("chunk_id"), on="chunk_id", how="left_anti")
    else:
        todo = distinct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = _embed_rows(pdf["text"].fillna(""), dim, embedder)
            yield pd.DataFrame({"chunk_id": pdf["chunk_id"], "embedding": embs})

    fresh = todo.mapInPandas(run, schema="chunk_id string, embedding array<double>")
    if existing is not None:
        fresh = fresh.unionByName(existing.select("chunk_id", "embedding"))
    return fresh
