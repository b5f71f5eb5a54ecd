"""Chunking stage: corpus rows → chunk rows (UDTF-style one→many explode).

Reference semantics: ChineseTextChunker.chunk_text + create_relation_between_chunks
(reference text_chunker.py:185-266, struct_builder.py:60-142). The pure
algorithm lives in functions/chunking.py; this module is only the Spark
plumbing: one `mapInPandas` pass that streams Arrow batches of documents and
emits chunk rows with ids/positions/offsets.

Scale notes (100 TB):
- the input is repartitioned by repo-hash *before* this stage (salts the
  hot-repo skew — one giant repo otherwise pins a single task);
- chunking is embarrassingly parallel per document: no shuffle inside the
  stage, output partitioning inherits the repo-hash layout so the downstream
  per-chunk extraction needs no re-shuffle;
- chunk rows carry doc_id + content_sha256 so provenance (the per-row
  sha256 invariant vs the source table) never requires re-reading content.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from graph_rag_agent_spark.config import CHUNK_SIZE, MAX_TEXT_LENGTH, OVERLAP
from graph_rag_agent_spark.functions.chunking import chunk_records

CHUNKS_SCHEMA = (
    "doc_id string, repo string, path string, lang string, "
    "chunk_id string, text string, position int, length int, "
    "content_offset bigint, tokens int, prev_chunk_id string, "
    "content_sha256 string"
)
_CHUNK_COLS = [
    "doc_id", "repo", "path", "lang", "chunk_id", "text", "position",
    "length", "content_offset", "tokens", "prev_chunk_id", "content_sha256",
]


def doc_id_of(repo: str, path: str, commit: str) -> str:
    """Stable document key (reference keys documents by fileName;
    ours must be unique across repos/commits)."""
    return hashlib.sha256(f"{repo}:{path}@{commit}".encode("utf-8")).hexdigest()


def chunk_documents(
    corpus: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = OVERLAP,
    max_text_length: int = MAX_TEXT_LENGTH,
) -> DataFrame:
    """corpus(repo, path, commit, lang, content) → chunks table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for repo, path, commit, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
            ):
                content = content or ""
                did = doc_id_of(repo, path, commit)
                csha = hashlib.sha256(content.encode("utf-8")).hexdigest()
                for rec in chunk_records(content, chunk_size, overlap, max_text_length):
                    rows.append((
                        did, repo, path, lang, rec.chunk_id, rec.text,
                        rec.position, rec.length, rec.content_offset,
                        rec.tokens, rec.prev_chunk_id, csha,
                    ))
            yield pd.DataFrame(rows, columns=_CHUNK_COLS)

    return corpus.mapInPandas(run, schema=CHUNKS_SCHEMA)
