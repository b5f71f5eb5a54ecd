"""Orchestrated incremental run (reference N7, incremental_update.py:355-409).

Order mirrors the reference: detect changes → rebuild changed partitions →
GC deleted docs → refresh embeddings (anti-join incremental) →
consistency validate/repair → re-detect communities only if changes.

Everything flows through the TableCatalog (Iceberg MERGE INTO when a real
catalog is configured; anti-join+rewrite parquet emulation otherwise), and
every stage appends lineage rows to build_metrics.
"""

from __future__ import annotations

import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_rag_agent_spark.config import PipelineConfig
from graph_rag_agent_spark.operators.canonicalize import canonicalize
from graph_rag_agent_spark.operators.chunker import chunk_documents
from graph_rag_agent_spark.operators.communities import (
    community_membership,
    community_rank,
    detect_communities,
    summarize_communities,
)
from graph_rag_agent_spark.operators.consistency import repair, validation_report
from graph_rag_agent_spark.operators.embeddings import embed_entities
from graph_rag_agent_spark.operators.extraction import extract_chunks
from graph_rag_agent_spark.operators.incremental import (
    chunks_of_docs,
    detect_changes,
)
from graph_rag_agent_spark.sources.catalog import TableCatalog


class IncrementalUpdatePipeline:
    def __init__(
        self,
        spark: SparkSession,
        catalog: TableCatalog,
        config: Optional[PipelineConfig] = None,
        extractor=None,
        summarizer=None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.config = config or PipelineConfig()
        self.extractor = extractor
        self.summarizer = summarizer
        self.run_id = uuid.uuid4().hex[:12]

    def run_once(self, corpus: DataFrame) -> dict:
        """One incremental pass against the current catalog state."""
        cat, cfg = self.catalog, self.config
        registry = cat.read("registry")
        changes = detect_changes(corpus, registry)
        n_added = changes.added.count()
        n_modified = changes.modified.count()
        n_deleted = changes.deleted.count()
        stats = {"added": n_added, "modified": n_modified, "deleted": n_deleted}
        if not (n_added or n_modified or n_deleted):
            return {**stats, "changed": False}

        t0 = time.time()
        old_chunks = cat.read("chunks")
        occurrences = cat.read("occurrences")
        edges_raw = cat.read("edges_raw")

        # --- N6: GC deleted + modified docs' old state by chunk provenance.
        # A chunk dies only if no surviving doc shares its text (chunk_id =
        # sha1(text) dedups across docs).
        gone_docs = changes.deleted.unionByName(
            changes.modified.select("repo", "path")
        ).dropDuplicates(["repo", "path"])
        kept_chunks = old_chunks.join(gone_docs, on=["repo", "path"], how="left_anti")
        doomed_chunk_ids = (
            chunks_of_docs(old_chunks, gone_docs)
            .select("chunk_id")
            .dropDuplicates()
            .join(kept_chunks.select("chunk_id").dropDuplicates(), on="chunk_id", how="left_anti")
        )
        occurrences = occurrences.join(doomed_chunk_ids, on="chunk_id", how="left_anti")
        edges_raw = edges_raw.join(doomed_chunk_ids, on="chunk_id", how="left_anti")

        # --- N2: rebuild changed partitions only ---------------------------
        changed_corpus = changes.added.unionByName(changes.modified)
        new_chunks = chunk_documents(
            changed_corpus, cfg.chunk_size, cfg.overlap, cfg.max_text_length
        )
        cache = cat.read("extraction_cache") if cat.exists("extraction_cache") else None
        new_results = extract_chunks(
            new_chunks, extractor=self.extractor, cache=cache,
            max_gleanings=cfg.max_gleanings,
        )
        # chunks whose text (= chunk_id) already exists in surviving docs are
        # already materialized — only genuinely fresh chunk ids contribute
        # new graph rows (keeps incremental ≡ full rebuild, no double rows)
        fresh_results = new_results.join(
            kept_chunks.select("chunk_id").dropDuplicates(["chunk_id"]),
            on="chunk_id",
            how="left_anti",
        ).localCheckpoint(eager=True)

        # --- N3/N4: occurrences + edges are chunk-provenanced → plain union
        # after GC is exact; nodes/mentions re-derive from the merged
        # occurrences with the same order-independent rule as a full build
        from graph_rag_agent_spark.operators.parsing import (
            derive_mentions,
            derive_nodes,
            occurrences_from_records,
            parse_records,
            relationships_from_records,
        )

        all_chunks = kept_chunks.unionByName(new_chunks).localCheckpoint(eager=True)
        # one regex pass over the fresh delta; both unions derive from it
        fresh_records = parse_records(fresh_results).localCheckpoint(eager=True)
        occurrences = (
            occurrences.unionByName(occurrences_from_records(fresh_records))
            .localCheckpoint(eager=True)
        )
        edges_raw = (
            edges_raw.unionByName(relationships_from_records(fresh_records))
            .localCheckpoint(eager=True)
        )
        nodes_raw = derive_nodes(occurrences).localCheckpoint(eager=True)
        mentions_raw = derive_mentions(occurrences).localCheckpoint(eager=True)

        # --- N8 consistency repair -----------------------------------------
        report = validation_report(nodes_raw, edges_raw, mentions_raw, all_chunks)
        nodes_raw, edges_raw, mentions_raw = repair(
            nodes_raw, edges_raw, mentions_raw, all_chunks
        )

        # --- embeddings (I4 anti-join incremental) + canonicalize ----------
        existing_emb = cat.read("entity_embeddings") if cat.exists("entity_embeddings") else None
        embeddings = embed_entities(nodes_raw, existing=existing_emb, dim=cfg.embedding_dim)
        embeddings = embeddings.join(
            nodes_raw.select("entity_id"), on="entity_id", how="left_semi"
        ).localCheckpoint(eager=True)
        result = canonicalize(
            nodes_raw, edges_raw, mentions_raw, embeddings,
            cutoff=cfg.similarity_cutoff, topk=cfg.similarity_topk,
            max_edit_distance=cfg.word_edit_distance,
        )

        # --- persist new state ----------------------------------------------
        if cache is not None:
            new_results = new_results.localCheckpoint(eager=True)
        cat.upsert(
            "extraction_cache",
            new_results.select(F.col("chunk_id").alias("chunk_sha1"), "raw_result"),
            keys=["chunk_sha1"],
        )
        cat.write(all_chunks, "chunks")
        cat.write(occurrences, "occurrences")
        cat.write(nodes_raw, "nodes_raw")
        cat.write(edges_raw, "edges_raw")
        cat.write(mentions_raw, "mentions_raw")
        cat.write(embeddings, "entity_embeddings")
        cat.write(result.nodes.localCheckpoint(eager=True), "nodes")
        edges_out = result.edges.localCheckpoint(eager=True)
        cat.write(edges_out, "edges")
        mentions_out = result.mentions.localCheckpoint(eager=True)
        cat.write(mentions_out, "mentions")

        # --- communities only when the graph changed (reference order) -----
        entity_comms = detect_communities(
            cat.read("nodes"), cat.read("edges"),
            max_levels=cfg.community_max_levels, max_iter=cfg.community_max_iter,
        )
        cat.write(entity_comms.localCheckpoint(eager=True), "entity_communities")
        membership = community_membership(cat.read("entity_communities"))
        cat.write(membership, "communities")
        rank = community_rank(cat.read("communities"), cat.read("mentions"))
        # content-addressed summary reuse (G9 × S8): a community whose
        # stringified info is byte-identical to last run's — the usual case
        # for every community the delta didn't touch — keeps its summary;
        # the (LLM) summarizer runs only on the misses
        prior = (
            cat.read("community_summaries")
            if self.summarizer is not None and cat.exists("community_summaries")
            else None
        )
        summaries = summarize_communities(
            cat.read("communities"), cat.read("nodes"), cat.read("edges"), rank,
            summarizer=self.summarizer, prior=prior,
        )
        cat.write(summaries.localCheckpoint(eager=True), "community_summaries")

        # --- registry refresh + lineage -------------------------------------
        new_registry = corpus.select(
            "repo", "path",
            F.sha2("content", 256).alias("content_sha256"),
            F.current_timestamp().alias("processed_at"),
        ).localCheckpoint(eager=True)
        cat.write(new_registry, "registry")

        metrics = self.spark.createDataFrame(
            [
                ("incremental", int(cat.read("edges").count()),
                 int((time.time() - t0) * 1000), self.run_id),
            ],
            "stage string, row_count bigint, duration_ms bigint, run_id string",
        ).withColumn("recorded_at", F.current_timestamp())
        cat.write(metrics, "build_metrics", mode="append")

        return {
            **stats,
            "changed": True,
            "validation": {r.check: r.violation_count for r in report.collect()},
        }
