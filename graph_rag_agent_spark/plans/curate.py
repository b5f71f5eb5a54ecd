"""End-to-end corpus curation plan for training-data preparation.

Composes the document-level operators into the standard pre-training
sequence — quality filter → exact dedup → near-dup drop → stratified
mixing sample → shard packing — with per-stage lineage counts, mirroring
BuildPipeline's metrics discipline. Every stage is one of the
oracle-checked operators; this plan only wires them.

Scale shape: each stage is a single shuffle-bounded operator (the near-dup
join is the banded LSH join, never all-pairs), and each stage's output is
materialized ONCE (`localCheckpoint`) before it is counted and consumed —
without the barrier the lazy chain re-evaluates every earlier stage per
stage-count (5 passes over the corpus instead of 1) and the near-dup step,
which consumes `kept` twice (pair generation + the anti-join), would
execute the upstream chain twice inside one action. The kept set flows as
a DataFrame — no driver materialization of ids. At warehouse scale the
same barrier is a stage TABLE write (BuildPipeline's discipline);
`localCheckpoint` is the in-memory form of it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from graph_rag_agent_spark.operators.curation import pack_shards, stratified_sample
from graph_rag_agent_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    simhash_near_duplicates,
)
from graph_rag_agent_spark.operators.text_analysis import quality_scores


@dataclass
class CurationConfig:
    min_tokens: int = 10
    min_distinct_ratio: float = 0.2
    near_dup: Optional[str] = "minhash"   # "minhash" | "simhash" | None
    minhash_production: bool = True       # crc32 path (md5 = oracle twin)
    simhash_max_hamming: int = 3
    sample_rates: Dict[str, float] = field(default_factory=dict)
    sample_default_rate: float = 1.0
    strata_col: str = "lang"
    token_budget: int = 100_000
    part_cols: Tuple[str, ...] = ("lang",)
    shard_buckets: int = 0                # >0: distribute the per-group sort


@dataclass
class CurationResult:
    packed: DataFrame       # surviving docs + (n_tokens, shard_id)
    stats: Dict[str, int]   # per-stage surviving-row counts


def curate_corpus(
    docs: DataFrame,
    config: Optional[CurationConfig] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> CurationResult:
    cfg = config or CurationConfig()
    stats: Dict[str, int] = {"input": docs.count()}

    # 1. quality filter (same keep rule quality_scores publishes); the
    # semi-join keys on doc_id — AQE picks broadcast vs shuffle by size
    q = quality_scores(docs, text_col=text_col, id_col=id_col)
    kept = docs.join(
        q.filter("keep").select(F.col("doc_id").alias(id_col)),
        on=id_col, how="left_semi",
    ).localCheckpoint(eager=True)
    stats["quality"] = kept.count()

    # 2. exact dedup (min id per sha256 wins)
    kept = dedup_exact(kept, text_col=text_col, id_col=id_col).localCheckpoint(eager=True)
    stats["exact_dedup"] = kept.count()

    # 3. near-dup drop: for every candidate pair (a < b), drop b — each
    # dropped doc is near a smaller-id survivor or a doc dropped the same way
    if cfg.near_dup == "minhash":
        pairs = minhash_lsh_pairs(
            kept, text_col=text_col, id_col=id_col,
            production_hash=cfg.minhash_production,
        )
    elif cfg.near_dup == "simhash":
        pairs = simhash_near_duplicates(
            kept, max_hamming=cfg.simhash_max_hamming,
            text_col=text_col, id_col=id_col,
        )
    else:
        pairs = None
    if pairs is not None:
        drops = pairs.select(F.col("doc_b").alias("_drop_id")).dropDuplicates()
        kept = kept.join(
            drops, on=F.col(id_col).cast("string") == F.col("_drop_id"),
            how="left_anti",
        ).localCheckpoint(eager=True)
        stats["near_dup"] = kept.count()

    # 4. stratified mixing sample (deterministic hash membership)
    if cfg.sample_rates or cfg.sample_default_rate < 1.0:
        kept = stratified_sample(
            kept, cfg.sample_rates, strata_col=cfg.strata_col,
            id_col=id_col, default_rate=cfg.sample_default_rate,
        ).localCheckpoint(eager=True)
        stats["sampled"] = kept.count()

    # 5. shard packing
    packed = pack_shards(
        kept, token_budget=cfg.token_budget, part_cols=cfg.part_cols,
        id_col=id_col, text_col=text_col, n_buckets=cfg.shard_buckets,
    )
    stats["shards"] = packed.select("shard_id", *cfg.part_cols).dropDuplicates().count()
    return CurationResult(packed=packed, stats=stats)
