"""Pipeline configuration.

Mirrors the *semantics* of the reference's ``config/settings.py`` knobs
(reference: /root/reference/graphrag_agent/config/settings.py:98-136,241-249)
re-keyed for a source-code corpus. All values are deterministic constants so
the Spark pipeline and the pure-Python oracle agree bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---- chunking (reference settings.py:98-100) --------------------------------
CHUNK_SIZE = 500          # tokens per chunk window
OVERLAP = 100             # token overlap between adjacent chunks
MAX_TEXT_LENGTH = 500_000  # above this, large-text pre-split kicks in
SENTENCE_SNAP_SLACK = 100  # end may snap forward to a sentence end within +100 tokens

# sentence-end tokens for the snap logic (reference text_chunker.py:268-270)
SENTENCE_END_TOKENS = ("。", "！", "？")
# sentence punctuation used by the large-paragraph splitter (text_chunker.py:119)
SPLIT_PUNCT = "。！？.!?"

# ---- extraction wire format (reference entity_extractor.py:44-46) -----------
TUPLE_DELIMITER = " : "
RECORD_DELIMITER = "\n"
COMPLETION_DELIMITER = "\n\n"
BATCH_SEPARATOR = "\n" + "-" * 50 + "\n"   # entity_extractor.py:264
EXTRACTION_BATCH_CAP = 100                 # settings.py BATCH_SIZE analogue
EXTRACTION_BATCH_CHAR_BUDGET = 10_000      # dynamic batch = budget / avg_chunk_chars
# GraphRAG-style gleaning: continuation passes re-prompting the extractor for
# entities missed on the first pass (microsoft/graphrag defaults to 1). Runs
# only for extractors exposing a ``glean(text, prior)`` method — the
# deterministic extractors are single-pass-complete, so this is inert for them.
MAX_GLEANINGS = 1

# placeholder type for relationship endpoints never declared as entities
# (reference graph_writer.py:81,94 uses "未知")
UNKNOWN_ENTITY_TYPE = "未知"
UNKNOWN_ENTITY_DESCRIPTION = "No additional data"

# closed vocabularies injected into the extractor (reference settings.py:70-88
# has 6 entity types / 8 relationship types + catch-all; ours are re-keyed for
# the source-code corpus of BASELINE.json input_hint)
ENTITY_TYPES = ("module", "class", "function", "constant", "repo", "person")
RELATIONSHIP_TYPES = (
    "imports", "inherits", "calls", "defines",
    "contains", "references", "depends_on", "其它",
)

# ---- embeddings (reference entity_indexer.py:170,189-205) --------------------
EMBEDDING_DIM = 64        # deterministic hash-projection embedder dimension
EMBEDDING_BATCH = 1024    # Arrow batch rows per embed call

# ---- canonicalization (reference settings.py:101,147-155,241-249) -----------
SIMILARITY_CUTOFF = 0.9   # cosine threshold for SIMILAR edges (KNN cutoff)
SIMILARITY_TOPK = 10      # per-entity cap on SIMILAR edges
WORD_EDIT_DISTANCE = 3    # levenshtein(lower(a), lower(b)) < 3 → duplicate candidates
ALIGNMENT_MIN_GROUP = 2   # groups of >= 2 share a canonical id
CONFLICT_JACCARD = 0.5    # rel-type-set Jaccard below this = conflict
BLOCK_SALT_THRESHOLD = 2000   # blocks larger than this get salted sub-blocks
BLOCK_SALT_FACTOR = 16        # number of salt buckets for hot blocks

# ---- communities -------------------------------------------------------------
COMMUNITY_MAX_LEVELS = 2      # reference leiden.py fallback maxLevels=2
COMMUNITY_MAX_ITER = 10       # local-move / label-propagation sweeps per level
COMMUNITY_TOP_SUMMARIES = 200  # reference summary/leiden.py:10-151 LIMIT 200
COMMUNITY_GAMMA = 1.0          # Leiden resolution (reference gds.leiden gamma)
# ≤ this many projected edges → exact driver-side Leiden kernel (the
# reference's gds.leiden is likewise in-JVM single-machine); above it, the
# distributed weighted-LPA + contraction approximation runs
COMMUNITY_DRIVER_THRESHOLD = 2_000_000

# ---- connected components -----------------------------------------------------
CC_MAX_ITERATIONS = 50    # safety bound; similarity clusters have tiny diameter
CC_CHECKPOINT_EVERY = 3   # localCheckpoint cadence to cut lineage
CC_DRIVER_THRESHOLD = 1_000_000  # ≤ this many edges → driver union-find (one job)
# ≤ this many entities → whole canonical-map computation on the driver
# (shared numpy/union-find kernels; the GDS-in-memory analogue). Above it,
# the distributed blocked-join + DataFrame-CC path runs.
CANON_DRIVER_THRESHOLD = 200_000

# ---- pagerank -----------------------------------------------------------------
# ≤ this many edges → driver numpy power iteration (one job instead of
# ~2 actions per damped iteration); above it, the distributed two-shuffle
# loop runs. Same size-adaptive pattern as CC_DRIVER_THRESHOLD.
PAGERANK_DRIVER_THRESHOLD = 1_000_000

# ---- misc ---------------------------------------------------------------------
SEED = 42


@dataclass(frozen=True)
class PipelineConfig:
    """Bundled knobs passed through the build plan; defaults above."""

    chunk_size: int = CHUNK_SIZE
    overlap: int = OVERLAP
    max_text_length: int = MAX_TEXT_LENGTH
    embedding_dim: int = EMBEDDING_DIM
    similarity_cutoff: float = SIMILARITY_CUTOFF
    similarity_topk: int = SIMILARITY_TOPK
    word_edit_distance: int = WORD_EDIT_DISTANCE
    max_gleanings: int = MAX_GLEANINGS
    community_max_levels: int = COMMUNITY_MAX_LEVELS
    community_max_iter: int = COMMUNITY_MAX_ITER
    entity_types: tuple = field(default=ENTITY_TYPES)
    relationship_types: tuple = field(default=RELATIONSHIP_TYPES)
    seed: int = SEED
    # community detector for the BUILD/INCREMENTAL plans: 'auto' = the
    # size-adaptive modularity detector (detect_communities);
    # 'lpa' = weighted label propagation — COMPONENT-LOCAL, which lets the
    # incremental plan re-detect only delta-touched components
    # (communities.incremental_communities) instead of the whole graph
    community_method: str = "auto"
    # auto-vs-manual edit resolution (reference config/settings.py
    # conflict_strategy; manual_edit_manager.resolve_conflicts:363-477)
    conflict_strategy: str = "manual_first"
    # warm-start PageRank from the previous run's rank table on
    # incremental runs (pagerank initial_ranks; tol-mode)
    pagerank_tol: float = 1e-6
    pagerank_max_iter: int = 100
