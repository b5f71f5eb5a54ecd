"""Pure-Python reference-faithful builder.

Implements the reference's serial build path (chunk → extract → parse →
placeholder synthesis → embed → blocked KNN → WCC → edit-distance merge →
max-degree disambiguation/alignment) with NO Spark, using the exact same
deterministic kernels (chunking, extractor, embedder, blocking, levenshtein)
the Spark pipeline uses. The Spark pipeline must reproduce this builder's
final (subj, pred, obj) triple set at P/R ≥ 0.95 — the BASELINE.json gate.

Where the reference is nondeterministic (threadpool completion order feeding
the first-wins node cache, LLM adjudication, Cypher collection order), both
this oracle and the Spark pipeline use the same deterministic tie-breaks:
first-wins by chunk order, group representative = min entity_id, canonical =
(max degree, then min entity_id), self-loops dropped after merge.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Set, Tuple

import numpy as np
import pandas as pd

from graph_rag_agent_spark.config import (
    MAX_GLEANINGS,
    SIMILARITY_CUTOFF,
    SIMILARITY_TOPK,
    UNKNOWN_ENTITY_DESCRIPTION,
    UNKNOWN_ENTITY_TYPE,
    WORD_EDIT_DISTANCE,
)
from graph_rag_agent_spark.functions.canonical_kernel import (
    compose_maps,
    disambig_map_of,
    merge_map_of,
    remap_triples,
    wcc_of,
)
from graph_rag_agent_spark.functions.chunking import chunk_records
from graph_rag_agent_spark.functions.embedder import embed_text
from graph_rag_agent_spark.functions.extractor import (
    DeterministicCodeExtractor,
    extract_with_gleanings,
)
from graph_rag_agent_spark.functions.similarity_kernel import pairs_all
from graph_rag_agent_spark.functions.wire_format import (
    parse_entities,
    parse_relationships,
)


@dataclass
class OracleGraph:
    chunks: List[dict] = field(default_factory=list)
    nodes: Dict[str, Tuple[str, str]] = field(default_factory=dict)  # id -> (type, desc)
    edges: List[Tuple[str, str, str, str, float, str]] = field(default_factory=list)
    mentions: Set[Tuple[str, str]] = field(default_factory=set)
    triples: Set[Tuple[str, str, str]] = field(default_factory=set)  # final canonical set
    canonical_map: Dict[str, str] = field(default_factory=dict)


def build_reference_graph(
    corpus: pd.DataFrame,
    extractor=None,
    cutoff: float = SIMILARITY_CUTOFF,
    topk: int = SIMILARITY_TOPK,
    max_edit_distance: int = WORD_EDIT_DISTANCE,
    max_gleanings: int = MAX_GLEANINGS,
) -> OracleGraph:
    """corpus(repo, path, commit, lang, content) → fully canonicalized graph."""
    extractor = extractor or DeterministicCodeExtractor()
    g = OracleGraph()
    extraction_cache: Dict[str, str] = {}
    node_occ: Dict[str, Tuple[int, str, str]] = {}

    # ---- chunk + extract + parse (serial, file order) ----------------------
    for row in corpus.itertuples(index=False):
        for rec in chunk_records(row.content or ""):
            g.chunks.append(
                {"repo": row.repo, "path": row.path, "chunk_id": rec.chunk_id,
                 "position": rec.position, "text": rec.text}
            )
            if rec.chunk_id in extraction_cache:
                raw = extraction_cache[rec.chunk_id]
            else:
                raw = extract_with_gleanings(
                    rec.text, extractor(rec.text), extractor, max_gleanings
                )
                extraction_cache[rec.chunk_id] = raw
            chunk_entities = set()

            def note(eid: str, flag: int, etype: str, desc: str) -> None:
                cand = (flag, etype, desc)
                prev = node_occ.get(eid)
                if prev is None or cand < prev:
                    node_occ[eid] = cand

            for eid, etype, desc in parse_entities(raw):
                note(eid, 0, etype, desc)
                chunk_entities.add(eid)
            for src, tgt, rtype, desc, weight in parse_relationships(raw):
                g.edges.append((src, rtype, tgt, desc, weight, rec.chunk_id))
                for end in (src, tgt):
                    # endpoint occurrence: placeholder props unless declared
                    note(end, 1, UNKNOWN_ENTITY_TYPE, UNKNOWN_ENTITY_DESCRIPTION)
                    chunk_entities.add(end)
            for eid in chunk_entities:
                g.mentions.add((rec.chunk_id, eid))

    # node props: min over (placeholder_flag, type, desc) — the same
    # order-independent rule as operators/parsing.derive_nodes
    for eid, (_, etype, desc) in node_occ.items():
        g.nodes[eid] = (etype, desc)

    # ---- embed + SIMILAR + WCC + merge + disambiguation — all via the
    # SHARED kernels (functions/similarity_kernel.py, canonical_kernel.py),
    # the same code canonicalize's driver fast path runs -------------------
    ids = sorted(g.nodes)
    embs = (
        np.stack([embed_text(f"{eid} {g.nodes[eid][1]}") for eid in ids])
        if ids else np.zeros((0, 1), np.float32)
    )
    pairs = pairs_all(ids, embs, cutoff=cutoff, topk=topk)
    wcc = wcc_of(ids, [(a, b) for a, b, _ in pairs])
    merge_map = merge_map_of(wcc, max_edit_distance=max_edit_distance)

    triples0 = {(s, p, o) for s, p, o, _, _, _ in g.edges}
    triples1 = remap_triples(triples0, merge_map)
    degree: Dict[str, int] = {}
    for s, _, o in triples1:
        degree[s] = degree.get(s, 0) + 1
        degree[o] = degree.get(o, 0) + 1
    disambig_map = disambig_map_of(wcc, merge_map, degree)

    g.triples = remap_triples(triples1, disambig_map)
    g.canonical_map = compose_maps(merge_map, disambig_map)
    return g
