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

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Set, Tuple

import numpy as np
import pandas as pd

from graph_rag_agent_spark.config import (
    SIMILARITY_CUTOFF,
    SIMILARITY_TOPK,
    UNKNOWN_ENTITY_DESCRIPTION,
    UNKNOWN_ENTITY_TYPE,
    WORD_EDIT_DISTANCE,
)
from graph_rag_agent_spark.functions.blocking import block_key
from graph_rag_agent_spark.functions.chunking import chunk_records
from graph_rag_agent_spark.functions.embedder import embed_text
from graph_rag_agent_spark.functions.extractor import DeterministicCodeExtractor
from graph_rag_agent_spark.functions.strings import levenshtein
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


class _UnionFind:
    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # min-id representative (matches the Spark CC's min-label fixpoint)
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def _similar_pairs(
    ids: List[str], embs: np.ndarray, cutoff: float, topk: int
) -> Set[Tuple[str, str]]:
    """Blocked per-node topK cosine pairs — same contract as
    operators/canonicalize.similar_edges."""
    blocks: Dict[str, List[int]] = defaultdict(list)
    for i, eid in enumerate(ids):
        blocks[block_key(eid)].append(i)
    keep: Set[Tuple[str, str]] = set()
    for idxs in blocks.values():
        if len(idxs) < 2:
            continue
        sub = embs[idxs]
        norms = np.linalg.norm(sub, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sub = sub / norms
        sims = sub @ sub.T
        np.fill_diagonal(sims, -1.0)
        for a in range(len(idxs)):
            cand = np.where(sims[a] >= cutoff)[0]
            if cand.size == 0:
                continue
            cand = sorted(cand, key=lambda b: (-float(sims[a, b]), ids[idxs[b]]))[:topk]
            for b in cand:
                x, y = ids[idxs[a]], ids[idxs[b]]
                keep.add((x, y) if x < y else (y, x))
    return keep


def build_reference_graph(
    corpus: pd.DataFrame,
    extractor=None,
    cutoff: float = SIMILARITY_CUTOFF,
    topk: int = SIMILARITY_TOPK,
    max_edit_distance: int = WORD_EDIT_DISTANCE,
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
                raw = extractor(rec.text)
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

    # ---- embed + SIMILAR + WCC ---------------------------------------------
    ids = sorted(g.nodes)
    embs = (
        np.stack([embed_text(f"{eid} {g.nodes[eid][1]}") for eid in ids])
        if ids else np.zeros((0, 1), np.float32)
    )
    similar = _similar_pairs(ids, embs, cutoff, topk)
    wcc = _UnionFind()
    for eid in ids:
        wcc.find(eid)
    for a, b in similar:
        wcc.union(a, b)

    # ---- phase M: edit-distance duplicate groups within wcc ----------------
    comp_members: Dict[str, List[str]] = defaultdict(list)
    for eid in ids:
        if len(eid) > 1:
            comp_members[wcc.find(eid)].append(eid)
    merge_uf = _UnionFind()
    for members in comp_members.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if levenshtein(members[i].lower(), members[j].lower()) < max_edit_distance:
                    merge_uf.union(members[i], members[j])
    merge_map = {
        eid: merge_uf.find(eid) for eid in merge_uf.parent if merge_uf.find(eid) != eid
    }

    def remap(triple_rows, cmap):
        """distinct (subj, pred, obj) after mapping, self-loops dropped."""
        out = set()
        for s, p, o in triple_rows:
            s2, o2 = cmap.get(s, s), cmap.get(o, o)
            if s2 != o2:
                out.add((s2, p, o2))
        return out

    triples0 = {(s, p, o) for s, p, o, _, _, _ in g.edges}
    triples1 = remap(triples0, merge_map)

    # ---- phase A: max-degree disambiguation over surviving wcc groups ------
    degree: Dict[str, int] = defaultdict(int)
    for s, p, o in triples1:
        degree[s] += 1
        degree[o] += 1
    surviving = defaultdict(list)
    for eid in ids:
        if eid not in merge_map:  # not merged away
            surviving[wcc.find(eid)].append(eid)
    disambig_map: Dict[str, str] = {}
    for members in surviving.values():
        if len(members) < 2:
            continue
        canon = min(members, key=lambda e: (-degree.get(e, 0), e))
        for e in members:
            if e != canon:
                disambig_map[e] = canon
    g.triples = remap(triples1, disambig_map)
    g.canonical_map = {**merge_map}
    for k, v in disambig_map.items():
        g.canonical_map[k] = v
    # chase one level: merged-in-M then re-pointed-in-A
    for k in list(g.canonical_map):
        v = g.canonical_map[k]
        if v in disambig_map:
            g.canonical_map[k] = disambig_map[v]
    return g
