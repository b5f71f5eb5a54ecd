"""Shared driver-side canonicalization kernel (D3/D4/D6/D10 rules).

Used by BOTH the oracle (oracle/reference_builder.py) and canonicalize's
driver fast path — one implementation of:
- WCC over SIMILAR pairs (min-id union-find),
- within-WCC edit-distance duplicate grouping (lev(lower) < d, ids > 1 char,
  group representative = min id),
- max-degree disambiguation over surviving WCC co-members
  (canonical = max degree, tie → min id),
- map composition (disambig ∘ merge).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Sequence, Set, Tuple

from graph_rag_agent_spark.config import WORD_EDIT_DISTANCE
from graph_rag_agent_spark.functions.strings import levenshtein


class UnionFind:
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
        if rb < ra:  # min-id representative
            ra, rb = rb, ra
        self.parent[rb] = ra


def wcc_of(ids: Sequence[str], pairs: Iterable[Tuple[str, str]]) -> Dict[str, str]:
    """→ {entity_id: component (= min reachable id)}."""
    uf = UnionFind()
    for eid in ids:
        uf.find(eid)
    for a, b in pairs:
        uf.union(a, b)
    return {eid: uf.find(eid) for eid in ids}


def merge_map_of(
    wcc: Dict[str, str], max_edit_distance: int = WORD_EDIT_DISTANCE
) -> Dict[str, str]:
    """Edit-distance duplicate groups within each WCC → {entity: group rep}
    for merged-away entities only (rep = min id)."""
    comp_members: Dict[str, List[str]] = defaultdict(list)
    for eid, comp in wcc.items():
        if len(eid) > 1:
            comp_members[comp].append(eid)
    uf = UnionFind()
    for members in comp_members.values():
        if len(members) < 2:
            continue
        members.sort()
        lowered = [m.lower() for m in members]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if levenshtein(lowered[i], lowered[j]) < max_edit_distance:
                    uf.union(members[i], members[j])
    return {e: uf.find(e) for e in uf.parent if uf.find(e) != e}


def disambig_map_of(
    wcc: Dict[str, str], merge_map: Dict[str, str], degrees: Dict[str, int]
) -> Dict[str, str]:
    """Surviving WCC groups of ≥2 → canonical = (max degree, min id)."""
    surviving: Dict[str, List[str]] = defaultdict(list)
    for eid, comp in wcc.items():
        if eid not in merge_map:
            surviving[comp].append(eid)
    dmap: Dict[str, str] = {}
    for members in surviving.values():
        if len(members) < 2:
            continue
        canon = min(members, key=lambda e: (-degrees.get(e, 0), e))
        for e in members:
            if e != canon:
                dmap[e] = canon
    return dmap


def compose_maps(merge_map: Dict[str, str], dmap: Dict[str, str]) -> Dict[str, str]:
    """entity →(M)→ rep →(A)→ canonical, plus A's own rows."""
    combined = {e: dmap.get(rep, rep) for e, rep in merge_map.items()}
    combined.update(dmap)
    return combined


def remap_triples(
    triples: Iterable[Tuple[str, str, str]], cmap: Dict[str, str]
) -> Set[Tuple[str, str, str]]:
    """Distinct (subj, pred, obj) after mapping; self-loops dropped."""
    out: Set[Tuple[str, str, str]] = set()
    for s, p, o in triples:
        s2, o2 = cmap.get(s, s), cmap.get(o, o)
        if s2 != o2:
            out.add((s2, p, o2))
    return out
