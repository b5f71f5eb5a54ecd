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


def merge_groups_of(
    wcc: Dict[str, str], max_edit_distance: int = WORD_EDIT_DISTANCE
) -> Dict[str, List[str]]:
    """Edit-distance duplicate groups within each WCC → {rep: sorted members}
    for multi-member groups (rep = min id)."""
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
    groups: Dict[str, List[str]] = defaultdict(list)
    for e in uf.parent:
        groups[uf.find(e)].append(e)
    return {rep: sorted(ms) for rep, ms in groups.items() if len(ms) > 1}


def merge_map_of(
    wcc: Dict[str, str],
    max_edit_distance: int = WORD_EDIT_DISTANCE,
    adjudicator=None,
) -> Dict[str, str]:
    """Duplicate groups → {entity: canonical} for merged-away entities only.

    `adjudicator` is the D5 LLM slot (reference entity_merger.py:165-311:
    the model picks the surviving entity of each duplicate group): a
    callable sorted-members → canonical id. Default (None) = the
    deterministic min-id rule. A pick outside the group falls back to
    min-id (the reference's LLM-failure fallback)."""
    out: Dict[str, str] = {}
    for rep, members in merge_groups_of(wcc, max_edit_distance).items():
        canon = rep
        if adjudicator is not None:
            pick = adjudicator(list(members))
            if pick in members:
                canon = pick
        for e in members:
            if e != canon:
                out[e] = canon
    return out


def disambig_map_of(
    wcc: Dict[str, str],
    merge_map: Dict[str, str],
    degrees: Dict[str, int],
    resolver=None,
) -> Dict[str, str]:
    """Surviving WCC groups of ≥2 → canonical = (max degree, min id).

    `resolver` is the D13 LLM slot (reference entity_disambiguation.py:
    158-276: the model picks the canonical of a conflicting group; the
    max-degree rule is its deterministic fallback): callable
    (sorted members, {member: degree}) → canonical id; an out-of-group pick
    falls back to the degree rule."""
    surviving: Dict[str, List[str]] = defaultdict(list)
    for eid, comp in wcc.items():
        if eid not in merge_map:
            surviving[comp].append(eid)
    dmap: Dict[str, str] = {}
    for members in surviving.values():
        if len(members) < 2:
            continue
        members = sorted(members)
        canon = None
        if resolver is not None:
            pick = resolver(list(members), {e: degrees.get(e, 0) for e in members})
            if pick in members:
                canon = pick
        if canon is None:
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
