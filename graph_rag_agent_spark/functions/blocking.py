"""Entity blocking for the similarity join.

The reference computes KNN over *all* entities inside the Neo4j GDS JVM
(similar_entity.py:153-229) — itself approximate (topK, sampleRate
fallback). At 10^12-file scale an all-pairs KNN is impossible; the Spark
rebuild blocks on a normalized-name key and joins within blocks
(the "normalized-name blocking + salted broadcast/hash join" of the north
star). The SAME block function is used by the pure-Python oracle, so the
candidate-pair contract is deterministic and shared — parity is on pipeline
semantics, not on GDS internals.
"""

from __future__ import annotations

import re

_NON_ALNUM = re.compile(r"[^0-9a-z一-鿿]+")

BLOCK_PREFIX_LEN = 4


def normalize_name(name: str) -> str:
    """lower + strip non-alphanumerics — 'Data_Loader' → 'dataloader'."""
    return _NON_ALNUM.sub("", (name or "").lower())


def block_key(name: str) -> str:
    """Blocking key: prefix of the normalized name. Near-duplicate names
    (edit distance < 3 after lowering) share a prefix in practice; the block
    is intentionally coarse — precision comes from the cosine cutoff inside
    the block, recall from the prefix being short."""
    norm = normalize_name(name)
    return norm[:BLOCK_PREFIX_LEN] if norm else "∅"
