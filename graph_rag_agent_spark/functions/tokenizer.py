"""Deterministic tokenizer.

The reference chunks on HanLP ``COARSE_ELECTRA_SMALL_ZH`` tokens
(reference text_chunker.py:25) — a neural model we neither ship nor want:
chunk ids must be reproducible from public code alone. We substitute a
deterministic regex rule with the two properties the chunker relies on:

1. ``''.join(tokenize(t)) == t`` — chunk text is ``''.join(tokens)``
   (reference struct_builder.py:81), so tokens must reconstruct the text
   exactly (HanLP drops whitespace; we keep whitespace runs as tokens so
   source code round-trips byte-for-byte).
2. sentence-end punctuation (。！？) are standalone tokens, so the
   chunker's sentence-snap logic (text_chunker.py:237-260) works.

The same function is used by the Spark chunk UDF and the Python oracle.
"""

from __future__ import annotations

import re
from typing import List

# word runs | whitespace runs | single other char (punctuation, CJK symbol...)
_TOKEN_RE = re.compile(r"\w+|\s+|[^\w\s]", re.UNICODE)


def tokenize(text: str, max_text_length: int = 500_000) -> List[str]:
    """Split text into tokens; falls back to char split for oversized input
    (mirrors reference _safe_tokenize, text_chunker.py:165-183)."""
    if not text:
        return []
    if len(text) > max_text_length:
        return list(text)
    return _TOKEN_RE.findall(text)
