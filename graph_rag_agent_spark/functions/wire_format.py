"""The extraction wire format.

The reference's LLM emits delimited-text records, not JSON
(reference config/prompts/graph_prompts.py:7-95):

    ("entity" : "NAME" : "TYPE" : "DESCRIPTION")
    ("relationship" : "SRC" : "TGT" : "TYPE" : "DESCRIPTION" : WEIGHT)

and the writer parses them with two regexes (reference graph_writer.py:48-49).
We reproduce both directions here; the same strings are used JVM-side via
``regexp_extract_all`` in operators/parsing.py.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from graph_rag_agent_spark.config import RECORD_DELIMITER, TUPLE_DELIMITER

# exact parse patterns from the reference writer (graph_writer.py:48-49)
ENTITY_PATTERN = r'\("entity" : "(.+?)" : "(.+?)" : "(.+?)"\)'
RELATIONSHIP_PATTERN = r'\("relationship" : "(.+?)" : "(.+?)" : "(.+?)" : "(.+?)" : (.+?)\)'

_ENTITY_RE = re.compile(ENTITY_PATTERN)
_REL_RE = re.compile(RELATIONSHIP_PATTERN)


def emit_entity(name: str, etype: str, description: str) -> str:
    return f'("entity"{TUPLE_DELIMITER}"{name}"{TUPLE_DELIMITER}"{etype}"{TUPLE_DELIMITER}"{description}")'


def emit_relationship(
    src: str, tgt: str, rtype: str, description: str, weight: float
) -> str:
    return (
        f'("relationship"{TUPLE_DELIMITER}"{src}"{TUPLE_DELIMITER}"{tgt}"'
        f'{TUPLE_DELIMITER}"{rtype}"{TUPLE_DELIMITER}"{description}"{TUPLE_DELIMITER}{weight})'
    )


def join_records(records: List[str]) -> str:
    return RECORD_DELIMITER.join(records)


def parse_entities(result: str) -> List[Tuple[str, str, str]]:
    """→ [(entity_id, entity_type, description)]"""
    return _ENTITY_RE.findall(result or "")


def parse_relationships(result: str) -> List[Tuple[str, str, str, str, float]]:
    """→ [(src, tgt, rel_type, description, weight)]; rows with an
    unparseable weight are dropped (reference wraps float() in try)."""
    out = []
    for src, tgt, rtype, desc, weight in _REL_RE.findall(result or ""):
        try:
            out.append((src, tgt, rtype, desc, float(weight)))
        except ValueError:
            continue
    return out
