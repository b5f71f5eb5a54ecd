"""Chunker parity tests — window/overlap/sentence-snap/pre-split semantics
(reference text_chunker.py:43-266, struct_builder.py:60-142)."""

import hashlib

from graph_rag_agent_spark.config import CHUNK_SIZE, OVERLAP
from graph_rag_agent_spark.functions.chunking import (
    _preprocess_large_text,
    chunk_records,
    chunk_text,
)
from graph_rag_agent_spark.functions.tokenizer import tokenize
from graph_rag_agent_spark.operators.chunker import chunk_documents, doc_id_of


def test_tokenize_roundtrip():
    for text in ["def f(x):\n    return x + 1", "你好。世界！", "a  b\t\tc", ""]:
        assert "".join(tokenize(text)) == text


def test_sentence_enders_are_single_tokens():
    toks = tokenize("前半。后半！结尾？")
    assert "。" in toks and "！" in toks and "？" in toks


def test_empty_and_short_text():
    assert chunk_text("") == []
    # < chunk_size/10 chars → exactly one chunk (reference :196-198)
    short = "tiny text"
    chunks = chunk_text(short)
    assert len(chunks) == 1
    assert "".join(chunks[0]) == short


def test_window_and_overlap():
    # 2000 word tokens, no sentence enders → pure window arithmetic
    text = " ".join(f"w{i}" for i in range(1000))
    chunks = chunk_text(text)
    assert len(chunks) > 1
    for c in chunks[:-1]:
        assert len(c) == CHUNK_SIZE
    # consecutive chunks share the overlap region
    joined0, joined1 = "".join(chunks[0]), "".join(chunks[1])
    tail = "".join(chunks[0][-OVERLAP:])
    assert joined1.startswith(tail)


def test_sentence_snap_extends_chunk():
    # a sentence end shortly after the window boundary → end snaps forward.
    # whitespace runs are tokens too: 260 words + 260 spaces puts 。 at
    # token index ~520, inside the +100 snap slack past the 500 boundary
    words = ["w"] * 260 + ["。"] + ["x"] * 600
    text = " ".join(words)
    chunks = chunk_text(text)
    # first chunk must end exactly at the 。 token
    assert chunks[0][-1] == "。"
    assert len(chunks[0]) <= CHUNK_SIZE + 100 + 1


def test_large_text_presplit():
    text = ("段落内容。" * 2000 + "\n\n") * 60  # > 500k chars
    assert len(text) > 500_000
    segments = _preprocess_large_text(text, 500_000)
    assert len(segments) > 1
    assert all(len(s) <= 500_000 for s in segments)
    # chunking still works end-to-end
    assert len(chunk_text(text)) > 1


def test_chunk_records_metadata():
    text = " ".join(f"w{i}" for i in range(1000))
    recs = chunk_records(text)
    assert [r.position for r in recs] == list(range(1, len(recs) + 1))
    # offset = running sum of previous chunk lengths (struct_builder.py:85-88)
    offset = 0
    for i, r in enumerate(recs):
        assert r.content_offset == offset
        offset += r.length
        assert r.chunk_id == hashlib.sha1(r.text.encode()).hexdigest()
    # position-1 chunk points at itself (struct_builder.py:84)
    assert recs[0].prev_chunk_id == recs[0].chunk_id
    assert recs[1].prev_chunk_id == recs[0].chunk_id


def test_spark_chunker_matches_pure_python(spark, tiny_corpus, tiny_corpus_pdf):
    out = chunk_documents(tiny_corpus).collect()
    by_doc = {}
    for row in out:
        by_doc.setdefault(row.doc_id, []).append(row)
    total_expected = 0
    for r in tiny_corpus_pdf.itertuples(index=False):
        recs = chunk_records(r.content or "")
        total_expected += len(recs)
        did = doc_id_of(r.repo, r.path, r.commit)
        got = sorted(by_doc.get(did, []), key=lambda x: x.position)
        assert [g.chunk_id for g in got] == [x.chunk_id for x in recs]
        assert [g.content_offset for g in got] == [x.content_offset for x in recs]
    assert len(out) == total_expected


def test_content_sha256_invariant(spark, tiny_corpus):
    """Per-row content sha256 equality vs the source table (BASELINE.json)."""
    from pyspark.sql import functions as F

    chunks = chunk_documents(tiny_corpus)
    src = tiny_corpus.select(
        "repo", "path", F.sha2("content", 256).alias("expected_sha")
    )
    joined = chunks.select("repo", "path", "content_sha256").dropDuplicates(
        ["repo", "path"]
    ).join(src, on=["repo", "path"])
    bad = joined.filter(F.col("content_sha256") != F.col("expected_sha")).count()
    assert bad == 0
