"""Shard packing + stratified sampling (training-data curation ops)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.curation import (
    pack_shards,
    rate_to_hex_threshold,
    shard_manifest,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(f"tok{i}_{j}" for j in range(5 + (i * 7) % 40)),
         ["en", "de", "fr"][i % 3])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pack_shards_budget_property(spark, corpus):
    budget = 200
    packed = pack_shards(corpus, token_budget=budget, part_cols=("lang",))
    rows = packed.select("lang", "shard_id", "doc_id", "n_tokens").collect()
    max_doc = max(r.n_tokens for r in rows)
    man = {
        (r.lang, r.shard_id): r
        for r in shard_manifest(packed).collect()
    }
    # coverage: every doc in exactly one shard, token totals add up
    assert sum(r.n_docs for r in man.values()) == corpus.count()
    for lang in ("en", "de", "fr"):
        shards = sorted(s for (lg, s) in man if lg == lang)
        # doc sizes ≪ budget → contiguous shard ids from 0
        assert shards == list(range(len(shards)))
        for s in shards[:-1]:
            total = man[(lang, s)].total_tokens
            assert budget - max_doc < total < budget + max_doc, (lang, s, total)


def test_pack_shards_deterministic_across_partitionings(spark, corpus):
    budget = 150
    a = pack_shards(corpus, token_budget=budget).select("doc_id", "shard_id")
    b = pack_shards(corpus.repartition(7), token_budget=budget).select(
        "doc_id", "shard_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_shards_bucketed_distributes_without_loss(spark, corpus):
    budget = 100
    packed = pack_shards(corpus, token_budget=budget, n_buckets=4)
    # every doc still assigned exactly once, and the op is deterministic
    assert packed.count() == corpus.count()
    again = pack_shards(corpus.repartition(5), token_budget=budget, n_buckets=4)
    assert sorted(map(tuple, packed.select("doc_id", "shard_id").collect())) == \
        sorted(map(tuple, again.select("doc_id", "shard_id").collect()))


def test_stratified_sample_membership_is_pure_hash_function(spark, corpus):
    rates = {"en": 0.5, "de": 0.25}
    kept = {r.doc_id for r in stratified_sample(
        corpus, rates, default_rate=0.1).select("doc_id").collect()}
    langs = {r.doc_id: r.lang for r in corpus.select("doc_id", "lang").collect()}
    expect = set()
    for did, lang in langs.items():
        thr = rate_to_hex_threshold(rates.get(lang, 0.1))
        if hashlib.md5(str(did).encode()).hexdigest()[:8] < thr:
            expect.add(did)
    assert kept == expect
    # rate sanity on the biggest stratum (100 en docs, rate 0.5)
    n_en = sum(1 for l in langs.values() if l == "en")
    n_en_kept = sum(1 for d in kept if langs[d] == "en")
    assert 0.3 * n_en < n_en_kept < 0.7 * n_en


def test_stratified_sample_no_shuffle_in_plan(spark, corpus):
    plan = stratified_sample(corpus, {"en": 0.5})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # map-only filter
