"""End-to-end corpus curation plan (quality -> dedup -> near-dup -> sample -> shards)."""

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.plans.curate import CurationConfig, CurationResult, curate_corpus


@pytest.fixture(scope="module")
def messy_corpus(spark):
    rows = []
    for i in range(40):  # 40 pairwise-disjoint quality docs (40 tokens each)
        rows.append((i, " ".join(f"w{i}_{j}" for j in range(40)), "en"))
    rows.append((100, rows[0][1], "en"))                 # exact dup of 0
    rows.append((101, rows[1][1], "en"))                 # exact dup of 1
    rows.append((102, rows[2][1].replace("w2_7 ", ""), "en"))  # near dup of 2
    rows.append((103, "tiny", "en"))                     # quality fail: <10 tokens
    rows.append((104, "x " * 50, "en"))                  # quality fail: distinct_ratio
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curate_corpus_stage_lineage(spark, messy_corpus):
    cfg = CurationConfig(near_dup="minhash", token_budget=300,
                         sample_default_rate=1.0)
    res = curate_corpus(messy_corpus, cfg)
    assert res.stats["input"] == 45
    assert res.stats["quality"] == 43          # 103, 104 dropped
    assert res.stats["exact_dedup"] == 41      # 100, 101 dropped (min id wins)
    assert res.stats["near_dup"] <= 40         # 102 near-dups 2 -> dropped
    kept_ids = {r.doc_id for r in res.packed.select("doc_id").collect()}
    assert {103, 104, 100, 101}.isdisjoint(kept_ids)
    # the near-dup pair {2, 102} keeps exactly its min-STRING-id member
    # ("102" < "2" — pair ids are strings in the dedup operators)
    assert (2 in kept_ids) ^ (102 in kept_ids)
    assert 102 in kept_ids
    # every kept doc has a shard assignment and token count
    assert res.packed.filter("shard_id is null or n_tokens is null").count() == 0
    assert res.stats["shards"] >= 1


def test_curate_corpus_sampling_and_determinism(spark, messy_corpus):
    cfg = CurationConfig(near_dup=None, sample_rates={"en": 0.5},
                         sample_default_rate=0.0, token_budget=300)
    a = curate_corpus(messy_corpus, cfg)
    b = curate_corpus(messy_corpus.repartition(7), cfg)
    ka = sorted(r.doc_id for r in a.packed.select("doc_id").collect())
    kb = sorted(r.doc_id for r in b.packed.select("doc_id").collect())
    assert ka == kb and 0 < len(ka) < 41
    assert a.stats["sampled"] == len(ka)
