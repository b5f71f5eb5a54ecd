"""retrieval_metrics: the reference's rule arithmetic
(evaluation/metrics/retrieval_metrics.py:100-131, 280-316) on crafted
samples exercising each branch — substring rule, digit-run rule, score
floor, utilization partial-token fallback, and case-insensitivity."""

import pytest

from graph_rag_agent_spark.operators.retrieval_metrics import retrieval_metrics


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "query_id string, retrieved array<string>, reference array<string>"
    )
    return {r["query_id"]: r.asDict() for r in retrieval_metrics(df).collect()}


def test_substring_rule_and_score(spark):
    out = _run(
        spark,
        [
            # 2 of 4 refs are substrings of some retrieved string
            ("q1", ["alpha beta", "gamma"], ["alpha", "gamma", "delta", "zeta"]),
            # full match → 0.3 + 0.7·1 = 1.0
            ("q2", ["x", "y"], ["x", "y"]),
        ],
    )
    assert out["q1"]["prec_matched"] == 2
    assert out["q1"]["precision"] == pytest.approx(0.3 + 0.7 * 2 / 4)
    assert out["q2"]["precision"] == pytest.approx(1.0)
    # matched > 0 → utilization equals precision (same rule, same score)
    assert out["q1"]["utilization"] == out["q1"]["precision"]


def test_digit_rule_takes_max(spark):
    # direct substring matches 0 refs, but both digit-runs appear → num rule
    out = _run(
        spark,
        [("q", ["chunk 42 intro", "see 7"], ["doc42", "section7", "other"])],
    )
    assert out["q"]["prec_matched"] == 2
    assert out["q"]["precision"] == pytest.approx(0.3 + 0.7 * 2 / 3)


def test_floor_and_partial_token_fallback(spark):
    out = _run(
        spark,
        [
            # nothing matches at all → 0.3 / 0.3
            ("cold", ["aaa"], ["zzzz qqqq"]),
            # no rule match, but the >3-char token 'zzzz' appears in the
            # joined retrieved text → precision floor 0.3, utilization 0.4
            ("warm", ["xx zzzz yy"], ["zzzz qqqq"]),
        ],
    )
    assert out["cold"]["precision"] == pytest.approx(0.3)
    assert out["cold"]["util_matched"] == 0
    assert out["cold"]["utilization"] == pytest.approx(0.3)
    assert out["warm"]["prec_matched"] == 0
    assert out["warm"]["precision"] == pytest.approx(0.3)
    assert out["warm"]["util_matched"] == 1
    assert out["warm"]["utilization"] == pytest.approx(0.4)


def test_case_insensitive(spark):
    out = _run(spark, [("q", ["ALPHA one"], ["Alpha"])])
    assert out["q"]["prec_matched"] == 1
    assert out["q"]["precision"] == pytest.approx(1.0)


def test_chunk_utilization_ratio_and_mean(spark):
    from graph_rag_agent_spark.operators.retrieval_metrics import chunk_utilization

    chunks = spark.createDataFrame(
        [
            ("c1", "alpha bravo charlie delta"),  # 4 phrases
            ("c2", "echoes foxtrot golfing"),  # 3 phrases
            ("c3", "a b c"),  # no >=4-char phrase → ratio 0, still counted
        ],
        "chunk_id string, text string",
    )
    samples = spark.createDataFrame(
        [
            # answer contains 2 of c1's 4 phrases → ratio 0.5
            ("q1", "ALPHA and delta appear", ["c1"]),
            # mean over c1 (0.5) and c3 (0.0) → 0.25
            ("q2", "alpha delta", ["c1", "c3"]),
            # missing id excluded from the mean; c2 fully used → 1.0
            ("q3", "echoes foxtrot golfing all used", ["c2", "missing"]),
            # nothing resolves → 0.3 base
            ("q4", "whatever", ["missing"]),
        ],
        "query_id string, answer string, chunk_ids array<string>",
    )
    out = {r["query_id"]: r.asDict() for r in chunk_utilization(samples, chunks).collect()}
    assert out["q1"]["chunk_utilization"] == pytest.approx(0.5)
    assert out["q2"]["chunk_utilization"] == pytest.approx(0.25)
    assert out["q2"]["n_chunks"] == 2
    assert out["q3"]["chunk_utilization"] == pytest.approx(1.0)
    assert out["q3"]["n_chunks"] == 1
    assert out["q4"]["chunk_utilization"] == pytest.approx(0.3)
    assert out["q4"]["n_chunks"] == 0


def test_chunk_utilization_phrase_dedup(spark):
    from graph_rag_agent_spark.operators.retrieval_metrics import chunk_utilization

    # repeated phrase counts once (reference set()s the phrases)
    chunks = spark.createDataFrame(
        [("c", "word word word other")], "chunk_id string, text string"
    )
    samples = spark.createDataFrame(
        [("q", "word only", ["c"])],
        "query_id string, answer string, chunk_ids array<string>",
    )
    out = chunk_utilization(samples, chunks).collect()[0]
    assert out["chunk_utilization"] == pytest.approx(0.5)  # 1 of {word, other}


def _run_answers(spark, rows):
    from graph_rag_agent_spark.operators.retrieval_metrics import answer_metrics

    df = spark.createDataFrame(
        rows, "query_id string, prediction string, golden string"
    )
    return {r["query_id"]: r.asDict() for r in answer_metrics(df).collect()}


def test_exact_match_normalization(spark):
    out = _run_answers(
        spark,
        [
            # punctuation, case, articles, and whitespace all normalize away
            ("em", "The  Answer, is: Blue!", "answer is blue"),
            ("near", "answer is blue", "answer is red"),
            ("empty", "", "answer"),
        ],
    )
    assert out["em"]["exact_match"] == pytest.approx(1.0)
    assert out["near"]["exact_match"] == pytest.approx(0.0)
    assert out["empty"]["exact_match"] == pytest.approx(0.0)
    assert out["empty"]["content_similarity"] == pytest.approx(0.0)


def test_content_similarity_formula(spark):
    # pred {alpha beta}, gold {alpha gamma delta}: common 1, union 4
    # 0.4·(1/4) + 0.3·(1/2) + 0.3·(1/3)
    out = _run_answers(spark, [("q", "alpha beta", "alpha gamma delta")])
    expected = 0.4 * (1 / 4) + 0.3 * (1 / 2) + 0.3 * (1 / 3)
    assert out["q"]["content_similarity"] == pytest.approx(expected, abs=1e-6)


def test_rule_f1_list_denominators_and_edge_cases(spark):
    out = _run_answers(
        spark,
        [
            # pred tokens (len>1): [aa, aa, bb] (3 with duplicate), gold [aa, cc]
            # common distinct = {aa} → p = 1/3, r = 1/2, f1 = 2pr/(p+r) = 0.4
            ("dup", "aa aa bb", "aa cc"),
            # all tokens length 1 → both filtered empty → 1.0
            ("both_empty", "a b", "c d"),
            # one side empty after filtering → 0.0
            ("one_empty", "a b", "real words"),
        ],
    )
    assert out["dup"]["rule_f1"] == pytest.approx(0.4, abs=1e-6)
    assert out["both_empty"]["rule_f1"] == pytest.approx(1.0)
    assert out["one_empty"]["rule_f1"] == pytest.approx(0.0)


def _run_reasoning(spark, rows):
    from graph_rag_agent_spark.operators.retrieval_metrics import reasoning_metrics

    df = spark.createDataFrame(rows, "query_id string, answer string")
    return {r["query_id"]: r.asDict() for r in reasoning_metrics(df).collect()}


def test_reasoning_scores_and_caps(spark):
    think = (
        "<think>"
        + "> 1. first query\n> 2. second query\n> 3. third\n> 4. fourth\n"
        + "para one\n\npara two\n\npara three\n\npara four\n\n"
        + "**Final Information** found it\n\n**Final Information** more\n\n"
        + "</think>answer"
    )
    out = _run_reasoning(
        spark,
        [
            ("full", think),
            ("bare", "no markup at all"),
            ("thin", "<think>one line only</think>x"),
        ],
    )
    full = out["full"]
    assert full["n_queries"] == 4
    assert full["n_info"] == 2
    # queries capped at 3 → 0.6 + 0.3 + 0.1 (paras > 3) capped at 1.0
    assert full["reasoning_coherence"] == pytest.approx(1.0)
    # depth: 0.6 + min(.2, .05·4)=0.2 + min(.1, .02·n_para) + min(.1, .05·2)=0.1
    assert full["reasoning_depth"] == pytest.approx(
        0.6 + 0.2 + min(0.1, 0.02 * full["n_paragraphs"]) + 0.1
    )
    # no thinking block → both metrics at the 0.6 default, counts zero
    assert out["bare"]["reasoning_coherence"] == pytest.approx(0.6)
    assert out["bare"]["reasoning_depth"] == pytest.approx(0.6)
    assert out["bare"]["n_queries"] == 0
    # minimal thinking: no queries, single paragraph
    thin = out["thin"]
    assert thin["n_queries"] == 0 and thin["n_paragraphs"] == 1
    assert thin["reasoning_coherence"] == pytest.approx(0.6)
    assert thin["reasoning_depth"] == pytest.approx(0.6 + 0.02 * 1)


def test_agent_utilization_rules(spark):
    from graph_rag_agent_spark.operators.retrieval_metrics import (
        agent_utilization_metrics,
    )

    rows = [
        # 5 iterations (capped bonus 0.3); thinking mentions 实体+关系 = 2;
        # entity marker present, community absent
        (
            "cap",
            "<think>"
            + "> 1. a\n> 2. b\n> 3. c\n> 4. d\n> 5. e\n"
            + "uses 实体 and 关系\n\nmore</think>核心相关实体: x\nrest",
        ),
        # no thinking: simplified branch — entity marker + 2 entity words +
        # 1 relation word (+ the 实体 inside the marker) → mentions path off
        ("bare", "核心相关实体: y\nentity entity relation text"),
    ]
    df = spark.createDataFrame(rows, "query_id string, answer string")
    out = {r["query_id"]: r.asDict() for r in agent_utilization_metrics(df).collect()}
    cap = out["cap"]
    assert cap["n_iterations"] == 5
    assert cap["iterative_improvement"] == pytest.approx(0.8)  # 0.5 + cap 0.3
    assert cap["kg_mentions"] == 2
    assert cap["kg_utilization"] == pytest.approx(0.2 + 0.06 + 0.25)
    bare = out["bare"]
    assert bare["n_iterations"] == 0
    assert bare["iterative_improvement"] == pytest.approx(0.5)
    # erefs = 实体(in marker) + entity×2 = 3, rrefs = 1 → min(0.3, 0.2)
    assert bare["kg_utilization"] == pytest.approx(0.2 + 0.25 + 0.2)


def test_short_tokens_do_not_trigger_fallback(spark):
    # all ref tokens ≤ 3 chars → fallback stays off (reference filters >3)
    out = _run(spark, [("q", ["ab cd ef"], ["ab cd"])])
    # note: 'ab cd' IS a substring of 'ab cd ef' → direct rule fires; use
    # a ref that is not a substring
    out2 = _run(spark, [("q", ["ab xx ef"], ["ab cd"])])
    assert out2["q"]["prec_matched"] == 0
    assert out2["q"]["util_matched"] == 0
    assert out2["q"]["utilization"] == pytest.approx(0.3)
    assert out["q"]["prec_matched"] == 1
