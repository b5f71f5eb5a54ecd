"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full KG build (chunk → extract → parse →
                canonicalize) over sf0.001 documents, returns the canonical
                (subj, pred, obj) edge table.
queries()     — one entry per implemented operator family (SURVEY.md §2 +
                the training-data ops); each callable (spark, sf_dir) → DF.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query where SQL-expressible;
                non-SQL ops (full KG build, simhash/minhash/LSH whose hash
                functions DuckDB lacks) are rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_rag_agent_spark.functions.extractor import KeywordCooccurrenceExtractor
from graph_rag_agent_spark.operators.canonicalize import canonicalize
from graph_rag_agent_spark.operators.chunker import chunk_documents
from graph_rag_agent_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from graph_rag_agent_spark.operators.embeddings import embed_entities
from graph_rag_agent_spark.operators.extraction import extract_chunks
from graph_rag_agent_spark.operators.parsing import (
    build_graph_tables,
    parse_entities,
    parse_relationships,
)
from graph_rag_agent_spark.operators.similarity import cosine_col
from graph_rag_agent_spark.operators.text_analysis import (
    LANG_MARKERS,
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)

SF_DEFAULT = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → the corpus shape
    (repo, path, commit, lang, content) of BASELINE.json input_hint."""
    return _docs(spark, sf_dir).select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.concat_ws(":", "source", F.col("doc_id").cast("string")), 256).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def _raw_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _docs_as_corpus(spark, sf_dir)
    chunks = chunk_documents(corpus)
    return extract_chunks(chunks, extractor=KeywordCooccurrenceExtractor())


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: canonicalized triple table from the sf0.001 documents."""
    results = _raw_results(spark, SF_DEFAULT)
    nodes, edges, mentions = build_graph_tables(results)
    emb = embed_entities(nodes)
    res = canonicalize(nodes, edges, mentions, emb)
    return res.edges.select("subj", "pred", "obj", "weight", "support")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_kg_triples_raw(spark, sf_dir):
    """Pre-canonicalization distinct triples — SQL-checkable because every
    sf document fits in one chunk (≤553 chars < chunk window)."""
    rels = parse_relationships(_raw_results(spark, sf_dir))
    return rels.select("subj", "pred", "obj").distinct()


def _q_kg_entities(spark, sf_dir):
    ents = parse_entities(_raw_results(spark, sf_dir))
    return ents.select("entity_id", "entity_type").distinct()


def _q_kg_entity_degree(spark, sf_dir):
    triples = _q_kg_triples_raw(spark, sf_dir)
    return (
        triples.select(F.col("subj").alias("entity_id"))
        .unionAll(triples.select(F.col("obj").alias("entity_id")))
        .groupBy("entity_id")
        .agg(F.count("*").alias("degree"))
    )


def _q_kg_mention_counts(spark, sf_dir):
    _, _, mentions = build_graph_tables(_raw_results(spark, sf_dir))
    return mentions.groupBy("entity_id").agg(
        F.countDistinct("chunk_id").alias("n_chunks")
    )


def _q_kg_canonical_triples(spark, sf_dir):
    """Full pipeline incl. canonicalization — rows-only check (the real
    correctness gate is tests/test_parity.py vs the Python oracle)."""
    nodes, edges, mentions = build_graph_tables(_raw_results(spark, sf_dir))
    emb = embed_entities(nodes)
    return canonicalize(nodes, edges, mentions, emb).edges.select("subj", "pred", "obj")


def _q_entity_linking(spark, sf_dir):
    """D9 string-recall stage: levenshteinSimilarity ≥ 0.7 top-5 candidates
    for the mention 'tables' against the extracted entity vocabulary."""
    from graph_rag_agent_spark.operators.entity_linking import string_recall

    ents = _q_kg_entities(spark, sf_dir)
    return string_recall(ents, "tables")


def _q_exact_dedup(spark, sf_dir):
    dups = exact_duplicates(_docs(spark, sf_dir))
    return dups.select(
        "content_sha256",
        "dup_count",
        F.array_join("doc_ids", ",").alias("doc_ids"),
    )


def _q_jaccard_pairs(spark, sf_dir):
    pairs = ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _q_simhash(spark, sf_dir):
    return simhash_signatures(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "simhash"
    )


def _q_minhash_pairs(spark, sf_dir):
    return minhash_lsh_pairs(_docs(spark, sf_dir))


def _q_ann_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(cosine_col(F.col("embedding").cast("array<double>"), F.col("qv")), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(10)


def _q_knn_per_label(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    a, b = emb.alias("a"), emb.alias("b")
    from pyspark.sql import Window

    scored = a.join(
        b, on=[F.col("a.label") == F.col("b.label"), F.col("a.vec_id") != F.col("b.vec_id")]
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        cosine_col(F.col("a.e"), F.col("b.e")).alias("score"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("vec_id", "neighbor_id", F.round("score", 6).alias("score"))
    )


def _q_token_counts(spark, sf_dir):
    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_distinct_tokens", F.round("avg_token_len", 6).alias("avg_token_len")
    )


def _q_quality(spark, sf_dir):
    return quality_scores(_docs(spark, sf_dir))


def _q_langid(spark, sf_dir):
    return language_id(_docs(spark, sf_dir))


def _q_fingerprints(spark, sf_dir):
    return fingerprints(_docs(spark, sf_dir))


def _q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q_top_orders_per_segment(spark, sf_dir):
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


def _q_regional_revenue(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_triples_raw": _q_kg_triples_raw,
        "kg_entities": _q_kg_entities,
        "kg_entity_degree": _q_kg_entity_degree,
        "kg_mention_counts": _q_kg_mention_counts,
        "kg_canonical_triples": _q_kg_canonical_triples,
        "entity_linking": _q_entity_linking,
        "exact_dedup": _q_exact_dedup,
        "jaccard_pairs": _q_jaccard_pairs,
        "simhash_signatures": _q_simhash,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "ann_topk": _q_ann_topk,
        "knn_per_label": _q_knn_per_label,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality,
        "language_id": _q_langid,
        "fingerprints": _q_fingerprints,
        "tpch_q1": _q_tpch_q1,
        "top_orders_per_segment": _q_top_orders_per_segment,
        "regional_revenue": _q_regional_revenue,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# shared CTE: per-doc ordered distinct words (≥6 chars, identifier-shaped) —
# the deterministic keyword extractor's entity rule
_WORDS_CTE = """
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS idx
    FROM documents
), ents AS (
    SELECT doc_id, lower(w) AS w, min(idx) AS first_idx
    FROM toks
    WHERE length(w) >= 4 AND regexp_matches(w, '^[A-Za-z_]')
    GROUP BY doc_id, lower(w)
), ordered AS (
    SELECT doc_id, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY first_idx) AS rn
    FROM ents
)
"""

_PAIRS_CTE = _WORDS_CTE + """
, pairs AS (
    SELECT a.doc_id, a.w AS subj, 'cooccurs' AS pred, b.w AS obj
    FROM ordered a JOIN ordered b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
)
"""


def oracle_sql() -> dict[str, str]:
    lang_score = {
        code: f"len(list_intersect(toks, {words!r}))"
        for code, words in sorted(LANG_MARKERS.items())
    }
    lang_case = " ".join(
        f"WHEN {lang_score[c]} = best THEN '{c}'" for c in sorted(LANG_MARKERS)
    )
    en_words = LANG_MARKERS["en"]
    return {
        "kg_triples_raw": _PAIRS_CTE + "SELECT DISTINCT subj, pred, obj FROM pairs",
        "kg_entities": _WORDS_CTE
        + "SELECT DISTINCT w AS entity_id, 'term' AS entity_type FROM ordered",
        "kg_entity_degree": _PAIRS_CTE + """
            SELECT entity_id, count(*) AS degree FROM (
                SELECT subj AS entity_id FROM (SELECT DISTINCT subj, pred, obj FROM pairs)
                UNION ALL
                SELECT obj AS entity_id FROM (SELECT DISTINCT subj, pred, obj FROM pairs)
            ) GROUP BY entity_id""",
        "kg_mention_counts": _WORDS_CTE + """
            SELECT w AS entity_id, count(DISTINCT dh) AS n_chunks FROM (
                SELECT o.w, sha256(d.text) AS dh
                FROM ordered o JOIN documents d ON o.doc_id = d.doc_id
            ) GROUP BY w""",
        "entity_linking": _WORDS_CTE + """
            SELECT entity_id, string_sim FROM (
                SELECT DISTINCT w AS entity_id,
                       round(1.0 - levenshtein(w, 'tables')::double
                             / greatest(length(w), 6), 6) AS string_sim
                FROM ordered
            ) WHERE string_sim >= 0.7
            ORDER BY string_sim DESC, entity_id LIMIT 5""",
        "exact_dedup": """
            SELECT sha256(text) AS content_sha256,
                   count(*) AS dup_count,
                   array_to_string(list_sort(array_agg(doc_id::varchar)), ',') AS doc_ids
            FROM documents GROUP BY sha256(text) HAVING count(*) > 1""",
        "jaccard_pairs": """
            WITH base AS (
                SELECT doc_id::varchar AS id, lang,
                       CAST(floor(length(text) / 100) AS int) AS lb,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS words
                FROM documents
            )
            SELECT a.id AS doc_a, b.id AS doc_b,
                   round(len(list_intersect(a.words, b.words))::double
                         / len(list_distinct(a.words || b.words)), 6) AS jaccard
            FROM base a JOIN base b
              ON a.lang = b.lang AND a.lb = b.lb AND a.id < b.id
            WHERE len(list_intersect(a.words, b.words))::double
                  / len(list_distinct(a.words || b.words)) >= 0.5""",
        "ann_topk": """
            SELECT b.vec_id,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS score
            FROM embeddings a JOIN embeddings b ON a.vec_id = 0
            ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id
            LIMIT 10""",
        "knn_per_label": """
            SELECT vec_id, neighbor_id, round(score, 6) AS score FROM (
                SELECT a.vec_id, b.vec_id AS neighbor_id,
                       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])) AS score,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                           CAST(b.embedding AS DOUBLE[])) DESC,
                                    b.vec_id
                       ) AS rn
                FROM embeddings a JOIN embeddings b
                  ON a.label = b.label AND a.vec_id <> b.vec_id
            ) WHERE rn <= 5""",
        "token_counts": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS n_distinct_tokens,
                   round(length(regexp_replace(text, '\\s+', '', 'g'))::double
                         / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS avg_token_len
            FROM documents""",
        "quality_scores": f"""
            WITH t AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                FROM documents
            )
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(toks) AS n_tokens,
                   round(length(regexp_replace(text, '[\\w\\s]+', '', 'g'))::double
                         / length(text), 6) AS punct_ratio,
                   round(len(list_distinct(toks))::double / len(toks), 6) AS distinct_ratio,
                   len(list_intersect(list_distinct(toks), {en_words!r})) AS n_stopword_types,
                   (len(toks) >= 10 AND len(list_distinct(toks))::double / len(toks) > 0.2) AS keep
            FROM t""",
        "language_id": f"""
            WITH t AS (
                SELECT doc_id,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
                FROM documents
            ), s AS (
                SELECT doc_id, toks,
                       greatest({', '.join(lang_score[c] for c in sorted(LANG_MARKERS))}) AS best
                FROM t
            )
            SELECT doc_id,
                   CASE WHEN best = 0 THEN 'und' {lang_case} END AS pred_lang
            FROM s""",
        "fingerprints": """
            SELECT doc_id,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "top_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
                SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                       row_number() OVER (
                           PARTITION BY c.c_mktsegment
                           ORDER BY o.o_totalprice DESC, o.o_orderkey
                       ) AS rn
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ) WHERE rn <= 5""",
        "regional_revenue": """
            SELECT r.r_name,
                   round(sum(o.o_totalprice), 4) AS revenue,
                   count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name""",
        # kg_canonical_triples, simhash_signatures, minhash_lsh_pairs:
        # intentionally omitted — non-SQL-expressible (iterative CC loop /
        # xxhash64 & md5-banded minhash not reproducible in DuckDB);
        # driver records rows-only checks, pytest covers exactness.
    }
