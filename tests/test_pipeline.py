

def test_hot_repo_salting_balances_partitions(spark):
    """North-rule skew handling: a repo holding 90% of the corpus must not
    concentrate in one task after the build's salted repartition (keying is
    (repo, path), never repo alone)."""
    from pyspark.sql import functions as F

    from graph_rag_agent_spark.plans.build import salted_corpus_repartition

    rows = [
        ("hot_repo" if i % 10 else f"cold{i}", f"src/f{i}.py", "c0", "python",
         f"import mod{i}")
        for i in range(2000)
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    n_parts = 16
    dist = (
        salted_corpus_repartition(corpus, n_parts)
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    sizes = [r["count"] for r in dist]
    assert len(sizes) == n_parts
    ideal = 2000 / n_parts
    assert max(sizes) < 2 * ideal, sizes  # no hot-key task
