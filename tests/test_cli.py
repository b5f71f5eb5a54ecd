"""spark-submit launch surface: python -m graph_rag_agent_spark build/incremental."""

import json
import tempfile

from graph_rag_agent_spark.sources.corpus import generate_corpus_pdf


def test_cli_build_then_incremental(spark, capsys):
    """The __main__ entry runs a full build into a warehouse, then an
    incremental pass over the same corpus reports no changes — reusing the
    active session (the spark-submit path)."""
    from graph_rag_agent_spark.__main__ import main

    pdf = generate_corpus_pdf(20, seed=42)
    corpus = spark.createDataFrame(
        pdf, schema="repo string, path string, commit string, lang string, content string"
    )
    with tempfile.TemporaryDirectory(prefix="graft_cli_") as d:
        src = f"{d}/corpus"
        corpus.write.parquet(src)
        wh = f"{d}/wh"

        assert main(["build", "--input", src, "--warehouse", wh]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["cmd"] == "build" and out["triples"] > 0
        assert out["entities"] > 0 and not out["iceberg"]

        assert main(["incremental", "--input", src, "--warehouse", wh]) == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["cmd"] == "incremental" and out2["changed"] is False


def test_cli_rejects_wrong_schema(spark, capsys):
    import pytest

    from graph_rag_agent_spark.__main__ import main

    bad = spark.createDataFrame([("x",)], "just_text string")
    with tempfile.TemporaryDirectory(prefix="graft_cli_bad_") as d:
        src = f"{d}/bad"
        bad.write.parquet(src)
        with pytest.raises(SystemExit):
            main(["build", "--input", src, "--warehouse", f"{d}/wh"])
