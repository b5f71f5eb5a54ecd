"""Real `spark-submit --py-files graft.zip` launch path.

The north rule's production launch surface is spark-submit with the package
shipped as a --py-files zip (reference analogue: the build runner invoked as
``python -m graphrag_agent.integrations.build.main``, integrations/build/
main.py). `tests/test_cli.py` covers the __main__ argument surface in-process;
this test covers what that cannot: a FRESH JVM + driver whose only source of
the package is the zip (cwd is a temp dir, PYTHONPATH scrubbed), the way a
1000-executor cluster actually receives the code. Catches zip-unimportable
packages, data files missing from the artifact, and __main__ paths that
accidentally depend on the repo checkout.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# spark-submit gives the driver a session; __main__ must reuse it (the
# cluster-provided-session branch of _get_session) rather than build its own.
_DRIVER = """\
import sys
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
from graph_rag_agent_spark.__main__ import main
sys.exit(main(sys.argv[1:]))
"""


def _spark_submit():
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


def _build_zip(zip_path: str) -> None:
    pkg_root = os.path.join(REPO, "graph_rag_agent_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_root):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not found")
def test_spark_submit_py_files_build(spark):
    from graph_rag_agent_spark.sources.corpus import generate_corpus_pdf

    with tempfile.TemporaryDirectory(prefix="graft_submit_") as d:
        src = f"{d}/corpus"
        pdf = generate_corpus_pdf(12, seed=7)
        spark.createDataFrame(
            pdf,
            schema="repo string, path string, commit string, lang string, content string",
        ).write.parquet(src)

        zip_path = f"{d}/graft.zip"
        _build_zip(zip_path)
        driver = f"{d}/driver.py"
        with open(driver, "w") as fh:
            fh.write(_DRIVER)

        env = {
            **os.environ,
            "PYSPARK_PYTHON": sys.executable,
            "PYSPARK_DRIVER_PYTHON": sys.executable,
        }
        # the zip must be the subprocess's ONLY route to the package
        env.pop("PYTHONPATH", None)

        r = subprocess.run(
            [
                _spark_submit(),
                "--master", "local[4]",
                "--driver-memory", "4g",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                driver,
                "build", "--input", src, "--warehouse", f"{d}/wh",
            ],
            capture_output=True,
            text=True,
            cwd=d,  # NOT the repo — import must come from the zip
            env=env,
            timeout=600,
        )
        assert r.returncode == 0, f"spark-submit failed:\n{r.stderr[-4000:]}"
        json_lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        assert json_lines, f"no summary line on stdout:\n{r.stdout[-2000:]}"
        summary = json.loads(json_lines[-1])
        assert summary["cmd"] == "build"
        assert summary["triples"] > 0 and summary["entities"] > 0
        # warehouse tables were written by the subprocess, readable here
        nodes = spark.read.parquet(f"{d}/wh/nodes")
        assert nodes.count() == summary["entities"]
