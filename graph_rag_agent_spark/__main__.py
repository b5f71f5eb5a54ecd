"""spark-submit entry point for the KG construction pipeline.

The north rule's launch surface (reference analogue:
``python -m graphrag_agent.integrations.build.main``,
integrations/build/main.py):

    # cluster (the production path):
    zip -r graft.zip graph_rag_agent_spark
    spark-submit --py-files graft.zip \
        --master yarn --num-executors 1000 \
        -m graph_rag_agent_spark  ... (or pass the repo's __main__.py)

    # local:
    python -m graph_rag_agent_spark build \
        --input /data/corpus_parquet --warehouse /data/graph_wh
    python -m graph_rag_agent_spark incremental \
        --input /data/corpus_parquet --warehouse /data/graph_wh

Subcommands:
  build        full KG build (chunk → extract → parse → canonicalize →
               communities), all stage tables written through TableCatalog
               (Iceberg when the session has a catalog configured, parquet
               emulation otherwise) with per-stage lineage metrics.
  incremental  one incremental pass (change detection → partial rebuild →
               upsert + GC) against an existing warehouse.

The corpus input is either a parquet directory or (with ``--table``) any
session-readable table name — e.g. an Iceberg table of source-code
repositories with columns (repo, path, commit, lang, content), the
BASELINE.json input shape. When running under spark-submit an active
SparkSession is reused; standalone invocation builds a local one honoring
$SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _get_session(app_name: str):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:  # spark-submit / cluster-provided session
        return active
    from graph_rag_agent_spark.session import get_spark

    return get_spark(app_name=app_name)


def _read_corpus(spark, args):
    df = (
        spark.read.table(args.input) if args.table
        else spark.read.parquet(args.input)
    )
    missing = {"repo", "path", "commit", "lang", "content"} - set(df.columns)
    if missing:
        raise SystemExit(f"corpus is missing required columns: {sorted(missing)}")
    return df


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="graph_rag_agent_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("build", "incremental"):
        s = sub.add_parser(name)
        s.add_argument("--input", required=True,
                       help="corpus parquet dir (or table name with --table)")
        s.add_argument("--table", action="store_true",
                       help="treat --input as a session table name (e.g. an "
                            "Iceberg table) instead of a parquet path")
        s.add_argument("--warehouse", required=True,
                       help="TableCatalog warehouse dir (parquet emulation) — "
                            "an Iceberg-configured session writes to its "
                            "catalog instead")
        s.add_argument("--resume", action="store_true",
                       help="build only: reuse the extraction cache table")

    args = p.parse_args(argv)
    spark = _get_session(f"graft-{args.cmd}")

    from graph_rag_agent_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    corpus = _read_corpus(spark, args)
    t0 = time.time()
    if args.cmd == "build":
        from graph_rag_agent_spark.plans.build import BuildPipeline

        out = BuildPipeline(spark, catalog).run(corpus, resume=args.resume)
        n_triples = out["edges"].count()
        summary = {
            "cmd": "build",
            "triples": n_triples,
            "entities": out["nodes"].count(),
            "sec": round(time.time() - t0, 2),
            "triples_per_sec": round(n_triples / max(time.time() - t0, 1e-9), 2),
            "iceberg": bool(catalog.iceberg_catalog),
        }
    else:
        from graph_rag_agent_spark.plans.incremental_update import (
            IncrementalUpdatePipeline,
        )

        stats = IncrementalUpdatePipeline(spark, catalog).run_once(corpus)
        summary = {
            "cmd": "incremental",
            **{k: v for k, v in stats.items() if isinstance(v, (int, float, str, bool))},
            "sec": round(time.time() - t0, 2),
            "iceberg": bool(catalog.iceberg_catalog),
        }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
