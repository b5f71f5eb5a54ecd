"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "triples_per_sec": ...}

The KG-build entries are the north-star workload (triples/sec end-to-end);
the rest cover the operator families (dedup, ANN, text analysis, relational).
Run tools/scaling_bench.py for the N vs 4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from graph_rag_agent_spark.session import get_spark  # noqa: E402
from graph_rag_agent_spark.sources.corpus import generate_corpus  # noqa: E402

BENCH_QUERIES = [
    "kg_triples_raw",
    "kg_canonical_triples",
    "kg_graph_projection",
    "top_chunks_for_seeds",
    "exact_dedup",
    "jaccard_pairs",
    "simhash_signatures",
    "minhash_lsh_pairs",
    "ann_topk",
    "knn_per_label",
    "token_counts",
    "quality_scores",
    "language_id",
    "fingerprints",
    "tpch_q1",
    "top_orders_per_segment",
    "regional_revenue",
]

SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    spark = get_spark(app_name="graft-bench", master=f"local[{cpus}]")

    timings: dict = {}
    qs = entry_mod.queries()
    total_t0 = time.time()

    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    # north-star workload LAST: the synthetic KG build saturates every core
    # for tens of seconds, and this host throttles for ~60s after an
    # all-core burn (measured — see BENCH.md); running it first poisons the
    # small queries' timings with the hangover
    t0 = time.time()
    corpus = generate_corpus(spark, SYNTH_DOCS).localCheckpoint(eager=True)
    corpus_build_s = time.time() - t0
    t0 = time.time()
    from graph_rag_agent_spark.plans.build import run_kg_build_in_memory

    res = run_kg_build_in_memory(spark, corpus)
    n_triples = res.edges.count()
    kg_s = time.time() - t0
    timings["kg_build_synthetic"] = round(kg_s, 3)
    triples_per_sec = round(n_triples / kg_s, 2) if kg_s > 0 else 0.0

    total = round(time.time() - total_t0 - corpus_build_s, 3)
    print(
        json.dumps(
            {
                "metric": "kg_pipeline_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "triples_per_sec": triples_per_sec,
                "synthetic_docs": SYNTH_DOCS,
                "synthetic_triples": n_triples,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
