"""Scaling-efficiency evidence for the north rule: the same KG build at two
parallelism levels (local[8] = N, local[32] = 4N — the sandbox proxy for N
vs 4N executors), reporting throughput at both and
eff = (throughput@4N / throughput@N) / 4.

Each level runs in its own subprocess (fresh JVM, no cache bleed); the
corpus is sized so parallel work dominates scheduler overhead.

Usage: python tools/scaling_bench.py [n_docs] [repeats]
Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

WORKER = r"""
import sys, time, os
sys.path.insert(0, "/root/repo")
from graph_rag_agent_spark.session import get_spark
from graph_rag_agent_spark.sources.corpus import generate_corpus
from graph_rag_agent_spark.plans.build import run_kg_build_in_memory

master, n_docs = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="scaling", master=master)
corpus = generate_corpus(spark, n_docs).localCheckpoint(eager=True)
corpus.count()  # warm JVM + codegen
# warm the Python worker pool on every core (pandas/numpy import cost is
# per-worker; excluding it measures steady-state throughput, not spawn)
import pandas as _pd
ncores = spark.sparkContext.defaultParallelism
spark.range(0, ncores * 4, 1, ncores * 4).mapInPandas(
    lambda it: (pdf for pdf in it), schema="id long"
).count()
t0 = time.time()
res = run_kg_build_in_memory(spark, corpus)
n_triples = res.edges.count()
dt = time.time() - t0
print(f"RESULT {dt} {n_triples}")
spark.stop()
"""


def run_once(master: str, n_docs: int) -> tuple[float, int]:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, master, str(n_docs)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            _, dt, n = line.split()
            return float(dt), int(n)
    raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    report = {"n_docs": n_docs, "repeats": repeats}
    for label, master in [("N(local[8])", "local[8]"), ("4N(local[32])", "local[32]")]:
        times, triples = [], 0
        for _ in range(repeats):
            dt, triples = run_once(master, n_docs)
            times.append(dt)
        med = statistics.median(times)
        report[label] = {
            "median_sec": round(med, 2),
            "all_sec": [round(t, 2) for t in times],
            "triples": triples,
            "triples_per_sec": round(triples / med, 2),
        }
    thr_n = report["N(local[8])"]["triples_per_sec"]
    thr_4n = report["4N(local[32])"]["triples_per_sec"]
    report["scaling_efficiency"] = round((thr_4n / thr_n) / 4.0, 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
