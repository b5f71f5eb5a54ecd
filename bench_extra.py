"""Per-query isolation harness for optimization work (guide §1.4).

NOT the frozen bench: `bench.py` stays the driver's measurement contract.
This file exists so optimization evidence (noop-sink timings, formatted
plans) can be produced per query without touching bench.py.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--reps N] [--plans plans/r06 --suffix _before] [--sink noop|count] \
      [query ...]

Prints one JSON line: {"sf_dir": ..., "sink": ..., "queries": {name: [secs...]}}
Plans (explain("formatted")) are written to <plans>/<query><suffix>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from graph_rag_agent_spark.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--plans", default=None, help="directory for explain output")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sink", choices=["noop", "count"], default="count")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="graft-bench-extra",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry_mod.queries()
    names = args.queries or list(qs)
    out: dict = {}
    for name in names:
        fn = qs[name]
        saved = dict(entry_mod._MEMO)
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        times = []
        for i in range(args.reps):
            if i:
                entry_mod._MEMO.clear()
                entry_mod._MEMO.update(saved)
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.time() - t0, 3))
        out[name] = times
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            # plan of the final (post-memo) build — what the timed rep ran
            plan = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        print(f"## {name}: {times}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "sink": args.sink, "queries": out}))


if __name__ == "__main__":
    main()
