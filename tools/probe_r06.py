"""One-off probes for round-6 optimization: candidate-count shape of the
quadratic-suspect dedup joins at a given SF. Not part of the bench."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_rag_agent_spark.session import get_spark
from graph_rag_agent_spark.operators.dedup import simhash_signatures

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark(app_name="probe-r06", master="local[32]",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

t0 = time.time()
# --- simhash: bucket-size distribution and Σ cnt² (candidate pairs) ---
head = docs.select("doc_id", "text").filter(F.col("doc_id") < 200)
aug = docs.select("doc_id", "text").unionByName(
    head.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
).unionByName(
    head.select((F.col("doc_id") + 200000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz")).alias("text"))
)
sigs = simhash_signatures(aug).localCheckpoint(eager=True)
chunks = sigs.select(
    "id",
    F.explode(F.array(*[
        F.concat_ws(":", F.lit(i),
                    F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)))
        for i in range(4)
    ])).alias("bucket"),
)
dist = (chunks.groupBy("bucket").agg(F.count("*").alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cand_pairs"),
             F.max("n").alias("max_bucket"),
             F.count("*").alias("n_buckets")).collect()[0])
print("simhash: cand_pairs=%s max_bucket=%s n_buckets=%s  (%.1fs)"
      % (dist["cand_pairs"], dist["max_bucket"], dist["n_buckets"], time.time() - t0))

# distinct signatures
nsig = sigs.select("simhash").distinct().count()
print("simhash: docs=%d distinct_sigs=%d" % (sigs.count(), nsig))

# --- jaccard: prefix-key join explosion ---
t0 = time.time()
threshold = 0.5
from graph_rag_agent_spark.operators.dedup import _word_set
base = docs.select(
    F.col("doc_id").cast("string").alias("id"), F.col("lang"),
    (F.length("text") / 100).cast("int").alias("_lb"),
    _word_set("text").alias("_words"),
)
toks = base.select("id", "lang", "_lb", F.explode("_words").alias("w"))
docfreq = toks.groupBy("w").agg(F.count("*").alias("_df"))
from pyspark.sql import Window
w_rank = Window.partitionBy("id").orderBy(F.asc("_df"), F.asc("w"))
prefix = (
    toks.join(docfreq, on="w")
    .withColumn("_rn", F.row_number().over(w_rank))
    .withColumn("_sz", F.count("*").over(Window.partitionBy("id")))
    .filter(F.col("_rn") <= F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1)
)
kdist = (prefix.groupBy("w", "lang", "_lb").agg(F.count("*").alias("n"))
         .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cand_pairs"),
              F.max("n").alias("max_key"),
              F.count("*").alias("n_keys"),
              F.sum("n").alias("prefix_rows")).collect()[0])
print("jaccard: cand_rows=%s max_key=%s n_keys=%s prefix_rows=%s (%.1fs)"
      % (kdist["cand_pairs"], kdist["max_key"], kdist["n_keys"],
         kdist["prefix_rows"], time.time() - t0))
spark.stop()
