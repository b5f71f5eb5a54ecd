"""Document deduplication operators for large-scale training-data pipelines.

Beyond the reference's entity-level dedupe (D2-D8), a 100 TB corpus pipeline
needs document-level dedup. Four strategies, cheapest-first:

- exact:        sha256 groupBy — one shuffle on a uniform key.
- ngram-jaccard: blocked pair join + set overlap — exact near-dup inside
                 cheap blocks (lang + length bucket).
- simhash:      64-bit signature; near-dups = small hamming distance;
                 bucketed by rotated prefixes for sub-quadratic matching.
- minhash-LSH:  shingle → K minhashes → B bands; candidate pairs share a
                 band bucket — the classic web-scale near-dup join
                 (one shuffle on band keys, no all-pairs).

All JVM-side except the numpy minhash kernel (Arrow-batched).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (content_sha256, dup_count, doc_ids) for texts appearing > 1 time."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(
            F.count("*").alias("dup_count"),
            F.array_sort(F.collect_list(F.col(id_col).cast("string"))).alias("doc_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (min id wins — deterministic)."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# n-gram jaccard (blocked exact near-dup)
# ---------------------------------------------------------------------------

def _word_set(text_col: str) -> F.Column:
    return F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple = ("lang",),
    length_bucket: int = 100,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard) for same-block pairs above threshold.

    Block = (block_cols, length(text)//length_bucket): near-identical texts
    have near-identical lengths, so same-bucket blocking keeps recall while
    cutting the pair space from O(n²) to O(Σ block²). Set overlap is
    array_intersect/array_union — JVM-side, codegen'd."""
    base = docs.select(
        F.col(id_col).cast("string").alias("id"),
        *[F.col(c) for c in block_cols],
        (F.length(text_col) / length_bucket).cast("int").alias("_lb"),
        _word_set(text_col).alias("_words"),
    )
    a = base.alias("a")
    b = base.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    on.append(F.col("a._lb") == F.col("b._lb"))
    on.append(F.col("a.id") < F.col("b.id"))
    inter = F.size(F.array_intersect(F.col("a._words"), F.col("b._words")))
    union = F.size(F.array_union(F.col("a._words"), F.col("b._words")))
    return (
        a.join(b, on=[x for x in on])
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (id, simhash bigint): 64-bit simhash over word features.

    Pure DataFrame arithmetic: per-word xxhash64, per-bit ±1 votes summed,
    sign → bit. No Python in the loop."""
    words = docs.select(
        F.col(id_col).cast("string").alias("id"),
        F.explode(_word_set(text_col)).alias("w"),
    ).withColumn("h", F.xxhash64("w"))
    # one row per (doc, bit): vote = +1 if bit set else -1
    bits = words.select(
        "id", "h", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit")
    ).withColumn(
        # dynamic shift amounts need the SQL operator form (the DSL
        # shiftright only takes an int literal)
        "vote",
        F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1),
    )
    votes = bits.groupBy("id", "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(0)
        ).alias("simhash")
    )


def simhash_near_duplicates(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_a, doc_b, hamming ≤ max_hamming). Bucketed by each of 4
    16-bit chunks (pigeonhole: distance ≤ 3 ⇒ some 16-bit chunk equal),
    so the join is on bucket keys, never all-pairs."""
    sigs = simhash_signatures(docs, text_col, id_col)
    chunks = sigs.select(
        "id", "simhash",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(i), F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)))
                for i in range(4)
            ])
        ).alias("bucket"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"), F.col("a.id") < F.col("b.id")])
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(k: int, seed: int = 42) -> tuple:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64)
    return a, b


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """→ candidate near-dup pairs (doc_a, doc_b) sharing ≥ 1 LSH band.

    Word-shingle → K minhashes (numpy, Arrow-batched) → B band keys →
    self-join on band key. With K=64, B=16 (rows/band = 4) the S-curve
    threshold sits at ≈ (1/16)^(1/4) ≈ 0.5 jaccard."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    ha, hb = _minhash_params(num_hashes, seed)

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_bands = [], []
            for did, text in zip(pdf["id"], pdf["text"]):
                words = (text or "").lower().split()
                shingles = {
                    " ".join(words[i : i + shingle])
                    for i in range(max(0, len(words) - shingle + 1))
                } or {""}
                hv = np.array(
                    [
                        int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 3
                        for s in shingles
                    ],
                    dtype=np.int64,
                )
                mins = ((ha[:, None] * hv[None, :] + hb[:, None]) % _MERSENNE).min(axis=1)
                for band in range(bands):
                    seg = mins[band * rows_per_band : (band + 1) * rows_per_band]
                    key = hashlib.md5(
                        (str(band) + ":" + ",".join(map(str, seg))).encode()
                    ).hexdigest()
                    out_ids.append(did)
                    out_bands.append(key)
            yield pd.DataFrame({"id": out_ids, "band": out_bands})

    base = docs.select(F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text"))
    banded = base.mapInPandas(sig_batches, schema="id string, band string")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=[F.col("a.band") == F.col("b.band"), F.col("a.id") < F.col("b.id")])
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
