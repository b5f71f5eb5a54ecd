"""Generate a larger measurement dataset with the SAME statistical shape as
the driver's deterministic synthetic tables (profiled from
/root/testdata/sf0.1 — see TESTDATA.md). NOT part of the bench contract;
used only to measure optimization work at driver-bench scale (the driver's
round-end MEASUREMENT ran at sf=1.0 in r5, a directory this sandbox no
longer contains).

Profile replicated (measured off sf0.1):
- documents: 5000·(sf/0.1) docs; 30-word vocabulary, uniform 10..100
  words/doc; lang ~ {en:.41, zh/es/fr/de:~.1475}; source src0..src19;
  5% of docs are a near-copy of a random earlier doc with " dup" appended.
- embeddings: 2000·(sf/0.1) unit-ish vectors, 64 dims, std .125/dim
  (≈unit norm), label uniform 0..9.
- events: 100k·(sf/0.1) rows, ts uniform over Jan 2024, user_id uniform
  over 1500·(sf/0.1), 5 event types, value ~ Exp(mean 50), props {"k": n}.
- TPC-H-ish: customer/supplier/part/orders/lineitem scaled by (sf/0.1)
  with the measured value ranges; region/nation fixed.

Usage: python tools/gen_sf.py <sf> [outdir]   (default outdir /root/sfgen)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def write(outdir, name, table):
    pq.write_table(
        table, os.path.join(outdir, f"{name}.parquet"),
        row_group_size=1 << 31,  # single row group, like the driver's files
        compression="snappy",
    )
    print(f"{name}: {table.num_rows} rows")


def gen_documents(rng, n, outdir):
    lens = rng.integers(10, 101, size=n)
    texts = []
    for i in range(n):
        words = rng.choice(VOCAB, size=lens[i])
        texts.append(" ".join(words))
    # 5% near-duplicates: copy of a random earlier doc + " dup"
    n_dup = n // 20
    dup_targets = rng.choice(n, size=n_dup, replace=False)
    for t in dup_targets:
        src = rng.integers(0, n)
        if src != t:
            texts[t] = texts[src] + " dup"
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    table = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
        "source": pa.array([f"src{i % 20}" for i in rng.integers(0, 20, n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    write(outdir, "documents", table)


def gen_embeddings(rng, n, outdir):
    vecs = rng.normal(0, 1, size=(n, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    table = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    })
    write(outdir, "embeddings", table)


def gen_events(rng, n, n_users, outdir):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 1000000, "us")
    ts = base + (rng.random(n) * span.astype(np.int64)).astype("timedelta64[us]")
    ts = np.sort(ts)
    table = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["click", "view", "purchase", "signup", "error"], n).tolist()),
        "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
    })
    write(outdir, "events", table)


def gen_tpch(rng, scale, outdir):
    n_cust, n_supp, n_part = int(15000 * scale), int(1000 * scale), int(20000 * scale)
    n_ord, n_li = int(150000 * scale), int(600000 * scale)
    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int32()),
        "n_name": [f"NATION{i:02d}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
    }))
    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(
            ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"],
            n_cust).tolist()),
    }))
    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }))
    adjs = ["large", "hot", "small", "cold", "fast", "slow", "new", "old"]
    nouns = ["ring", "bolt", "plate", "wheel", "gear", "pipe", "rod", "cap"]
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{rng.choice(adjs)} {rng.choice(nouns)}" for _ in range(n_part)],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(rng.choice(
            ["LARGE", "STANDARD", "ECONOMY", "SMALL", "MEDIUM", "PROMO"],
            n_part).tolist()),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2)),
    }))
    day_us = 24 * 3600 * 1000000
    o_base = np.datetime64("1995-01-01T00:00:00", "us")
    o_days = rng.integers(0, 2405, n_ord)
    odate = o_base + (o_days * day_us).astype("timedelta64[us]")
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord).tolist()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 400000, n_ord), 2)),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_ord).tolist()),
    }))
    l_ord = rng.integers(0, n_ord, n_li)
    sdate = o_base + ((rng.integers(0, 2405, n_li) + 1) * day_us).astype("timedelta64[us]")
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ord, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li).tolist()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li).tolist()),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    root = sys.argv[2] if len(sys.argv) > 2 else "/root/sfgen"
    scale = sf / 0.1
    outdir = os.path.join(root, f"sf{sf}")
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_documents(rng, int(5000 * scale), outdir)
    gen_embeddings(rng, int(2000 * scale), outdir)
    gen_events(rng, int(100000 * scale), int(1500 * scale), outdir)
    gen_tpch(rng, scale, outdir)
    open(os.path.join(outdir, "_DONE"), "w").close()
    print("done:", outdir)


if __name__ == "__main__":
    main()
