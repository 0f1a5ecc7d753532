#!/usr/bin/env python
"""Build a 10x measurement replica of /root/testdata/sf0.1 (round-6
optimization evidence only — the driver's own BENCH run generates its own
sf1.0; this replica reproduces its SCALE so optimizations are measured at
the size the driver times, not at sf0.1 where several heavy queries are
constant-overhead-bound).

Statistical process reverse-engineered from the committed sf dirs (seed
fixed, no external data):
  documents   50k rows — 31-token vocab, wordcount ~ U[10,100], uniform
              token draw, lang {en:.41, zh/es/fr/de:.1475}, source
              uniform src0..19, ~0.16%% planted exact duplicates
  embeddings  20k rows — 64-dim unit vectors (normalized gaussians),
              label uniform 0..9 (measured: no cluster structure)
  events      1M rows — ts sorted-uniform over 2024-01, user ~U[0,15000),
              type uniform over 5, value ~ Exp(mean=50) 2dp, props k 0..99
  tpch        lineitem/orders/customer/part/supplier replicated 10x with
              key offsets; nation/region copied (fixed-size dims)

Usage: python scripts/make_sf_bench_replica.py /root/sfbench/sf1.0 [mult]
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
VOCAB = sorted(["a", "agg", "batch", "big", "column", "customer", "data",
                "dup", "fast", "filter", "group", "hash", "join", "key",
                "line", "merge", "order", "part", "query", "row", "scan",
                "slow", "small", "sort", "spark", "stream", "table", "the",
                "value", "vector", "window"])
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def gen_documents(out: str, n: int, rng: np.random.Generator) -> None:
    wc = rng.integers(10, 101, size=n)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=w)])
             for w in wc]
    # plant exact duplicates at the measured ~0.16% rate
    for i in rng.integers(1, n, size=max(1, n * 8 // 5000)):
        texts[int(i)] = texts[int(rng.integers(0, i))]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    src = np.array([f"src{i}" for i in rng.integers(0, 20, size=n)])
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(src, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(out: str, n: int, rng: np.random.Generator) -> None:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def gen_events(out: str, n: int, users: int,
               rng: np.random.Generator) -> None:
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * 86400 * 1_000_000
    ts = np.sort(rng.integers(0, span, size=n)) + t0
    types = np.array(["signup", "purchase", "view", "click", "error"])
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, users, size=n), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, size=n)],
                               pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.integers(0, 100, size=n)],
                          pa.string()),
    })
    pq.write_table(tbl, f"{out}/events.parquet")


def replicate_tpch(out: str, mult: int) -> None:
    offsets = {
        "lineitem": {"l_orderkey": 150000, "l_partkey": 20000,
                     "l_suppkey": 1000},
        "orders": {"o_orderkey": 150000, "o_custkey": 15000},
        "customer": {"c_custkey": 15000},
        "part": {"p_partkey": 20000},
        "supplier": {"s_suppkey": 1000},
    }
    for t, offs in offsets.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        chunks = []
        for r in range(mult):
            cols = {}
            for name in base.schema.names:
                col = base[name]
                if name in offs and r:
                    col = pc.add(col, offs[name] * r)
                cols[name] = col
            chunks.append(pa.table(cols))
        pq.write_table(pa.concat_tables(chunks), f"{out}/{t}.parquet")
    for t in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{out}/{t}.parquet")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbench/sf1.0"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(4242)
    gen_documents(out, 5000 * mult, rng)
    gen_embeddings(out, 2000 * mult, rng)
    gen_events(out, 100000 * mult, 1500 * mult, rng)
    replicate_tpch(out, mult)
    open(f"{out}/_DONE", "w").close()
    print(f"wrote {out} (mult={mult})")


if __name__ == "__main__":
    main()
