#!/usr/bin/env python3
"""Local sf1 probe generator (driver ships sf <= 0.1 only).

Regenerates a 10x-sf0.1 corpus statistically matched to
/root/testdata/sf0.1 — same schemas, vocabulary, length/lang/source
mixes, dup structure, and the driver's CURRENT timestamp unit for
events.ts (parquet TIMESTAMP(MICROS), no tz) — so the registry can be
oracle-graded at 10x the driver's gate scale. Deterministic (seed 42).

Usage: python3 tools/gen_sf1.py [outDir=/tmp/sf1]
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SEED = 42
N_DOCS = 50_000
N_VECS = 20_000
N_EVENTS = 1_000_000
N_USERS = 15_000

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

rng = np.random.default_rng(SEED)
os.makedirs(OUT, exist_ok=True)


def gen_documents():
    texts = []
    for i in range(N_DOCS):
        n = rng.integers(10, 101)
        texts.append(" ".join(rng.choice(VOCAB, size=n)))
    # 4% near-dups: re-issue an earlier doc with one token swapped for
    # the out-of-vocab marker "dup" (same structure the shipped corpus
    # uses — near-dup pairs share almost all shingles)
    near = rng.choice(N_DOCS, size=int(N_DOCS * 0.04), replace=False)
    for i in near:
        src = rng.integers(0, N_DOCS)
        while src == i:  # resample: a doc can't be its own near-dup
            src = rng.integers(0, N_DOCS)
        toks = texts[src].split(" ")
        toks[rng.integers(0, len(toks))] = "dup"
        texts[i] = " ".join(toks)
    # 0.3% exact dups
    exact = rng.choice(N_DOCS, size=int(N_DOCS * 0.003), replace=False)
    for i in exact:
        src = rng.integers(0, N_DOCS)
        while src == i:  # resample: self-copy is not a duplicate
            src = rng.integers(0, N_DOCS)
        texts[i] = texts[src]
    lang = rng.choice(LANGS, size=N_DOCS, p=LANG_P)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet")


def gen_embeddings():
    v = rng.standard_normal((N_VECS, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, N_VECS), pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")


def gen_events():
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span, N_EVENTS)) + t0
    tbl = pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        # the driver's current unit: TIMESTAMP(MICROS), no timezone
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], N_EVENTS),
            pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 560, N_EVENTS), 2),
                          pa.float64()),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, N_EVENTS)],
                          pa.string()),
    })
    pq.write_table(tbl, f"{OUT}/events.parquet")


gen_documents()
gen_embeddings()
gen_events()
print(f"wrote documents({N_DOCS}), embeddings({N_VECS}), events({N_EVENTS}) to {OUT}")
