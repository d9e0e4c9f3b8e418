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


N_CUST = 150_000
N_ORDERS = 1_500_000
N_SUPP = 10_000
N_PART = 200_000

TS0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)


def _ts(lo_days, hi_days, n):
    # DAY granularity, like the shipped corpus (dates are midnight-
    # aligned there — a sub-day component would break the CSV
    # round-trip row, whose text format is millisecond-truncating)
    us_per_day = 24 * 3600 * 1_000_000
    return pa.array(
        TS0 + rng.integers(lo_days, hi_days, n) * us_per_day,
        pa.timestamp("us"))


def gen_tpch():
    """10x the sf0.1 TPC-H-shaped tables: dense 0-based keys, uniform
    value mixes matched to the shipped corpus (probed 2026-08-14 —
    statuses O/P/F, 5 priorities/segments, flags A/N/R x F/O, nation
    regionkey = key % 5, 2-dp money columns, dates 1995..2001)."""
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
        "r_name": pa.array(
            ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"], pa.string()),
    }), f"{OUT}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32), pa.int32()),
    }), f"{OUT}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, N_CUST), 2), pa.float64()),
        "c_mktsegment": pa.array(rng.choice(
            ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"],
            N_CUST), pa.string()),
    }), f"{OUT}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)], pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, N_SUPP), 2), pa.float64()),
    }), f"{OUT}/supplier.parquet")
    adjectives = ["large", "hot", "small", "cold", "steel", "brushed"]
    nouns = ["ring", "bolt", "plate", "washer", "gear", "pin"]
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
        "p_name": pa.array([f"{adjectives[i % 6]} {nouns[(i // 6) % 6]}"
                            for i in range(N_PART)], pa.string()),
        "p_brand": pa.array([f"Brand#{i % 25}" for i in range(N_PART)], pa.string()),
        "p_type": pa.array(rng.choice(
            ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO"], N_PART), pa.string()),
        "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(900 + (np.arange(N_PART) % 1000) / 10, 2),
                                  pa.float64()),
    }), f"{OUT}/part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], N_ORDERS), pa.string()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, N_ORDERS), 2),
                                 pa.float64()),
        "o_orderdate": _ts(0, 2404, N_ORDERS),  # 1995-01-01 .. 2001-08-01
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            N_ORDERS), pa.string()),
    }), f"{OUT}/orders.parquet")
    # 1-7 lines per order (~6M rows), mirroring the shipped 4 lines/order mean
    n_lines = rng.integers(1, 8, N_ORDERS)
    okeys = np.repeat(np.arange(N_ORDERS), n_lines)
    n_li = int(okeys.shape[0])
    linenum = np.concatenate([np.arange(1, k + 1) for k in n_lines])
    pq.write_table(pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, N_PART, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, N_SUPP, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum.astype(np.int32), pa.int32()),
        "l_quantity": pa.array(np.round(rng.uniform(1, 50, n_li), 2), pa.float64()),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2),
                                    pa.float64()),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2), pa.float64()),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li), pa.string()),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li), pa.string()),
        "l_shipdate": _ts(1, 2499, n_li),  # 1995-01-02 .. 2001-11
    }), f"{OUT}/lineitem.parquet")
    return n_li


gen_documents()
gen_embeddings()
gen_events()
n_li = gen_tpch()
print(f"wrote documents({N_DOCS}), embeddings({N_VECS}), events({N_EVENTS}), "
      f"lineitem({n_li}), orders({N_ORDERS}), customer({N_CUST}) to {OUT}")
