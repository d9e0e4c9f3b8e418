#!/usr/bin/env python3
"""Scale ladder for the text/dedup/ANN/mm families (VERDICT r15 #3).

The r15 sf1 series measured one 10x step (sf0.1 -> sf1). The dedup
family's excluding-quadratic slope (5.4x) and mm's (6.7x) lean on that
single step; this tool generates documents.parquet + embeddings.parquet
ONLY — the tables those families read — at an arbitrary multiple of the
sf1 shape, so a second and third rung (sf3 = 150k docs / 60k vecs,
sf10 = 500k docs / 200k vecs) fit the box without the 60M-row lineitem
that the full corpus would drag along.

Statistically matched to gen_sf1.py: same vocabulary, 10-100 token
uniform lengths, 4% near-dups (one token swapped to "dup"), 0.3% exact
dups, same lang/source mixes, unit-norm gaussian embeddings.
Deterministic (seed 42 + scale, so each rung is a DIFFERENT corpus of
the same shape, not a prefix).

Usage: python3 tools/gen_docs_scale.py <outDir> <multiple-of-sf1>
       e.g. python3 tools/gen_docs_scale.py /tmp/sf3docs 3
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1]
MULT = float(sys.argv[2])
N_DOCS = int(50_000 * MULT)
N_VECS = int(20_000 * MULT)
SEED = 42 + int(MULT)

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

rng = np.random.default_rng(SEED)
import os
os.makedirs(OUT, exist_ok=True)

# vectorized doc construction (the gen_sf1 per-doc loop is fine at 50k
# but minutes at 500k): draw all lengths, then one flat token draw
lens = rng.integers(10, 101, N_DOCS)
flat = rng.choice(VOCAB, size=int(lens.sum()))
offs = np.zeros(N_DOCS + 1, dtype=np.int64)
np.cumsum(lens, out=offs[1:])
texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(N_DOCS)]

near = rng.choice(N_DOCS, size=int(N_DOCS * 0.04), replace=False)
for i in near:
    src = rng.integers(0, N_DOCS)
    while src == i:
        src = rng.integers(0, N_DOCS)
    toks = texts[src].split(" ")
    toks[rng.integers(0, len(toks))] = "dup"
    texts[i] = " ".join(toks)
exact = rng.choice(N_DOCS, size=int(N_DOCS * 0.003), replace=False)
for i in exact:
    src = rng.integers(0, N_DOCS)
    while src == i:
        src = rng.integers(0, N_DOCS)
    texts[i] = texts[src]

pq.write_table(pa.table({
    "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(rng.choice(LANGS, size=N_DOCS, p=LANG_P), pa.string()),
    "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)], pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{OUT}/documents.parquet")

v = rng.standard_normal((N_VECS, 64)).astype(np.float32)
v /= np.linalg.norm(v, axis=1, keepdims=True)
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
    "embedding": pa.array(list(v), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_VECS), pa.int32()),
}), f"{OUT}/embeddings.parquet")

print(f"{OUT}: {N_DOCS} docs, {N_VECS} vecs (x{MULT} of sf1)")
