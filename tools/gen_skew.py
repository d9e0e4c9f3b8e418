#!/usr/bin/env python3
"""Zipfian skew probe corpus (VERDICT r11, next-round #3).

Every driver corpus (sf0.001..sf0.1) and the local sf1 probe are
UNIFORM-generated; nothing validated the dedup/window/join families
under the key distributions 100 TB corpora actually have. This tool
regenerates events + documents at sf0.1 scale with the three skew
shapes the judge named, and copies the remaining tables verbatim from
a source corpus so the whole registry still runs:

  - events.user_id   ~ zipfian (s≈1.2): the hottest user owns ~8-12%
    of all events — the straggler shape for per-user windows
    (window_rolling_7d), sessionize, funnel, retention, latest-row;
  - events.event_type ~ [0.85, 0.08, 0.04, 0.02, 0.01]: one monster
    key for the salted join/agg rows to prune against;
  - documents: 40% of docs carry a shared 10-token boilerplate
    preamble AND token draws are zipfian over the vocabulary — hot
    grams/fingerprints everywhere, the df-cap / substring-dedup
    stress shape.

Deterministic (seed 1337). Timestamp unit matches the driver's current
events unit (TIMESTAMP MICROS, no tz).

An optional `dupfrac=F` argument (VERDICT r12 #2) additionally copies
ONE text verbatim onto F of all docs — the exact-dedup straggler
shape: a row_number window partitioned by the text fingerprint would
pin every copy of the hot text in a single task, while the min_by
aggregate winner combines map-side. Generate it as a SEPARATE corpus
(e.g. /tmp/skewdup) so the default corpus stays comparable across
rounds.

Round 14 (VERDICT r13 #4) adds the two family-specific hostile shapes:

  - embeddings: generated (no longer copied verbatim) as a HOT-CLUSTER
    mixture — 55% of all vectors sit in ONE tight cluster (the rest
    spread over 7 others), the deliberately hot-bucket shape for the
    ANN family: a fixed-nlist IVF layout concentrates that mass into
    few buckets unless training splits it. Cluster membership is
    deterministic in vec_id (vec_id % 20 < 11 -> hot), centers reuse
    the embClusteredCte integer pattern, noise is seeded-gaussian.
  - `bigdoc=1`: doc 0's text becomes itself repeated 100x — the
    skewed-payload multimodal shape (mm_frame_sample's payload IS the
    text, so one document carries 100x the frames; the image/audio
    rows' payload dims are mod-bounded by construction and cannot
    skew). Generate as a SEPARATE corpus (e.g. /tmp/skewmm) so the
    text-family rows stay comparable on the default corpus.

Usage: python3 tools/gen_skew.py [outDir=/tmp/skew01] [srcDir=/root/testdata/sf0.1] [dupfrac=0.2] [bigdoc=1]
"""
import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew01"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DUP_FRAC = 0.0
BIG_DOC = False
for a in sys.argv[3:]:
    if a.startswith("dupfrac="):
        DUP_FRAC = float(a.split("=", 1)[1])
    if a.startswith("bigdoc="):
        BIG_DOC = a.split("=", 1)[1] == "1"
SEED = 1337
N_EVENTS = 100_000
N_USERS = 1_500
N_DOCS = 5_000

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
BOILER = "terms of service apply to all data in this corpus"  # 10 tokens

rng = np.random.default_rng(SEED)
os.makedirs(OUT, exist_ok=True)


def zipf_ids(n, k, s=1.2):
    """n draws over ids 0..k-1 with zipf(s) rank-frequency — id 0 is
    the hottest. Exact normalized probabilities (np.random.zipf's
    unbounded tail would need clipping that distorts the head)."""
    ranks = np.arange(1, k + 1, dtype=np.float64)
    p = ranks ** -s
    p /= p.sum()
    return rng.choice(k, size=n, p=p)


def gen_events():
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span, N_EVENTS)) + t0
    user = zipf_ids(N_EVENTS, N_USERS)
    etype = rng.choice(["view", "click", "purchase", "signup", "error"],
                       N_EVENTS, p=[0.85, 0.08, 0.04, 0.02, 0.01])
    # every user still signs up once (retention needs cohorts): force
    # the FIRST event of each user to signup
    first = np.full(N_USERS, -1, dtype=np.int64)
    for i in range(N_EVENTS - 1, -1, -1):
        first[user[i]] = i
    etype = etype.astype(object)
    for u in range(N_USERS):
        if first[u] >= 0:
            etype[first[u]] = "signup"
    tbl = pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array(list(etype), pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 560, N_EVENTS), 2),
                          pa.float64()),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, N_EVENTS)],
                          pa.string()),
    })
    pq.write_table(tbl, f"{OUT}/events.parquet")
    hot = np.bincount(user).max() / N_EVENTS
    print(f"events: hottest user owns {hot:.1%} of {N_EVENTS} events")


def gen_documents():
    # zipfian token draws: the head of the vocabulary dominates, so
    # shared grams are pervasive even outside the boilerplate preamble
    texts = []
    for i in range(N_DOCS):
        n = int(rng.integers(10, 101))
        toks = [VOCAB[j] for j in zipf_ids(n, len(VOCAB), s=1.1)]
        if i % 5 < 2:  # 40% boilerplate-prefixed
            texts.append(BOILER + " " + " ".join(toks))
        else:
            texts.append(" ".join(toks))
    # same dup structure as the uniform corpora so the dedup semantics
    # stay exercised: 4% near-dups, 0.3% exact dups
    near = rng.choice(N_DOCS, size=int(N_DOCS * 0.04), replace=False)
    for i in near:
        src = int(rng.integers(0, N_DOCS))
        while src == i:
            src = int(rng.integers(0, N_DOCS))
        toks = texts[src].split(" ")
        toks[int(rng.integers(0, len(toks)))] = "dup"
        texts[i] = " ".join(toks)
    if DUP_FRAC > 0:
        # ONE hot text duplicated verbatim across DUP_FRAC of the
        # corpus: a single fingerprint owns that whole fraction, so a
        # winner-selection window would be a one-task straggler
        hot_ids = rng.choice(N_DOCS, size=int(N_DOCS * DUP_FRAC),
                             replace=False)
        hot_text = texts[int(hot_ids[0])]
        for i in hot_ids:
            texts[i] = hot_text
        print(f"documents: {len(hot_ids)}/{N_DOCS} share one duplicated text")
    exact = rng.choice(N_DOCS, size=int(N_DOCS * 0.003), replace=False)
    for i in exact:
        src = int(rng.integers(0, N_DOCS))
        while src == i:
            src = int(rng.integers(0, N_DOCS))
        texts[i] = texts[src]
    if BIG_DOC:
        # one 100x document — applied AFTER the dup loops so nothing
        # overwrites it; n_chars below reflects the final text
        texts[0] = " ".join([texts[0]] * 100)
        print(f"documents: doc 0 inflated to {len(texts[0])} chars (100x)")
    lang = rng.choice(LANGS, size=N_DOCS, p=LANG_P)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet")
    nb = sum(1 for t in texts if t.startswith(BOILER))
    print(f"documents: {nb}/{N_DOCS} carry the shared boilerplate preamble")


N_EMB = 2000
EMB_DIM = 64


def gen_embeddings():
    # hot-bucket mixture: 55% of vectors in ONE tight cluster, the
    # rest over 7 spread clusters. Membership deterministic in vec_id;
    # centers reuse the embClusteredCte integer pattern so cluster
    # geometry matches the clustered-recall rows' regime. Draws happen
    # AFTER events/documents so those tables stay byte-identical to
    # the r12/r13 corpora (rng consumes in generation order).
    ids = np.arange(N_EMB)
    cl = np.where(ids % 20 < 11, 0, 1 + (ids % 20 - 11) % 7)
    centers = np.array([[((c * 37 + d * 11) % 19 - 9) / 9.0
                         for d in range(EMB_DIM)] for c in range(8)])
    v = (centers[cl] + rng.normal(0, 0.08, (N_EMB, EMB_DIM))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(cl.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")
    frac = np.mean(cl == 0)
    print(f"embeddings: {frac:.0%} of {N_EMB} vectors in the hot cluster")


COPY = ["region", "nation", "customer", "supplier", "part", "orders",
        "lineitem"]

gen_events()
gen_documents()
gen_embeddings()
for t in COPY:
    src = f"{SRC}/{t}.parquet"
    if os.path.exists(src):
        shutil.copyfile(src, f"{OUT}/{t}.parquet")
print(f"skew corpus at {OUT} (rest copied from {SRC})")
