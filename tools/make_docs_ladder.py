#!/usr/bin/env python3
"""Slope table for the docs-family scale ladder (VERDICT r15 #3).

Reads the three bench_docs_{sf1,sf3,sf10}_r16.json artifacts (same
25-query subset, count mode, same box) and prints a markdown table of
per-query and per-family ratios. Rung corpora: gen_sf1 documents/
embeddings at 1x (50k/20k), gen_docs_scale at 3x (150k/60k) and 10x
(500k/200k) — documents-family queries only, so the rungs fit the box
without the 60M-row lineitem.

Usage: python3 tools/make_docs_ladder.py [suffix=r16]
"""
import json
import sys

SUF = sys.argv[1] if len(sys.argv) > 1 else "r16"
rungs = {}
for name in ("sf1", "sf3", "sf10"):
    rungs[name] = json.load(open(f"artifacts/bench_docs_{name}_{SUF}.json"))


def fam(k):
    if k.startswith("dedup_"):
        return "dedup"
    if k.startswith(("mm_", "embed_")):
        return "mm"
    return "text"


q1, q3, q10 = (rungs[n]["queries"] for n in ("sf1", "sf3", "sf10"))
keys = sorted(k for k in q1 if k in q3 and k in q10
              and min(q1[k], q3[k], q10[k]) >= 0)

print("| query | sf1 s | sf3 s | x3 | sf10 s | x10 |")
print("|---|---|---|---|---|---|")
for k in sorted(keys, key=lambda k: -q10[k]):
    print(f"| {k} | {q1[k]:.2f} | {q3[k]:.2f} | {q3[k]/q1[k]:.1f}× "
          f"| {q10[k]:.2f} | {q10[k]/q1[k]:.1f}× |")

print()
print("| family | n | sf1 s | sf3 s | x3 | sf10 s | x10 |")
print("|---|---|---|---|---|---|---|")
fams = {}
for k in keys:
    f = fam(k)
    a, b, c, n = fams.get(f, (0.0, 0.0, 0.0, 0))
    fams[f] = (a + q1[k], b + q3[k], c + q10[k], n + 1)
tot = [0.0, 0.0, 0.0]
for f, (a, b, c, n) in sorted(fams.items()):
    print(f"| {f} | {n} | {a:.1f} | {b:.1f} | {b/a:.1f}× | {c:.1f} "
          f"| {c/a:.1f}× |")
    tot[0] += a
    tot[1] += b
    tot[2] += c
print(f"| total | {len(keys)} | {tot[0]:.1f} | {tot[1]:.1f} "
      f"| {tot[1]/tot[0]:.1f}× | {tot[2]:.1f} | {tot[2]/tot[0]:.1f}× |")

for n, d in rungs.items():
    print(f"\n{n}: total {d['value']:.1f}s contaminated="
          f"{d.get('contaminated')} errors={d.get('errors')}")
