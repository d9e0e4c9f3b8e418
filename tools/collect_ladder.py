#!/usr/bin/env python3
"""Collect per-key ladder runs into one artifact per rung.

The chained 25-key Bench run at sf3 was unbounded — one quadratic row
(dedup_multi_signal) ran >70 min through warmup+iterations+retries —
so the ladder runs ONE key per Bench JVM under a wall cap (`timeout`):
a blowup is bounded AND named instead of eating the series. This tool
merges /tmp/ladder/<rung>_<key>.json (each a single-query Bench
artifact, min-of-2 methodology preserved) plus <...>.json.timeout
markers into artifacts/bench_docs_<rung>_perkey_r{N}.json.

Usage: python3 tools/collect_ladder.py <rung> <round> [ladderDir]
"""
import glob
import json
import os
import sys

RUNG = sys.argv[1]
RND = sys.argv[2]
DIR = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ladder"

queries, timeouts, contaminated, errors = {}, {}, [], []
for p in sorted(glob.glob(f"{DIR}/{RUNG}_*.json")):
    d = json.load(open(p))
    for k, v in d["queries"].items():
        # Bench reports a query that throws as -1.0 plus an 'errors'
        # array — mirror that split instead of summing the sentinel
        # into total_sec and counting the key as timed
        if v < 0:
            errors.append(k)
            continue
        queries[k] = v
        if d.get("contaminated"):
            contaminated.append(k)
for p in sorted(glob.glob(f"{DIR}/{RUNG}_*.json.timeout")):
    d = json.load(open(p))
    timeouts[d["key"]] = d["timeout_sec"]

# refused runs (ADVICE r17): Bench exits 3 on a contaminated verdict and
# writes only <out>.json.contaminated — fold those keys into
# contaminated_keys (times kept OUT of 'queries'/total: the refusal
# means the numbers are polluted; they are recorded separately so the
# artifact still shows what the polluted run measured), and pick up
# .refused crash markers (no artifact at all) as errors.
contaminated_times = {}
for p in sorted(glob.glob(f"{DIR}/{RUNG}_*.json.contaminated")):
    d = json.load(open(p))
    for k, v in d["queries"].items():
        # a later re-run supersedes the refused one whatever its
        # outcome — clean-timed, errored, or wall-capped (ADVICE r18:
        # checking only `queries` let a stale contaminated time fold
        # back in when the clean re-run errored or timed out)
        if k in queries or k in errors or k in timeouts:
            continue
        contaminated.append(k)
        if v >= 0:
            contaminated_times[k] = v
        # an errored key inside a refused run stays OUT of `errors`:
        # the failure happened under contamination, so contaminated_keys
        # is its provenance — double-listing would misattribute the
        # rung's state as both "errored" and "polluted"
for p in sorted(glob.glob(f"{DIR}/{RUNG}_*.json.refused")):
    d = json.load(open(p))
    if d["key"] not in queries:
        errors.append(d["key"])

out = {
    "probe": "docs-ladder per-key",
    "rung": RUNG,
    "round": int(RND),
    "method": ("one key per Bench JVM (warmup + min of 2 steady-state "
               "iterations), wall-capped; a capped key is reported in "
               "'timeouts' with its cap, not a time"),
    "n_queries": len(queries),
    "total_sec": round(sum(queries.values()), 1),
    "queries": queries,
    "timeouts": timeouts,
    "errors": sorted(set(errors)),
    "contaminated_keys": sorted(set(contaminated)),
    "contaminated_times": contaminated_times,
}
path = f"artifacts/bench_docs_{RUNG}_perkey_r{RND}.json"
json.dump(out, open(path, "w"), indent=1)
print(f"{path}: {len(queries)} timed, {len(timeouts)} capped, "
      f"{len(errors)} errored, {len(contaminated)} contaminated")
