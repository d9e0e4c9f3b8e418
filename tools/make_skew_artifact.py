#!/usr/bin/env python3
"""Build CORRECTNESS_skew_r{N}.json from check.py runs over one or
more hostile-distribution corpora.

Usage:
    python3 tools/make_skew_artifact.py <round> \
        <sfDir>:<outDir>[:<blockName>] [more triples...] \
        [scope=...] [extra=path.json] > CORRECTNESS_skew_r{N}.json

The FIRST (sfDir, outDir) pair is the primary corpus: its per-query
verdicts land at the artifact's top level (the r12/r13 shape). Each
LATER pair becomes a named block under `_meta` (e.g. `dup_corpus`,
`mm_corpus`) holding its own sf_dir + per-query verdicts — separate
corpora stay separate so the primary series remains comparable
round-over-round. `extra=` merges a JSON object (e.g. measured
bucket-spread numbers) into `_meta` verbatim.
"""
import json
import os
import subprocess
import sys

RND = sys.argv[1]
PAIRS = []
SCOPE = None
EXTRA = {}
for a in sys.argv[2:]:
    if a.startswith("scope="):
        SCOPE = a.split("=", 1)[1]
    elif a.startswith("extra="):
        with open(a.split("=", 1)[1]) as f:
            EXTRA = json.load(f)
    else:
        parts = a.split(":")
        PAIRS.append((parts[0], parts[1],
                      parts[2] if len(parts) > 2 else None))


def run_check(sf_dir, out_dir):
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
         sf_dir, out_dir],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
    res = {}
    for line in proc.stdout.splitlines():
        if line.startswith("PASS "):
            for q in line.split(":", 1)[1].split():
                res[q] = {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None}
        elif line.startswith("SKIP "):
            q, msg = line[5:].split(":", 1)
            res[q] = {"rows_match": None, "schema_match": None,
                      "hash_match": None, "err": "no_oracle:" + msg.strip()}
        elif line.startswith("FAIL "):
            q, msg = line[5:].split(":", 1)
            res[q] = {"rows_match": False, "schema_match": False,
                      "hash_match": False, "err": msg.strip()}
    return res, proc.returncode


primary_sf, primary_out, _ = PAIRS[0]
res, rc = run_check(primary_sf, primary_out)
green = sum(1 for v in res.values() if v["hash_match"])
meta = {
    "sf_dir": primary_sf,
    "scope": SCOPE or f"round-{RND} hostile-distribution grade",
    "checked": len(res),
    "hash_green": green,
    "oracle_infeasible": 0,
    "check_exit": rc,
}
total_green, total_checked, worst_rc = green, len(res), rc
for sf_dir, out_dir, name in PAIRS[1:]:
    block_res, block_rc = run_check(sf_dir, out_dir)
    bg = sum(1 for v in block_res.values() if v["hash_match"])
    meta[name or os.path.basename(sf_dir)] = {
        "sf_dir": sf_dir,
        "checked": sorted(block_res),
        "hash_green": bg,
        "check_exit": block_rc,
        "results": block_res,
    }
    total_green += bg
    total_checked += len(block_res)
    worst_rc = max(worst_rc, block_rc)
meta["total_checked"] = total_checked
meta["total_hash_green"] = total_green
meta.update(EXTRA)
out = {"_meta": meta}
for q in sorted(res):
    out[q] = res[q]
json.dump(out, sys.stdout, indent=1)
print()
print(f"[make_skew_artifact] total checked={total_checked} "
      f"green={total_green} worst_exit={worst_rc}", file=sys.stderr)
sys.exit(worst_rc)
