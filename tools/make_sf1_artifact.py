#!/usr/bin/env python3
"""Build CORRECTNESS_sf1_r{N}.json from a tools/check.py run over an
sf1 Verify dump.

Usage:
    python3 tools/make_sf1_artifact.py <sfDir> <outDir> <round> \
        [excluded=q1,q2,...] > CORRECTNESS_sf1_r{N}.json

Runs check.py as a subprocess, parses its PASS/SKIP/FAIL lines, and
emits the r8-style artifact: one entry per checked query with
rows/schema/hash booleans, plus a _meta block. Queries named in
`excluded` are moved OUT of the compare (their oracle is documented
infeasible at this scale — e.g. DuckDB O(n^2) lambda evaluation or a
recursive-CTE closure measured in r8 at >40 min) and recorded with
err = "oracle_infeasible" and the Spark-side row count.
"""
import json
import os
import subprocess
import sys

SF_DIR = sys.argv[1]
OUT_DIR = sys.argv[2]
RND = sys.argv[3]
EXCLUDED = {}
for a in sys.argv[4:]:
    if a.startswith("excluded="):
        for q in a.split("=", 1)[1].split(","):
            EXCLUDED[q.strip()] = True

# stash excluded dirs so check.py never opens their oracle (stash
# created only when needed: an empty leftover _excluded dir would be
# reported by check.py as an unreadable result)
stash = os.path.join(OUT_DIR, "_excluded")
if EXCLUDED:
    os.makedirs(stash, exist_ok=True)
for q in EXCLUDED:
    src = os.path.join(OUT_DIR, q)
    if os.path.isdir(src):
        os.rename(src, os.path.join(stash, q))

# stdout (the PASS/SKIP/FAIL verdicts) is captured; stderr (the
# per-query progress heartbeat) streams through — a silent multi-hour
# DuckDB grind is indistinguishable from a hang without it
proc = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
     SF_DIR, OUT_DIR],
    stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
lines = proc.stdout.splitlines()

res = {}
for line in lines:
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

import duckdb
for q in EXCLUDED:
    d = os.path.join(stash, q)
    n = None
    if os.path.isdir(d):
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
    res[q] = {"rows_match": None, "schema_match": None, "hash_match": None,
              "spark_rows": n, "err": "oracle_infeasible"}

green = sum(1 for v in res.values() if v["hash_match"])
out = {"_meta": {
    "sf_dir": SF_DIR,
    "scope": ("dedup/ANN/embedding/text/corpus families re-verified vs "
              f"DuckDB at 10x the bench scale, round {RND}"),
    "checked": len(res) - len(EXCLUDED),
    "hash_green": green,
    "oracle_infeasible": len(EXCLUDED),
    "check_exit": proc.returncode,
}}
for q in sorted(res):
    out[q] = res[q]
json.dump(out, sys.stdout, indent=1)
print()
print(f"[make_sf1_artifact] checked={out['_meta']['checked']} "
      f"green={green} excluded={len(EXCLUDED)}", file=sys.stderr)
