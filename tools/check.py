#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads each parquet result written by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same corpus tables,
and compares: row count, schema (column names sorted), and exact values
(rows sorted, columns sorted by name). Reports per-query PASS/FAIL with
first differing cell.
"""
import json, os, sys
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# Memory-capped + spill-enabled oracle (VERDICT r18 #7): the sf1 grade
# runs heavy oracles (all-pairs dedup CTEs) in TWO concurrent DuckDB
# processes; uncapped, each assumes it owns ~80% of RAM and the pair
# OOMs — r18's dedup_multi_signal_recall_tune died exactly that way and
# needed a manual re-run. A per-process cap sized for two cohabiting
# checkers plus a temp directory turns would-be OOMs into spills, so a
# clean large-sf grade needs no hand-holding. Both are env-overridable
# for a single-process run on a bigger box.
MEM = os.environ.get("GRAFT_DUCKDB_MEM", "40GB")
SPILL = os.environ.get("GRAFT_DUCKDB_SPILL", "/tmp/duckdb_spill")
os.makedirs(SPILL, exist_ok=True)
con.sql(f"SET memory_limit='{MEM}'")
con.sql(f"SET temp_directory='{SPILL}'")
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

with open(f"{OUT_DIR}/oracle_sql.json") as f:
    oracles = json.load(f)

def norm(v):
    if isinstance(v, float):
        return v  # exact compare; parity helpers make engines bit-identical
    return v

passed, failed, skipped = [], [], []
import sys as _sys, time as _time
for name in sorted(os.listdir(OUT_DIR)):
    d = os.path.join(OUT_DIR, name)
    # underscore-prefixed dirs are tooling state (the _excluded stash),
    # not query results
    if not os.path.isdir(d) or name.startswith("_"):
        continue
    # progress to stderr (stdout keeps the machine-readable verdicts):
    # heavyweight oracles at large sf run for minutes — a silent check
    # is indistinguishable from a hung one
    print(f"[check] {name} @ {_time.strftime('%H:%M:%S')}",
          file=_sys.stderr, flush=True)
    try:
        got_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got_types = dict(zip(got_rel.columns, [str(t) for t in got_rel.types]))
        got = got_rel.df()
    except Exception as e:
        failed.append((name, f"result unreadable: {e}"))
        continue
    if name not in oracles:
        skipped.append((name, f"no oracle ({len(got)} rows)"))
        continue
    try:
        exp_rel = con.sql(oracles[name])
        exp_types = dict(zip(exp_rel.columns, [str(t) for t in exp_rel.types]))
        exp = exp_rel.df()
    except Exception as e:
        failed.append((name, f"oracle SQL error: {str(e).splitlines()[0]}"))
        continue
    if sorted(got.columns) != sorted(exp.columns):
        failed.append((name, f"schema: got {sorted(got.columns)} want {sorted(exp.columns)}"))
        continue
    # Type-strict: the driver hashes DuckDB-typed values, so a column
    # whose oracle type differs from the Spark result type (e.g. window
    # SUM(BIGINT) -> HUGEINT) hash-mismatches even when values print the
    # same. pandas coerces both to the same dtype, so value compare
    # alone cannot catch it — compare DuckDB types explicitly.
    type_diff = [f"col {c}: got {got_types[c]} want {exp_types[c]}"
                 for c in sorted(got.columns) if got_types[c] != exp_types[c]]
    if type_diff:
        failed.append((name, "types: " + "; ".join(type_diff)))
        continue
    if len(got) != len(exp):
        failed.append((name, f"rows: got {len(got)} want {len(exp)}"))
        continue
    g = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    e = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    diff = None
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a != b and not (a is None and b is None) and str(a) != str(b):
                if isinstance(a, float) and isinstance(b, float) and a != a and b != b:
                    continue  # both NaN
                diff = f"col {c} row {i}: got {a!r} want {b!r}"
                break
        if diff:
            break
    if diff:
        failed.append((name, diff))
    else:
        passed.append(name)

print(f"PASS {len(passed)}: {' '.join(passed)}")
for n, msg in skipped:
    print(f"SKIP {n}: {msg}")
for n, msg in failed:
    print(f"FAIL {n}: {msg}")
sys.exit(1 if failed else 0)
