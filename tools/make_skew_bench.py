#!/usr/bin/env python3
"""Build BENCH_skew_r{N}.json — the hostile-corpus wall-clock summary
(VERDICT r15 #2/#4): both Bench modes on the zipfian sf0.1-shaped
corpus (gen_skew.py), plus the SkewPairs salted-vs-unsalted-vs-AQE
wall/peak-task cases on the same corpus and on the 20M-row zipfian
events table (gen_skew_events.py) where skew cost dominates fixed
overheads.

Usage:
    python3 tools/make_skew_bench.py <round> <count.json> <full.json> \
        <pairs.json> > BENCH_skew_r{N}.json
"""
import json
import sys

RND = int(sys.argv[1])
cnt = json.load(open(sys.argv[2]))
full = json.load(open(sys.argv[3]))
pairs = json.load(open(sys.argv[4]))


def mode(d):
    return {
        "n_queries": len(d["queries"]),
        "total_sec": round(d["value"], 1),
        "contaminated": d.get("contaminated"),
        "errors": d.get("errors", []),
        "fixed_floor_sec": round(d.get("fixed_floor_seconds", 0), 1),
    }


out = {
    "round": RND,
    "corpus": ("gen_skew.py zipfian sf0.1 shape: events.event_type "
               "[0.85,0.08,0.04,0.02,0.01], user_id zipf s~1.2, documents "
               "40% boilerplate preamble, embeddings 55% hot cluster"),
    "cpus": 32,
    "modes": {"count": mode(cnt), "full": mode(full)},
    "pairs_probe": {
        "method": pairs.get("method"),
        "cases": pairs["cases"],
    },
}
json.dump(out, sys.stdout, indent=1)
print()
