#!/usr/bin/env python3
"""Large zipfian events table for the skew WALL bench (VERDICT r15 #2/#4).

gen_skew.py's corpus is sf0.1-shaped (100k events): correct for grading
the registry on hostile distributions, but too small for wall-clock
evidence — every strategy lands sub-second and fixed overheads (extra
shuffle stages, replica explodes) dominate the thing being measured.
This generates ONLY a big events.parquet with the same schema and the
same hostile event_type mix [0.85, 0.08, 0.04, 0.02, 0.01], at a row
count where the hot key's single-reducer timeline is seconds, so
salted-vs-unsalted and AQE-vs-manual comparisons measure skew, not
startup. user_id keeps the zipfian shape (s~1.2) for per-user windows.

Deterministic (seed 7). Usage:
    python3 tools/gen_skew_events.py <outDir> [nRows=20000000]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
SEED = 7

TYPES = np.array(["view", "click", "purchase", "signup", "error"])
TYPE_P = [0.85, 0.08, 0.04, 0.02, 0.01]

rng = np.random.default_rng(SEED)

import os
os.makedirs(OUT, exist_ok=True)

event_id = np.arange(N, dtype=np.int64)
# 30 days of microsecond timestamps, uniform
t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
ts = t0 + rng.integers(0, 30 * 86_400_000_000, N, dtype=np.int64)
# zipfian users: rank r gets weight 1/r^1.2 over 50k users
n_users = 50_000
w = 1.0 / np.power(np.arange(1, n_users + 1), 1.2)
user_id = rng.choice(n_users, N, p=w / w.sum()).astype(np.int64)
etype = TYPES[rng.choice(5, N, p=TYPE_P)]
value = np.round(rng.uniform(0, 100, N), 3)
hot_share = float((etype == "view").mean())

tbl = pa.table({
    "event_id": pa.array(event_id),
    "ts": pa.array(ts, type=pa.timestamp("us")),
    "user_id": pa.array(user_id),
    "event_type": pa.array(etype),
    "value": pa.array(value),
    "props": pa.array(np.where(value > 50, '{"src":"web"}', '{"src":"app"}')),
})
pq.write_table(tbl, f"{OUT}/events.parquet", row_group_size=1_000_000)
print(f"events: {N} rows at {OUT}, hot key owns {hot_share:.1%}")
