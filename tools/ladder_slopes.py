#!/usr/bin/env python3
"""Emit the docs-ladder slope table (VERDICT r18 #3) as markdown.

Joins the sf0.1 count anchor with the per-key docs rungs (sf3, sf10)
and prints per-key seconds plus the sf3->sf10 step ratio — the rung
step is 10/3 = 3.33x data, so a linear key lands near 3.3x and the
written fence is 3.5x; capped keys print their cap as ">=CAPs".
Keys missing from a rung (capped/errored/contaminated) are labeled,
never silently dropped.

Usage: python3 tools/ladder_slopes.py <sf01_bench.json> <sf3_perkey.json> <sf10_perkey.json>
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    qs = dict(d.get("queries", {}))
    caps = dict(d.get("timeouts", {}))
    bad = set(d.get("errors", [])) | set(d.get("contaminated_keys", []))
    return qs, caps, bad


sf01, _, _ = load(sys.argv[1])
sf3, caps3, bad3 = load(sys.argv[2])
sf10, caps10, bad10 = load(sys.argv[3])


def cell(key, qs, caps, bad):
    if key in qs:
        return f"{qs[key]:.1f}"
    if key in caps:
        return f">={caps[key]:.0f} (cap)"
    if key in bad:
        return "errored/contam."
    return "-"


keys = sorted(set(sf3) | set(caps3) | set(sf10) | set(caps10) | bad3 | bad10)
print("| key | sf0.1 | sf3 (30x docs) | sf10 (100x docs) | sf3->sf10 (3.33x data) |")
print("|---|---|---|---|---|")
for k in keys:
    if k in sf3 and k in sf10:
        step = f"{sf10[k] / sf3[k]:.1f}x" if sf3[k] > 0.05 else "tiny denom"
    elif k in sf3 and k in caps10:
        step = f">={caps10[k] / sf3[k]:.1f}x (capped)"
    else:
        step = "n/a"
    print(f"| `{k}` | {cell(k, sf01, {}, set())} | {cell(k, sf3, caps3, bad3)}"
          f" | {cell(k, sf10, caps10, bad10)} | {step} |")

lin3, lin10 = [sum(v for k, v in qs.items() if k in sf3 and k in sf10)
               for qs in (sf3, sf10)]
print(f"\nuncapped-common totals: sf3 {lin3:.1f} s, sf10 {lin10:.1f} s "
      f"({lin10 / lin3:.2f}x for a 3.33x rung step)")
