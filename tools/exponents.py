#!/usr/bin/env python3
"""Fit per-query scaling exponents from two or more bench JSON files.

Each input is a `graft.Bench` output (one JSON object with a "queries"
map) paired with its scale factor K. For every query present in all
files, prints the step ratios and the log-log slope between consecutive
scale points plus the least-squares slope over all points:

  python3 tools/exponents.py 5:/tmp/b5.json 10:/tmp/b10.json 20:/tmp/b20.json

The slope is d(log t)/d(log K) — x in t ∝ data^x. Times below FLOOR_SEC
(default 0.25 s) are noise-dominated (JVM/session fixed cost) and the
pairwise column is marked '~' for that step.
"""
import json
import math
import sys

FLOOR_SEC = 0.25

points = []
for a in sys.argv[1:]:
    k, path = a.split(":", 1)
    with open(path) as f:
        points.append((float(k), json.load(f)["queries"]))
points.sort(key=lambda p: p[0])
ks = [p[0] for p in points]
common = set(points[0][1])
for _, q in points[1:]:
    common &= set(q)

print(f"{'query':<28} " + " ".join(f"{k:>7g}x" for k in ks) +
      "  pairwise-x   lsq-x")
for name in sorted(common):
    ts = [p[1][name] for p in points]
    pair = []
    for i in range(1, len(ts)):
        if min(ts[i - 1], ts[i]) < FLOOR_SEC:
            pair.append("   ~")
        else:
            x = math.log(ts[i] / ts[i - 1]) / math.log(ks[i] / ks[i - 1])
            pair.append(f"{x:+.2f}")
    # lsq over the SAME points the pairwise column trusts: sub-FLOOR
    # times are JVM/session fixed cost, and log() of a 0.0 reading
    # raises — drop both from the fit (r8 ADVICE)
    fit = [(k, t) for k, t in zip(ks, ts) if t >= FLOOR_SEC]
    if len(fit) < 2:
        slope_s = "    ~"
    else:
        lx = [math.log(k) for k, _ in fit]
        ly = [math.log(t) for _, t in fit]
        n = len(fit)
        mx, my = sum(lx) / n, sum(ly) / n
        den = sum((x - mx) ** 2 for x in lx)
        slope = (sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / den
                 if den else 0.0)
        slope_s = f"{slope:+.2f}"
    print(f"{name:<28} " + " ".join(f"{t:>8.2f}" for t in ts) +
          f"  {','.join(pair):>10}  {slope_s}")
