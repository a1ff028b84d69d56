#!/usr/bin/env python3
"""Per-query bench regression check.
Usage: python3 tools/bench_delta.py <current_bench.json> [floor_bench.json]

Compares the current bench run against the committed floor
(BENCH_FLOOR.json by default: the best known per-query times). Flags
any query slower than 1.5x its floor, and prints the deltas sorted by
regression ratio. Exit 1 if any regression exceeds the threshold.

Warm-min protocol: graft.Bench reports the MIN of SPARK_GRAFT_BENCH_REPS
(default 2) back-to-back reps per query, so both sides of this
comparison are warm (plan-cost) numbers — a flag here is a real plan
regression, not cold-JIT noise from a single-shot alphabetical sweep.
Floors folded into BENCH_FLOOR.json must likewise be warm minimums
(graft.tools.QBench with QBENCH_REPS>=2, or a prior warm-min Bench run).
Build-time tool only — NOT part of the Scala library.
"""
import json, sys

THRESH = 1.5
MIN_DELTA = 0.3  # absolute seconds over floor — sub-second queries flap
                 # at 1.5-1.8x of floor on pure window variance, so a
                 # regression must ALSO cost real wall-clock to flag

def load(p):
    with open(p) as f:
        return json.loads(f.read().strip())

def main(cur_path, floor_path="BENCH_FLOOR.json"):
    cur = load(cur_path)["queries"]
    floor = load(floor_path)["queries"]
    rows = []
    for q, t in sorted(cur.items()):
        f = floor.get(q)
        if f is None or f <= 0 or t <= 0:
            continue
        rows.append((t / f, q, t, f))
    rows.sort(reverse=True)
    bad = 0
    for ratio, q, t, f in rows:
        flag = ""
        if ratio > THRESH and (t - f) > MIN_DELTA:
            flag = "  <-- REGRESSION"
            bad += 1
        if ratio > THRESH or ratio < 1 / THRESH:
            print(f"{q:32s} {t:8.2f}s vs floor {f:8.2f}s  ({ratio:4.2f}x){flag}")
    tot_c = sum(t for _, _, t, _ in rows)
    tot_f = sum(f for _, _, _, f in rows)
    print(f"\ntotal {tot_c:.1f}s vs floor {tot_f:.1f}s ({tot_c/tot_f:.2f}x); "
          f"{bad} regression(s) > {THRESH}x")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
