#!/usr/bin/env python3
"""Re-baseline BENCH_FLOOR.json from one or more warm Bench runs.

Usage: python3 tools/make_floor.py [--changed q1,q2] run1.json [run2.json ...] > BENCH_FLOOR.json

Each input is a graft.Bench file artifact (SPARK_GRAFT_BENCH_OUT).
The floor is the per-query MIN across the given runs — all captured
with the same warm protocol (untimed warmup sweep, min-of-reps,
convergent re-measure), on the same host class, at the same SF.
Fingerprints must AGREE across runs (same code, same data ⇒ same
physical plan); a disagreement aborts, because it means the inputs
are not comparable runs of one build. The newest run's loadavg is
recorded so the capture conditions travel with the floor.

--changed (r19): queries whose physical plan was DELIBERATELY changed
this round. For those, the minimum folds ONLY from runs whose
fingerprint matches the newest run's (an old floor captured on the
superseded plan must not hold a floor the new plan never achieved,
and vice versa); any other disagreement still aborts.
Build-time tool only — NOT part of the Scala library.
"""
import json, sys


MAX_LOADAVG = 3.0  # floors are best-known CLEAN minimums — a
# contended capture (r16 driver sweep: loadavg 5.3, 29 remeasures)
# must never be folded in, or the floor itself inherits the noise


def main(paths):
    changed = set()
    if paths and paths[0].startswith("--changed"):
        if paths[0] == "--changed":
            changed = set(paths[1].split(",")); paths = paths[2:]
        else:
            changed = set(paths[0].split("=", 1)[1].split(","))
            paths = paths[1:]
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p, json.loads(f.read().strip())))
    for p, d in runs:
        # a prior FLOOR file is per-query minima, not a sweep — its
        # recorded loadavg is the capture condition of the newest
        # input at the last fold, not this input's own cleanliness
        if d.get("metric") == "floor":
            continue
        # gate on the PRE-SWEEP loadavg when recorded: the publish-
        # time reading includes the sweep's own fingerprint-pass tail
        # (q_ktruss_dist alone pushes it past 3 on an idle box)
        la = d.get("loadavg_start", d.get("loadavg"))
        if la is not None and la > MAX_LOADAVG:
            raise SystemExit(
                f"{p}: captured at loadavg {la} > {MAX_LOADAVG} — "
                "not a clean sweep; re-run on a quiet host before "
                "folding it into the floor")
    # newest run's fingerprint per query — the plan the floor describes
    final_fp = {}
    for _, d in runs:
        for q, fp in d.get("fingerprints", {}).items():
            if fp not in ("err", "skip"):
                final_fp[q] = fp
    queries = {}
    for _, d in runs:
        run_fp = d.get("fingerprints", {})
        for q, t in d["queries"].items():
            if q in changed and run_fp.get(q) != final_fp.get(q):
                continue  # superseded-plan reading; not this plan's floor
            if t > 0 and (q not in queries or t < queries[q]):
                queries[q] = t
    fps = {}
    for p, d in runs:
        for q, fp in d.get("fingerprints", {}).items():
            if fp in ("err", "skip") or q in changed:
                continue
            if q in fps and fps[q] != fp:
                raise SystemExit(
                    f"fingerprint mismatch for {q}: {fps[q]} vs {fp} ({p}) "
                    "— inputs are not runs of the same build")
            fps[q] = fp
    for q in changed:
        if q in final_fp:
            fps[q] = final_fp[q]
    out = {
        "metric": "floor",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": runs[-1][1].get("sf"),
        "loadavg": runs[-1][1].get("loadavg"),
        "runs": len(runs),
        "queries": {q: queries[q] for q in sorted(queries)},
        "fingerprints": {q: fps[q] for q in sorted(fps)},
    }
    json.dump(out, sys.stdout, separators=(",", ":"))
    sys.stdout.write("\n")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    main(sys.argv[1:])
