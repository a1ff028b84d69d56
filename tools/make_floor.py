#!/usr/bin/env python3
"""Re-baseline BENCH_FLOOR.json from one or more warm Bench runs.

Usage: python3 tools/make_floor.py run1.json [run2.json ...] > BENCH_FLOOR.json

Each input is a graft.Bench file artifact (SPARK_GRAFT_BENCH_OUT).
The floor is the per-query MIN across the given runs — all captured
with the same warm protocol (untimed warmup sweep, min-of-reps,
convergent re-measure), on the same host class, at the same SF.
Fingerprints must AGREE across runs (same code, same data ⇒ same
physical plan); a disagreement aborts, because it means the inputs
are not comparable runs of one build. The newest run's loadavg is
recorded so the capture conditions travel with the floor.
Build-time tool only — NOT part of the Scala library.
"""
import json, sys


MAX_LOADAVG = 3.0  # floors are best-known CLEAN minimums — a
# contended capture (r16 driver sweep: loadavg 5.3, 29 remeasures)
# must never be folded in, or the floor itself inherits the noise


def main(paths):
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
    queries = {}
    for _, d in runs:
        for q, t in d["queries"].items():
            if t > 0 and (q not in queries or t < queries[q]):
                queries[q] = t
    fps = {}
    for p, d in runs:
        for q, fp in d.get("fingerprints", {}).items():
            if fp in ("err", "skip"):
                continue
            if q in fps and fps[q] != fp:
                raise SystemExit(
                    f"fingerprint mismatch for {q}: {fps[q]} vs {fp} ({p}) "
                    "— inputs are not runs of the same build")
            fps[q] = fp
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
