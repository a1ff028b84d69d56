#!/usr/bin/env python3
"""Per-query bench regression check.
Usage: python3 tools/bench_delta.py <current_bench.json> [floor_bench.json] [prev_bench.json]

Compares the current bench run against the committed floor
(BENCH_FLOOR.json by default: the best known per-query warm minimums).
A query is flagged as a REGRESSION only when BOTH hold:
  - it is >1.5x its floor AND more than 0.3 s over it (sub-second
    queries flap at 1.5-1.8x of floor on pure window variance, so a
    regression must also cost real wall-clock), and
  - it is ALSO >1.25x and >0.2 s over a reference run of the same code:
    the third arg if given, else BENCH_PREV.json (the most recent
    builder-verified full-sweep artifact — refresh it whenever a full
    bench of committed code completes), else the newest BENCH_r*.json.
    Floors are best-EVER times, often captured in a lighter-context
    window; iterative queries read 1.4-2.1 s run-to-run with identical
    plans (PlanAuditSpec locks the plans), so a query that reads the
    same as the reference run has not regressed, whatever the floor
    says. A query ABSENT from the reference run (e.g. newly added this
    round) is judged on the floor test alone — its floor was set from
    its own recent runs, so exceeding it by 1.5x+0.3s is a real signal.
Exit 1 if any regression survives the applicable tests.

Warm-min protocol: graft.Bench reports the MIN of SPARK_GRAFT_BENCH_REPS
(default 2) back-to-back reps per query, so both sides of this
comparison are warm (plan-cost) numbers. Floors folded into
BENCH_FLOOR.json must likewise be warm minimums (graft.tools.QBench
with QBENCH_REPS>=2, or a prior warm-min Bench run).
Build-time tool only — NOT part of the Scala library.
"""
import json, re, sys

THRESH = 1.5
MIN_DELTA = 0.3
PREV_THRESH = 1.25
PREV_MIN_DELTA = 0.2
# Loadavg discipline (round 17): the r16 driver sweep ran at loadavg
# 5.3 on 32 cpus and published a spurious 1.26x with 29 remeasures —
# the judge had to adjudicate noise by hand. A sweep captured above
# this 1-min loadavg carries no regression authority: the gate verdict
# is WITHHELD (exit 3) instead of flagging phantom regressions, and
# the caller re-runs on a quiet host.
MAX_LOADAVG = 3.0

def load_queries(p):
    with open(p) as f:
        d = json.loads(f.read().strip())
    if "queries" in d:
        return d["queries"]
    # driver round artifacts hold a bounded stdout tail — recover the
    # per-query pairs from the fragment
    if "tail" in d:
        return {k: float(v)
                for k, v in re.findall(r'"(q[\w]*)":([0-9.]+)', d["tail"])}
    raise KeyError(f"{p}: no 'queries' or 'tail'")

def load_fingerprints(p):
    """Per-query physical-plan fingerprints (round 14: Bench writes
    them into the file artifact). Empty dict when the artifact
    predates them."""
    try:
        with open(p) as f:
            return json.loads(f.read().strip()).get("fingerprints", {})
    except Exception:
        return {}

def discover_prev():
    import glob, os
    if os.path.exists("BENCH_PREV.json"):
        return "BENCH_PREV.json"
    rounds = sorted(glob.glob("BENCH_r*.json"))
    return rounds[-1] if rounds else None

def main(cur_path, floor_path="BENCH_FLOOR.json", prev_path=None):
    cur = load_queries(cur_path)
    floor = load_queries(floor_path)
    cur_fp = load_fingerprints(cur_path)
    floor_fp = load_fingerprints(floor_path)
    if prev_path is None:
        prev_path = discover_prev()
    prev = load_queries(prev_path) if prev_path else None
    if prev_path:
        print(f"[reference run: {prev_path}]")
    # Structural check first: a changed physical-plan fingerprint is
    # direct evidence the operator tree moved — no wall-time inference
    # needed. Plan-changed + slower-than-floor = hard regression (the
    # prev-run noise test does NOT rescue it); plan-changed + at-or-
    # under floor = an intentional plan improvement, printed for the
    # record.
    plan_changed = {q for q in cur_fp
                    if q in floor_fp and cur_fp[q] != floor_fp[q]
                    and cur_fp[q] not in ("err", "skip")
                    and floor_fp[q] not in ("err", "skip")}
    for q in sorted(plan_changed):
        t, f = cur.get(q), floor.get(q)
        verdict = ""
        if t and f and t > f * THRESH and (t - f) > MIN_DELTA:
            verdict = "  <-- slower AND structurally different"
        print(f"{q:32s} PLAN CHANGED {floor_fp[q]} -> {cur_fp[q]}{verdict}")
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
            p = prev.get(q) if prev else None
            if q in plan_changed:
                flag = "  <-- REGRESSION (plan changed)"
                bad += 1
            elif p is not None and p > 0 and not (
                    t / p > PREV_THRESH and (t - p) > PREV_MIN_DELTA):
                flag = f"  (floor-only; ={t/p:.2f}x of prev {p:.2f}s — not flagged)"
            else:
                flag = "  <-- REGRESSION"
                bad += 1
        if ratio > THRESH or ratio < 1 / THRESH:
            print(f"{q:32s} {t:8.2f}s vs floor {f:8.2f}s  ({ratio:4.2f}x){flag}")
    tot_c = sum(t for _, _, t, _ in rows)
    tot_f = sum(f for _, _, _, f in rows)
    # "err" fingerprints mean planning THREW for that query — a mass
    # planning failure would otherwise silently disable the structural
    # gate (every err query drops out of plan_changed), so the count is
    # part of the gate output.
    errs = sorted(q for q, fp in cur_fp.items() if fp in ("err", "skip"))
    if errs:
        print(f"WARNING: {len(errs)} query plan fingerprint(s) errored "
              f"(structural gate blind there): {', '.join(errs[:10])}"
              + (" ..." if len(errs) > 10 else ""))
    print(f"\ntotal {tot_c:.1f}s vs floor {tot_f:.1f}s ({tot_c/tot_f:.2f}x); "
          f"{bad} regression(s) > {THRESH}x; "
          f"{len(plan_changed)} plan fingerprint change(s); "
          f"{len(errs)} fingerprint error(s)")
    # A wall-time regression verdict from a contended sweep is noise
    # dressed as signal — withhold it. Plan-fingerprint changes are
    # load-independent and stand regardless.
    # gate on the PRE-SWEEP loadavg when recorded (the publish-time
    # reading includes the sweep's own fingerprint-pass tail)
    try:
        with open(cur_path) as f:
            d = json.loads(f.read().strip())
            la = d.get("loadavg_start", d.get("loadavg"))
    except Exception:
        la = None
    if bad and la is not None and la > MAX_LOADAVG:
        print(f"NOISY SWEEP: loadavg {la:.2f} > {MAX_LOADAVG} — wall-time "
              f"regression verdict WITHHELD; re-run on a quiet host "
              f"(plan-change findings above remain valid)")
        return 3
    return 1 if bad else 0

if __name__ == "__main__":
    if not 2 <= len(sys.argv) <= 4:
        print("usage: bench_delta.py <current_bench.json> "
              "[floor_bench.json] [prev_bench.json]", file=sys.stderr)
        sys.exit(2)
    sys.exit(main(*sys.argv[1:]))
