#!/usr/bin/env python3
"""Driver-vs-twin per-query bench divergence table + the committed
budget gate.

Every round the judge flags queries whose driver-run time diverges from
the committed same-tree twin (ambient suite load vs real regressions),
and until round 12 the evidence table was assembled by hand. Three
mechanical modes:

1. Twin compare (the original mode):

       python3 tools/divergence.py <driver.json> <twin.json> [threshold]

   Prints a markdown table of all shared queries with ratio >=
   threshold (default 2.0), sorted descending, plus aggregate totals
   AND the in-run canary sums of both files (the host-speed control:
   a run whose canary sum is 1.5x the twin's is a slow host, not a
   regression). Exit 0 always (reporting).

2. Budget gate (the round-13 mechanization):

       python3 tools/divergence.py --gate <run.json> [budget.json] [tol]

   budget.json defaults to BENCH_budget.json next to this script's
   repo root; tol defaults to 2.0. Each run query's CANARY-NORMALIZED
   time (t / in-run canary sum — dimensionless, host-independent) is
   compared to the committed per-query budget (the best normalized
   reading across the recorded twins). Prints the weak set (normalized
   ratio >= tol) as a paste-ready markdown table, plus queries new
   since the budget (no gate — they get budgeted at the next
   --make-budget). EXIT 1 if the weak set is non-empty, so a round
   close sees regressions in-round.

3. Budget (re)generation:

       python3 tools/divergence.py --make-budget <out.json> <run1.json> ...

   For every query in any input run, records the MINIMUM canary-
   normalized reading across the runs (and the raw seconds + source
   file of that minimum, for human reading). Runs lacking any canary
   query are rejected — normalization would be undefined.

Canary queries are the ten pinned never-touched plan-class probes of
tools/canary.py; both tools must agree on the list.
"""
import json
import os
import sys

from canary import CANARIES


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no queries dict found")
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def canary_sum(queries, path):
    present = [q for q in CANARIES if q in queries]
    if len(present) < len(CANARIES):
        missing = sorted(set(CANARIES) - set(present))
        raise SystemExit(
            f"{path}: missing canary queries {missing} — cannot normalize")
    return sum(queries[q] for q in present)


def twin_compare(argv):
    driver = load(argv[0])
    twin = load(argv[1])
    threshold = float(argv[2]) if len(argv) > 2 else 2.0
    dc, tc = canary_sum(driver, argv[0]), canary_sum(twin, argv[1])
    shared = sorted(set(driver) & set(twin))
    rows = []
    for q in shared:
        d, t = driver[q], twin[q]
        ratio = d / t if t > 0 else float("inf")
        rows.append((ratio, q, d, t))
    rows.sort(reverse=True)
    dtot = sum(driver[q] for q in shared)
    ttot = sum(twin[q] for q in shared)
    print(f"shared queries: {len(shared)}; driver total {dtot:.1f} s, "
          f"twin total {ttot:.1f} s, aggregate ratio "
          f"{dtot / ttot:.2f}" if ttot else "twin total is zero")
    print(f"canary sums: driver {dc:.2f} s, twin {tc:.2f} s, host factor "
          f"{dc / tc:.2f}x — canary-normalized aggregate "
          f"{(dtot / dc) / (ttot / tc):.2f}x" if tc else "twin canary zero")
    flagged = [r for r in rows if r[0] >= threshold]
    print(f"\n{len(flagged)} queries at >= {threshold}x driver/twin:\n")
    print("| query | driver | twin | ratio | canary-normalized |")
    print("|---|---|---|---|---|")
    for ratio, q, d, t in flagged:
        norm = (d / dc) / (t / tc) if t > 0 and dc > 0 else float("inf")
        print(f"| {q} | {d:.2f} | {t:.2f} | {ratio:.1f}x | {norm:.1f}x |")
    only_d = sorted(set(driver) - set(twin))
    only_t = sorted(set(twin) - set(driver))
    if only_d:
        print(f"\nonly in driver run ({len(only_d)}): {', '.join(only_d)}")
    if only_t:
        print(f"\nonly in twin run ({len(only_t)}): {', '.join(only_t)}")
    return 0


def default_budget_path():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "BENCH_budget.json")


def gate(argv):
    run_path = argv[0]
    budget_path = argv[1] if len(argv) > 1 else default_budget_path()
    tol = float(argv[2]) if len(argv) > 2 else 2.0
    run = load(run_path)
    with open(budget_path) as f:
        budget = json.load(f)
    norm_budget = budget["normalized"]
    rc = canary_sum(run, run_path)
    print(f"run {run_path}: {len(run)} queries, canary sum {rc:.2f} s; "
          f"budget {os.path.basename(budget_path)}: "
          f"{len(norm_budget)} queries; tolerance {tol}x")
    weak, fresh = [], []
    for q, t in sorted(run.items()):
        norm = t / rc
        if q not in norm_budget:
            fresh.append((q, t, norm))
            continue
        b = norm_budget[q]
        ratio = norm / b if b > 0 else float("inf")
        if ratio >= tol:
            weak.append((ratio, q, t, norm, b))
    weak.sort(reverse=True)
    print(f"\n{len(weak)} queries over budget at >= {tol}x "
          f"(canary-normalized):\n")
    print("| query | run (s) | normalized | budget | ratio |")
    print("|---|---|---|---|---|")
    for ratio, q, t, norm, b in weak:
        print(f"| {q} | {t:.2f} | {norm:.4f} | {b:.4f} | {ratio:.1f}x |")
    if fresh:
        print(f"\n{len(fresh)} queries new since the budget (not gated): "
              + ", ".join(q for q, _, _ in fresh))
    missing = sorted(set(norm_budget) - set(run))
    if missing:
        print(f"\n{len(missing)} budgeted queries absent from the run: "
              + ", ".join(missing))
    if weak:
        print(f"\nGATE FAIL: {len(weak)} canary-normalized regressions "
              f">= {tol}x — solo-pin each (PLANS.md protocol) before "
              "accepting the run.")
        return 1
    print("\nGATE PASS: no canary-normalized regression at "
          f">= {tol}x the committed budget.")
    return 0


def make_budget(argv):
    out_path, run_paths = argv[0], argv[1:]
    if not run_paths:
        raise SystemExit("--make-budget needs at least one run file")
    best = {}
    for path in run_paths:
        run = load(path)
        rc = canary_sum(run, path)
        for q, t in run.items():
            norm = t / rc
            if q not in best or norm < best[q]["normalized"]:
                best[q] = {"normalized": round(norm, 6),
                           "seconds": round(t, 3),
                           "canary_sum": round(rc, 3),
                           "source": os.path.basename(path)}
    doc = {
        "comment": ("Per-query bench budgets: the best CANARY-NORMALIZED "
                    "reading (seconds / in-run canary sum) across the "
                    "recorded twin runs. Gate with: python3 "
                    "tools/divergence.py --gate BENCH_local.json"),
        "canaries": CANARIES,
        "sources": [os.path.basename(p) for p in run_paths],
        "normalized": {q: v["normalized"] for q, v in sorted(best.items())},
        "detail": {q: v for q, v in sorted(best.items())},
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}: {len(best)} queries from {len(run_paths)} runs")
    return 0


def main():
    args = sys.argv[1:]
    if not args:
        raise SystemExit(__doc__)
    if args[0] == "--gate":
        sys.exit(gate(args[1:]))
    if args[0] == "--make-budget":
        sys.exit(make_budget(args[1:]))
    if len(args) < 2:
        raise SystemExit(__doc__)
    sys.exit(twin_compare(args))


if __name__ == "__main__":
    main()
