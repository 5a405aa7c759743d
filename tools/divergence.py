#!/usr/bin/env python3
"""Driver-vs-twin per-query bench divergence table.

Every round the judge flags queries whose driver-run time diverges from
the committed same-tree twin (ambient suite load vs real regressions),
and until now the evidence table was assembled by hand. This makes it
mechanical:

    python3 tools/divergence.py <driver.json> <twin.json> [threshold]

where each JSON is a graft.Bench artifact (the {"queries": {...}} file —
BENCH_local.json as written by a run, or extracted from history with
`git show <commit>:BENCH_local.json > /tmp/twin.json`). Prints a
markdown table of all shared queries with ratio >= threshold (default
2.0), sorted by ratio descending, plus aggregate totals — paste-ready
for PLANS.md. Queries only in one run are listed separately.

Exit code 0 always (reporting, not gating).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no queries dict found")
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    driver = load(sys.argv[1])
    twin = load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
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
    flagged = [r for r in rows if r[0] >= threshold]
    print(f"\n{len(flagged)} queries at >= {threshold}x driver/twin:\n")
    print("| query | driver | twin | ratio |")
    print("|---|---|---|---|")
    for ratio, q, d, t in flagged:
        print(f"| {q} | {d:.2f} | {t:.2f} | {ratio:.1f}x |")
    only_d = sorted(set(driver) - set(twin))
    only_t = sorted(set(twin) - set(driver))
    if only_d:
        print(f"\nonly in driver run ({len(only_d)}): {', '.join(only_d)}")
    if only_t:
        print(f"\nonly in twin run ({len(only_t)}): {', '.join(only_t)}")


if __name__ == "__main__":
    main()
