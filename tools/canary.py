#!/usr/bin/env python3
"""Pinned canary trend table.

Ten stable, never-touched queries spanning the engine's plan classes
(agg, star join, window, top-k, scalar battery, tf-idf text, pruned
scan, SCD2, iterative graph, sessionization). Their solo min-of-5 /
twin-record times move ONLY with the host, so the table converts "the
host was slower this round" from an assertion into a measurement and
protects the 2x divergence criterion.

Usage:
    python3 tools/canary.py BENCH_a.json BENCH_b.json ...

Each argument is a bench JSON (committed twin or a solo canary run);
prints one column per file, markdown. Labels are the file basenames;
pass paths extracted via `git show <commit>:BENCH_local.json > f.json`
for historical columns.
"""
import json
import sys

CANARIES = [
    "q9_agg",
    "q10_star_join",
    "q11_window_topk",
    "q19_topn",
    "q35_scalar_funcs",
    "q42_tfidf",
    "q55_partition_pruned",
    "q66_scd2",
    "q88_pagerank",
    "q90_user_growth",
]


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", d)


def main(paths):
    cols = [(p.split("/")[-1], load(p)) for p in paths]
    print("| canary | " + " | ".join(name for name, _ in cols) + " |")
    print("|---|" + "---|" * len(cols))
    tot = [0.0] * len(cols)
    n = [0] * len(cols)
    for q in CANARIES:
        cells = []
        for i, (_, qs) in enumerate(cols):
            v = qs.get(q)
            cells.append("%.2f" % v if v is not None else "-")
            if v is not None:
                tot[i] += v
                n[i] += 1
        print(f"| {q} | " + " | ".join(cells) + " |")
    # a sum over unlike subsets would skew the host-drift ratio the
    # table exists to measure — only print sums for complete columns
    print("| **sum** | " + " | ".join(
        "%.2f" % t if k == len(CANARIES) else f"({k}/{len(CANARIES)} only)"
        for t, k in zip(tot, n)) + " |")
    if any(k != len(CANARIES) for k in n):
        print("WARNING: columns with missing canaries are not summed "
              "(unlike subsets are not comparable)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
