#!/usr/bin/env python3
"""Fold per-query MINIMUMS across bench runs (the CLAUDE.md
judge-the-min discipline: host CPU steal comes in waves, so mins across
many runs converge where no single run is clean).

Usage: python3 scripts/foldbench.py <out.json> <run1.json> [run2.json ...]

Each run file holds Bench's one-line JSON record. The output carries
per-query mins, their total, and the core total (forced-regime queries
excluded, matching Bench's own core_value rule).
"""
import json
import sys


def main(out_path, run_paths):
    mins, forced, sf = {}, set(), None
    for p in run_paths:
        # Bench may emit its record line more than once (stdout tail +
        # final compact line) — take the first JSON line
        with open(p) as f:
            run = json.loads(f.readline())
        sf = run.get("sf", sf)
        forced.update(run.get("forced_regime", []))
        for q, sec in run["queries"].items():
            if isinstance(sec, (int, float)):
                mins[q] = min(mins.get(q, float("inf")), sec)
    total = round(sum(mins.values()), 2)
    core = round(sum(v for q, v in mins.items() if q not in forced), 2)
    rec = {
        "metric": "per-query mins across round-14 runs",
        "runs": len(run_paths),
        "n": len(mins),
        "sf": sf,
        "total": total,
        "core_total": core,
        "forced_regime": sorted(forced),
        "queries": {q: mins[q] for q in sorted(mins)},
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"folded {len(run_paths)} runs -> {out_path}: "
          f"n={len(mins)} total={total} core={core}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
