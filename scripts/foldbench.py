#!/usr/bin/env python3
"""Fold per-query MINIMUMS across bench runs (the CLAUDE.md
judge-the-min discipline: host CPU steal comes in waves, so mins across
many runs converge where no single run is clean).

Usage: python3 scripts/foldbench.py <out.json> <run1.json> [run2.json ...]

Each run file holds Bench's one-line JSON record, OR a prior mins file
(re-serialized to one line) whose evidence base carries forward: its
"runs" count is summed instead of counting the file as one run
(ADVICE r14 — the old len(inputs) under-reported a folded prior record's
eleven runs as one). The output carries per-query mins, their total, and
the core total (forced-regime queries excluded, matching Bench's own
core_value rule).
"""
import json
import sys


def main(out_path, run_paths):
    mins, forced, sf, runs = {}, set(), None, 0
    for p in run_paths:
        # Accept both shapes: a whole-file JSON document (a prior mins
        # file, even a pretty-printed one) or a multi-line capture where
        # only the first line is the record (Bench stdout saved with the
        # trailing compact line) — whole-file parse first, first-line
        # fallback (ADVICE r15: the old readline()-only reader crashed
        # on this script's own indent=1 output).
        with open(p) as f:
            text = f.read()
        try:
            run = json.loads(text)
        except json.JSONDecodeError:
            run = json.loads(text.splitlines()[0])
        sf = run.get("sf", sf)
        forced.update(run.get("forced_regime", []))
        # a prior mins file declares its own runs count; a raw bench
        # record counts as one run
        runs += run.get("runs", 1) if "total" in run else 1
        for q, sec in run["queries"].items():
            if isinstance(sec, (int, float)):
                mins[q] = min(mins.get(q, float("inf")), sec)
    total = round(sum(mins.values()), 2)
    core = round(sum(v for q, v in mins.items() if q not in forced), 2)
    rec = {
        "metric": "per-query mins across bench runs",
        "runs": runs,
        "n": len(mins),
        "sf": sf,
        "total": total,
        "core_total": core,
        "forced_regime": sorted(forced),
        "queries": {q: mins[q] for q in sorted(mins)},
    }
    # one line, like Bench's own record — every consumer (including this
    # script's first-line fallback) can readline() it
    with open(out_path, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(f"folded {runs} runs ({len(run_paths)} inputs) -> {out_path}: "
          f"n={len(mins)} total={total} core={core}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
