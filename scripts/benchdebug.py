#!/usr/bin/env python3
"""Summarize a SPARK_GRAFT_DEBUG=1 bench log: per query, min wall
across reps, the task-time at that rep, CPU density (taskTotal/wall),
and GC — the round-15 profiling instrument for separating CPU-dense
queries (optimize per-task work) from latency-bound ones (optimize
job/stage/exchange count).

Usage: python3 scripts/benchdebug.py /tmp/bench.log [topN]
"""
import re
import sys

pat = re.compile(
    r"\[bench-debug\] (\S+) rep=(\d+) sec=([\d.]+) gcSec=([\d.]+) "
    r"gcN=(\d+) taskTotalSec=([\d.]+) taskMaxSec=([\d.]+)")


def main(path, topn=60):
    reps = {}
    for line in open(path, errors="replace"):
        m = pat.search(line)
        if m:
            q = m.group(1)
            reps.setdefault(q, []).append(
                (float(m.group(3)), float(m.group(4)),
                 float(m.group(6)), float(m.group(7))))
    rows = []
    for q, rs in reps.items():
        best = min(rs, key=lambda r: r[0])
        rows.append((q, best[0], best[2], best[2] / max(best[0], 1e-9),
                     best[1], best[3], max(r[0] for r in rs) - best[0]))
    rows.sort(key=lambda r: -r[1])
    tot = sum(r[1] for r in rows)
    print(f"n={len(rows)} total(min)={tot:.1f}s")
    print(f"{'query':36s} {'wall':>7s} {'taskTot':>8s} {'dens':>5s} "
          f"{'gc':>5s} {'tmax':>6s} {'sprd':>6s}")
    for q, w, tt, d, gc, tmax, spread in rows[:topn]:
        print(f"{q:36s} {w:7.3f} {tt:8.2f} {d:5.1f} {gc:5.2f} "
              f"{tmax:6.2f} {spread:6.2f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 60)
