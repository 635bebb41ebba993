"""Reproducible bench-band measurement — the tool behind the README's
single-shot variance claims and the round-7 drift adjudication.

Runs ``bench.py`` N times in fresh processes (the external driver's own
methodology: one cold process, one JSON line) and prints a summary with
the three numbers that matter:

- the single-shot WARM/COLD total ranges (what a driver sample can read
  on this box on identical code),
- the sum of per-query MINIMUMS across runs (the plan floor — the only
  number comparable across rounds), and
- per-query min/median/max for anything that needs triage.

Usage:
  python tools/bench_band.py [n_runs]            # run + summarize
  python tools/bench_band.py --summarize F.jsonl # summarize an existing
                                                 # file of bench JSON lines

A per-query regression is REAL only when its minimum here moves; the
single-shot totals on this shared VM span 12.4-18.1 s warm / 24-54 s cold
on identical code (8-run adjudication at the round-6 commit, 2026-08-15).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def summarize(runs: list[dict]) -> dict:
    warm = [r["value"] for r in runs]
    cold = [r.get("cold_scan_total") for r in runs]
    cold = [c for c in cold if c is not None]
    qnames = list(runs[0]["queries"])
    per_q = {
        q: sorted(r["queries"][q] for r in runs if q in r["queries"])
        for q in qnames
    }
    out = {
        "n_runs": len(runs),
        "warm_totals": sorted(warm),
        "cold_totals": sorted(cold),
        "warm_min_sum": round(sum(v[0] for v in per_q.values()), 3),
        "per_query": {
            q: {
                "min": v[0],
                "median": round(statistics.median(v), 3),
                "max": v[-1],
            }
            for q, v in per_q.items()
        },
    }
    if cold and all("cold_queries" in r for r in runs):
        out["cold_min_sum"] = round(
            sum(
                min(r["cold_queries"][q] for r in runs)
                for q in runs[0]["cold_queries"]
            ),
            3,
        )
    return out


def main() -> int:
    argv = sys.argv[1:]
    runs: list[dict] = []
    if argv and argv[0] == "--summarize":
        with open(argv[1]) as f:
            runs = [json.loads(line) for line in f if line.strip()]
    else:
        n = int(argv[0]) if argv else 5
        for i in range(n):
            print(f"run {i + 1}/{n} ...", file=sys.stderr)
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True,
                text=True,
                cwd=REPO,
                check=False,
            )
            line = proc.stdout.strip().splitlines()[-1]
            runs.append(json.loads(line))
            print(line)
    s = summarize(runs)
    print(json.dumps(s, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
