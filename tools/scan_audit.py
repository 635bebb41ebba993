"""Audits how many times each registry query's executed plan scans its
source parquet files — the metric the exact_quantiles round-6 fix was
driven by (a composed plan that references a subtree many times can scan
a 100 TB fact table once per reference unless the intermediate is
materialized; exchange reuse alone does not collapse them all).

For every query: build at the given sf, execute, then count `Scan parquet`
leaves and `ReusedExchange` nodes in the FINAL adaptive plan. High scan
counts are not automatically bugs (multi-table joins legitimately scan
several tables; a self-join scans its table twice) — the audit flags
queries whose scan count exceeds a threshold so a human checks whether the
repeats hit the same big fact.

Counting caveat: the audit inspects the FINAL job's executed plan. A
lazily ``localCheckpoint``-ed subtree materializes in its own one-time job
whose scans are invisible here — by construction those run exactly ONCE,
which is the invariant being audited, so a low count after adding a
checkpoint is the fix working, not scans hiding.

Usage: python tools/scan_audit.py [sf_dir] [threshold] [query ...]
Prints one JSON line per flagged query, then a summary line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_spark.queries.registry import ALL_QUERIES
from lakehouse_architecture_spark.session import SessionFactory


def _indent(line: str) -> int:
    """Tree depth of a plan line = offset of the node name past the
    ':  +- '-style ASCII art."""
    i = 0
    while i < len(line) and line[i] in " :+-*(":
        i += 1
    return i


def live_scan_count(plan: str) -> int:
    """`Scan parquet` leaves that EXECUTE in this plan. An
    InMemoryRelation prints its full cached lineage (scans included), but
    at runtime those rows come from the cache — count only scans outside
    any InMemoryRelation subtree."""
    scans = 0
    skip_below: int | None = None
    for line in plan.splitlines():
        d = _indent(line)
        if skip_below is not None:
            if d > skip_below:
                continue
            skip_below = None
        if "InMemoryRelation" in line:
            skip_below = d
            continue
        if "Scan parquet" in line:
            scans += 1
    return scans


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    names = sys.argv[3:] or list(ALL_QUERIES)

    spark = SessionFactory(app_name="scan_audit").get_or_create()
    rows = []
    for name in names:
        spec = ALL_QUERIES[name]
        try:
            df = spec.build(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            rows.append({"query": name, "err": str(e).splitlines()[0][:120]})
            continue
        rows.append(
            {
                "query": name,
                "scans": live_scan_count(plan),
                "cached_lineage_scans": plan.count("Scan parquet")
                - live_scan_count(plan),
                "reused": plan.count("ReusedExchange"),
            }
        )
    flagged = [
        r for r in rows if r.get("scans", 0) >= threshold or r.get("err")
    ]
    for r in sorted(flagged, key=lambda r: -r.get("scans", 0)):
        print(json.dumps(r))
    ok = [r for r in rows if not r.get("err")]
    print(
        json.dumps(
            {
                "summary": True,
                "queries": len(rows),
                "flagged_at_threshold": len(flagged),
                "threshold": threshold,
                "max_scans": max((r["scans"] for r in ok), default=0),
                "mean_scans": round(
                    sum(r["scans"] for r in ok) / max(1, len(ok)), 2
                ),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
