"""Steady-state timing probe — the reproducible source for the README's
per-query sampling-artifact claims.

Runs each query N times against the SAME warmed, cached tables bench.py
uses and reports min/median/max, separating plan cost (the min) from
sampling noise (the spread). Use when a bench number moves and you need
to know whether the PLAN changed or the box was noisy.

Usage: python tools/steady_probe.py [sf_dir] [n_runs] [query ...]

Reference run (sf0.1, local[32], 6 runs, round 3):
  q21_sole_late  samples [3.14, 1.14, 1.01, 0.99, 0.89, 0.87] — settles ~0.9-1.0 s
  q_minhash_lsh  samples [3.40, 2.41, 1.71, 1.62, 1.42, 1.34] — first run pays
  the whole-stage-codegen compile, then settles ~1.3-1.7 s
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_spark.queries.base import warm_cached_tables
from lakehouse_architecture_spark.queries.registry import ALL_QUERIES
from lakehouse_architecture_spark.session import SessionFactory

DEFAULT_QUERIES = ["q21_sole_late", "q_minhash_lsh", "q01_pricing_summary"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    names = sys.argv[3:] or DEFAULT_QUERIES

    spark = SessionFactory(app_name="steady_probe").get_or_create()
    # identical warm-cache setup to bench.py's timed section — one shared
    # implementation so the two can never drift
    warm_cached_tables(spark, sf_dir)

    for qname in names:
        spec = ALL_QUERIES[qname]
        samples = []
        for _ in range(n_runs):
            t0 = time.time()
            spec.build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "query": qname,
                    "n_runs": n_runs,
                    "min": min(samples),
                    "median": round(statistics.median(samples), 3),
                    "max": max(samples),
                    "samples": samples,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
