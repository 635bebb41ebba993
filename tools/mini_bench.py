"""Focused re-measurement of a query subset with the bench methodology
(warm cached tables + settling sweep + best-of-2 noop sink) — the
per-change before/after probe for the optimization rounds, so a full
35-query bench is not needed to evaluate one operator edit.

Usage: python tools/mini_bench.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    from lakehouse_architecture_spark.materialize import release_small_pins
except ImportError:  # pre-round-15 tree (A/B runs via git stash)
    def release_small_pins(spark) -> int:  # type: ignore[misc]
        return 0


from lakehouse_architecture_spark.queries.base import warm_cached_tables
from lakehouse_architecture_spark.queries.registry import ALL_QUERIES
from lakehouse_architecture_spark.session import SessionFactory


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = SessionFactory(app_name="mini_bench").get_or_create()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_cached_tables(spark, sf_dir)
    for name in names:  # settling: compile codegen, warm pins' shape
        ALL_QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_small_pins(spark)
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            ALL_QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        release_small_pins(spark)
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
