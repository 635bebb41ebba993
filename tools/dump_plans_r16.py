"""Dump full `.explain("formatted")` output for named queries into
plans/r16/<query>_<tag>.txt — the before/after evidence files for the
round-15 optimization pass.

Usage: python tools/dump_plans_r16.py <before|after> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_spark.plans.inspect import formatted_plan
from lakehouse_architecture_spark.queries.registry import ALL_QUERIES
from lakehouse_architecture_spark.session import SessionFactory


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = SessionFactory(app_name="dump_plans_r16").get_or_create()
    for name in names:
        df = ALL_QUERIES[name].build(spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
