"""Bootstrap scaling A/B (VERDICT r11 #5): row-level vs grouped Poisson
bootstrap under corpus amplification, on both grouping regimes.

The claim to verify is precise: ``poisson_bootstrap_grouped`` does
B×|groups| bootstrap work after one corpus-sized hash-agg, so its scaling
under N× data depends entirely on what |groups| does — grouping by a key
that grows with the corpus (l_orderkey) stays ~linear like the row-level
form, while grouping by a FIXED-cardinality analysis key (here
l_partkey % 64 — 64 analysis cells) leaves the bootstrap stage flat and
only the single collapse aggregate grows. This probe measures all three
variants at base and amplified scale (facts replicated with shifted
order keys, the tools/scale_probe.py convention).

Usage: python tools/bootstrap_probe.py [factor] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.profiling import (
    poisson_bootstrap_grouped,
    poisson_bootstrap_mean,
)
from lakehouse_architecture_spark.session import SessionFactory

B, LO, HI = 100, 3, 98


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = SessionFactory(app_name="bootstrap_probe").get_or_create()
    base = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") <= "1995-03-31")
    )
    shift = base.agg(F.max("l_orderkey")).collect()[0][0] + 1
    amplified = base
    for i in range(1, factor):
        amplified = amplified.unionByName(
            base.withColumn("l_orderkey", F.col("l_orderkey") + i * shift)
        )
    amplified = amplified.localCheckpoint()  # isolate the bootstrap cost

    def variants(df):
        rid = F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber"))
        return {
            "row_level": lambda: poisson_bootstrap_mean(
                df, rid, F.col("l_extendedprice"), B, LO, HI
            ),
            "grouped_growing(l_orderkey)": lambda: poisson_bootstrap_grouped(
                df, F.col("l_orderkey"), F.col("l_extendedprice"), B, LO, HI
            ),
            "grouped_fixed(l_partkey%64)": lambda: poisson_bootstrap_grouped(
                df, F.col("l_partkey") % 64, F.col("l_extendedprice"), B, LO, HI
            ),
        }

    base_ck = base.localCheckpoint()
    # warm-up: compile each variant's codegen once so the first timed run
    # is not a compiler benchmark; then best-of-2 per cell
    for thunk in variants(base_ck).values():
        thunk().collect()
    results: dict[str, dict[str, float]] = {}
    for label, df in (("base", base_ck), (f"x{factor}", amplified)):
        for name, thunk in variants(df).items():
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                thunk().collect()
                best = min(best, time.time() - t0)
            results.setdefault(name, {})[label] = round(best, 3)
    for name, r in results.items():
        b, a = r["base"], r[f"x{factor}"]
        print(
            json.dumps(
                {
                    "variant": name,
                    "factor": factor,
                    "base_sec": b,
                    "amplified_sec": a,
                    "ratio": round(a / b, 2),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
