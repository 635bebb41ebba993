"""Hub-amplification A/B for the Adamic-Adar degree cap (VERDICT r11 #2).

The key-shifted amplification in tools/scale_probe.py grows the CONTEXT
COUNT but keeps per-context degrees fixed (replicated orders get new order
keys), so it exercises linear growth only — both the capped and uncapped
paths scale ~N× there (measured r12: 2.8× vs 3.9× at 30×, noise-level
apart). The failure mode ``max_ctx_degree`` exists for is the other axis:
HUB growth, where contexts keep their identity and their degree grows with
the corpus (one order accreting more distinct parts; one n-gram appearing
in more documents). This probe amplifies that axis — replicas keep
``l_orderkey`` and shift ``l_partkey`` — so every order's degree multiplies
by the factor and the uncapped pair space grows ~factor², while the cap
drops the now-oversized contexts before the self-join.

Usage: python tools/hub_probe.py [factor] [sf_dir]
Prints one JSON line per variant: pairs emitted + wall seconds at base and
hub-amplified scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.graph import adamic_adar
from lakehouse_architecture_spark.session import SessionFactory

CAP = 8  # mirrors queries/analytics7._AA_CAP


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = SessionFactory(app_name="hub_probe").get_or_create()
    base = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            F.col("l_partkey").alias("node"), F.col("l_orderkey").alias("ctx")
        )
    )
    shift = (
        base.agg(F.max("node")).collect()[0][0] + 1
    )  # keep replica part ids disjoint
    replicas = [
        base.select((F.col("node") + i * shift).alias("node"), "ctx")
        for i in range(factor)
    ]
    hub = replicas[0]
    for r in replicas[1:]:
        hub = hub.unionByName(r)

    for label, edges in (("base", base), (f"hub_x{factor}", hub)):
        for cap in (None, CAP):
            t0 = time.time()
            n_pairs = adamic_adar(edges, "node", "ctx", max_ctx_degree=cap).count()
            print(
                json.dumps(
                    {
                        "variant": label,
                        "max_ctx_degree": cap,
                        "pairs": n_pairs,
                        "sec": round(time.time() - t0, 3),
                    }
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()
