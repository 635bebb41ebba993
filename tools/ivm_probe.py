"""Measures incremental view maintenance against full recompute.

The merge logs its change feed (log_changes=True), so refresh folds the
recorded O(churn) pre/post images without scanning either snapshot — the
honest IVM cost model. (Without a feed, refresh falls back to hash-diffing
the snapshots, which loses to a plain rebuild for cheap aggregates — that
fallback exists for correctness on feeds gaps, not as the fast path.)

Builds a VersionedTable from lineitem at the given sf, materializes a
grouped SUM/COUNT view, then applies a small update batch (default 1% of
keys) and times (a) MaterializedAggregate.refresh — which folds only the
CDC delta — against (b) a full groupBy recompute of the new snapshot.
Prints one JSON line per phase. The gap widens with table size: the delta
path's work tracks the churn, the rebuild's tracks the table.

Usage: python tools/ivm_probe.py [sf_dir] [update_fraction] [mult]

``mult`` replicates lineitem that many times (distinct keys per replica) to
probe the refresh-vs-rebuild crossover at 10x/30x the base table size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_architecture_spark.pipeline.materialized import MaterializedAggregate
from lakehouse_architecture_spark.pipeline.table_format import VersionedTable
from lakehouse_architecture_spark.session import SessionFactory


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    spark = SessionFactory(app_name="ivm_probe").get_or_create()
    work = tempfile.mkdtemp(prefix="ivm_probe_")
    try:
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
            "l_extendedprice",
        )
        if mult > 1:
            li = li.crossJoin(
                F.broadcast(spark.range(mult).select(F.col("id").alias("__rep")))
            ).withColumn(
                "l_orderkey",
                F.col("l_orderkey") * mult + F.col("__rep"),
            ).drop("__rep")
        li = li.withColumn(
            "rid", F.concat_ws("_", "l_orderkey", "l_linenumber")
        )

        src = VersionedTable(spark, os.path.join(work, "src"), keys=["rid"])
        src.write(li)
        view = MaterializedAggregate(
            src,
            os.path.join(work, "view"),
            group_cols=["l_returnflag"],
            sum_cols=["l_quantity", "l_extendedprice"],
        )
        t0 = time.time()
        view.refresh()
        print(json.dumps({"phase": "initial_build", "sec": round(time.time() - t0, 3)}))

        # update batch: ~frac of rows get their quantity bumped
        mod = int(1 / frac)
        updates = li.filter(F.col("l_orderkey") % mod == 0).withColumn(
            "l_quantity", F.col("l_quantity") + 1
        )
        n_upd = updates.count()
        src.merge(updates, log_changes=True)

        t0 = time.time()
        view.refresh()
        inc = round(time.time() - t0, 3)

        t0 = time.time()
        full = (
            src.read()
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("sum_l_quantity"),
                F.sum("l_extendedprice").alias("sum_l_extendedprice"),
            )
        )
        # a real rebuild persists its view too — same sink work as refresh
        full.write.mode("overwrite").parquet(os.path.join(work, "rebuilt_view"))
        rebuild = round(time.time() - t0, 3)

        # the incremental result must equal the rebuild
        got = {
            (r["l_returnflag"], r["n"], round(r["sum_l_quantity"], 2))
            for r in view.read().collect()
        }
        want = {
            (r["l_returnflag"], r["n"], round(r["sum_l_quantity"], 2))
            for r in full.collect()
        }
        print(
            json.dumps(
                {
                    "phase": "refresh_vs_rebuild",
                    "updated_rows": n_upd,
                    "incremental_sec": inc,
                    "full_rebuild_sec": rebuild,
                    "match": got == want,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
