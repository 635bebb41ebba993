"""Shuffle audit — measured shuffle/spill bytes per headline query.

"Minimize shuffles" is this repo's #1 scale rule; this tool turns it from
a claim into a number. For each query it runs the plan once, then reads
the stage metrics Spark publishes on its UI REST API
(/api/v1/applications/{app}/stages) and attributes the delta to the query:

* shuffle_write / shuffle_read bytes — the data actually crossing the wire
  (what a 1000-executor cluster would pay network+disk for),
* spill (memory/disk) bytes — pressure that would become disk I/O at scale,
* scanned_table_bytes — on-disk size of the parquet files the plan reads
  (from ``df.inputFiles()`` + ``os.path.getsize``; the stage-level
  ``inputBytes`` metric underreports columnar scans, so disk bytes are the
  honest denominator).

A query whose shuffle bytes dwarf the data it scans is re-materializing
the corpus through the exchange (the 100 TB red flag this audit exists to
catch); partial aggregation should make most group-bys shuffle a small
fraction of what they scan. Fan-out operators (shingle explodes, session
windows) legitimately shuffle MORE than the compressed scan — the audit
makes the factor visible so it is a design number, not a surprise.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Prints one JSON line per query and a closing summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_spark.queries.registry import ALL_QUERIES
from lakehouse_architecture_spark.session import SessionFactory

DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q05_nation_revenue",
    "q09_product_profit",
    "q18_large_orders",
    "q21_sole_late",
    "q_minhash_lsh",
    "q_simhash",
    "q_ngram_jaccard",
    "q_dup_spans",
    "q_embedding_knn",
    "q_funnel",
    "q_sessionize",
    "q_corpus_curation",
    "q_dsir_score",
    "q_hapax",
    "q_ngram_diversity",
    "q_semdedup",
]


def _stage_totals(ui: str, app_id: str) -> dict[str, int]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    tot = {
        "input_bytes": 0,
        "shuffle_read_bytes": 0,
        "shuffle_write_bytes": 0,
        "spill_memory_bytes": 0,
        "spill_disk_bytes": 0,
    }
    for s in stages:
        tot["input_bytes"] += s.get("inputBytes", 0)
        tot["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        tot["spill_memory_bytes"] += s.get("memoryBytesSpilled", 0)
        tot["spill_disk_bytes"] += s.get("diskBytesSpilled", 0)
    return tot


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    # engine defaults disable the UI; the audit needs its REST metrics
    spark = SessionFactory(
        app_name="shuffle_audit",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4057"},
    ).get_or_create()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    if ui is None:
        print(json.dumps({"error": "Spark UI disabled; metrics unavailable"}))
        return 1

    rows = []
    for name in names:
        spec = ALL_QUERIES[name]
        df = spec.build(spark, sf_dir)
        scanned = sum(
            os.path.getsize(f.removeprefix("file:"))
            for f in set(df.inputFiles())
            if os.path.exists(f.removeprefix("file:"))
        )
        before = _stage_totals(ui, app_id)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        # completed-stage metrics land asynchronously in the status store
        time.sleep(1.0)
        after = _stage_totals(ui, app_id)
        delta = {k: after[k] - before[k] for k in after}
        row = {
            "query": name,
            "wall_sec": round(wall, 3),
            "scanned_table_bytes": scanned,
            **{k: v for k, v in delta.items()},
            "shuffle_over_scan": (
                round(delta["shuffle_write_bytes"] / scanned, 4) if scanned else None
            ),
        }
        rows.append(row)
        print(json.dumps(row))

    worst = max(
        (r for r in rows if r["shuffle_over_scan"] is not None),
        key=lambda r: r["shuffle_over_scan"],
        default=None,
    )
    print(
        json.dumps(
            {
                "summary": "shuffle_audit",
                "sf_dir": sf_dir,
                "total_spill_bytes": sum(
                    r["spill_memory_bytes"] + r["spill_disk_bytes"] for r in rows
                ),
                "worst_shuffle_over_scan": (
                    {"query": worst["query"], "ratio": worst["shuffle_over_scan"]}
                    if worst
                    else None
                ),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
