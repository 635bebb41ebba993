"""Local oracle-differential harness — mirrors the driver's correctness gate.

Runs every query in the registry on Spark and its oracle SQL on DuckDB over
the same parquet tables, canonicalizes both results (columns sorted by name,
rows sorted, values stringified), and compares row counts + value hashes.

Usage: python tools/oracle_check.py [--plain] [sf_dir] [query_name ...]

``--plain`` runs on a bare SparkSession (no engine confs — Spark 4 ANSI
defaults, like the external driver's) instead of SessionFactory, verifying
that the query layer pins every conf it depends on (queries/base.py).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from lakehouse_architecture_spark.catalog import TESTDATA_TABLES
from lakehouse_architecture_spark.queries.registry import ALL_QUERIES
from lakehouse_architecture_spark.session import SessionFactory


def canonical(df: pd.DataFrame) -> tuple[int, str, list[str]]:
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v: object) -> str:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = sorted(
        ",".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), h, rows


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--plain"]
    plain = "--plain" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    if plain:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle_check_plain")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = SessionFactory(app_name="oracle_check").get_or_create()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures, passes = [], []
    for name, spec in ALL_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.build(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {str(e).splitlines()[0][:200]}"))
            continue
        if spec.oracle is None:
            passes.append((name, f"rows-only n={len(sdf)} ({time.time()-t0:.1f}s)"))
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {str(e).splitlines()[0][:200]}"))
            continue
        sn, sh, srows = canonical(sdf)
        on, oh, orows = canonical(odf)
        dt = time.time() - t0
        if sn != on:
            failures.append((name, f"ROWCOUNT spark={sn} oracle={on}"))
        elif sh != oh:
            diff = next(
                (f"spark={a!r} oracle={b!r}" for a, b in zip(srows, orows) if a != b),
                "rows differ only in tail",
            )
            failures.append((name, f"HASH mismatch n={sn}; first diff: {diff[:300]}"))
        else:
            passes.append((name, f"OK n={sn} hash={sh} ({dt:.1f}s)"))

    for name, msg in passes:
        print(f"PASS {name}: {msg}")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(passes)} passed, {len(failures)} failed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
