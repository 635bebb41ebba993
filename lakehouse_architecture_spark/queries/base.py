"""Query registry plumbing for the driver contract (__spark_entry__.py).

Every engine capability is declared as a :class:`QuerySpec`: a Spark builder
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an exactly
equivalent DuckDB oracle SQL string. The driver runs both sides at sf0.01
and hash-compares values — so builders follow the determinism rules:

* double aggregates go through DECIMAL(38,6) (functions/aggregates.py);
* no raw timestamps in outputs (cast to date or formatted string);
* every ranking/limit has a total-order tiebreak;
* computed columns aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from lakehouse_architecture_spark.catalog import load_tables


@dataclass(frozen=True)
class QuerySpec:
    name: str
    doc: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


_TABLE_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register the testdata tables as temp views for this query.

    Pins the two session confs the determinism rules depend on — the driver
    may call builders on a session this engine did not construct. Loads are
    cached per (application, sf_dir): re-reading ten parquet footers per
    query added ~0.3s to every build. Keyed by applicationId (not object
    identity) so a stopped-and-recreated session can never alias a stale
    entry.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    _ensure_package_on_executors(spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _TABLE_CACHE.get(key)
    if cached is None:
        cached = _TABLE_CACHE[key] = load_tables(spark, sf_dir)
    return cached


_SHIPPED_APPS: set[str] = set()


def _ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Arrow UDF stages (mapInPandas/applyInPandas — manifest builders,
    multimodal decode, grouped-map demos) pickle their functions BY
    REFERENCE, so each worker re-imports ``lakehouse_architecture_spark``.
    On a driver launched from the repo cwd that works by accident; on a
    real cluster (or a driver launched elsewhere — the external gate runs
    builders on its OWN session) the import fails unless the package rides
    along. One zip per application, pennies at import time; workers pick
    pyFiles up per-task, so this is safe after the context is live."""
    try:
        app = spark.sparkContext.applicationId
        if app in _SHIPPED_APPS:
            return
        import os
        import tempfile
        import zipfile

        pkg_dir = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )  # .../lakehouse_architecture_spark
        root = os.path.dirname(pkg_dir)
        out = os.path.join(
            tempfile.gettempdir(), f"lhas_pkg_{os.getpid()}.zip"
        )
        if not os.path.exists(out):
            tmp = f"{out}.tmp{os.getpid()}"
            with zipfile.ZipFile(tmp, "w") as z:
                for dirpath, _dirs, files in os.walk(pkg_dir):
                    for f in sorted(files):
                        if f.endswith(".py"):
                            p = os.path.join(dirpath, f)
                            z.write(p, os.path.relpath(p, root))
            os.replace(tmp, out)
        spark.sparkContext.addPyFile(out)
        _SHIPPED_APPS.add(app)
    except Exception:  # pragma: no cover - best-effort on exotic harnesses
        pass


def warm_cached_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Decode every table once into a partitioned in-memory cache and swap
    it into this session's shared table dict + temp views — the warm-table
    environment bench.py times against (and tools/steady_probe.py must
    reproduce EXACTLY, hence one shared implementation).

    Rationale: the fixture parquet is single-row-group, and Spark's scan
    parallelism is row-group aligned — cold queries would serialize on one
    decode task, a fixture artifact (production tables have thousands of
    row groups). ~25k rows per partition, capped at core count: big facts
    decode and scan in parallel, tiny dims stay single-partition (32
    near-empty partitions cost more in task launches than they save).
    """
    tbls = tables(spark, sf_dir)
    max_parts = spark.sparkContext.defaultParallelism
    for name, df in tbls.items():
        rows = df.count()
        n = max(1, min(max_parts, rows // 25_000))
        cached = (df.repartition(n) if n > 1 else df).cache()
        cached.count()  # materialize
        cached.createOrReplaceTempView(name)
        tbls[name] = cached  # builders resolve via this shared dict or views
    return tbls
