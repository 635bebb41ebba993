"""SessionFactory — one place for all SparkSession configuration.

Replaces the reference's scattered per-script conf blocks
(``app/sliver.py:94-103``, ``airflow/dags/realestate_pipeline.py:73-84``,
``app/read_data_from_minIO.py:4-12``) with a single factory that produces a
session tuned for the deployment target:

* ``local`` — tests / bench on ``local[N]``: shuffle partitions sized to
  cores (not the 200 default), AQE on, Arrow on, UTC timezone (required for
  oracle-differential comparison against DuckDB).
* ``s3a`` — optional object-store profile mirroring the reference's MinIO
  connection keys (endpoint / path-style / ssl), applied only when an
  endpoint is given. No proprietary services are assumed.

Scale notes (100 TB design point): AQE handles runtime coalescing and skew
joins; ``spark.sql.files.maxPartitionBytes`` keeps scan tasks bounded; the
broadcast threshold stays at Spark's default so Catalyst can still pick
broadcast-hash for small dimension tables. On a real cluster only
``master``/memory settings change — the engine code is identical.
"""

from __future__ import annotations

import os
from typing import Mapping

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


class SessionFactory:
    """Builds SparkSessions with engine defaults; all knobs overridable."""

    def __init__(
        self,
        app_name: str = "lakehouse_architecture_spark",
        master: str | None = None,
        shuffle_partitions: int | None = None,
        extra_conf: Mapping[str, str] | None = None,
        s3a_endpoint: str | None = None,
        s3a_access_key: str | None = None,
        s3a_secret_key: str | None = None,
        hive_warehouse: str | None = None,
        checkpoint_dir: str | None = None,
    ) -> None:
        self.app_name = app_name
        self.master = master or f"local[{_default_parallelism()}]"
        self.shuffle_partitions = shuffle_partitions or _default_parallelism()
        self.extra_conf = dict(extra_conf or {})
        self.s3a_endpoint = s3a_endpoint
        self.s3a_access_key = s3a_access_key
        self.s3a_secret_key = s3a_secret_key
        self.hive_warehouse = hive_warehouse
        self.checkpoint_dir = checkpoint_dir

    def conf(self) -> dict[str, str]:
        conf = {
            # Sized to cores for local mode; on a cluster this is overridden
            # to ~2-3x total executor cores. AQE coalesces either way.
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # UTC so timestamp semantics line up with the DuckDB oracle and
            # with parquet written by other engines.
            "spark.sql.session.timeZone": "UTC",
            # The reference runs Spark 3.3 where ANSI mode is off: invalid
            # casts yield NULL (the semantics U1-U3 and the silver casts
            # depend on). Spark 4 flipped the default, so pin it.
            "spark.sql.ansi.enabled": "false",
            # Arrow for every pandas boundary (Pandas UDFs, toPandas).
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            # Bound scan-task size so a 100 TB table yields sane task counts.
            "spark.sql.files.maxPartitionBytes": "128m",
            # Runtime bloom-filter join reduction: when one side of a
            # shuffle join is selective, inject a bloom filter into the
            # other side's scan so filtered-out rows never enter the
            # shuffle — a major lever on fact-fact joins at 100 TB. Off by
            # default in OSS Spark. Size thresholds stay at their defaults,
            # so the filter only fires where it pays (tests opt in with
            # lowered thresholds to pin the injection path;
            # runtimeFilter.semiJoinReduction is NOT enabled — it deadlocks
            # this Spark build on any action, verified on 4.1.2).
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # Don't let a single output file explode on partitioned writes.
            "spark.sql.files.maxRecordsPerFile": "5000000",
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        }
        if self.s3a_endpoint:
            # Mirrors the reference's MinIO wiring (app/sliver.py:94-103)
            # without hardcoding credentials in job code.
            conf.update(
                {
                    "spark.hadoop.fs.s3a.endpoint": self.s3a_endpoint,
                    "spark.hadoop.fs.s3a.access.key": self.s3a_access_key or "",
                    "spark.hadoop.fs.s3a.secret.key": self.s3a_secret_key or "",
                    "spark.hadoop.fs.s3a.path.style.access": "true",
                    "spark.hadoop.fs.s3a.connection.ssl.enabled": "false",
                    "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
                }
            )
        if self.hive_warehouse:
            # Persistent catalog (SURVEY.md S15): the reference registers
            # tables in a Hive metastore so they outlive the session and are
            # queryable from BI tools (hive-metastore/metastore-site.xml:29-40,
            # spark/hive-site.xml:2-5). Locally the embedded Derby metastore
            # pinned inside the warehouse dir gives the same durability
            # contract for SEQUENTIAL sessions — embedded Derby allows one
            # JVM at a time, so concurrent readers (a BI tool alongside the
            # pipeline) need a server-mode metastore: point ConnectionURL
            # (or hive.metastore.uris) at the shared service, exactly as
            # the reference's docker-compose does.
            conf.update(
                {
                    "spark.sql.warehouse.dir": self.hive_warehouse,
                    "spark.hadoop.javax.jdo.option.ConnectionURL": (
                        f"jdbc:derby:;databaseName={self.hive_warehouse.rstrip('/')}"
                        "/_metastore_db;create=true"
                    ),
                }
            )
        conf.update(self.extra_conf)
        return conf

    def get_or_create(self) -> SparkSession:
        builder = SparkSession.builder.appName(self.app_name).master(self.master)
        for k, v in self.conf().items():
            builder = builder.config(k, v)
        if self.hive_warehouse:
            builder = builder.enableHiveSupport()
        spark = builder.getOrCreate()
        if self.checkpoint_dir:
            # Cluster deployments set this (an HDFS/object-store path) so
            # every lineage truncation in the package upgrades from
            # executor-local localCheckpoint to the RELIABLE checkpoint()
            # that survives executor loss — see materialize.truncate_lineage.
            spark.sparkContext.setCheckpointDir(self.checkpoint_dir)
        spark.sparkContext.setLogLevel("WARN")
        return spark


def get_spark(app_name: str = "lakehouse_architecture_spark") -> SparkSession:
    """Convenience: engine-default local session."""
    return SessionFactory(app_name=app_name).get_or_create()


_SHIPPED_APPS: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
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
        import tempfile
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        root = os.path.dirname(pkg_dir)
        out = os.path.join(tempfile.gettempdir(), f"lhas_pkg_{os.getpid()}.zip")
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
    except Exception as e:  # pragma: no cover - best-effort on exotic harnesses
        # Do NOT fail the session — but say why the ship failed: an Arrow
        # UDF stage later dying with an executor-side ModuleNotFoundError
        # is this exception's downstream symptom, not its own bug.
        import warnings

        warnings.warn(
            "ensure_package_on_executors: could not ship "
            f"lakehouse_architecture_spark via addPyFile ({e!r}); Arrow UDF "
            "stages may fail to import the package on executor workers",
            RuntimeWarning,
            stacklevel=2,
        )
