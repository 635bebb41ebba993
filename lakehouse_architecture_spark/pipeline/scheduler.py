"""Scheduler adapter — the reference's 4-task DAG without the Airflow dep.

The reference sequences ``ingest → bronze_to_silver → silver_to_gold →
train`` as Airflow PythonOperators (``airflow/dags/realestate_pipeline.py:
256-280``). The engine's stages are plain functions, so any scheduler can
run them; this module supplies the two pieces a migrating user needs:

* A minimal, dependency-free DAG runner (:class:`Dag` / :func:`run_dag`)
  — named tasks, upstream edges, deterministic topological execution with
  per-task retry and a structured run report. This is NOT a distributed
  scheduler; it is the glue for cron/CI/one-box use, and its task graph is
  the exact shape you'd hand to Airflow/Dagster/Prefect.
* :func:`realestate_dag` — the reference pipeline's four stages wired onto
  that graph: crawl to bronze JSON, bronze→silver, silver→gold, train.
  Each stage reads its input from disk (not from a previous stage's
  in-memory result), mirroring the reference's task isolation: a stage can
  be re-run alone, and on a real scheduler each task may land on a
  different worker.

To run under Airflow proper, map each :class:`TaskSpec` to a
``PythonOperator(task_id=t.name, python_callable=t.fn)`` and replay
``t.upstream`` as ``>>`` edges — nothing else is needed.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class TaskSpec:
    name: str
    fn: Callable[[], object]
    upstream: tuple[str, ...] = ()
    retries: int = 0
    retry_backoff_s: float = 0.0


@dataclass
class TaskRun:
    name: str
    state: str  # "success" | "failed" | "skipped"
    attempts: int
    seconds: float
    result: object = None
    error: str | None = None


@dataclass
class Dag:
    name: str
    tasks: dict[str, TaskSpec] = field(default_factory=dict)

    def add(self, spec: TaskSpec) -> TaskSpec:
        if spec.name in self.tasks:
            raise ValueError(f"duplicate task {spec.name!r}")
        for up in spec.upstream:
            if up not in self.tasks:
                raise ValueError(f"{spec.name!r} depends on unknown task {up!r}")
        self.tasks[spec.name] = spec
        return spec

    def topo_order(self) -> list[str]:
        """Insertion order IS a topological order: ``add`` rejects edges to
        not-yet-added tasks, so every upstream precedes its dependents and
        cycles are unconstructible by design."""
        return list(self.tasks)


def run_dag(dag: Dag) -> dict[str, TaskRun]:
    """Execute the DAG; downstream tasks of a failure are skipped, siblings
    still run (Airflow's default trigger rule)."""
    runs: dict[str, TaskRun] = {}
    for name in dag.topo_order():
        spec = dag.tasks[name]
        failed_up = [
            u for u in spec.upstream if runs[u].state in ("failed", "skipped")
        ]
        if failed_up:
            runs[name] = TaskRun(name, "skipped", 0, 0.0, error=f"upstream {failed_up}")
            continue
        t0 = time.monotonic()
        attempts = 0
        while True:
            attempts += 1
            try:
                result = spec.fn()
                runs[name] = TaskRun(
                    name, "success", attempts, time.monotonic() - t0, result=result
                )
                break
            except Exception as exc:  # noqa: BLE001 — report, don't crash the DAG
                if attempts > spec.retries:
                    runs[name] = TaskRun(
                        name, "failed", attempts, time.monotonic() - t0, error=repr(exc)
                    )
                    break
                if spec.retry_backoff_s:
                    time.sleep(spec.retry_backoff_s * (2 ** (attempts - 1)))
    return runs


def realestate_dag(
    spark: SparkSession,
    fetch_page: Callable,
    fetch_detail: Callable,
    bronze_dir: str,
    silver_dir: str,
    gold_dir: str,
    retries: int = 1,
) -> Dag:
    """The reference pipeline (realestate_pipeline.py:256-280) as a
    :class:`Dag`: ``ingest >> bronze_to_silver >> silver_to_gold >> train``.

    ``fetch_page``/``fetch_detail`` are injected (sources/ingest.py design)
    — tests and air-gapped runs pass fakes; production passes HTTP clients.
    """
    from lakehouse_architecture_spark.pipeline.medallion import (
        bronze_to_silver_listings,
        silver_to_gold,
    )
    from lakehouse_architecture_spark.pipeline.ml import train_price_model
    from lakehouse_architecture_spark.sources.ingest import crawl_batch
    from lakehouse_architecture_spark.sources.readers import read_bronze_json

    def t_ingest() -> object:
        return crawl_batch(fetch_page, fetch_detail, bronze_dir)

    def t_bronze_to_silver() -> int:
        silver = bronze_to_silver_listings(read_bronze_json(spark, bronze_dir))
        silver.write.mode("overwrite").parquet(silver_dir)
        return spark.read.parquet(silver_dir).count()

    def t_silver_to_gold() -> int:
        silver = spark.read.parquet(silver_dir)
        gold = silver_to_gold(
            silver.selectExpr(
                "list_id AS id", "Address AS location", "Area AS area",
                "CAST(Bedrooms AS int) AS bedrooms",
                "CAST(Price AS double) AS price",
            )
        )
        gold.write.mode("overwrite").parquet(gold_dir)
        return spark.read.parquet(gold_dir).count()

    def t_train() -> float:
        result = train_price_model(spark.read.parquet(gold_dir))
        return result.r2

    dag = Dag("realestate_pipeline")
    dag.add(TaskSpec("ingest", t_ingest, retries=retries))
    dag.add(TaskSpec("bronze_to_silver", t_bronze_to_silver, ("ingest",), retries))
    dag.add(TaskSpec("silver_to_gold", t_silver_to_gold, ("bronze_to_silver",), retries))
    dag.add(TaskSpec("train", t_train, ("silver_to_gold",), retries))
    return dag


def describe(runs: Mapping[str, TaskRun]) -> str:
    """One line per task — what a scheduler UI's run page shows."""
    return "\n".join(
        f"{r.name}: {r.state} (attempts={r.attempts}, {r.seconds:.2f}s)"
        + (f" error={r.error}" if r.error else "")
        for r in runs.values()
    )
