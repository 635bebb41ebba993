"""Parallelism-restoring repartition helpers for explode/compute-heavy ops.

A compact input — one small parquet file, a heavily filtered scan, or a
coalesced upstream stage — arrives in few partitions. Narrow follow-up
stages inherit that layout, so an operator whose cost is dominated by
per-row fan-out (shingle explode, per-row vector math, a cross join against
a broadcast side) runs near-serially no matter how many cores exist.

Repartitioning first costs one pass over the input but (a) restores full
parallelism for the expensive stage, (b) balances per-row work skew
(document length, vector count), and — for :func:`spread_by_id` — (c)
satisfies a downstream ``groupBy(id)`` distribution, so the per-id
aggregate that usually follows needs no second shuffle.

At 100 TB the input is already thousands of partitions and the helper's
shuffle is the no-op case in spirit; it matters exactly when the planner's
partition count collapses below the cluster's parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _target_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))


def spread_by_id(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-partition on ``id_col`` ahead of an explode-heavy stage whose
    result is re-aggregated per id (shingling, tokenization)."""
    return df.repartition(_target_partitions(df), F.col(id_col))


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition ahead of a compute-heavy narrow stage with no
    downstream grouping to co-locate for (vector scoring, broadcast cross
    joins)."""
    return df.repartition(_target_partitions(df))
