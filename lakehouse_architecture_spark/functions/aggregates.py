"""Deterministic aggregate helpers.

Floating-point SUM/AVG over a shuffled dataset is order-dependent, so two
engines (or two runs with different partitioning) can disagree in the last
bits. For oracle-differential testing and reproducible pipelines the engine
aggregates doubles through ``DECIMAL(38,6)`` — exact integer arithmetic —
and casts the final result back to double. The per-row double→decimal cast
is deterministic, decimal addition is exact, so the result is bit-identical
regardless of partitioning, parallelism, or engine.

Cost note: Spark's decimal sum is still a Tungsten hash-aggregate with
map-side partial aggregation (128-bit integer adds); at 100 TB this is the
same shuffle shape as a double sum, just slightly more CPU per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(38,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive average: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """The DuckDB/ANSI text equivalent of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """The DuckDB/ANSI text equivalent of :func:`davg`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"
