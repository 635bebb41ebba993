"""Time-series rollup operators.

``time_rollup`` is the hypertable/continuous-aggregate shape: the same
measure aggregated at several time granularities in ONE pass. Instead of
one scan + shuffle per granularity, the grouping-sets formulation expands
each row map-side (×len(granularities)) and feeds a single hash aggregate
— one scan, one shuffle, with map-side partial aggregation collapsing the
expansion before it ships. At 100 TB that is the difference between one
job and N of them; materialize the (tiny) result as the serving table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import dsum


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    granularities: tuple[str, ...] = ("hour", "day", "week"),
) -> DataFrame:
    """Multi-granularity rollup via GROUPING SETS.

    Output: (granularity, bucket [formatted string], n, total_value), one
    row per (granularity, bucket). Buckets use ``date_trunc`` — both Spark
    and DuckDB truncate weeks to Monday, so the oracle matches exactly.
    """
    buckets = [F.date_trunc(g, ts_col).alias(f"bucket_{g}") for g in granularities]
    b = df.select(*buckets, F.col(value_col).alias("__v"))
    cols = [F.col(f"bucket_{g}") for g in granularities]
    # grouping() is only valid inside the aggregate, so the flags become
    # aggregated columns and the label is derived afterwards
    agg = b.groupingSets([[c] for c in cols], *cols).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("__v", "total_value"),
        *[F.grouping(f"bucket_{g}").alias(f"__is_{g}") for g in granularities],
    )
    label = None
    for g in granularities:
        cond = F.col(f"__is_{g}") == 0
        label = F.when(cond, g) if label is None else label.when(cond, g)
    return agg.select(
        label.alias("granularity"),
        F.date_format(F.coalesce(*cols), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n",
        "total_value",
    )
