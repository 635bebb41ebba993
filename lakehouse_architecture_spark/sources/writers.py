"""Partitioned sinks done with native partitionBy.

The reference hand-assembles Hive-style partition paths in the object key
(``silver/date=YYYY-MM-DD/...``, ``app/sliver.py:161-171``) so Spark never
knows about the partition column and reads cannot prune. This writer uses
``partitionBy`` so the column is part of the table layout and both static
and dynamic partition pruning work — the difference between scanning one
date and scanning 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bronze_json(
    df: "DataFrame",
    path: str,
    mode: str = "append",
) -> None:
    """Bronze sink (S8): raw rows as JSON lines, executor-side.

    Replaces the reference's driver-side ``put_object(BytesIO(json.dumps))``
    (``app/bronze.py:130-138``) — each partition writes its own files, so a
    100 TB bronze batch never flows through one process.
    """
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    format: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.format(format).mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)
