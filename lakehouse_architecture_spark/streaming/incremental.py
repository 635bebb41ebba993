"""Incremental / streaming processing — Structured Streaming replacements
for the reference's batch bookkeeping (SURVEY.md §2.9).

Reference mechanisms replaced:

* seen-ID text-file ledger (``app/bronze.py:29,50-63``) →
  ``dropDuplicatesWithinWatermark`` / checkpointed state.
* list-bucket + exclude ``processed/`` + copy/delete move protocol
  (``app/sliver.py:106-117,180-187``; non-atomic, can double-process on
  crash) → file-source checkpoint: exactly-once discovery, atomic progress
  in the checkpoint WAL.
* daily Airflow tick (``realestate_pipeline.py:249-253``) →
  ``Trigger.AvailableNow`` for catch-up batches on a schedule, or a
  continuous trigger for a live stream.

Event-time machinery (not present in the reference, required by the north
star): watermarks, tumbling/sliding windows, session windows — all stock
Structured Streaming operators, exercised over the ``events`` fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def incremental_file_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    format: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Checkpoint-tracked file source: every file processed exactly once
    across restarts, no ledger files, no copy/delete protocol."""
    reader = spark.readStream.format(format).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time aggregation
    with late-data handling via watermark. Works identically on a batch
    DataFrame (watermark is a no-op there) — used by the oracle tests.
    ``value_col=None`` skips the sum for events without a numeric column
    (every other column here is parameterized; the measure should be too).
    """
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value")
        )
    return (
        src.groupBy(win.alias("w"), *group_cols)
        .agg(*aggs)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *group_cols,
            "n",
            *(["total_value"] if value_col is not None else []),
        )
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows (gap-based) per key — Spark's native session_window.
    Batch mode: sessions computed over the whole input; streaming: state
    closed by watermark.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly the reference's seen-ID ledger semantics, stateful and
    bounded: duplicates of a key arriving within the watermark horizon are
    dropped; state is purged past the watermark (the ledger grew forever).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


def run_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    sink_path: str | None = None,
    query_name: str = "lakehouse_stream",
    output_mode: str = "append",
) -> StreamingQuery:
    """Run a streaming DataFrame to completion over all currently-available
    input (Trigger.AvailableNow) — the scheduled-catch-up replacement for
    the reference's daily Airflow tick. Sink: parquet when ``sink_path``
    given, else an in-memory table named ``query_name`` (tests)."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if sink_path:
        writer = writer.format("parquet").option("path", sink_path)
    else:
        writer = writer.format("memory").queryName(query_name)
    return writer.start()
