"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful streaming (SURVEY.md §2.9); the north star
requires custom stateful operators. This module implements the canonical
one — a per-key running aggregate with idle-timeout flush — as an
Arrow-batched ``applyInPandasWithState`` function, usable for e.g. "emit a
user's session summary when they go quiet".

In batch mode the same semantics are a plain groupBy (provided for parity
testing); in streaming mode state lives in the checkpoint and is evicted on
ProcessingTimeTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, flushed string"
STATE_SCHEMA = "n bigint, total double"


def _accumulate(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per key; emit + clear on idle timeout."""
    if state.hasTimedOut:
        (n, total) = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "flushed": ["timeout"],
            }
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(30_000)  # flush after 30s idle
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "flushed": ["update"],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: stateful per-user running totals with timeout flush.
    Batch: the equivalent single-pass aggregate (for oracle/parity tests).
    """
    if events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            _accumulate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .withColumn("flushed", F.lit("batch"))
    )
