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
    # decimal-exact accumulation quantized to 6dp, then back to float for
    # the state/output schema: plain float += across micro-batches is
    # order-dependent and drifts from the batch branch's decimal(38,6)
    # sum in the last ulp, breaking the exact-equality parity oracle
    from decimal import ROUND_HALF_UP, Decimal

    acc = Decimal(repr(total))
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        for v in vals:
            # HALF_UP to match Spark's decimal(38,6) cast rounding
            acc += Decimal(repr(float(v))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
    total = float(acc)
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


# --- transformWithStateInPandas (Spark 4 stateful API) ---------------------

try:  # Spark 4.x only, and its state-server protocol needs protobuf;
    # import-gated so Spark 3.5 / protobuf-less deployments still load
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TopKProcessor(StatefulProcessor):
        """Keeps the k largest values per key across micro-batches.

        ListState-free formulation: the running top-k (bounded, tiny) lives
        in a single ValueState array — O(k) state per key, no unbounded
        growth, no timer needed. The new-API upgrade of the
        applyInPandasWithState pattern above.
        """

        def __init__(self, k: int) -> None:
            self.k = k

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("topk", "vals array<double>")

        def handleInputRows(self, key, rows, timer_values):
            import math

            cur = list(self.state.get()[0]) if self.state.exists() else []
            for pdf in rows:
                # drop nulls/NaN like the batch branch's collect_list: a
                # NaN in the sort corrupts top-k order (all comparisons
                # False) and would then persist in state forever
                cur.extend(
                    fv
                    for v in pdf["value"]
                    if not math.isnan(fv := float(v))
                )
            cur = sorted(cur, reverse=True)[: self.k]
            self.state.update((cur,))
            yield pd.DataFrame({"user_id": [key[0]], "topk": [cur]})

        def close(self) -> None:
            pass

    HAS_TWS = True
except ImportError:  # pragma: no cover
    HAS_TWS = False


def streaming_top_k(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-user k largest ``value``s.

    Streaming: transformWithStateInPandas (Spark 4 stateful API, RocksDB
    state store) with O(k) ValueState per key. Batch: the equivalent
    sort_array/slice aggregate for parity tests.
    """
    if events.isStreaming:
        if not HAS_TWS:
            raise RuntimeError(
                "transformWithStateInPandas unavailable: needs Spark >= 4.0 "
                "AND the protobuf package (its state-server protocol); on "
                "Spark 4.x the fix is `pip install protobuf`, not a Spark "
                "upgrade"
            )
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_TopKProcessor(k),
            outputStructType="user_id bigint, topk array<double>",
            outputMode="Update",
            timeMode="None",
        )
    return events.groupBy("user_id").agg(
        F.slice(
            F.sort_array(F.collect_list(F.col("value").cast("double")), asc=False),
            1,
            k,
        ).alias("topk")
    )
