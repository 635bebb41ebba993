"""Event-stream query suite: JSON extraction, event-time windows (tumbling /
sliding / session), as-of join, and bucketed range join over ``events``.

The windowing queries run the *same* engine code a streaming job uses
(streaming/incremental.py) — Spark's window/session_window operators are
identical in batch and streaming; the oracle states the equivalent
timestamp-arithmetic SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import davg_sql, dsum_sql
from lakehouse_architecture_spark.operators.relational import asof_join, range_join_bucketed
from lakehouse_architecture_spark.queries.base import QuerySpec, tables
from lakehouse_architecture_spark.streaming.incremental import (
    sessionized_counts,
    windowed_counts,
)


# --- JSON scalar extraction (§2.8: from_json / get_json_object) ---
def _q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    ev = t["events"].withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count("value")).alias("avg_value"),
        )
        .orderBy("event_type")
    )


_Q_JSON_SQL = f"""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       {davg_sql('value')} AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- conditional bucketing (P5 CASE WHEN belt) ---
def _q_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    bucket = (
        F.when(F.col("value") < 5.0, "low")
        .when(F.col("value") < 15.0, "mid")
        .otherwise("high")
    )
    return (
        t["events"]
        .groupBy("event_type", bucket.alias("value_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.min("value"), 6).alias("min_v"))
        .orderBy("event_type", "value_bucket")
    )


_Q_BUCKETS_SQL = """
SELECT event_type,
       CASE WHEN value < 5.0 THEN 'low'
            WHEN value < 15.0 THEN 'mid' ELSE 'high' END AS value_bucket,
       COUNT(*) AS n, ROUND(MIN(value), 6) AS min_v
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- tumbling window (streaming operator in batch mode) ---
def _q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return windowed_counts(t["events"], window="1 hour").orderBy(
        "window_start", "event_type"
    )


_Q_TUMBLING_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n,
       {dsum_sql('value')} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- sliding window: 1h windows every 15 min ---
def _q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return windowed_counts(t["events"], window="1 hour", slide="15 minutes").orderBy(
        "window_start", "event_type"
    )


# Each event falls into exactly 4 windows whose starts are the 15-minute
# grid points in (ts-1h, ts]: start_k = trunc15(ts) - k*15min, k = 0..3.
_Q_SLIDING_SQL = f"""
WITH grid AS (
  SELECT e.*,
         date_trunc('minute', ts)
           - (CAST(EXTRACT(minute FROM ts) AS INT) % 15) * INTERVAL 1 MINUTE
           - k.k * INTERVAL 15 MINUTE AS wstart
  FROM events e, (SELECT unnest(generate_series(0, 3)) AS k) k
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n,
       {dsum_sql('value')} AS total_value
FROM grid
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- session windows (gap = 2 hours) ---
def _q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return sessionized_counts(t["events"], gap="2 hours").orderBy(
        "user_id", "session_start"
    )


# Session semantics: a new session starts when the gap to the previous event
# of the same user is >= 2h; session_end = last event ts + gap.
_Q_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 2 HOUR
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


# --- as-of join: each purchase ↔ latest prior-or-equal click of that user ---
def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="pts",
        right_time="cts",
        value_cols=["click_id", "cts"],
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.date_format("pts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
        "click_id",
        F.date_format("cts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


# --- forward as-of: each click ↔ earliest following purchase of that user ---
def _q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="cts",
        right_time="pts",
        value_cols=["purchase_id", "pts"],
        direction="forward",
    )
    return out.select(
        "click_id",
        "user_id",
        F.date_format("cts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_id",
        F.date_format("pts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


_Q_ASOF_FORWARD_SQL = """
SELECT c.event_id AS click_id,
       c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       p.event_id AS purchase_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts >= c.ts
"""


_Q_ASOF_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       p.value AS purchase_value,
       c.event_id AS click_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


def _ts_us(col: str) -> F.Column:
    """Epoch microseconds from a timestamp column of either flavor.
    unix_micros rejects TIMESTAMP_NTZ (the type parquet event data often
    carries); under the engine's pinned UTC session the NTZ→TIMESTAMP cast
    is the identity on the wall-clock value, so this is exact either way."""
    return F.unix_micros(F.col(col).cast("timestamp"))


# --- bucketed range join: clicks within 5 minutes after an error ---
def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    ev = t["events"]
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            _ts_us("ts").alias("w_start"),
            (_ts_us("ts") + F.lit(300_000_000)).alias("w_end"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), _ts_us("ts").alias("c_us")
    )
    joined = range_join_bucketed(
        clicks, errors, "c_us", "w_start", "w_end", bucket_width=300_000_000
    )
    return joined.select("error_id", "click_id").orderBy("error_id", "click_id")


_Q_RANGE_JOIN_SQL = """
SELECT e.event_id AS error_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON epoch_us(c.ts) >= epoch_us(e.ts)
 AND epoch_us(c.ts) <= epoch_us(e.ts) + 300000000
ORDER BY error_id, click_id
"""


EVENTS_QUERIES: list[QuerySpec] = [
    QuerySpec("q_json_extract", "get_json_object over events.props", _q_json, _Q_JSON_SQL),
    QuerySpec("q_case_buckets", "CASE WHEN bucketing (P5)", _q_buckets, _Q_BUCKETS_SQL),
    QuerySpec("q_tumbling_window", "1h tumbling event-time windows", _q_tumbling, _Q_TUMBLING_SQL),
    QuerySpec("q_sliding_window", "1h/15min sliding windows", _q_sliding, _Q_SLIDING_SQL),
    QuerySpec("q_session_window", "gap-based session windows", _q_sessions, _Q_SESSIONS_SQL),
    QuerySpec("q_asof_join", "as-of join (union+window formulation)", _q_asof, _Q_ASOF_SQL),
    QuerySpec("q_asof_forward", "forward as-of join (merge_asof direction surface)", _q_asof_forward, _Q_ASOF_FORWARD_SQL),
    QuerySpec("q_range_join", "point-in-interval join, bucketed", _q_range_join, _Q_RANGE_JOIN_SQL),
]


# --- funnel: strict-order step reach counts (single-shuffle array form) ---
def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.timeseries import funnel_counts

    t = tables(spark, sf_dir)
    return funnel_counts(
        t["events"], "user_id", "ts", "event_type", ("view", "click", "purchase")
    ).orderBy("step_index")


_Q_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS t
  FROM events GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND t1.t IS NOT NULL AND e.ts > t1.t
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t
  GROUP BY e.user_id
)
SELECT * FROM (VALUES
  ('view', 0, (SELECT COUNT(t) FROM t1)),
  ('click', 1, (SELECT COUNT(*) FROM t2)),
  ('purchase', 2, (SELECT COUNT(*) FROM t3))) AS v(step, step_index, n_users)
ORDER BY step_index
"""


# --- cohort retention matrix ----------------------------------------------
def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.timeseries import cohort_retention

    t = tables(spark, sf_dir)
    return cohort_retention(t["events"], "user_id", "ts").orderBy("cohort", "day_n")


_Q_RETENTION_SQL = """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
)
SELECT strftime(f.d0, '%Y-%m-%d') AS cohort,
       date_diff('day', f.d0, CAST(e.ts AS DATE)) AS day_n,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


EVENTS_QUERIES.extend(
    [
        QuerySpec("q_funnel", "strict-order funnel step counts", _q_funnel, _Q_FUNNEL_SQL),
        QuerySpec("q_retention", "cohort retention matrix", _q_retention, _Q_RETENTION_SQL),
    ]
)
