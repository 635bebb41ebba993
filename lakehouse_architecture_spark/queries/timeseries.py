"""Time-series queries: gap-fill + forward-fill, and exact second-moment
statistics (correlation/covariance from decimal-exact sums).

Gap-fill is the canonical time-series operator Spark lacks as a built-in:
materialize a complete per-key time grid, left-join the observed points,
and forward-fill with ``last(..., ignorenulls)`` over an ordered window —
one grid explode + one shuffle per key. (TimescaleDB's time_bucket_gapfill /
locf shape, rebuilt on DataFrame ops.)

corr/covar: engine-native ``corr()`` implementations use different
incremental formulas in different engines (last-ulp divergence), so the
oracle-checked version computes Pearson r from decimal-exact component sums
(n, Σx, Σy, Σxy, Σx², Σy²) — identical algebra on both sides, bit-stable
under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import dsum, dsum_sql
from lakehouse_architecture_spark.operators.timeseries import time_rollup
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- gap-fill: hourly per-user grid over day 1, forward-filled -------------
def _q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    ev = t["events"].filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
        & (F.col("user_id") <= 20)
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(dsum("value", "hour_value"))
    # complete per-user grid: every user x every hour of the day
    users = hourly.select("user_id").distinct()
    grid = users.crossJoin(
        spark.range(24).select(
            (F.lit("2024-01-01").cast("timestamp") + F.make_interval(hours=F.col("id"))).alias("hour")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("hour_value").isNotNull().alias("observed"),
            F.round(
                F.coalesce(F.last("hour_value", ignorenulls=True).over(w), F.lit(0.0)),
                6,
            ).alias("filled_value"),
        )
        .orderBy("user_id", "hour")
    )


_Q_GAPFILL_SQL = f"""
WITH ev AS (
  SELECT * FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
    AND user_id <= 20
),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         {dsum_sql('value')} AS hour_value
  FROM ev GROUP BY 1, 2
),
grid AS (
  SELECT u.user_id, TIMESTAMP '2024-01-01' + h.h * INTERVAL 1 HOUR AS hour
  FROM (SELECT DISTINCT user_id FROM hourly) u,
       (SELECT unnest(generate_series(0, 23)) AS h) h
)
SELECT g.user_id,
       strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       hourly.hour_value IS NOT NULL AS observed,
       ROUND(COALESCE(
         LAST_VALUE(hourly.hour_value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 6) AS filled_value
FROM grid g
LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.hour = g.hour
ORDER BY g.user_id, g.hour
"""


# --- exact Pearson correlation / covariance from decimal sums --------------
def _q_exact_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        dsum(x * y, "sxy"),
        dsum(x * x, "sxx"),
        dsum(y * y, "syy"),
    )
    n = F.col("n").cast("double")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(cov, 4).alias("covar_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


_Q_EXACT_CORR_SQL = f"""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         {dsum_sql('l_quantity')} AS sx,
         {dsum_sql('l_extendedprice')} AS sy,
         {dsum_sql('l_quantity * l_extendedprice')} AS sxy,
         {dsum_sql('l_quantity * l_quantity')} AS sxx,
         {dsum_sql('l_extendedprice * l_extendedprice')} AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 4)
         AS covar_qty_price,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_qty_price
FROM s
ORDER BY l_returnflag
"""


# --- full Pearson correlation MATRIX, one aggregate pass --------------------
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs Pearson correlation of lineitem's numeric measures from a
    SINGLE hash-aggregate pass (the feature-analysis screen a training
    pipeline runs before model fitting): n + 4 sums + 4 sums-of-squares +
    6 cross sums = 15 decimal-exact aggregate expressions, map-side
    combined — one scan, one one-row shuffle, never a per-pair pass.
    Output: one row per unordered pair (col_a < col_b) with the exact
    correlation, identical formula to q_exact_corr."""
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    pairs = [
        (a, b)
        for ai, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[ai + 1 :]
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(dsum(F.col(c), f"s_{c}"))
        aggs.append(dsum(F.col(c) * F.col(c), f"ss_{c}"))
    for a, b in pairs:
        aggs.append(dsum(F.col(a) * F.col(b), f"sx_{a}_{b}"))
    one = li.agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("n").cast("double")
        num = n * F.col(f"sx_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        den = F.sqrt(
            n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        ) * F.sqrt(n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        return num / den

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(corr(a, b), 6).alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"), "n")
        .select("r.col_a", "r.col_b", "n", "r.corr")
        .orderBy("col_a", "col_b")
    )


def _corr_matrix_sql() -> str:
    cols = _CORR_COLS
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    sums = ",\n         ".join(
        [f"COUNT(*) AS n"]
        + [f"{dsum_sql(c)} AS s_{c}" for c in cols]
        + [f"{dsum_sql(f'{c} * {c}')} AS ss_{c}" for c in cols]
        + [f"{dsum_sql(f'{a} * {b}')} AS sx_{a}_{b}" for a, b in pairs]
    )
    sel = "\n  UNION ALL\n".join(
        f"""  SELECT '{a}' AS col_a, '{b}' AS col_b, n,
         ROUND((CAST(n AS DOUBLE) * sx_{a}_{b} - s_{a} * s_{b})
               / (sqrt(CAST(n AS DOUBLE) * ss_{a} - s_{a} * s_{a})
                  * sqrt(CAST(n AS DOUBLE) * ss_{b} - s_{b} * s_{b})), 6)
           AS corr FROM s"""
        for a, b in pairs
    )
    return f"""
WITH s AS (
  SELECT {sums}
  FROM lineitem
)
SELECT col_a, col_b, n, corr FROM (
{sel}
)
ORDER BY col_a, col_b
"""


_Q_CORR_MATRIX_SQL = _corr_matrix_sql()


# --- hypertable-style multi-granularity rollup (GROUPING SETS, one pass) --
def _q_time_rollup(spark, sf_dir):
    t = tables(spark, sf_dir)
    return time_rollup(t["events"], "ts", "value").orderBy("granularity", "bucket")


_Q_TIME_ROLLUP_SQL = f"""
SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
            WHEN GROUPING(d) = 0 THEN 'day'
            ELSE 'week' END AS granularity,
       strftime(COALESCE(h, d, w), '%Y-%m-%d %H:%M:%S') AS bucket,
       COUNT(*) AS n,
       {dsum_sql('value')} AS total_value
FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             date_trunc('week', ts) AS w, value
      FROM events)
GROUP BY GROUPING SETS ((h), (d), (w))
ORDER BY granularity, bucket
"""


# --- SCD2 validity intervals from a change stream ---------------------------
def _q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.timeseries import scd2_intervals

    t = tables(spark, sf_dir)
    out = scd2_intervals(t["events"], ["user_id"], "ts", "event_type", "event_id")
    return out.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


_Q_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered
  WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM changes
"""


# --- gap-based sessionization → per-session stats --------------------------
_SESSION_GAP_S = 1800


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.timeseries import sessionize

    t = tables(spark, sf_dir)
    labeled = sessionize(
        t["events"], "user_id", "ts", _SESSION_GAP_S, tiebreak_col="event_id"
    )
    return (
        labeled.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


_Q_SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         epoch(ts) - lag(epoch(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > {_SESSION_GAP_S} THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM g
)
SELECT user_id, session_seq,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM s
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


# --- rolling z-score anomaly screen ----------------------------------------
_Z_ROWS = 24
_Z_MIN_PERIODS = 3
_Z_THRESHOLD = 2.0


def _q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.timeseries import rolling_zscore

    t = tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") <= 20)
    scored = rolling_zscore(
        ev, "user_id", "ts", "value", _Z_ROWS, _Z_MIN_PERIODS, tiebreak_col="event_id"
    )
    return (
        scored.filter(F.abs(F.col("zscore")) >= _Z_THRESHOLD)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
            "roll_n",
            "roll_mean",
            "zscore",
        )
        .orderBy("user_id", "event_id")
    )


_Q_ZSCORE_SQL = f"""
WITH b AS (
  SELECT user_id, event_id, ts, value,
         CAST(COUNT(value) OVER w AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxx
  FROM events
  WHERE user_id <= 20
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_Z_ROWS - 1} PRECEDING AND CURRENT ROW)
),
z AS (
  SELECT user_id, event_id, ts, value,
         CAST(n AS BIGINT) AS roll_n,
         ROUND(sx / n, 6) AS roll_mean,
         ROUND(CASE WHEN n >= {_Z_MIN_PERIODS}
                     AND sqrt((sxx - sx * sx / n) / (n - 1)) > 0
                    THEN (value - sx / n)
                         / sqrt((sxx - sx * sx / n) / (n - 1))
               END, 6) AS zscore
  FROM b
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       value, roll_n, roll_mean, zscore
FROM z
WHERE abs(zscore) >= {_Z_THRESHOLD}
ORDER BY user_id, event_id
"""


# --- finite-window EWMA smoothing ------------------------------------------
_EWMA_ALPHA = 0.5
_EWMA_LOOKBACK = 8


def _ewma_sql_terms() -> tuple[str, str]:
    nums, dens = [], []
    for k in range(_EWMA_LOOKBACK):
        wk = repr((1.0 - _EWMA_ALPHA) ** k)
        xk = "value" if k == 0 else f"lag(value, {k}) OVER w"
        nums.append(f"CASE WHEN {xk} IS NOT NULL THEN {xk} * {wk} ELSE 0.0 END")
        dens.append(f"CASE WHEN {xk} IS NOT NULL THEN {wk} ELSE 0.0 END")
    return " + ".join(nums), " + ".join(dens)


def _q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.timeseries import ewma

    t = tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") <= 20)
    return (
        ewma(
            ev, "user_id", "ts", "value",
            _EWMA_ALPHA, _EWMA_LOOKBACK, tiebreak_col="event_id",
        )
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
            "ewma",
        )
        .orderBy("user_id", "event_id")
    )


_Q_EWMA_SQL = f"""
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       value,
       ROUND(({_ewma_sql_terms()[0]}) / ({_ewma_sql_terms()[1]}), 6) AS ewma
FROM events
WHERE user_id <= 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


TIMESERIES_QUERIES: list[QuerySpec] = [
    QuerySpec("q_scd2", "SCD2 validity intervals from a change stream", _q_scd2, _Q_SCD2_SQL),
    QuerySpec("q_gapfill", "time-grid gap-fill with forward fill (locf)", _q_gapfill, _Q_GAPFILL_SQL),
    QuerySpec("q_exact_corr", "Pearson corr/covar from decimal-exact sums", _q_exact_corr, _Q_EXACT_CORR_SQL),
    QuerySpec("q_time_rollup", "multi-granularity rollup in one grouping-sets pass", _q_time_rollup, _Q_TIME_ROLLUP_SQL),
    QuerySpec("q_sessionize", "gap-based sessionization, per-session stats", _q_sessionize, _Q_SESSIONIZE_SQL),
    QuerySpec("q_zscore_outliers", "rolling z-score anomaly screen (exact sums)", _q_zscore_outliers, _Q_ZSCORE_SQL),
    QuerySpec("q_ewma", "finite-window EWMA smoothing per key", _q_ewma, _Q_EWMA_SQL),
    QuerySpec("q_corr_matrix", "all-pairs Pearson correlation matrix in one aggregate pass", _q_corr_matrix, _Q_CORR_MATRIX_SQL),
]


# --- Kaplan-Meier time-to-conversion survival -----------------------------
def _q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve of click->next-purchase latency in hours, right-
    censoring clicks with no later purchase at the user's last observed
    event — the churn/conversion-analysis staple, built on
    operators/timeseries.kaplan_meier over a duration-cardinality table."""
    from pyspark.sql import Window

    from lakehouse_architecture_spark.operators.timeseries import kaplan_meier

    t = tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = t["events"].select(
        "user_id", "event_type", "event_id", us.alias("us")
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"), F.col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w_all = Window.partitionBy("user_id")
    enriched = ev.withColumn(
        "next_p",
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).over(w_next),
    ).withColumn("l_user", F.max("us").over(w_all))
    clicks = enriched.filter(F.col("event_type") == "click").select(
        F.expr("(coalesce(next_p, l_user) - us) div 3600000000").alias("t"),
        F.col("next_p").isNotNull().cast("int").alias("e"),
    )
    return kaplan_meier(clicks, "t", "e")


_Q_KAPLAN_MEIER_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us FROM events
),
enriched AS (
  SELECT user_id, event_type, us,
         MIN(CASE WHEN event_type = 'purchase' THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p,
         MAX(us) OVER (PARTITION BY user_id) AS l_user
  FROM ev
),
life AS (
  SELECT (COALESCE(next_p, l_user) - us) // 3600000000 AS t,
         CASE WHEN next_p IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM enriched WHERE event_type = 'click'
),
counts AS (
  SELECT t, CAST(SUM(e) AS BIGINT) AS d, COUNT(*) AS c FROM life GROUP BY t
),
wr AS (
  SELECT t, d, c, CAST(SUM(c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
  FROM counts
),
ev2 AS (
  SELECT t, d, n_risk,
         MAX(CASE WHEN CAST(n_risk - d AS DOUBLE) / n_risk = 0
                  THEN 1 ELSE 0 END) OVER (ORDER BY t ASC) AS zs,
         SUM(CASE WHEN CAST(n_risk - d AS DOUBLE) / n_risk > 0
                  THEN LN(CAST(n_risk - d AS DOUBLE) / n_risk) END)
           OVER (ORDER BY t ASC) AS ls
  FROM wr WHERE d > 0
)
SELECT t, n_risk, d,
       CASE WHEN zs = 1 THEN 0.0 ELSE ROUND(EXP(ls), 6) END AS survival
FROM ev2 ORDER BY t
"""


# defined below the list it joins: appended at import, keeping the family
# declaration in one file without reordering the module
TIMESERIES_QUERIES.append(
    QuerySpec("q_kaplan_meier", "right-censored user-lifetime survival curve", _q_kaplan_meier, _Q_KAPLAN_MEIER_SQL)
)
