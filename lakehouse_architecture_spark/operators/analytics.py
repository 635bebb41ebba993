"""Event-stream analytics operators: path transitions, attribution,
out-of-order diagnostics.

The reference ships raw event-shaped data to BI (SURVEY.md §3 EP3); these
are the standard product-analytics queries a warehouse serves over such a
table, built scale-first: every window partitions by the entity key
(user), never a global ordering, so state per task is one user's events
and the shuffle is the same single hash-partition-by-user every
sessionization job already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts between consecutive events of
    each user: (prev_type, next_type, n, prob) with ``prob`` normalized per
    prev_type. One window partitioned by user + one hash aggregate; the
    transition matrix is |types|² rows — a broadcastable serving table.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    steps = df.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = steps.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    total = Window.partitionBy("prev_type")
    return counts.withColumn(
        "prob", F.round(F.col("n") / F.sum("n").over(total), 6)
    )


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str,
    touch_type: str,
    max_lag_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Attribute each conversion event to the user's most recent preceding
    touch event within ``max_lag_seconds`` (last-touch model). Output: one
    row per conversion with the attributed touch id/ts (NULL = organic).

    Implemented as a per-user window over the interleaved event stream —
    ``last(touch, ignorenulls=True)`` over rows-unbounded-preceding — so it
    is one shuffle on user, not a range self-join; the window state is one
    running value per user regardless of history length.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col) == touch_type
    touch_id = F.last(F.when(is_touch, F.col(id_col)), ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True).over(w)
    in_window = (
        F.col(ts_col).cast("double") - F.col("__touch_ts").cast("double")
        <= max_lag_seconds
    )
    return (
        df.withColumn("__touch_id", touch_id)
        .withColumn("__touch_ts", touch_ts)
        .filter(F.col(type_col) == conversion_type)
        .select(
            F.col(id_col).alias("conversion_id"),
            F.col(user_col),
            F.when(in_window, F.col("__touch_id")).alias("touch_id"),
            F.when(in_window, F.col("__touch_ts")).alias("touch_ts"),
        )
    )


def out_of_order_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Watermark-health diagnostic: per ``group_col``, how many events
    arrived out of order within their key's stream (event time < the
    running max of earlier-arriving events, arrival order = ``seq_col``),
    and the worst lateness. This is the measurement that sizes a streaming
    watermark delay before deploying one. ``max_lateness`` is returned
    unrounded, in whatever unit ``ts_col`` subtracts in (pass epoch micros
    for exact integer arithmetic; the caller scales to seconds).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(seq_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    high = F.max(F.col(ts_col)).over(w)
    lateness = F.when(
        F.col("__high").isNotNull() & (F.col(ts_col) < F.col("__high")),
        F.col("__high").cast("double") - F.col(ts_col).cast("double"),
    ).otherwise(F.lit(0.0))
    flagged = df.withColumn("__high", high).withColumn("__late_s", lateness)
    return flagged.groupBy(group_col).agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("__late_s") > 0).cast("bigint")).alias("n_late"),
        F.round(
            F.sum((F.col("__late_s") > 0).cast("bigint")) / F.count("*"), 6
        ).alias("late_ratio"),
        F.max("__late_s").alias("max_lateness"),
    )


def multi_touch_attribution(
    df: DataFrame,
    conversion_type: str,
    touch_type: str,
    max_lag_seconds: int,
    model: str = "linear",
    half_life_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Fractional conversion credit across ALL touches in the lookback
    window — ``linear`` (equal split) or ``time_decay`` (half-life
    exponential, normalized per conversion). Output: one row per
    (conversion, touch) with lag and weight; weights per conversion sum
    to ~1.

    Unlike last-touch (a pure window), multi-touch must enumerate the
    (touch, conversion) pairs — a per-user equi-join with a range filter,
    bounded by touches-per-user-per-window; for hot users compose with
    the bucketed range-join pattern (operators/relational.range_join).
    Timestamps compare as exact epoch-micros integers; the decay
    normalizer sums through decimal so weights are partition-order
    independent.
    """
    if model not in ("linear", "time_decay"):
        raise ValueError(f"model must be linear|time_decay: {model}")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    conv = df.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("conversion_id"),
        us.alias("cus"),
    )
    touch = df.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("touch_id"),
        us.alias("tus"),
    )
    lag_us = F.col("cus") - F.col("tus")
    pairs = conv.join(touch, "u").filter(
        (F.col("tus") < F.col("cus"))
        & (lag_us <= int(max_lag_seconds) * 1_000_000)
    )
    if model == "linear":
        w_raw = F.lit(1.0)
    else:
        w_raw = F.pow(
            F.lit(0.5),
            lag_us.cast("double") / (int(half_life_seconds) * 1_000_000),
        )
    wnorm = Window.partitionBy("conversion_id")
    norm = F.sum(w_raw.cast("decimal(38,18)")).over(wnorm).cast("double")
    return pairs.select(
        "conversion_id",
        F.col("u").alias(user_col),
        "touch_id",
        F.expr("(cus - tus) div 1000000").alias("lag_seconds"),
        F.round(w_raw / norm, 6).alias("weight"),
    )


def ab_test_summary(
    df: DataFrame,
    arm_col: str,
    metric_col: str,
    control: object = 0,
    treatment: object = 1,
) -> DataFrame:
    """Two-sample experiment readout in ONE aggregate pass: per-arm n,
    decimal-exact means and variances, the difference, Welch's t statistic
    and Satterthwaite degrees of freedom.

    All moments come from conditional decimal sums (Σx, Σx² per arm) in a
    single hash aggregate — no per-arm scans, no collect; the variance
    uses the (Σx² − n·mean²)/(n−1) identity with the same expression order
    on both engines. Inference (p-value lookup) stays with the caller —
    the statistic is the engine's job, the t-distribution table is not.
    """
    from lakehouse_architecture_spark.functions.aggregates import DECIMAL

    x = F.col(metric_col)
    in_a = F.col(arm_col) == F.lit(control)
    in_b = F.col(arm_col) == F.lit(treatment)

    def arm_aggs(cond, tag):
        xa = F.when(cond, x)
        return [
            F.count(xa).alias(f"n_{tag}"),
            F.sum(xa.cast(DECIMAL)).cast("double").alias(f"s_{tag}"),
            F.sum((xa * xa).cast(DECIMAL)).cast("double").alias(f"ss_{tag}"),
        ]

    agg = df.filter(x.isNotNull()).agg(*arm_aggs(in_a, "a"), *arm_aggs(in_b, "b"))
    mean = lambda t: F.col(f"s_{t}") / F.col(f"n_{t}")
    var = lambda t: (
        F.col(f"ss_{t}") - F.col(f"n_{t}") * mean(t) * mean(t)
    ) / (F.col(f"n_{t}") - 1)
    se2 = var("a") / F.col("n_a") + var("b") / F.col("n_b")
    t_stat = (mean("b") - mean("a")) / F.sqrt(se2)
    df_welch = (se2 * se2) / (
        (var("a") / F.col("n_a")) * (var("a") / F.col("n_a")) / (F.col("n_a") - 1)
        + (var("b") / F.col("n_b")) * (var("b") / F.col("n_b")) / (F.col("n_b") - 1)
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(mean("a"), 6).alias("mean_a"),
        F.round(mean("b"), 6).alias("mean_b"),
        F.round(mean("b") - mean("a"), 6).alias("diff"),
        F.round(var("a"), 6).alias("var_a"),
        F.round(var("b"), 6).alias("var_b"),
        F.round(t_stat, 6).alias("welch_t"),
        F.round(df_welch, 6).alias("df_welch"),
    )


def cooccurrence_cosine(
    df: DataFrame,
    entity_col: str,
    item_col: str,
) -> DataFrame:
    """Item-item cosine similarity on entity-incidence vectors:
    cos(a,b) = |entities with both| / sqrt(|with a| · |with b|).

    Distinct (entity, item) pairs self-join ON THE ENTITY — per-entity
    fan-out is bounded by that entity's distinct item count (cap upstream
    for power users), never an all-pairs item join; totals broadcast back
    onto the |items|² (tiny) pair table.
    """
    pairs = df.select(
        F.col(entity_col).alias("__e"), F.col(item_col).alias("__i")
    ).distinct()
    totals = pairs.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    a = pairs.select("__e", F.col("__i").alias("item_a"))
    b = pairs.select("__e", F.col("__i").alias("item_b"))
    both = (
        a.join(b, on="__e")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        both.join(
            F.broadcast(totals.select(F.col("__i").alias("item_a"), F.col("__n").alias("__na"))),
            on="item_a",
        )
        .join(
            F.broadcast(totals.select(F.col("__i").alias("item_b"), F.col("__n").alias("__nb"))),
            on="item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_both",
            F.round(
                F.col("n_both")
                / F.sqrt(F.col("__na").cast("double") * F.col("__nb")),
                6,
            ).alias("cosine"),
        )
    )
