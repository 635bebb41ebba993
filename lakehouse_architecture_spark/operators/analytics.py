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


def cuped_adjusted(
    df: DataFrame,
    arm_col: str,
    metric_col: str,
    covariate_col: str,
    control: object = 0,
    treatment: object = 1,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker, WSDM 2013): adjust each unit's metric with its PRE-experiment
    covariate, y' = y − θ·(x − x̄) with θ = cov(x, y)/var(x), and read the
    arm difference off the adjusted metric. θ is fit POOLED across arms
    (the standard, unbiased-under-randomization choice); units with no
    pre-period (NULL covariate) contribute their raw metric unadjusted —
    equivalent to imputing x̄, the mean-preserving convention.

    Everything reduces to ONE hash-aggregate pass of decimal-exact
    conditional sums (Σx, Σy, Σxy, Σx², per-arm Σy, Σy², and the same
    restricted to covariate-present units) + double algebra identical on
    both engines — the ab_test_summary discipline extended with the
    cross-moment. Output one row: θ, per-arm adjusted means, raw and
    adjusted diffs, raw and adjusted pooled variance of the metric, and
    the variance-reduction fraction 1 − var(y')/var(y) (the whole point:
    at equal traffic the experiment reads as if it had 1/(1−VR)× the
    sample).
    """
    from lakehouse_architecture_spark.functions.aggregates import DECIMAL

    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    in_a = F.col(arm_col) == F.lit(control)
    in_b = F.col(arm_col) == F.lit(treatment)
    has_x = x.isNotNull()

    def dsum(c, name):
        return F.sum(c.cast(DECIMAL)).cast("double").alias(name)

    agg = df.filter(y.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(has_x, 1)).alias("n_x"),
        dsum(F.when(has_x, x), "sx"),
        dsum(F.when(has_x, y), "sy_x"),
        dsum(F.when(has_x, x * y), "sxy"),
        dsum(F.when(has_x, x * x), "sxx"),
        F.count(F.when(in_a, 1)).alias("n_a"),
        F.count(F.when(in_b, 1)).alias("n_b"),
        dsum(F.when(in_a, y), "sy_a"),
        dsum(F.when(in_b, y), "sy_b"),
        dsum(y, "sy"),
        dsum(y * y, "syy"),
        # adjusted-metric moments need θ, which needs this same pass — so
        # carry the per-arm covariate sums and assemble y' algebraically:
        # the arm correction with the POOLED x̄ is θ·(Σx_arm − n_x_arm·x̄)
        F.count(F.when(in_a & has_x, 1)).alias("nx_a"),
        F.count(F.when(in_b & has_x, 1)).alias("nx_b"),
        dsum(F.when(in_a & has_x, x), "sx_a"),
        dsum(F.when(in_b & has_x, x), "sx_b"),
    )
    xbar = F.col("sx") / F.col("n_x")
    # covariance/variance over covariate-present units (population form —
    # the ratio is scale-free so n vs n-1 cancels)
    cov = F.col("sxy") - xbar * F.col("sy_x")
    varx = F.col("sxx") - xbar * F.col("sx")
    theta = cov / varx
    adj_a = (F.col("sy_a") - theta * (F.col("sx_a") - F.col("nx_a") * xbar)) / F.col("n_a")
    adj_b = (F.col("sy_b") - theta * (F.col("sx_b") - F.col("nx_b") * xbar)) / F.col("n_b")
    mean_a = F.col("sy_a") / F.col("n_a")
    mean_b = F.col("sy_b") / F.col("n_b")
    ybar = F.col("sy") / F.col("n")
    var_y = (F.col("syy") - F.col("n") * ybar * ybar) / (F.col("n") - 1)
    # Σy'² = Σy² − 2θ(Σxy − x̄Σy_x) + θ²(Σx² − 2x̄Σx + n_x·x̄²): the
    # correction touches only covariate-present units (the others keep
    # raw y), and every moment in it is already restricted to has_x
    syy_adj = (
        F.col("syy")
        - 2 * theta * (F.col("sxy") - xbar * F.col("sy_x"))
        + theta * theta * (F.col("sxx") - 2 * xbar * F.col("sx") + F.col("n_x") * xbar * xbar)
    )
    # Σy' = Σy globally: θ·Σ(x−x̄) over covariate-present units is θ·0
    ybar_adj = F.col("sy") / F.col("n")
    var_yadj = (syy_adj - F.col("n") * ybar_adj * ybar_adj) / (F.col("n") - 1)
    return agg.select(
        "n",
        "n_a",
        "n_b",
        F.round(theta, 6).alias("theta"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(mean_b - mean_a, 6).alias("diff_raw"),
        F.round(adj_a, 6).alias("adj_mean_a"),
        F.round(adj_b, 6).alias("adj_mean_b"),
        F.round(adj_b - adj_a, 6).alias("diff_adj"),
        F.round(var_y, 6).alias("var_y"),
        F.round(var_yadj, 6).alias("var_y_adj"),
        F.round(1 - var_yadj / var_y, 6).alias("var_reduction"),
    )


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    period_col: str,
    metric_col: str,
) -> DataFrame:
    """Difference-in-differences readout: with ``group_col`` ∈ {0=control,
    1=treated} and ``period_col`` ∈ {0=pre, 1=post}, the DiD estimate is
    (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre) — the parallel-trends
    causal estimate of Card & Krueger 1994. One hash aggregate of four
    conditional decimal sums; output one row with the four cell means,
    cell sizes, and the estimate.
    """
    from lakehouse_architecture_spark.functions.aggregates import DECIMAL

    y = F.col(metric_col).cast("double")
    cells = {}
    for g in (0, 1):
        for p in (0, 1):
            tag = f"{'t' if g else 'c'}_{'post' if p else 'pre'}"
            cond = (F.col(group_col) == g) & (F.col(period_col) == p)
            cells[tag] = cond
    agg = df.filter(y.isNotNull()).agg(
        *[F.count(F.when(c, 1)).alias(f"n_{t}") for t, c in cells.items()],
        *[
            F.sum(F.when(c, y).cast(DECIMAL)).cast("double").alias(f"s_{t}")
            for t, c in cells.items()
        ],
    )
    m = {t: F.col(f"s_{t}") / F.col(f"n_{t}") for t in cells}
    did = (m["t_post"] - m["t_pre"]) - (m["c_post"] - m["c_pre"])
    return agg.select(
        *[F.col(f"n_{t}") for t in cells],
        *[F.round(m[t], 6).alias(f"mean_{t}") for t in cells],
        F.round(did, 6).alias("did"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration curve + Brier decomposition (Murphy 1973) for a
    probabilistic score against a binary outcome — the model-eval
    counterpart of psi_drift, with the same fixed-LITERAL-bin discipline
    (bin = floor(score·n_bins) clamped to [0, n_bins−1]; no coordination
    pass, additive cells, mergeable across shards).

    Per-bin rows (bin ≥ 0): n, mean_score, event_rate. Summary row
    (bin = −1): n = N, mean_score / event_rate = overall, plus the
    decomposition over the binned forecasts — reliability
    Σ n_b(s̄_b−ō_b)²/N (calibration error, 0 is perfect), resolution
    Σ n_b(ō_b−ō)²/N (how much the bins separate outcomes), uncertainty
    ō(1−ō), and the binned Brier = REL − RES + UNC. Per-bin means are
    rounded to 9 dp before the quadratic terms so both engines square
    identical doubles.
    """
    from lakehouse_architecture_spark.functions.aggregates import DECIMAL

    s = F.col(score_col).cast("double")
    yv = F.col(label_col).cast("int")
    b = F.least(
        F.greatest(F.floor(s * n_bins).cast("int"), F.lit(0)), F.lit(n_bins - 1)
    )
    cells = (
        df.filter(s.isNotNull() & yv.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s.cast(DECIMAL)).cast("double").alias("ss"),
            F.sum(yv.cast("long")).alias("sy"),
        )
        .select(
            "bin",
            "n",
            F.round(F.col("ss") / F.col("n"), 9).alias("mean_score"),
            F.round(F.col("sy").cast("double") / F.col("n"), 9).alias("event_rate"),
            "ss",
            "sy",
        )
    )
    from lakehouse_architecture_spark.materialize import materialize_small

    cells = materialize_small(cells)
    # totals re-sum the per-bin DECIMAL-exact sums (not the rounded
    # per-bin means), and every quadratic term is rounded to 9 dp before
    # the decimal re-sum — the psi_drift discipline that keeps a
    # float fold over bins partition-order-independent and engine-exact
    rel_term = F.round(
        F.col("n") * (F.col("mean_score") - F.col("event_rate"))
        * (F.col("mean_score") - F.col("event_rate")),
        9,
    )
    tot = cells.agg(
        F.sum("n").alias("n"),
        (F.sum(F.col("ss").cast(DECIMAL)).cast("double") / F.sum("n")).alias(
            "mean_score"
        ),
        (F.sum("sy").cast("double") / F.sum("n")).alias("event_rate"),
        (F.sum(rel_term.cast(DECIMAL)).cast("double") / F.sum("n")).alias(
            "reliability"
        ),
    )
    # resolution needs the grand rate, which tot just computed — join the
    # 1-row frames (broadcast, driver-trivial); the grand rate is rounded
    # to 9 dp so both engines square the identical double
    grand = tot.select(F.round(F.col("event_rate"), 9).alias("__g"))
    res_term = F.round(
        F.col("n") * (F.col("event_rate") - F.col("__g"))
        * (F.col("event_rate") - F.col("__g")),
        9,
    )
    res = (
        cells.crossJoin(F.broadcast(grand))
        .agg(
            (F.sum(res_term.cast(DECIMAL)).cast("double") / F.sum("n")).alias(
                "resolution"
            )
        )
    )
    summary = tot.crossJoin(F.broadcast(res)).select(
        F.lit(-1).alias("bin"),
        "n",
        F.round("mean_score", 6).alias("mean_score"),
        F.round("event_rate", 6).alias("event_rate"),
        F.round("reliability", 6).alias("reliability"),
        F.round("resolution", 6).alias("resolution"),
        F.round(F.col("event_rate") * (1 - F.col("event_rate")), 6).alias("uncertainty"),
        F.round(
            F.col("reliability")
            - F.col("resolution")
            + F.col("event_rate") * (1 - F.col("event_rate")),
            6,
        ).alias("brier"),
    )
    per_bin = cells.select(
        "bin",
        "n",
        F.round("mean_score", 6).alias("mean_score"),
        F.round("event_rate", 6).alias("event_rate"),
        F.lit(None).cast("double").alias("reliability"),
        F.lit(None).cast("double").alias("resolution"),
        F.lit(None).cast("double").alias("uncertainty"),
        F.lit(None).cast("double").alias("brier"),
    )
    return per_bin.unionByName(summary).orderBy("bin")


def shapley_coalition_pairs(
    channels: tuple[str, ...],
) -> list[tuple[str, str, str, float]]:
    """The exact Shapley coalition-pair table for a declared channel set:
    one row per (channel i, S ⊆ C∖{i}) — (channel, key(S), key(S∪{i}),
    weight |S|!·(k−|S|−1)!/k! rounded to 12 dp). Shared by
    :func:`shapley_attribution` and the SQL oracle generator so both
    engines fold the IDENTICAL literal weights."""
    import itertools
    import math

    k = len(channels)
    ch = sorted(channels)
    pairs = []
    for i in ch:
        others = [c for c in ch if c != i]
        for r in range(len(others) + 1):
            for s in itertools.combinations(others, r):
                w = (
                    math.factorial(len(s)) * math.factorial(k - len(s) - 1)
                    / math.factorial(k)
                )
                pairs.append(
                    (i, ",".join(sorted(s)), ",".join(sorted(s + (i,))), round(w, 12))
                )
    return pairs


def shapley_attribution(
    df: DataFrame,
    user_col: str,
    channel_col: str,
    conversion_value,
    channels: tuple[str, ...],
) -> DataFrame:
    """Exact Shapley-value channel attribution (Shapley 1953; the
    data-driven attribution of Zhao, Mahboobi & Bagheri 2018): each
    channel's credit is its average marginal contribution to the
    conversion rate across every coalition of the other channels,
    φ_i = Σ_{S ⊆ C∖{i}} |S|!·(k−|S|−1)!/k! · [v(S∪{i}) − v(S)],
    with v(S) = conversion rate among users whose touched-channel set is
    exactly S (unobserved coalitions contribute v = 0, the standard
    convention for exact-set attribution).

    ``channels`` is a DECLARED literal tuple (the psi_drift fixed-bins
    discipline — no coordination pass to discover the universe), capped
    at 12 because the coalition table is 2^k rows; the heavy work is ONE
    per-user hash aggregate (set assembly) + one |sets|-cardinality
    aggregate — both corpus-sized steps are single-shuffle. The Shapley
    sum itself runs over the 2^k×k literal pair table joined (broadcast)
    against the |sets| rate rows: driver-trivial at any corpus size.
    Rates are rounded to 9 dp, weights are exact rationals rounded to 12
    dp, and the per-channel fold decimal-sums the rounded products, so
    the result is engine-exact. Returns (channel, phi) ordered by
    channel.
    """
    from lakehouse_architecture_spark.functions.aggregates import DECIMAL

    k = len(channels)
    if not 1 <= k <= 12:
        raise ValueError(f"shapley_attribution needs 1-12 declared channels, got {k}")
    ch = sorted(channels)
    per_user = (
        df.select(
            F.col(user_col).alias("__u"),
            F.col(channel_col).alias("__c"),
            conversion_value.cast("int").alias("__y"),
        )
        .groupBy("__u")
        .agg(
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.collect_list(
                            F.when(F.col("__c").isin(*ch), F.col("__c"))
                        )
                    )
                ),
                ",",
            ).alias("set_key"),
            F.max("__y").alias("converted"),
        )
    )
    rates = per_user.groupBy("set_key").agg(
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)), 9
        ).alias("v")
    )
    pairs = shapley_coalition_pairs(channels)
    spark = df.sparkSession
    pair_df = spark.createDataFrame(
        pairs, "channel string, without_key string, with_key string, weight double"
    )
    rw = rates.withColumnRenamed("set_key", "with_key").withColumnRenamed("v", "v_with")
    ro = rates.withColumnRenamed("set_key", "without_key").withColumnRenamed("v", "v_without")
    joined = (
        pair_df.join(F.broadcast(rw), "with_key", "left")
        .join(F.broadcast(ro), "without_key", "left")
        .select(
            "channel",
            F.round(
                F.col("weight")
                * (F.coalesce("v_with", F.lit(0.0)) - F.coalesce("v_without", F.lit(0.0))),
                12,
            ).alias("term"),
        )
    )
    return (
        joined.groupBy("channel")
        .agg(
            F.round(
                F.sum(F.col("term").cast("decimal(38,12)")).cast("double"), 6
            ).alias("phi")
        )
        .orderBy("channel")
    )


def smd_balance(
    df: DataFrame,
    arm_col: str,
    covariates: list[str],
    arm_a: str = "a",
    arm_b: str = "b",
) -> DataFrame:
    """Covariate balance table for an experiment split: per covariate, the
    standardized mean difference SMD = (μ_a − μ_b) / √((s²_a + s²_b)/2)
    (Austin 2009 — |SMD| < 0.1 is the conventional "balanced" bar). The
    pre-flight companion of :func:`cuped_adjusted` / :func:`diff_in_diff`:
    a randomization or hash-split whose SMDs are large is broken before
    any effect estimate is read.

    ONE moment aggregate over the corpus (4 conditional sums per
    covariate), unpivoted to a |covariates|-row tall table via ``stack``.
    Sample variance from decimal-exact sums. Returns one row per
    covariate: (covariate, n_a, n_b, mean_a, mean_b, smd).

    Covariate names are spliced into generated aliases and a ``stack``
    expression, so they are validated up front (ADVICE r13): a quote,
    space, dash, or dot would otherwise surface as an opaque
    AnalysisException deep in the plan instead of a clear contract error.
    """
    import re as _re

    if not covariates:
        raise ValueError("covariates must name at least one column")
    for c in covariates:
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c):
            raise ValueError(
                "smd_balance covariate names must be plain identifiers "
                f"([A-Za-z_][A-Za-z0-9_]*); got {c!r} — alias the column "
                "before calling"
            )
    in_a = F.col(arm_col) == arm_a
    in_b = F.col(arm_col) == arm_b

    def moments(c: str, side, tag: str):
        x = F.when(side, F.col(c).cast("double"))
        d = lambda col: col.cast("decimal(38,6)")  # noqa: E731
        return [
            F.count(x).alias(f"n_{tag}_{c}"),
            F.sum(d(x)).cast("double").alias(f"s_{tag}_{c}"),
            F.sum(d(x * x)).cast("double").alias(f"q_{tag}_{c}"),
        ]

    aggs = []
    for c in covariates:
        aggs += moments(c, in_a, "a") + moments(c, in_b, "b")
    row = df.agg(*aggs)
    cells = []
    for c in covariates:
        cells += [
            f"'{c}'", f"n_a_{c}", f"s_a_{c}", f"q_a_{c}",
            f"n_b_{c}", f"s_b_{c}", f"q_b_{c}",
        ]
    tall = row.select(
        F.expr(
            f"stack({len(covariates)}, {', '.join(cells)}) AS "
            "(covariate, n_a, s_a, q_a, n_b, s_b, q_b)"
        )
    )
    mean = lambda s, n: F.col(s) / F.col(n)  # noqa: E731
    var = lambda s, q, n: (  # noqa: E731
        (F.col(q) - F.col(s) * F.col(s) / F.col(n)) / (F.col(n) - 1)
    )
    den = F.sqrt((var("s_a", "q_a", "n_a") + var("s_b", "q_b", "n_b")) / 2)
    return tall.select(
        "covariate",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(mean("s_a", "n_a"), 6).alias("mean_a"),
        F.round(mean("s_b", "n_b"), 6).alias("mean_b"),
        F.round(
            F.when(den > 0, (mean("s_a", "n_a") - mean("s_b", "n_b")) / den), 6
        ).alias("smd"),
    ).orderBy("covariate")


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected: dict[str, float],
) -> DataFrame:
    """Sample-ratio-mismatch check (Fabijan et al. 2019 — the single most
    common A/B-test invalidator): χ² goodness-of-fit of observed arm
    counts against the design ratios. One hash aggregate at |arms|
    cardinality; each (o−e)²/e term is rounded to 9 dp and decimal-summed
    so both engines fold identically. Returns one row per arm plus the
    shared statistic: (arm, observed, expected_n, chi2).

    The χ² threshold is the caller's policy (at 1 dof, SRM alarms
    conventionally fire at χ² > 10.8, p < 0.001); this emits the
    statistic, not a verdict.

    Observed counts are densified against the EXPECTED arm set (round 14,
    ADVICE r13): an arm in the design that received zero traffic still
    contributes its (0−e)²/e term and its output row — that arm is the
    most extreme mismatch the check exists to catch, and a groupBy over
    the data alone would silently omit it.
    """
    arms = sorted(expected)
    spark = df.sparkSession
    design = spark.createDataFrame(
        [(a, float(expected[a])) for a in arms], "arm string, ratio double"
    )
    counts = (
        df.filter(F.col(arm_col).isin(arms))
        .groupBy(F.col(arm_col).alias("arm"))
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    dense = F.broadcast(design).join(counts, "arm", "left").select(
        "arm",
        F.coalesce("observed", F.lit(0)).cast("long").alias("observed"),
        "ratio",
    )
    tot = dense.agg(F.sum("observed").alias("n_total"))
    cells = dense.crossJoin(F.broadcast(tot)).select(
        "arm",
        "observed",
        (F.col("ratio") * F.col("n_total")).alias("expected_n"),
    )
    term = F.round(
        (F.col("observed") - F.col("expected_n"))
        * (F.col("observed") - F.col("expected_n"))
        / F.col("expected_n"),
        9,
    ).cast("decimal(38,9)")
    chi2 = cells.agg(F.round(F.sum(term).cast("double"), 6).alias("chi2"))
    return (
        cells.crossJoin(F.broadcast(chi2))
        .select(
            "arm",
            "observed",
            F.round("expected_n", 6).alias("expected_n"),
            "chi2",
        )
        .orderBy("arm")
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's κ inter-rater agreement (Cohen 1960): κ = (p_o − p_e) /
    (1 − p_e), observed agreement vs the agreement two independent raters
    with the same marginals would reach by chance. The standard QA
    statistic for LLM training-data labeling (heuristic labeler vs model
    labeler, or two annotators).

    One hash aggregate to the |labels|² confusion table, marginals and
    the κ algebra on that broadcastable derivative; p_o and every
    marginal product are ratios of exact integers. Returns one row:
    (n, n_labels, po, pe, kappa).
    """
    cells = (
        df.filter(
            F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
        )
        .groupBy(
            F.col(rater_a_col).alias("la"), F.col(rater_b_col).alias("lb")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("c")).otherwise(0)).alias(
            "agree"
        ),
    )
    ra = cells.groupBy("la").agg(F.sum("c").alias("ca"))
    rb = cells.groupBy("lb").agg(F.sum("c").alias("cb"))
    pe_terms = (
        ra.join(rb, ra["la"] == rb["lb"])
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.col("ca").cast("double")
                * F.col("cb")
                / (F.col("n").cast("double") * F.col("n")),
                9,
            ).cast("decimal(38,9)").alias("t")
        )
        # coalesce: raters sharing NO label (disjoint vocabularies) have
        # zero chance agreement, not NULL (empty-join sum)
        .agg(F.coalesce(F.sum("t"), F.lit(0)).cast("double").alias("pe"))
    )
    labels = (
        cells.select(F.col("la").alias("l"))
        .unionByName(cells.select(F.col("lb").alias("l")))
        .agg(F.count_distinct("l").alias("n_labels"))
    )
    po = F.col("agree").cast("double") / F.col("n")
    return (
        tot.crossJoin(F.broadcast(pe_terms))
        .crossJoin(F.broadcast(labels))
        .select(
            "n",
            "n_labels",
            F.round(po, 6).alias("po"),
            F.round("pe", 6).alias("pe"),
            # pe == 1 -> kappa undefined (0/0 is NaN in Spark, not NULL in
            # every engine) — emit NULL explicitly in both
            F.round(
                F.when(F.col("pe") < 1, (po - F.col("pe")) / (1 - F.col("pe"))),
                6,
            ).alias("kappa"),
        )
    )


def mcnemar_test(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    positive: str,
) -> DataFrame:
    """McNemar's χ² (McNemar 1947) for two PAIRED binary labelers — the
    marginal-homogeneity companion of :func:`cohens_kappa` (κ asks "do
    they agree?"; McNemar asks "does one labeler fire systematically more
    than the other?" — exactly the question when swapping a heuristic
    labeler for a model labeler): χ² = (b − c)² / (b + c) over the two
    DISCORDANT cells b = a-pos/b-neg, c = a-neg/b-pos.

    One hash aggregate (4 conditional sums); NULL-labeled rows excluded
    on BOTH raters so the pair set is well-defined. Returns one row:
    (n, b, c, chi2) — chi2 NULL when b + c = 0 (no discordant pairs).
    """
    pa = F.col(rater_a_col) == positive
    pb = F.col(rater_b_col) == positive
    agg = (
        df.filter(
            F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(pa & ~pb, 1).otherwise(0)).cast("long").alias("b"),
            F.sum(F.when(~pa & pb, 1).otherwise(0)).cast("long").alias("c"),
        )
    )
    num = (F.col("b") - F.col("c")) * (F.col("b") - F.col("c"))
    den = (F.col("b") + F.col("c")).cast("double")
    return agg.select(
        "n",
        "b",
        "c",
        F.round(F.when(den > 0, num / den), 6).alias("chi2"),
    )


def matthews_corr(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    positive: str,
) -> DataFrame:
    """Matthews correlation coefficient (Matthews 1975) between two
    binary labelers, treating rater a as truth and rater b as prediction:
    MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN)) — the
    balanced single-number agreement score that, unlike accuracy, does
    not saturate on skewed label distributions (the normal state of
    quality-filter labels).

    One hash aggregate (4 conditional sums); every product is computed in
    double (the bigint product of four ~n/2 counts overflows 2^63 well
    before 100 TB row counts). Returns one row: (n, tp, fp, fn, tn, mcc)
    — mcc NULL when any marginal is 0 (undefined 0/0).
    """
    pa = F.col(rater_a_col) == positive
    pb = F.col(rater_b_col) == positive
    agg = (
        df.filter(
            F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(pa & pb, 1).otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when(~pa & pb, 1).otherwise(0)).cast("long").alias("fp"),
            F.sum(F.when(pa & ~pb, 1).otherwise(0)).cast("long").alias("fn"),
            F.sum(F.when(~pa & ~pb, 1).otherwise(0)).cast("long").alias("tn"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    den = F.sqrt(
        (d("tp") + d("fp"))
        * (d("tp") + d("fn"))
        * (d("tn") + d("fp"))
        * (d("tn") + d("fn"))
    )
    return agg.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            F.when(den > 0, (d("tp") * d("tn") - d("fp") * d("fn")) / den), 6
        ).alias("mcc"),
    )


def gwet_ac1(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Gwet's AC1 agreement coefficient (Gwet 2008) — the
    prevalence-robust alternative to :func:`cohens_kappa`: κ collapses
    toward 0 when one label dominates (the "kappa paradox", endemic to
    quality-filter labels where 95 %+ of documents pass); AC1's chance
    term e_γ = Σ_q π_q(1 − π_q) / (Q − 1) with π_q the MEAN of the two
    raters' marginal shares stays calibrated there.
    AC1 = (p_o − e_γ) / (1 − e_γ).

    One hash aggregate to the |labels|² confusion table; marginals and
    the algebra on that broadcastable derivative, each π term rounded to
    9 dp and decimal-summed. Returns one row: (n, n_labels, po, pe_gamma,
    ac1) — ac1 NULL when e_γ = 1 (degenerate single-label data).
    """
    cells = (
        df.filter(
            F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
        )
        .groupBy(
            F.col(rater_a_col).alias("la"), F.col(rater_b_col).alias("lb")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.sum(
            F.when(F.col("la") == F.col("lb"), F.col("c")).otherwise(0)
        ).alias("agree"),
    )
    # label universe = union of both raters' vocabularies; a label one
    # rater never uses still enters e_gamma with that rater's share 0
    ra = cells.groupBy(F.col("la").alias("l")).agg(F.sum("c").alias("ca"))
    rb = cells.groupBy(F.col("lb").alias("l")).agg(F.sum("c").alias("cb"))
    marg = (
        ra.join(rb, "l", "full")
        .select(
            "l",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .crossJoin(F.broadcast(tot))
    )
    pi = (F.col("ca") + F.col("cb")).cast("double") / (2 * F.col("n"))
    terms = marg.agg(
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum(F.round(pi * (1 - pi), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("s"),
    )
    po = F.col("agree").cast("double") / F.col("n")
    peg = F.when(
        F.col("n_labels") > 1, F.col("s") / (F.col("n_labels") - 1)
    ).otherwise(F.lit(0.0))
    return (
        tot.crossJoin(F.broadcast(terms))
        .select(
            "n",
            "n_labels",
            F.round(po, 6).alias("po"),
            F.round(peg, 6).alias("pe_gamma"),
            F.round(F.when(peg < 1, (po - peg) / (1 - peg)), 6).alias("ac1"),
        )
    )


def tost_equivalence(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    arm_a: str,
    arm_b: str,
    margin_frac: float = 0.01,
) -> DataFrame:
    """TOST equivalence readout (two one-sided tests, Schuirmann 1987) —
    the A/A-test companion of the Welch readout: instead of failing to
    reject "no difference" (which any underpowered test does), TOST
    REJECTS non-equivalence when both one-sided t statistics clear the
    5 % normal critical value 1.645. The margin is ±``margin_frac`` of
    the pooled mean (an absolute margin would not transfer across
    metrics).

    ONE moment aggregate (Welch algebra on decimal-exact sums):
    t_lower = (diff + δ)/se, t_upper = (diff − δ)/se. Returns one row:
    (n_a, n_b, diff, margin, se, t_lower, t_upper, equivalent) —
    equivalent true iff t_lower > 1.645 AND t_upper < −1.645.
    """
    x = F.col(value_col).cast("double")
    in_a = F.col(arm_col) == arm_a
    in_b = F.col(arm_col) == arm_b
    d = lambda c: c.cast("decimal(38,6)")  # noqa: E731

    def side(cond, tag):
        xa = F.when(cond, x)
        return [
            F.count(xa).cast("long").alias(f"n_{tag}"),
            F.sum(d(xa)).cast("double").alias(f"s_{tag}"),
            F.sum(d(xa * xa)).cast("double").alias(f"q_{tag}"),
        ]

    agg = df.agg(*side(in_a, "a"), *side(in_b, "b"))
    mean = lambda t: F.col(f"s_{t}") / F.col(f"n_{t}")  # noqa: E731
    var = lambda t: (  # noqa: E731
        F.col(f"q_{t}") - F.col(f"s_{t}") * F.col(f"s_{t}") / F.col(f"n_{t}")
    ) / (F.col(f"n_{t}") - 1)
    diff = mean("a") - mean("b")
    pooled_mean = (F.col("s_a") + F.col("s_b")) / (F.col("n_a") + F.col("n_b"))
    margin = F.abs(pooled_mean) * F.lit(float(margin_frac))
    se = F.sqrt(var("a") / F.col("n_a") + var("b") / F.col("n_b"))
    t_lo = (diff + margin) / se
    t_hi = (diff - margin) / se
    crit = F.lit(1.645)
    return agg.select(
        "n_a",
        "n_b",
        F.round(diff, 6).alias("diff"),
        F.round(margin, 6).alias("margin"),
        F.round(se, 6).alias("se"),
        F.round(t_lo, 6).alias("t_lower"),
        F.round(t_hi, 6).alias("t_upper"),
        # int, not boolean: engines stringify booleans differently in the
        # oracle canonicalization (True vs 0/1)
        ((F.round(t_lo, 6) > crit) & (F.round(t_hi, 6) < -crit))
        .cast("int")
        .alias("equivalent"),
    )


def power_mde(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    arm_a: str,
    arm_b: str,
    target_mde_frac: float = 0.01,
) -> DataFrame:
    """Experiment power pre-flight: given the split's realized per-arm
    variance, the minimum detectable effect at the CURRENT sample size
    and the per-arm n needed for a target relative effect — the third
    leg of the pre-flight triad next to :func:`smd_balance` /
    :func:`srm_check` (balance can be perfect and the ratio exact while
    the test is still hopelessly underpowered). Standard 80 % power /
    5 % two-sided normal approximation: z_{α/2} + z_β = 1.96 + 0.8416 =
    2.8016; MDE = 2.8016·SE; n_per_arm = 2·s²_pooled·(2.8016/δ)².

    ONE moment aggregate (same Welch algebra as :func:`tost_equivalence`).
    Returns one row: (n_a, n_b, mean, sd_pooled, mde_abs, mde_rel,
    n_per_arm_target).
    """
    x = F.col(value_col).cast("double")
    in_a = F.col(arm_col) == arm_a
    in_b = F.col(arm_col) == arm_b
    d = lambda c: c.cast("decimal(38,6)")  # noqa: E731

    def side(cond, tag):
        xa = F.when(cond, x)
        return [
            F.count(xa).cast("long").alias(f"n_{tag}"),
            F.sum(d(xa)).cast("double").alias(f"s_{tag}"),
            F.sum(d(xa * xa)).cast("double").alias(f"q_{tag}"),
        ]

    agg = df.agg(*side(in_a, "a"), *side(in_b, "b"))
    var = lambda t: (  # noqa: E731
        F.col(f"q_{t}") - F.col(f"s_{t}") * F.col(f"s_{t}") / F.col(f"n_{t}")
    ) / (F.col(f"n_{t}") - 1)
    z = F.lit(2.8016)
    pooled_mean = (F.col("s_a") + F.col("s_b")) / (F.col("n_a") + F.col("n_b"))
    s2 = (var("a") + var("b")) / 2
    se = F.sqrt(var("a") / F.col("n_a") + var("b") / F.col("n_b"))
    mde_abs = z * se
    delta = F.abs(pooled_mean) * F.lit(float(target_mde_frac))
    n_target = F.ceil(2 * s2 * (z / delta) * (z / delta)).cast("long")
    return agg.select(
        "n_a",
        "n_b",
        F.round(pooled_mean, 6).alias("mean"),
        F.round(F.sqrt(s2), 6).alias("sd_pooled"),
        F.round(mde_abs, 6).alias("mde_abs"),
        F.round(
            F.when(F.abs(pooled_mean) > 0, mde_abs / F.abs(pooled_mean)), 6
        ).alias("mde_rel"),
        F.when(delta > 0, n_target).alias("n_per_arm_target"),
    )
