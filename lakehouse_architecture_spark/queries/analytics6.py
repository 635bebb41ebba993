"""Round-4 statistics/sketch tail: a hand-rolled HyperLogLog, closed-form
OLS regression (+ Simpson's-paradox screen), exact mode, adoption and
power-user curves, a Wald-Wolfowitz runs test, inter-event gap stats,
top event paths, percentile bands, and log2 histograms.

Registered last — these are the audited OVERFLOW block: they wait one
driver round beyond the 50-slot window, with committed LOCAL_ORACLE.json
rows proving the local oracle check (tests/test_registry_rotation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.materialize import materialize_small

from lakehouse_architecture_spark.functions.aggregates import dsum, dsum_sql
from lakehouse_architecture_spark.operators.skew import exact_quantiles
from lakehouse_architecture_spark.functions.hashing import (
    md5_hash64,
    md5_hash64_sql,
)
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

_US = "unix_micros(cast(ts as timestamp))"
_DUCK_US = "(epoch_ns(ts) // 1000)"
_DAY_US = 86400000000


# --- hand-rolled HyperLogLog ------------------------------------------------
_HLL_M = 256  # registers
#: the standard bias correction alpha_m = 0.7213/(1 + 1.079/m) for m >= 128
#: (Flajolet et al. 2007); formatted once so Spark and the oracle use the
#: bit-identical literal
_HLL_ALPHA = round(0.7213 / (1 + 1.079 / _HLL_M), 10)


def _q_hll_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A from-scratch HyperLogLog (Flajolet et al. 2007) distinct-count of
    lineitem order keys, next to the exact answer: md5-derived 60-bit
    hashes split into (register = h % 256, payload = h >> 8); each
    register keeps max rho (trailing-zero count + 1 of the payload,
    computed as ROUND(log2(x & -x)) — the round absorbs libm's last-ulp
    error on either engine: Spark's LOG2(2^29) measurably returns
    29.000000000000004, so a truncating cast would be one off the moment
    a libm rounds LOW instead); the bias-corrected estimate
    alpha_m * m^2 / sum(2^-rho) uses decimal-exact sums. The register table is 256
    rows — the whole sketch is one hash aggregate + a 256-row fold, the
    mergeable-sketch shape that beats exact COUNT(DISTINCT) at 100 TB."""
    t = tables(spark, sf_dir)
    # md5_hash64 is non-negative 60-bit by construction (15 hex chars) —
    # no sign wrapping needed
    h = md5_hash64(F.col("l_orderkey").cast("string"))
    reg = (h % _HLL_M).alias("reg")
    # INTEGER shift, not a double divide: 60-bit payloads exceed 2^53 and
    # float division would corrupt low bits (and the rho derived from them)
    payload = F.shiftright(h, 8)  # h >> 8 for m=256
    # rho = trailing zeros of payload + 1 via ROUND(log2(x & -x))
    rho = F.when(payload == 0, F.lit(53)).otherwise(
        F.round(
            F.log2((payload.bitwiseAND(-payload)).cast("double"))
        ).cast("int")
        + 1
    )
    regs = (
        t["lineitem"]
        .select(reg, rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("max_rho"))
    )
    filled = regs.agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.pow(F.lit(2.0), -F.col("max_rho")).cast("decimal(38,18)")
        ).cast("double").alias("__z"),
    )
    exact = t["lineitem"].agg(
        F.count_distinct("l_orderkey").alias("exact_distinct")
    )
    est = (
        F.lit(_HLL_ALPHA)
        * F.lit(float(_HLL_M * _HLL_M))
        / (F.col("__z") + (F.lit(_HLL_M) - F.col("n_regs")))
    )
    return (
        filled.crossJoin(F.broadcast(exact))
        .select(
            "n_regs",
            F.round(est, 4).alias("hll_estimate"),
            "exact_distinct",
            F.round(est / F.col("exact_distinct"), 4).alias("ratio"),
        )
    )


_Q_HLL_SQL = f"""
WITH h AS (
  SELECT {md5_hash64_sql('CAST(l_orderkey AS VARCHAR)')} AS hv
  FROM lineitem
),
regs AS (
  SELECT hv % {_HLL_M} AS reg,
         MAX(CASE WHEN hv // {_HLL_M} = 0 THEN 53
              ELSE CAST(ROUND(LOG2(CAST((hv // {_HLL_M}) & (-(hv // {_HLL_M})) AS DOUBLE))) AS INTEGER) + 1
         END) AS max_rho
  FROM h GROUP BY 1
),
filled AS (
  SELECT COUNT(*) AS n_regs,
         CAST(SUM(CAST(POWER(2.0, -max_rho) AS DECIMAL(38,18))) AS DOUBLE) AS z
  FROM regs
),
exact AS (SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
SELECT n_regs,
       ROUND({_HLL_ALPHA} * {_HLL_M * _HLL_M}.0 / (z + ({_HLL_M} - n_regs)), 4)
         AS hll_estimate,
       exact_distinct,
       ROUND(({_HLL_ALPHA} * {_HLL_M * _HLL_M}.0 / (z + ({_HLL_M} - n_regs)))
             / exact_distinct, 4) AS ratio
FROM filled, exact
"""


# --- closed-form OLS per group ----------------------------------------------
def _q_ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (quantity -> extended price) in
    closed form from decimal-exact sums: slope, intercept, r2 — the exact,
    single-pass, mergeable formulation (no iterative solver)."""
    t = tables(spark, sf_dir)
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    agg = t["lineitem"].groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        dsum(x * y, "sxy"),
        dsum(x * x, "sxx"),
        dsum(y * y, "syy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r_num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    r2 = (r_num * r_num) / (
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("l_returnflag")


_Q_OLS_SQL = f"""
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         {dsum_sql('l_quantity')} AS sx,
         {dsum_sql('l_extendedprice')} AS sy,
         {dsum_sql('l_quantity * l_extendedprice')} AS sxy,
         {dsum_sql('l_quantity * l_quantity')} AS sxx,
         {dsum_sql('l_extendedprice * l_extendedprice')} AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
         AS intercept,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s ORDER BY l_returnflag
"""


# --- Simpson's paradox screen ----------------------------------------------
def _q_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen for discount -> quantity: the pooled OLS
    slope next to each customer-segment slope, flagging segments whose
    sign disagrees with the pooled trend — the classic aggregation trap
    a profiling layer should surface. Same closed-form sums, grouping
    sets style: one grouped aggregate + one global, broadcast joined."""
    t = tables(spark, sf_dir)
    j = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "l_discount", "l_quantity")
    )
    x = F.col("l_discount")
    y = F.col("l_quantity")

    # ONE pass over the 3-table join: per-segment sums kept as
    # DECIMAL(38,6) (exact, so the pooled sums — plain decimal adds over
    # the per-segment rows — are bit-identical to a direct second pass;
    # this is why the pooled slope can derive from the grouped table
    # instead of re-running the join)
    dec = "decimal(38,6)"
    raw = (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast(dec)).alias("dsx"),
            F.sum(y.cast(dec)).alias("dsy"),
            F.sum((x * y).cast(dec)).alias("dsxy"),
            F.sum((x * x).cast(dec)).alias("dsxx"),
        )
    )
    # segment-cardinality, referenced 2x
    raw = materialize_small(raw)

    def slope_col():
        n = F.col("n").cast("double")
        sx = F.col("dsx").cast("double")
        sy = F.col("dsy").cast("double")
        sxy = F.col("dsxy").cast("double")
        sxx = F.col("dsxx").cast("double")
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    per = raw.select(
        "c_mktsegment", "n", F.round(slope_col(), 6).alias("seg_slope")
    )
    pooled = raw.agg(
        F.sum("n").alias("n"),
        F.sum("dsx").alias("dsx"),
        F.sum("dsy").alias("dsy"),
        F.sum("dsxy").alias("dsxy"),
        F.sum("dsxx").alias("dsxx"),
    ).select(F.round(slope_col(), 6).alias("pooled_slope"))
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "c_mktsegment",
            "n",
            "seg_slope",
            "pooled_slope",
            (
                F.signum(F.col("seg_slope")) != F.signum(F.col("pooled_slope"))
            ).alias("sign_flip"),
        )
        .orderBy("c_mktsegment")
    )


_Q_SIMPSON_SQL = f"""
WITH j AS (
  SELECT c_mktsegment, l_discount, l_quantity
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
),
per AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         ROUND((COUNT(*) * {dsum_sql('l_discount * l_quantity')}
                - {dsum_sql('l_discount')} * {dsum_sql('l_quantity')})
               / (COUNT(*) * {dsum_sql('l_discount * l_discount')}
                  - {dsum_sql('l_discount')} * {dsum_sql('l_discount')}), 6)
           AS seg_slope
  FROM j GROUP BY 1
),
pooled AS (
  SELECT ROUND((COUNT(*) * {dsum_sql('l_discount * l_quantity')}
                - {dsum_sql('l_discount')} * {dsum_sql('l_quantity')})
               / (COUNT(*) * {dsum_sql('l_discount * l_discount')}
                  - {dsum_sql('l_discount')} * {dsum_sql('l_discount')}), 6)
           AS pooled_slope
  FROM j
)
SELECT c_mktsegment, n, seg_slope, pooled_slope,
       SIGN(seg_slope) <> SIGN(pooled_slope) AS sign_flip
FROM per, pooled
ORDER BY c_mktsegment
"""


# --- exact mode --------------------------------------------------------------
def _q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode of quantity per return flag with a deterministic
    tie-break (highest count, then smallest value) — the missing exact
    aggregate, as two hash aggregates + a count-cardinality rank window."""
    t = tables(spark, sf_dir)
    counts = t["lineitem"].groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_quantity"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


_Q_MODE_SQL = """
SELECT l_returnflag, mode_quantity, mode_count
FROM (
  SELECT l_returnflag, l_quantity AS mode_quantity, COUNT(*) AS mode_count,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
  FROM lineitem GROUP BY 1, 2
)
WHERE rn = 1 ORDER BY l_returnflag
"""


# --- cumulative adoption curve ----------------------------------------------
def _q_cumulative_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of distinct users ever seen, per day — the adoption
    curve. Per-user first day is one hash aggregate; the cumulative
    window runs over day cardinality."""
    t = tables(spark, sf_dir)
    first = (
        t["events"]
        .groupBy("user_id")
        .agg(F.expr(f"min({_US} div {_DAY_US})").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return first.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("total_users"),
    ).orderBy("day")


_Q_ADOPTION_SQL = f"""
WITH first AS (
  SELECT MIN({_DUCK_US} // {_DAY_US}) AS day
  FROM events GROUP BY user_id
),
daily AS (SELECT day, COUNT(*) AS new_users FROM first GROUP BY 1)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS total_users
FROM daily ORDER BY day
"""


# --- power-user concentration -----------------------------------------------
def _q_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of all events produced by the top-decile users (by event
    count): per-user counts, exact p90 cut broadcast back, conditional
    decimal sums — the engagement-concentration readout."""
    t = tables(spark, sf_dir)
    per = t["events"].groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    cut = per.agg(F.expr("percentile(n_ev, 0.9)").alias("__p90"))
    return (
        per.crossJoin(F.broadcast(cut))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                (F.col("n_ev") >= F.col("__p90")).cast("bigint")
            ).alias("n_power_users"),
            F.sum("n_ev").alias("n_events"),
            F.sum(
                F.when(F.col("n_ev") >= F.col("__p90"), F.col("n_ev")).otherwise(0)
            ).alias("power_events"),
        )
        .select(
            "n_users",
            "n_power_users",
            "n_events",
            F.round(
                F.col("power_events") / F.col("n_events").cast("double"), 6
            ).alias("power_share"),
        )
    )


_Q_POWER_USERS_SQL = """
WITH per AS (SELECT user_id, COUNT(*) AS n_ev FROM events GROUP BY 1),
cut AS (SELECT quantile_cont(n_ev, 0.9) AS p90 FROM per)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN n_ev >= p90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_power_users,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       ROUND(SUM(CASE WHEN n_ev >= p90 THEN n_ev ELSE 0 END)
             / CAST(SUM(n_ev) AS DOUBLE), 6) AS power_share
FROM per, cut
"""


# --- Wald-Wolfowitz runs test -----------------------------------------------
def _q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomness check on the daily total-value series: count up/down
    runs of the day-over-day delta and compare to the expected run count
    1 + 2*n_up*n_down/n (Wald-Wolfowitz) — trend/oscillation shows as a
    low/high ratio. All windows run over the day-cardinality series."""
    t = tables(spark, sf_dir)
    daily = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .groupBy(F.expr(f"{_US} div {_DAY_US}").alias("day"))
        .agg(dsum("value", "x"))
    )
    w = Window.orderBy("day")
    signed = (
        daily.withColumn("prev", F.lag("x", 1).over(w))
        .filter(F.col("prev").isNotNull() & (F.col("x") != F.col("prev")))
        .withColumn("up", (F.col("x") > F.col("prev")).cast("int"))
    )
    runs = signed.withColumn(
        "chg",
        (F.col("up") != F.lag("up", 1).over(w)).cast("int"),
    )
    return runs.agg(
        F.sum("up").alias("n_up"),
        F.sum(F.lit(1) - F.col("up")).alias("n_down"),
        (F.coalesce(F.sum("chg"), F.lit(0)) + 1).alias("n_runs"),
        F.round(
            F.lit(1.0)
            + 2.0 * F.sum("up") * F.sum(F.lit(1) - F.col("up"))
            / F.count(F.lit(1)),
            4,
        ).alias("expected_runs"),
    ).select(
        "n_up",
        "n_down",
        "n_runs",
        "expected_runs",
        F.round(F.col("n_runs") / F.col("expected_runs"), 6).alias("runs_ratio"),
    )


_Q_RUNS_SQL = f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, {dsum_sql('value')} AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
signed AS (
  SELECT day, x, prev, CASE WHEN x > prev THEN 1 ELSE 0 END AS up
  FROM (SELECT day, x, LAG(x, 1) OVER (ORDER BY day) AS prev FROM daily)
  WHERE prev IS NOT NULL AND x <> prev
),
runs AS (
  SELECT up,
         CASE WHEN up <> LAG(up, 1) OVER (ORDER BY day) THEN 1 ELSE 0 END AS chg
  FROM signed
)
SELECT CAST(SUM(up) AS BIGINT) AS n_up,
       CAST(SUM(1 - up) AS BIGINT) AS n_down,
       CAST(COALESCE(SUM(chg), 0) + 1 AS BIGINT) AS n_runs,
       ROUND(1.0 + 2.0 * SUM(up) * SUM(1 - up) / COUNT(*), 4) AS expected_runs,
       ROUND((COALESCE(SUM(chg), 0) + 1)
             / ROUND(1.0 + 2.0 * SUM(up) * SUM(1 - up) / COUNT(*), 4), 6)
         AS runs_ratio
FROM runs
"""


# --- inter-event gap stats ---------------------------------------------------
def _q_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per event type (gap = seconds since
    the same user's previous event of any type; attributed to the later
    event's type): median and p90 — the behavioral-cadence profile. The
    lag window partitions by user; quantiles run per type."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("us"), F.col("event_id")
    )
    gaps = (
        t["events"]
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.expr(_US).alias("us"),
        )
        .withColumn("gap_s", (F.col("us") - F.lag("us", 1).over(w)) / 1e6)
        .filter(F.col("gap_s").isNotNull())
    )
    base = gaps.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_gaps"))
    qtl = exact_quantiles(
        gaps,
        ["event_type"],
        "gap_s",
        {"__med": 0.5, "__p90": 0.9},
        bucket_width=3600.0,  # gaps span ~30 days of seconds -> ~720 buckets
    )
    return (
        base.join(F.broadcast(qtl), on="event_type")
        .select(
            "event_type",
            "n_gaps",
            F.round("__med", 4).alias("median_gap_s"),
            F.round("__p90", 4).alias("p90_gap_s"),
        )
        .orderBy("event_type")
    )


_Q_GAP_SQL = f"""
WITH gaps AS (
  SELECT event_type,
         (us - LAG(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id))
           / 1e6 AS gap_s
  FROM (SELECT user_id, event_id, event_type, {_DUCK_US} AS us FROM events)
)
SELECT event_type, COUNT(*) AS n_gaps,
       ROUND(quantile_cont(gap_s, 0.5), 4) AS median_gap_s,
       ROUND(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


# --- top event paths ---------------------------------------------------------
def _q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step event paths (consecutive per-user sequences) by
    frequency — the navigation-pattern miner: two lag windows partitioned
    by user, one hash aggregate over the |types|^3 path space."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.expr(_US), F.col("event_id")
    )
    paths = (
        t["events"]
        .select(
            "user_id",
            "event_id",
            F.col("event_type").alias("s3"),
            F.lag("event_type", 1).over(w).alias("s2"),
            F.lag("event_type", 2).over(w).alias("s1"),
        )
        .filter(F.col("s1").isNotNull())
    )
    return (
        paths.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "s1", "s2", "s3")
        .limit(10)
    )


_Q_TOP_PATHS_SQL = f"""
WITH seq AS (
  SELECT event_type AS s3,
         LAG(event_type, 1) OVER w AS s2,
         LAG(event_type, 2) OVER w AS s1
  FROM (SELECT user_id, event_id, event_type, {_DUCK_US} AS us FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT s1, s2, s3, COUNT(*) AS n
FROM seq WHERE s1 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, s1, s2, s3
LIMIT 10
"""


# --- percentile bands --------------------------------------------------------
def _q_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p10/p25/p50/p75/p90 of event value per event type in ONE
    :func:`exact_quantiles` pass (bounded-state two-phase rank; all five
    cut points share the same counts table) — the distribution-profile
    belt."""
    t = tables(spark, sf_dir)
    ev = t["events"].filter(F.col("value").isNotNull()).select("event_type", "value")
    qtl = exact_quantiles(
        ev,
        ["event_type"],
        "value",
        {f"__p{int(p * 100)}": p for p in (0.1, 0.25, 0.5, 0.75, 0.9)},
        bucket_width=1.0,  # value range ~[0, 500]
    )
    base = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        base.join(F.broadcast(qtl), on="event_type")
        .select(
            "event_type",
            "n",
            *[
                F.round(f"__p{int(p * 100)}", 4).alias(f"p{int(p * 100)}")
                for p in (0.1, 0.25, 0.5, 0.75, 0.9)
            ],
        )
        .orderBy("event_type")
    )


_Q_BANDS_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.10), 4) AS p10,
       ROUND(quantile_cont(value, 0.25), 4) AS p25,
       ROUND(quantile_cont(value, 0.50), 4) AS p50,
       ROUND(quantile_cont(value, 0.75), 4) AS p75,
       ROUND(quantile_cont(value, 0.90), 4) AS p90
FROM events WHERE value IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


# --- log2 histogram ----------------------------------------------------------
def _q_log_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed histogram of order value — the long-tail profile
    (each bucket doubles; exact powers of two are unambiguous on both
    engines). One bounded-domain hash aggregate + share window."""
    t = tables(spark, sf_dir)
    b = F.floor(F.log2(F.col("o_totalprice"))).cast("int")
    hist = (
        t["orders"]
        .filter(F.col("o_totalprice") > 0)
        .groupBy(b.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_v"),
            F.round(F.max("o_totalprice"), 2).alias("max_v"),
        )
    )
    tot = hist.agg(F.sum("n").alias("__t"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "log2_bucket",
            "n",
            "min_v",
            "max_v",
            F.round(F.col("n") / F.col("__t"), 6).alias("share"),
        )
        .orderBy("log2_bucket")
    )


_Q_LOG_HIST_SQL = """
WITH hist AS (
  SELECT CAST(FLOOR(LOG2(o_totalprice)) AS INTEGER) AS log2_bucket,
         COUNT(*) AS n,
         ROUND(MIN(o_totalprice), 2) AS min_v,
         ROUND(MAX(o_totalprice), 2) AS max_v
  FROM orders WHERE o_totalprice > 0
  GROUP BY 1
),
tot AS (SELECT SUM(n) AS t FROM hist)
SELECT log2_bucket, n, min_v, max_v,
       ROUND(n * 1.0 / t, 6) AS share
FROM hist, tot
ORDER BY log2_bucket
"""


ANALYTICS6_QUERIES = [
    QuerySpec("q_hll_custom", "hand-rolled HyperLogLog vs exact distinct", _q_hll_custom, _Q_HLL_SQL),
    QuerySpec("q_ols_by_group", "closed-form OLS slope/intercept/r2 per group", _q_ols_by_group, _Q_OLS_SQL),
    QuerySpec("q_simpson_check", "Simpson's-paradox slope-sign screen", _q_simpson_check, _Q_SIMPSON_SQL),
    QuerySpec("q_mode", "exact mode with deterministic tie-break", _q_mode, _Q_MODE_SQL),
    QuerySpec("q_cumulative_adoption", "running distinct-user adoption curve", _q_cumulative_adoption, _Q_ADOPTION_SQL),
    QuerySpec("q_power_users", "top-decile engagement concentration", _q_power_users, _Q_POWER_USERS_SQL),
    QuerySpec("q_runs_test", "Wald-Wolfowitz up/down runs randomness test", _q_runs_test, _Q_RUNS_SQL),
    QuerySpec("q_gap_stats", "inter-event gap distribution per type", _q_gap_stats, _Q_GAP_SQL),
    QuerySpec("q_top_paths", "top 3-step event paths", _q_top_paths, _Q_TOP_PATHS_SQL),
    QuerySpec("q_percentile_bands", "p10..p90 percentile bands per type", _q_percentile_bands, _Q_BANDS_SQL),
    QuerySpec("q_log_hist", "log2-bucketed long-tail histogram", _q_log_hist, _Q_LOG_HIST_SQL),
]
