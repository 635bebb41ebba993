"""Round-4 analytics tail: series diagnostics (autocorrelation,
day-of-week seasonality, period-over-period growth), scaling/screening
features (z-standardization, chi-squared), privacy t-closeness, interval
overlap join, ties-aware top-k, column profiling, and co-occurrence
cosine. (Funnel, retention, and weighted sampling live in events.py /
textops.py since round 2.)

Registered last (after the 50-slot window; queries/registry.py ordering
note). Time comparisons run on integer epoch MICROseconds on both engines
(Spark reads the testdata's TIMESTAMP(NANOS) as micros; DuckDB keeps
nanos — dividing both to micros removes the resolution mismatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import dsum, dsum_sql
from lakehouse_architecture_spark.operators.skew import exact_quantiles
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

_HASH64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

_US = "unix_micros(cast(ts as timestamp))"
_DUCK_US = "(epoch_ns(ts) // 1000)"
_DAY_US = 86400000000


# --- lag-k autocorrelation of the daily series -----------------------------
_ACF_LAGS = 7


def _q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily total event value at lags 1..7, computed
    from decimal-exact sums over lagged pairs (the q_exact_corr recipe on
    a self-lagged series). Raw rows collapse to one row per day first, so
    the lag windows run over a days-cardinality series."""
    t = tables(spark, sf_dir)
    daily = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .groupBy(F.expr(f"{_US} div {_DAY_US}").alias("day"))
        .agg(dsum("value", "x"))
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in range(1, _ACF_LAGS + 1)],
    )
    out = None
    for k in range(1, _ACF_LAGS + 1):
        xk = F.col(f"x{k}")
        pair = lagged.filter(xk.isNotNull())
        agg = pair.agg(
            F.count(F.lit(1)).alias("n"),
            dsum("x", "sx"),
            dsum(xk, "sy"),
            dsum(F.col("x") * xk, "sxy"),
            dsum(F.col("x") * F.col("x"), "sxx"),
            dsum(xk * xk, "syy"),
        )
        n = F.col("n").cast("double")
        corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
        )
        row = agg.select(
            F.lit(k).alias("lag"), "n", F.round(corr, 6).alias("acf")
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("lag")


def _acf_sql() -> str:
    rows = []
    for k in range(1, _ACF_LAGS + 1):
        rows.append(f"""
  SELECT {k} AS lag, COUNT(*) AS n,
         ROUND((COUNT(*) * {dsum_sql('x * x' + str(k))} - {dsum_sql('x')} * {dsum_sql('x' + str(k))})
               / (SQRT(COUNT(*) * {dsum_sql('x * x')} - {dsum_sql('x')} * {dsum_sql('x')})
                  * SQRT(COUNT(*) * {dsum_sql('x' + str(k) + ' * x' + str(k))} - {dsum_sql('x' + str(k))} * {dsum_sql('x' + str(k))})), 6)
           AS acf
  FROM lagged WHERE x{k} IS NOT NULL""")
    union = "\n  UNION ALL\n".join(rows)
    lags = ", ".join(
        f"LAG(x, {k}) OVER (ORDER BY day) AS x{k}"
        for k in range(1, _ACF_LAGS + 1)
    )
    return f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, {dsum_sql('value')} AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
lagged AS (
  SELECT day, x, {lags} FROM daily
)
{union}
ORDER BY lag
"""


# --- day-of-week seasonality index -----------------------------------------
def _q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal index per day-of-week: mean daily total value for that
    weekday over the overall mean daily total. Weekday derives from the
    epoch-day number ((day + 4) % 7, 0 = Thursday-anchored Monday-free
    arithmetic both engines share — no timezone/calendar functions)."""
    t = tables(spark, sf_dir)
    daily = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .groupBy(F.expr(f"{_US} div {_DAY_US}").alias("day"))
        .agg(dsum("value", "x"))
    )
    overall = daily.agg(
        (dsum("x") / F.count(F.lit(1))).alias("__avg_all")
    )
    return (
        daily.groupBy(((F.col("day") + 4) % 7).alias("dow"))
        .agg(F.count(F.lit(1)).alias("n_days"), dsum("x", "__s"))
        .crossJoin(F.broadcast(overall))
        .select(
            "dow",
            "n_days",
            F.round(F.col("__s") / F.col("n_days"), 4).alias("avg_value"),
            F.round(
                (F.col("__s") / F.col("n_days")) / F.col("__avg_all"), 6
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


_Q_DOW_SQL = f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, {dsum_sql('value')} AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
overall AS (SELECT {dsum_sql('x')} / COUNT(*) AS avg_all FROM daily)
SELECT (day + 4) % 7 AS dow, COUNT(*) AS n_days,
       ROUND({dsum_sql('x')} / COUNT(*), 4) AS avg_value,
       ROUND(({dsum_sql('x')} / COUNT(*)) / MIN(avg_all), 6) AS seasonal_index
FROM daily, overall
GROUP BY 1 ORDER BY 1
"""


# --- month-over-month growth -----------------------------------------------
def _q_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order revenue with month-over-month growth — the lag window
    runs over the months-cardinality aggregate, never the raw rows."""
    t = tables(spark, sf_dir)
    monthly = (
        t["orders"]
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(dsum("o_totalprice", "revenue"))
    )
    w = Window.orderBy("month")
    return (
        monthly.select(
            "month",
            F.round("revenue", 2).alias("revenue"),
            F.round(
                (F.col("revenue") - F.lag("revenue", 1).over(w))
                / F.lag("revenue", 1).over(w),
                6,
            ).alias("mom_growth"),
        )
        .orderBy("month")
    )


_Q_PCT_CHANGE_SQL = f"""
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         {dsum_sql('o_totalprice')} AS revenue
  FROM orders GROUP BY 1
)
SELECT month, ROUND(revenue, 2) AS revenue,
       ROUND((revenue - LAG(revenue, 1) OVER (ORDER BY month))
             / LAG(revenue, 1) OVER (ORDER BY month), 6) AS mom_growth
FROM monthly ORDER BY month
"""


# --- privacy: t-closeness ---------------------------------------------------
def _q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007): per QI group (market segment),
    total-variation distance between the group's sensitive-value
    distribution (balance band) and the table-wide one — groups above t
    leak their members' secret distribution. Joint counts in one hash
    aggregate; marginals derive from the joint table."""
    t = tables(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit("neg"))
        .when(F.col("c_acctbal") < 4500, F.lit("low"))
        .otherwise(F.lit("high"))
        .alias("band"),
    )
    joint = cust.groupBy("seg", "band").agg(F.count(F.lit(1)).alias("o"))
    seg_tot = joint.groupBy("seg").agg(F.sum("o").alias("ns"))
    band_tot = joint.groupBy("band").agg(F.sum("o").alias("nb"))
    tot = joint.agg(F.sum("o").alias("n"))
    # outer join on the full (seg x band) grid: a band absent from a group
    # contributes |0 - p(band)| to the distance
    grid = seg_tot.crossJoin(F.broadcast(band_tot)).crossJoin(F.broadcast(tot))
    cells = grid.join(joint, on=["seg", "band"], how="left").select(
        "seg",
        "ns",
        (
            F.abs(
                F.coalesce(F.col("o"), F.lit(0)) / F.col("ns")
                - F.col("nb") / F.col("n")
            )
        ).alias("dev"),
    )
    return (
        cells.groupBy("seg")
        .agg(
            F.max("ns").alias("n_rows"),
            F.round(
                (F.sum(F.col("dev").cast("decimal(38,18)")) / 2).cast("double"), 6
            ).alias("tv_distance"),
        )
        .orderBy("seg")
    )


_Q_T_CLOSENESS_SQL = """
WITH cust AS (
  SELECT c_mktsegment AS seg,
         CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 4500 THEN 'low'
              ELSE 'high' END AS band
  FROM customer
),
joint AS (SELECT seg, band, COUNT(*) AS o FROM cust GROUP BY 1, 2),
seg_tot AS (SELECT seg, SUM(o) AS ns FROM joint GROUP BY 1),
band_tot AS (SELECT band, SUM(o) AS nb FROM joint GROUP BY 1),
tot AS (SELECT SUM(o) AS n FROM joint),
cells AS (
  SELECT s.seg, s.ns,
         ABS(COALESCE(j.o, 0) * 1.0 / s.ns - b.nb * 1.0 / t.n) AS dev
  FROM seg_tot s CROSS JOIN band_tot b CROSS JOIN tot t
  LEFT JOIN joint j ON j.seg = s.seg AND j.band = b.band
)
SELECT seg, CAST(MAX(ns) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(CAST(dev AS DECIMAL(38,18))) / 2 AS DOUBLE), 6)
         AS tv_distance
FROM cells GROUP BY seg ORDER BY seg
"""


# --- winsorized / trimmed mean ---------------------------------------------
def _q_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of order value per priority: values are CLIPPED to
    the group's [p05, p95] (exact interpolated percentiles) before the
    decimal-exact mean — the robust-location estimator that, unlike a
    trimmed mean, keeps n constant. Percentiles come from one aggregate,
    broadcast back (groups are few; the clip is a narrow map)."""
    t = tables(spark, sf_dir)
    o = t["orders"].select("o_orderpriority", "o_totalprice")
    bounds = exact_quantiles(
        o,
        ["o_orderpriority"],
        "o_totalprice",
        {"__lo": 0.05, "__hi": 0.95},
        bucket_width=500.0,  # price range ~5e5 -> ~1k counted buckets
    )
    clipped = o.join(F.broadcast(bounds), on="o_orderpriority").select(
        "o_orderpriority",
        F.greatest(F.least(F.col("o_totalprice"), F.col("__hi")), F.col("__lo")).alias(
            "__w"
        ),
    )
    return (
        clipped.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round((dsum("__w") / F.count(F.lit(1))), 4).alias("winsor_mean"),
        )
        .orderBy("o_orderpriority")
    )


_Q_WINSORIZED_SQL = f"""
WITH bounds AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS lo,
         quantile_cont(o_totalprice, 0.95) AS hi
  FROM orders GROUP BY 1
),
clipped AS (
  SELECT o.o_orderpriority,
         GREATEST(LEAST(o_totalprice, hi), lo) AS w
  FROM orders o JOIN bounds USING (o_orderpriority)
)
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND({dsum_sql('w')} / COUNT(*), 4) AS winsor_mean
FROM clipped GROUP BY 1 ORDER BY 1
"""


# --- per-group z-standardization -------------------------------------------
def _q_std_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-standardized order values within each priority
    (operators/features.standard_scale): moments from one decimal-exact
    aggregate broadcast onto the rows — no window over the data. Top-50
    absolute z with a total-order tiebreak keeps the output bounded."""
    from lakehouse_architecture_spark.operators.features import standard_scale

    t = tables(spark, sf_dir)
    o = t["orders"].select("o_orderkey", "o_orderpriority", "o_totalprice")
    z = standard_scale(o, "o_totalprice", ["o_orderpriority"])
    return (
        z.select("o_orderkey", "o_orderpriority", "z")
        .orderBy(F.abs(F.col("z")).desc(), F.col("o_orderkey").asc())
        .limit(50)
        .orderBy("o_orderkey")
    )


_Q_STD_SCALE_SQL = f"""
WITH stats AS (
  SELECT o_orderpriority, COUNT(o_totalprice) AS n,
         {dsum_sql('o_totalprice')} AS s,
         {dsum_sql('o_totalprice * o_totalprice')} AS s2
  FROM orders GROUP BY 1
),
m AS (
  SELECT o_orderpriority, s / n AS mean,
         CASE WHEN n > 1 AND (s2 - s * s / n) / (n - 1) > 0
              THEN SQRT((s2 - s * s / n) / (n - 1)) END AS std
  FROM stats
),
z AS (
  SELECT o_orderkey, o.o_orderpriority,
         ROUND((o_totalprice - mean) / std, 6) AS z
  FROM orders o JOIN m USING (o_orderpriority)
)
SELECT o_orderkey, o_orderpriority, z
FROM z ORDER BY ABS(z) DESC, o_orderkey LIMIT 50
"""


# --- chi-squared independence screen ---------------------------------------
def _q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence of (order priority, return flag) on
    lineitem x orders (operators/features.chi2_independence) — the
    categorical feature-screening complement of q_mutual_info."""
    from lakehouse_architecture_spark.operators.features import chi2_independence

    t = tables(spark, sf_dir)
    j = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return chi2_independence(j, "o_orderpriority", "l_returnflag")


_Q_CHI2_SQL = """
WITH joint AS (
  SELECT COALESCE(CAST(o_orderpriority AS VARCHAR), ' null') AS x,
         COALESCE(CAST(l_returnflag AS VARCHAR), ' null') AS y,
         COUNT(*) AS o
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
mx AS (SELECT x, SUM(o) AS nx FROM joint GROUP BY 1),
my AS (SELECT y, SUM(o) AS ny FROM joint GROUP BY 1),
tot AS (SELECT SUM(o) AS n FROM joint),
-- full grid: zero cells still contribute (0-exp)^2/exp = exp
cells AS (
  SELECT mx.x, my.y, mx.nx, my.ny, tot.n, COALESCE(j.o, 0) AS o
  FROM mx CROSS JOIN my CROSS JOIN tot
  LEFT JOIN joint j ON j.x = mx.x AND j.y = my.y
)
SELECT ROUND(CAST(SUM(CAST((o - nx * ny * 1.0 / n) * (o - nx * ny * 1.0 / n)
                           / (nx * ny * 1.0 / n) AS DECIMAL(38,18))) AS DOUBLE), 6)
         AS chi2,
       (COUNT(DISTINCT x) - 1) * (COUNT(DISTINCT y) - 1) AS dof,
       CAST(MAX(n) AS BIGINT) AS n
FROM cells
"""


# --- interval overlap join --------------------------------------------------
def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap join via bucket replication with a
    canonical-bucket dedup (operators/relational.interval_overlap_join):
    maintenance windows (one per region, 40 days from its first order day)
    against order-activity intervals (order day + priority-dependent
    processing days) for a sample of orders — no cartesian product."""
    from lakehouse_architecture_spark.operators.relational import (
        interval_overlap_join,
    )

    t = tables(spark, sf_dir)
    day = F.expr(
        f"unix_micros(cast(o_orderdate as timestamp)) div {_DAY_US}"
    )
    ords = (
        t["orders"]
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            day.alias("o_start"),
            (day + (F.col("o_orderkey") % 5) * 10 + 5).alias("o_end"),
        )
    )
    # the windows anchor (min order day) stays IN the plan as a broadcast
    # one-row aggregate crossJoined under the 5-row frame — no driver-side
    # .first() job (the analytics3 CUSUM broadcast-scalar pattern)
    anchor = t["orders"].agg(
        F.expr(
            f"min(unix_micros(cast(o_orderdate as timestamp)) div {_DAY_US})"
        ).alias("__m")
    )
    wins = (
        spark.range(5)
        .select(F.col("id").cast("int").alias("win_id"))
        .crossJoin(F.broadcast(anchor))
        .select(
            "win_id",
            (F.col("__m") + 200 * F.col("win_id")).cast("bigint").alias("w_start"),
            (F.col("__m") + 200 * F.col("win_id") + 39).cast("bigint").alias("w_end"),
        )
    )
    return (
        interval_overlap_join(
            ords, wins, "o_start", "o_end", "w_start", "w_end", bucket_width=40.0
        )
        .select("o_orderkey", "win_id")
        .orderBy("o_orderkey", "win_id")
    )


_Q_INTERVAL_JOIN_SQL = f"""
WITH base AS (
  SELECT o_orderkey,
         (epoch_ns(o_orderdate) // 1000) // {_DAY_US} AS o_start,
         (epoch_ns(o_orderdate) // 1000) // {_DAY_US}
           + (o_orderkey % 5) * 10 + 5 AS o_end
  FROM orders WHERE o_orderkey % 97 = 0
),
d0 AS (
  SELECT MIN((epoch_ns(o_orderdate) // 1000) // {_DAY_US}) AS m FROM orders
),
wins AS (
  SELECT r AS win_id, m + 200 * r AS w_start, m + 200 * r + 39 AS w_end
  FROM range(5) t(r), d0
)
SELECT o_orderkey, CAST(win_id AS INTEGER) AS win_id
FROM base JOIN wins
  ON o_start <= w_end AND w_start <= o_end
ORDER BY o_orderkey, win_id
"""


# --- A-ES weighted sampling without replacement ----------------------------
def _q_aes_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, the Efraimidis-Spirakis A-ES
    way (operators/curation.weighted_sample_topk): key = u^(1/w) with an
    md5-derived uniform u — inclusion probability proportional to weight,
    reproducible across engines/partitionings/retries, one TakeOrdered
    top-k. Distinct from q_weighted_sample's priority-ratio sampler:
    A-ES is the estimator with the textbook WR-sampling guarantee."""
    from lakehouse_architecture_spark.operators.curation import weighted_sample_topk

    t = tables(spark, sf_dir)
    out = weighted_sample_topk(
        t["customer"].select("c_custkey", "c_acctbal"),
        "c_custkey",
        "c_acctbal",
        k=50,
    )
    return out.select(
        "c_custkey", "c_acctbal", F.col("__aes_key").alias("aes_key")
    ).orderBy("c_custkey")


_Q_AES_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT c_custkey, c_acctbal,
         ROUND(POWER((({_HASH64.format(expr='CAST(c_custkey AS VARCHAR)')} % 1000000) + 0.5)
                     / 1000000.0, 1.0 / c_acctbal), 12) AS aes_key
  FROM customer WHERE c_acctbal > 0
)
SELECT c_custkey, c_acctbal, aes_key
FROM (SELECT * FROM keyed ORDER BY aes_key DESC, c_custkey LIMIT 50)
ORDER BY c_custkey
"""


# --- ties-aware top-k -------------------------------------------------------
def _q_topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 account balances per nation WITH ties (rank(), not
    row_number()) — tied customers all appear, the SQL-standard top-k
    semantics row_number silently breaks."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        t["customer"]
        .select("c_nationkey", "c_custkey", "c_acctbal", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .orderBy("c_nationkey", "rnk", "c_custkey")
    )


_Q_TOPK_TIES_SQL = """
SELECT c_nationkey, c_custkey, c_acctbal, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
  FROM customer
)
WHERE rnk <= 3
ORDER BY c_nationkey, rnk, c_custkey
"""


# --- one-pass column profile ------------------------------------------------
_PROFILE_COLS = [("event_id", True), ("user_id", True), ("value", True), ("event_type", False)]


def _q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary of the events table: per column, row/null/
    distinct counts and numeric min/max — ONE aggregate pass over the
    scan (column stats stack as expressions; no per-column jobs), then a
    stack() unpivot of the single result row."""
    t = tables(spark, sf_dir)
    aggs = []
    for c, numeric in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"n_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            (
                F.min(F.col(c).cast("double"))
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"mn_{c}"),
            (
                F.max(F.col(c).cast("double"))
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"mx_{c}"),
        ]
    one = t["events"].agg(*aggs)
    parts = ", ".join(
        f"'{c}', n_{c}, nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {parts}) as "
        "(col_name, n_rows, n_null, n_distinct, min_num, max_num)"
    ).orderBy("col_name")


def _profile_sql() -> str:
    rows = []
    for c, numeric in _PROFILE_COLS:
        mn = f"MIN(CAST({c} AS DOUBLE))" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"MAX(CAST({c} AS DOUBLE))" if numeric else "CAST(NULL AS DOUBLE)"
        rows.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows,"
            f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct, {mn} AS min_num, {mx} AS max_num"
            f" FROM events"
        )
    return " UNION ALL ".join(rows) + " ORDER BY col_name"


# --- event-type co-occurrence cosine ---------------------------------------
def _q_cooccur_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine on user-incidence vectors
    (operators/analytics.cooccurrence_cosine): the self-join runs on the
    USER key with per-user fan-out bounded by their distinct types (max
    5 here), never an all-pairs item join."""
    from lakehouse_architecture_spark.operators.analytics import cooccurrence_cosine

    t = tables(spark, sf_dir)
    return cooccurrence_cosine(t["events"], "user_id", "event_type").orderBy(
        "item_a", "item_b"
    )


_Q_COOCCUR_SQL = """
WITH pairs AS (SELECT DISTINCT user_id, event_type FROM events),
totals AS (SELECT event_type, COUNT(*) AS n FROM pairs GROUP BY 1),
pairboth AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b, COUNT(*) AS n_both
  FROM pairs a JOIN pairs b USING (user_id)
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT item_a, item_b, n_both,
       ROUND(n_both / SQRT(ta.n * CAST(tb.n AS DOUBLE)), 6) AS cosine
FROM pairboth
JOIN totals ta ON ta.event_type = item_a
JOIN totals tb ON tb.event_type = item_b
ORDER BY item_a, item_b
"""


# --- deterministic ordered string aggregation ------------------------------
def _q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per region: nation names concatenated in
    collation-free byte order (array_sort + concat_ws — Spark's
    collect_list is unordered, so the sort is what makes the result
    deterministic; DuckDB's string_agg ORDER BY is the mirror)."""
    t = tables(spark, sf_dir)
    j = t["nation"].join(
        t["region"].select("r_regionkey", "r_name"),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        j.groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
                "nations"
            ),
        )
        .orderBy("r_name")
    )


_Q_GROUP_CONCAT_SQL = """
SELECT r_name, COUNT(*) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


ANALYTICS4_QUERIES = [
    QuerySpec("q_acf", "lag 1..7 autocorrelation of the daily value series", _q_acf, _acf_sql()),
    QuerySpec("q_dow_seasonality", "day-of-week seasonal index", _q_dow_seasonality, _Q_DOW_SQL),
    QuerySpec("q_pct_change", "month-over-month revenue growth", _q_pct_change, _Q_PCT_CHANGE_SQL),
    QuerySpec("q_t_closeness", "t-closeness (total-variation) privacy audit", _q_t_closeness, _Q_T_CLOSENESS_SQL),
    QuerySpec("q_winsorized", "winsorized mean per group (p05/p95 clip)", _q_winsorized, _Q_WINSORIZED_SQL),
    QuerySpec("q_std_scale", "per-group z-standardization, top-|z| rows", _q_std_scale, _Q_STD_SCALE_SQL),
    QuerySpec("q_chi2", "chi-squared independence screen", _q_chi2, _Q_CHI2_SQL),
    QuerySpec("q_interval_join", "interval x interval overlap join (bucketed)", _q_interval_join, _Q_INTERVAL_JOIN_SQL),
    QuerySpec("q_aes_sample", "A-ES weighted sampling without replacement", _q_aes_sample, _Q_AES_SAMPLE_SQL),
    QuerySpec("q_topk_ties", "rank()-based top-k per group with ties", _q_topk_ties, _Q_TOPK_TIES_SQL),
    QuerySpec("q_null_profile", "one-pass multi-column data profile", _q_null_profile, _profile_sql()),
    QuerySpec("q_cooccur_cosine", "event co-occurrence cosine similarity", _q_cooccur_cosine, _Q_COOCCUR_SQL),
    QuerySpec("q_group_concat", "deterministic ordered string aggregation", _q_group_concat, _Q_GROUP_CONCAT_SQL),
]
