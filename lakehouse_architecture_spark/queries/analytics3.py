"""Round-3 batch-analytics tail: fraud/quality screens and business
curves — Benford first-digit deviation, per-group Gini concentration,
CUSUM changepoint detection, and cohort LTV. Registered last (after the
50-slot window; see queries/registry.py ordering note)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import dsum, dsum_sql
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- Benford first-digit screen ------------------------------------------
def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of lineitem prices against Benford's law —
    the classic fabricated-numbers screen. One hash aggregate over the
    digit (9 output rows); natural multi-magnitude data tracks
    log10(1+1/d), synthetic or capped data does not."""
    t = tables(spark, sf_dir)
    digit = F.substring(
        F.floor(F.col("l_extendedprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        t["lineitem"]
        .filter(F.col("l_extendedprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("tot"))
    share = F.round(F.col("n").cast("double") / F.col("tot"), 6)
    expected = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            share.alias("share"),
            expected.alias("expected"),
            F.round(F.abs(share - expected), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


_Q_BENFORD_SQL = """
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit,
         COUNT(*) AS n
  FROM lineitem WHERE l_extendedprice >= 1
  GROUP BY 1
),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM counts)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / tot, 6) AS share,
       ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected,
       ROUND(ABS(ROUND(CAST(n AS DOUBLE) / tot, 6)
                 - ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6)
         AS abs_dev
FROM counts, total
ORDER BY digit
"""


# --- Gini concentration per customer nation ------------------------------
def _q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per customer nation — revenue-
    concentration profiling via the rank formula G = 2·Σ(i·x_i)/(n·Σx)
    − (n+1)/n over values sorted ascending; both sums are decimal-exact.

    The rank comes from :func:`two_phase_rank` (operators/skew.py), NOT a
    window partitioned by nation alone: with only 25 nations a plain
    ``row_number`` caps parallelism at 25 tasks each sorting a nation's
    FULL order history — the 100 TB failure mode. The two-phase form
    buckets by price (width 10k → ~60 buckets/nation), so the sort
    parallelism scales with nation×bucket while producing bit-identical
    ranks (parity-tested against the single-window form in
    tests/test_analytics3.py)."""
    from lakehouse_architecture_spark.operators.skew import two_phase_rank

    t = tables(spark, sf_dir)
    base = t["orders"].join(
        F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(F.col("c_nationkey").alias("nation"), "o_totalprice", "o_orderkey")
    ranked = two_phase_rank(
        base, ["nation"], "o_totalprice", ["o_orderkey"], bucket_width=10000.0
    )
    return (
        ranked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "__s"),
            F.sum(
                (F.col("i") * F.col("o_totalprice")).cast("decimal(38,6)")
            ).cast("double").alias("__t"),
        )
        .select(
            "nation",
            "n",
            F.round(
                (F.lit(2.0) * F.col("__t")) / (F.col("n") * F.col("__s"))
                - ((F.col("n") + 1).cast("double") / F.col("n")),
                6,
            ).alias("gini"),
        )
        .orderBy("nation")
    )


_Q_GINI_SQL = f"""
WITH base AS (
  SELECT c_nationkey AS nation, o_totalprice, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
),
ranked AS (
  SELECT nation, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS i
  FROM base
),
agg AS (
  SELECT nation, COUNT(*) AS n,
         {dsum_sql('o_totalprice')} AS s,
         CAST(SUM(CAST(i * o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS t
  FROM ranked GROUP BY nation
)
SELECT nation, n,
       ROUND((2.0 * t) / (n * s) - (CAST(n + 1 AS DOUBLE) / n), 6) AS gini
FROM agg ORDER BY nation
"""


# --- CUSUM changepoint over the daily event-value series -----------------
def _q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint statistic over daily total event value: the day
    where the cumulative deviation from the series mean peaks — the
    standard level-shift detector. Raw rows collapse to one row per day
    first, so every window runs on a days-cardinality series."""
    t = tables(spark, sf_dir)
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    daily = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .groupBy(day.alias("day"))
        .agg(dsum("value", "x"))
    )
    mean = daily.agg((dsum("x") / F.count(F.lit(1))).alias("md"))
    wc = Window.orderBy("day")
    cusum = (
        daily.crossJoin(F.broadcast(mean))
        .withColumn(
            "cusum",
            F.sum((F.col("x") - F.col("md")).cast("decimal(38,6)"))
            .over(wc)
            .cast("double"),
        )
    )
    return (
        cusum.select(
            F.col("day"),
            F.round(F.abs(F.col("cusum")), 6).alias("abs_cusum"),
        )
        .orderBy(F.col("abs_cusum").desc(), F.col("day").asc())
        .limit(1)
        .crossJoin(F.broadcast(daily.agg(F.count(F.lit(1)).alias("n_days"))))
        .select(F.col("day").alias("change_day"), "abs_cusum", "n_days")
    )


_Q_CUSUM_SQL = f"""
WITH daily AS (
  SELECT (epoch_ns(ts) // 1000) // 86400000000 AS day,
         {dsum_sql('value')} AS x
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
m AS (SELECT {dsum_sql('x')} / COUNT(x) AS md FROM daily),
c AS (
  SELECT day,
         CAST(SUM(CAST(x - md AS DECIMAL(38,6))) OVER (ORDER BY day)
              AS DOUBLE) AS cusum
  FROM daily, m
),
nd AS (SELECT COUNT(*) AS n_days FROM daily)
SELECT day AS change_day, ROUND(ABS(cusum), 6) AS abs_cusum, n_days
FROM c, nd
ORDER BY ROUND(ABS(cusum), 6) DESC, day ASC
LIMIT 1
"""


# --- cohort LTV curve -----------------------------------------------------
def _q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer by acquisition cohort: customers
    bucketed by first-order month, revenue accumulated by months-since-
    acquisition — the LTV curve. Months are exact integer year*12+month
    (no engine date-diff semantics in play); the cumulative window runs
    per cohort over cohort-age cardinality."""
    t = tables(spark, sf_dir)
    m = (
        F.year(F.col("o_orderdate").cast("timestamp")) * 12
        + F.month(F.col("o_orderdate").cast("timestamp"))
    )
    orders = t["orders"].select(
        "o_custkey", m.alias("m"), "o_totalprice"
    )
    first = orders.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    aged = orders.join(first, "o_custkey").select(
        "cohort_m", (F.col("m") - F.col("cohort_m")).alias("age"),
        "o_totalprice", "o_custkey",
    )
    cohort_sizes = first.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    rev = aged.groupBy("cohort_m", "age").agg(dsum("o_totalprice", "rev"))
    wc = Window.partitionBy("cohort_m").orderBy("age")
    return (
        rev.withColumn(
            "cum_rev",
            F.sum(F.col("rev").cast("decimal(38,6)")).over(wc).cast("double"),
        )
        .join(F.broadcast(cohort_sizes), "cohort_m")
        .select(
            "cohort_m",
            "age",
            "n_cust",
            F.round(F.col("cum_rev") / F.col("n_cust"), 6).alias("ltv"),
        )
        .orderBy("cohort_m", "age")
    )


_Q_COHORT_LTV_SQL = f"""
WITH o AS (
  SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS m,
         o_totalprice
  FROM orders
),
first AS (SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY o_custkey),
aged AS (
  SELECT cohort_m, o.m - cohort_m AS age, o_totalprice
  FROM o JOIN first USING (o_custkey)
),
sizes AS (SELECT cohort_m, COUNT(*) AS n_cust FROM first GROUP BY cohort_m),
rev AS (
  SELECT cohort_m, age, {dsum_sql('o_totalprice')} AS rev
  FROM aged GROUP BY cohort_m, age
),
cum AS (
  SELECT cohort_m, age,
         CAST(SUM(CAST(rev AS DECIMAL(38,6)))
              OVER (PARTITION BY cohort_m ORDER BY age) AS DOUBLE) AS cum_rev
  FROM rev
)
SELECT cum.cohort_m, age, n_cust, ROUND(cum_rev / n_cust, 6) AS ltv
FROM cum JOIN sizes ON cum.cohort_m = sizes.cohort_m
ORDER BY cum.cohort_m, age
"""




# --- RFM segmentation -----------------------------------------------------
def _q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary quartile segmentation of customers from
    their order history — the marketing-analytics staple. Per-customer
    stats are one hash aggregate; the quartile cut points are one exact
    percentile aggregate broadcast back (the same no-global-sort shape as
    q_equidepth_bins); output is the 4x4x4 segment census."""
    t = tables(spark, sf_dir)
    m = (
        F.year(F.col("o_orderdate").cast("timestamp")) * 12
        + F.month(F.col("o_orderdate").cast("timestamp"))
    )
    per_cust = (
        t["orders"]
        .select("o_custkey", m.alias("m"), "o_totalprice")
        .groupBy("o_custkey")
        .agg(
            F.max("m").cast("double").alias("rec"),
            F.count(F.lit(1)).cast("double").alias("freq"),
            dsum("o_totalprice", "mon"),
        )
    )
    qs = per_cust.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c}_q{i}")
            for c in ("rec", "freq", "mon")
            for i, q in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def score(c: str):
        return (
            F.when(F.col(c) <= F.col(f"{c}_q1"), F.lit(1))
            .when(F.col(c) <= F.col(f"{c}_q2"), F.lit(2))
            .when(F.col(c) <= F.col(f"{c}_q3"), F.lit(3))
            .otherwise(F.lit(4))
        )

    return (
        per_cust.crossJoin(F.broadcast(qs))
        .select(
            score("rec").alias("r_score"),
            score("freq").alias("f_score"),
            score("mon").alias("m_score"),
            "mon",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(dsum("mon") / F.count(F.lit(1)), 6).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_Q_RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(MAX(year(o_orderdate) * 12 + month(o_orderdate)) AS DOUBLE) AS rec,
         CAST(COUNT(*) AS DOUBLE) AS freq,
         {dsum_sql('o_totalprice')} AS mon
  FROM orders GROUP BY o_custkey
),
qs AS (
  SELECT quantile_cont(rec, 0.25) AS rec_q1, quantile_cont(rec, 0.5) AS rec_q2,
         quantile_cont(rec, 0.75) AS rec_q3,
         quantile_cont(freq, 0.25) AS freq_q1, quantile_cont(freq, 0.5) AS freq_q2,
         quantile_cont(freq, 0.75) AS freq_q3,
         quantile_cont(mon, 0.25) AS mon_q1, quantile_cont(mon, 0.5) AS mon_q2,
         quantile_cont(mon, 0.75) AS mon_q3
  FROM per_cust
),
scored AS (
  SELECT CASE WHEN rec <= rec_q1 THEN 1 WHEN rec <= rec_q2 THEN 2
              WHEN rec <= rec_q3 THEN 3 ELSE 4 END AS r_score,
         CASE WHEN freq <= freq_q1 THEN 1 WHEN freq <= freq_q2 THEN 2
              WHEN freq <= freq_q3 THEN 3 ELSE 4 END AS f_score,
         CASE WHEN mon <= mon_q1 THEN 1 WHEN mon <= mon_q2 THEN 2
              WHEN mon <= mon_q3 THEN 3 ELSE 4 END AS m_score,
         mon
  FROM per_cust, qs
)
SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
       ROUND({dsum_sql('mon')} / COUNT(*), 6) AS avg_monetary
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


# --- event-type co-occurrence lift ---------------------------------------
def _q_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over users: for each unordered pair of
    event types, the user co-occurrence count, support, and lift
    P(a,b)/(P(a)·P(b)) — the set-membership complement of the sequential
    transition matrix. Distinct (user, type) pairs first, then a self-join
    bounded by types-per-user; all shares are over the distinct-user
    universe."""
    t = tables(spark, sf_dir)
    ut = t["events"].select("user_id", "event_type").distinct()
    nu = ut.select("user_id").distinct().count()
    per_type = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    pairs = (
        ut.select(F.col("user_id"), F.col("event_type").alias("ta"))
        .join(
            ut.select(F.col("user_id"), F.col("event_type").alias("tb")),
            "user_id",
        )
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    return (
        pairs.join(
            F.broadcast(per_type.select(F.col("event_type").alias("ta"), F.col("n_t").alias("n_a"))),
            "ta",
        )
        .join(
            F.broadcast(per_type.select(F.col("event_type").alias("tb"), F.col("n_t").alias("n_b"))),
            "tb",
        )
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "c_ab",
            F.round(F.col("c_ab").cast("double") / F.lit(nu), 6).alias("support"),
            F.round(
                (F.col("c_ab").cast("double") * F.lit(nu))
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


_Q_LIFT_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM ut),
per_type AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS c_ab
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, c_ab,
       ROUND(CAST(c_ab AS DOUBLE) / n, 6) AS support,
       ROUND((CAST(c_ab AS DOUBLE) * n)
             / (CAST(pa.n_t AS DOUBLE) * pb.n_t), 6) AS lift
FROM pairs
JOIN per_type pa ON type_a = pa.event_type
JOIN per_type pb ON type_b = pb.event_type, nu
ORDER BY type_a, type_b
"""


ANALYTICS3_QUERIES: list[QuerySpec] = [
    QuerySpec("q_benford", "Benford first-digit deviation screen", _q_benford, _Q_BENFORD_SQL),
    QuerySpec("q_gini", "Gini revenue concentration per nation", _q_gini, _Q_GINI_SQL),
    QuerySpec("q_cusum", "CUSUM level-shift changepoint over daily values", _q_cusum, _Q_CUSUM_SQL),
    QuerySpec("q_cohort_ltv", "cohort LTV curve (first-order-month cohorts)", _q_cohort_ltv, _Q_COHORT_LTV_SQL),
    QuerySpec("q_rfm", "RFM quartile segmentation census", _q_rfm, _Q_RFM_SQL),
    QuerySpec("q_lift", "event-type co-occurrence support/lift", _q_lift, _Q_LIFT_SQL),
]
