"""Round-12 closing block, 5 queries: exact Spearman rank correlation
(midrank ties, decimal-exact rank moments), the Goh–Barabási burstiness
coefficient per event type, the Markov-order-1 conditional entropy rate
of user journeys, Weight-of-Evidence / Information-Value categorical
screening, and strict-order funnel time-to-convert quantiles through the
bounded-state exact-quantile machinery.

Registered last — the audited OVERFLOW block convention (analytics6.py):
these wait beyond the driver's 50-slot window with committed
LOCAL_ORACLE.json rows proving the local oracle check, and the
never-green-first rotation surfaces them next driver round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.features import woe_iv
from lakehouse_architecture_spark.operators.profiling import (
    spearman_corr,
    transition_entropy,
)
from lakehouse_architecture_spark.operators.timeseries import (
    burstiness,
    funnel_time_to_convert,
)
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- Spearman rank correlation ------------------------------------------------
def _q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman ρ between daily event volume and daily total value
    (operators/profiling.spearman_corr): midrank ties, Pearson on the
    ranks from decimal-exact sums — the monotone-association companion
    of q_exact_corr, immune to the value column's heavy tail."""
    t = tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("y"),
        )
    )
    return spearman_corr(daily, "x", "y")


_Q_SPEARMAN_SQL = """
WITH daily AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS x,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS y
  FROM events GROUP BY CAST(ts AS DATE)
),
pts AS (SELECT x, y FROM daily WHERE x IS NOT NULL AND y IS NOT NULL),
ranked AS (
  SELECT CAST(RANK() OVER (ORDER BY x) AS DOUBLE)
           + (CAST(COUNT(*) OVER (PARTITION BY x) AS DOUBLE) - 1) / 2 AS rx,
         CAST(RANK() OVER (ORDER BY y) AS DOUBLE)
           + (CAST(COUNT(*) OVER (PARTITION BY y) AS DOUBLE) - 1) / 2 AS ry
  FROM pts
),
agg AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(rx AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ry AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(rx * ry AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(rx * rx AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ry * ry AS DECIMAL(38,6))) AS DOUBLE) AS syy
  FROM ranked
)
SELECT n,
       ROUND(CASE WHEN SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n AS DOUBLE) * syy - sy * sy)) > 0
                  THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                       / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n AS DOUBLE) * syy - sy * sy))
             END, 6) AS rho
FROM agg
"""


# --- burstiness coefficient ----------------------------------------------------
def _q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness of inter-event times per event type
    (operators/timeseries.burstiness): each event's gap to the user's
    previous event, attributed to the event's type — −1 periodic, 0
    Poisson, →1 bursty."""
    t = tables(spark, sf_dir)
    return burstiness(t["events"], "user_id", "ts", "event_type", "event_id")


_Q_BURSTINESS_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us FROM events
),
gaps AS (
  SELECT event_type AS grp,
         (us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id))
           / 1e6 AS g
  FROM ev
),
agg AS (
  SELECT grp,
         COUNT(*) AS n_gaps,
         CAST(SUM(CAST(g AS DECIMAL(38,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(g * g AS DECIMAL(38,6))) AS DOUBLE) AS ss
  FROM gaps WHERE g IS NOT NULL GROUP BY grp
)
SELECT grp AS event_type,
       n_gaps,
       ROUND(s / n_gaps, 6) AS mean_gap_s,
       ROUND(SQRT((ss - CAST(n_gaps AS DOUBLE) * (s / n_gaps) * (s / n_gaps))
                  / (n_gaps - 1)), 6) AS std_gap_s,
       ROUND(CASE WHEN SQRT((ss - CAST(n_gaps AS DOUBLE) * (s / n_gaps)
                                  * (s / n_gaps)) / (n_gaps - 1))
                       + s / n_gaps > 0
                  THEN (SQRT((ss - CAST(n_gaps AS DOUBLE) * (s / n_gaps)
                                   * (s / n_gaps)) / (n_gaps - 1))
                        - s / n_gaps)
                       / (SQRT((ss - CAST(n_gaps AS DOUBLE) * (s / n_gaps)
                                     * (s / n_gaps)) / (n_gaps - 1))
                          + s / n_gaps)
             END, 6) AS burstiness
FROM agg ORDER BY event_type
"""


# --- conditional entropy rate ---------------------------------------------------
def _q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H(next | prev) of the per-user event stream in bits
    (operators/profiling.transition_entropy) — how predictable user
    journeys are, normalized by the uniform ceiling log2(|states|)."""
    t = tables(spark, sf_dir)
    return transition_entropy(t["events"], "user_id", "ts", "event_type", "event_id")


_Q_ENTROPY_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us FROM events
),
steps AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS prev,
         event_type AS nxt
  FROM ev
),
counts AS (
  SELECT prev, nxt, COUNT(*) AS nij FROM steps WHERE prev IS NOT NULL
  GROUP BY prev, nxt
),
tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n_total FROM counts),
-- |states| over the UNION of prev and nxt (ADVICE r12): a terminal event
-- type appearing only as a successor still counts toward the ceiling
states AS (
  SELECT COUNT(DISTINCT s) AS n_states FROM (
    SELECT prev AS s FROM counts UNION ALL SELECT nxt AS s FROM counts
  )
),
prev_tot AS (SELECT prev, SUM(nij) AS ni FROM counts GROUP BY prev),
h AS (
  SELECT -CAST(SUM(CAST(ROUND((CAST(nij AS DOUBLE) / n_total)
                              * LOG2(CAST(nij AS DOUBLE) / ni), 9)
                        AS DECIMAL(38,9))) AS DOUBLE) AS h,
         MIN(n_total) AS n_transitions,
         MIN(n_states) AS n_states
  FROM counts JOIN prev_tot USING (prev), tot, states
)
SELECT n_transitions, n_states,
       ROUND(h, 6) AS cond_entropy_bits,
       ROUND(LOG2(CAST(n_states AS DOUBLE)), 6) AS max_bits,
       ROUND(h / LOG2(CAST(n_states AS DOUBLE)), 6) AS normalized
FROM h
"""


# --- Weight of Evidence / Information Value --------------------------------------
def _q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE/IV screen of order priority against the F-status outcome
    (operators/features.woe_iv): per-level evidence weights plus the
    summed Information Value in the '(total)' row."""
    t = tables(spark, sf_dir)
    return woe_iv(
        t["orders"], "o_orderpriority", (F.col("o_orderstatus") == "F")
    )


_Q_WOE_SQL = """
WITH base AS (
  SELECT CAST(o_orderpriority AS VARCHAR) AS category,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
),
cells AS (
  SELECT category, COUNT(*) AS n, CAST(SUM(bad) AS BIGINT) AS n_bad
  FROM base GROUP BY category
),
tot AS (
  SELECT CAST(SUM(n - n_bad) AS BIGINT) AS tg, CAST(SUM(n_bad) AS BIGINT) AS tb
  FROM cells
),
scored AS (
  SELECT category, n, n_bad,
         ROUND(GREATEST(CAST(n - n_bad AS DOUBLE) / tg, 1e-4), 9) AS dist_good,
         ROUND(GREATEST(CAST(n_bad AS DOUBLE) / tb, 1e-4), 9) AS dist_bad,
         ROUND(LN(GREATEST(CAST(n - n_bad AS DOUBLE) / tg, 1e-4)
                  / GREATEST(CAST(n_bad AS DOUBLE) / tb, 1e-4)), 9) AS woe,
         ROUND((GREATEST(CAST(n - n_bad AS DOUBLE) / tg, 1e-4)
                - GREATEST(CAST(n_bad AS DOUBLE) / tb, 1e-4))
               * ROUND(LN(GREATEST(CAST(n - n_bad AS DOUBLE) / tg, 1e-4)
                          / GREATEST(CAST(n_bad AS DOUBLE) / tb, 1e-4)), 9), 9)
           AS iv_term
  FROM cells, tot
)
SELECT category, n, n_bad, dist_good, dist_bad, woe,
       ROUND(iv_term, 6) AS iv_term
FROM scored
UNION ALL
SELECT '(total)', CAST(SUM(n) AS BIGINT), CAST(SUM(n_bad) AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       ROUND(CAST(SUM(CAST(iv_term AS DECIMAL(38,9))) AS DOUBLE), 6)
FROM scored
ORDER BY category
"""


# --- funnel time-to-convert -------------------------------------------------------
_TTC_QS = {"p25": 0.25, "p50": 0.5, "p75": 0.75}


def _q_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75 latency (seconds) of each strict-order funnel leg
    view→click→purchase (operators/timeseries.funnel_time_to_convert) —
    the per-user reach times reuse the funnel's single-shuffle array
    construction and the quantiles run through the bounded-state
    exact_quantiles two-phase rank."""
    t = tables(spark, sf_dir)
    out = funnel_time_to_convert(
        t["events"], "user_id", "ts", "event_type",
        steps=("view", "click", "purchase"), qs=_TTC_QS, bucket_width=3600.0,
    )
    return out.select(
        "step_from",
        "step_to",
        F.round("p25", 4).alias("p25_s"),
        F.round("p50", 4).alias("p50_s"),
        F.round("p75", 4).alias("p75_s"),
    )


_Q_FUNNEL_TTC_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
),
t0 AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN us END) AS t0
  FROM ev GROUP BY user_id
),
t1 AS (
  SELECT e.user_id, MIN(e.us) AS t1
  FROM ev e JOIN t0 ON e.user_id = t0.user_id AND e.us > t0.t0
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.us) AS t2
  FROM ev e JOIN t1 ON e.user_id = t1.user_id AND e.us > t1.t1
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
legs AS (
  SELECT 'view' AS step_from, 'click' AS step_to,
         (t1.t1 - t0.t0) / 1e6 AS dt_s
  FROM t1 JOIN t0 USING (user_id)
  UNION ALL
  SELECT 'click', 'purchase', (t2.t2 - t1.t1) / 1e6
  FROM t2 JOIN t1 USING (user_id)
)
SELECT step_from, step_to,
       ROUND(quantile_cont(dt_s, 0.25), 4) AS p25_s,
       ROUND(quantile_cont(dt_s, 0.5), 4) AS p50_s,
       ROUND(quantile_cont(dt_s, 0.75), 4) AS p75_s
FROM legs GROUP BY step_from, step_to
ORDER BY step_from, step_to
"""


ANALYTICS9_QUERIES: tuple[QuerySpec, ...] = (
    QuerySpec(
        "q_spearman",
        "Spearman rank correlation of daily volume vs daily value",
        _q_spearman,
        _Q_SPEARMAN_SQL,
    ),
    QuerySpec(
        "q_burstiness",
        "Goh-Barabasi burstiness of inter-event gaps per type",
        _q_burstiness,
        _Q_BURSTINESS_SQL,
    ),
    QuerySpec(
        "q_entropy_rate",
        "conditional entropy of next event given previous (bits)",
        _q_entropy_rate,
        _Q_ENTROPY_SQL,
    ),
    QuerySpec(
        "q_woe_iv",
        "WOE / Information-Value screen of priority vs F status",
        _q_woe_iv,
        _Q_WOE_SQL,
    ),
    QuerySpec(
        "q_funnel_ttc",
        "exact time-to-convert quantiles per funnel leg",
        _q_funnel_ttc,
        _Q_FUNNEL_TTC_SQL,
    ),
)
