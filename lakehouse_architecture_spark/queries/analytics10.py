"""Round-13 depth block, 12 queries: the nonparametric two-sample /
association tail (Kendall τ-b, Mann–Whitney U + Cliff's δ, exact
two-sample KS, Cramér's V, Cohen's κ), experiment pre-flight checks
(covariate SMD balance, sample-ratio-mismatch χ²), concentration and
inequality measures (HHI + CR4, Theil T decomposition, Lorenz deciles),
Jensen–Shannon source drift, and the modal Markov next-event table.

Registered last — the audited OVERFLOW block convention (analytics6.py):
these wait beyond the driver's 50-slot window with committed
LOCAL_ORACLE.json rows proving the local oracle check, and the
never-green-first rotation surfaces them next driver round. Round-13
additions were budgeted against registry.max_safe_additions (VERDICT r12
directive #2) before being declared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_architecture_spark.functions.hashing import md5_hash64
from lakehouse_architecture_spark.operators.analytics import (
    cohens_kappa,
    event_transitions,
    smd_balance,
    srm_check,
)
from lakehouse_architecture_spark.operators.features import cramers_v
from lakehouse_architecture_spark.operators.profiling import (
    jensen_shannon_pairs,
    kendall_tau_b,
    ks_2samp_exact,
    mann_whitney_u,
    theil_index,
)
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


def _daily_events(t) -> DataFrame:
    """Shared day-grain series: (x = daily event count, y = daily total
    value) — the same collapsed series q_spearman correlates, so the
    rank-family statistics are directly comparable across queries."""
    return (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("y"),
        )
    )


_DAILY_SQL = """
  SELECT CAST(COUNT(*) AS DOUBLE) AS x,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS y
  FROM events GROUP BY CAST(ts AS DATE)
"""


# --- Kendall tau-b --------------------------------------------------------------
def _q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b (full tie correction) between daily event volume and
    daily total value (operators/profiling.kendall_tau_b) — the
    concordance companion of q_spearman on the identical collapsed
    series; exact integer pair counts, τ is the only float."""
    return kendall_tau_b(_daily_events(tables(spark, sf_dir)), "x", "y")


_Q_KENDALL_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
pts AS (
  SELECT x, y, ROW_NUMBER() OVER (ORDER BY x, y) AS rn
  FROM daily WHERE x IS NOT NULL AND y IS NOT NULL
),
pair AS (
  SELECT CAST(SUM(CASE WHEN SIGN(b.x - a.x) * SIGN(b.y - a.y) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN SIGN(b.x - a.x) * SIGN(b.y - a.y) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS discordant
  FROM pts a JOIN pts b ON a.rn < b.rn
),
nr AS (SELECT COUNT(*) AS n FROM pts),
tx AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS tx2
       FROM (SELECT COUNT(*) AS t FROM pts GROUP BY x)),
ty AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS ty2
       FROM (SELECT COUNT(*) AS t FROM pts GROUP BY y))
SELECT n,
       CAST((n * (n - 1)) / 2 AS BIGINT) AS n_pairs,
       concordant, discordant,
       ROUND(CASE WHEN (n * (n - 1) - tx2) > 0 AND (n * (n - 1) - ty2) > 0
                  THEN 2.0 * (concordant - discordant)
                       / SQRT(CAST(n * (n - 1) - tx2 AS DOUBLE)
                              * CAST(n * (n - 1) - ty2 AS DOUBLE))
             END, 6) AS tau_b
FROM pair, nr, tx, ty
"""


# --- Mann-Whitney U + Cliff's delta ----------------------------------------------
def _seg_prices(t) -> DataFrame:
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_totalprice")
    )


_SEG_SQL = """
  SELECT c_mktsegment, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
"""


def _q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U with midrank ties + Cliff's δ between the BUILDING
    and MACHINERY segments' order values
    (operators/profiling.mann_whitney_u): ranks computed on the COLLAPSED
    (group, value) count table, U decimal-exact."""
    return mann_whitney_u(
        _seg_prices(tables(spark, sf_dir)),
        "c_mktsegment",
        "o_totalprice",
        "BUILDING",
        "MACHINERY",
    )


_Q_MANN_WHITNEY_SQL = f"""
WITH seg AS ({_SEG_SQL}),
vals AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'a'
              WHEN c_mktsegment = 'MACHINERY' THEN 'b' END AS g,
         CAST(o_totalprice AS DOUBLE) AS v, COUNT(*) AS c
  FROM seg
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
),
per_v AS (
  SELECT v, SUM(c) AS tv,
         SUM(CASE WHEN g = 'a' THEN c ELSE 0 END) AS ca
  FROM vals GROUP BY v
),
mid AS (
  SELECT ca, 2 * (SUM(tv) OVER (ORDER BY v) - tv) + tv + 1 AS mid2
  FROM per_v
),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST((SELECT SUM(tv) FROM per_v) - SUM(ca) AS BIGINT) AS n_b,
         SUM(CAST(mid2 * ca AS DECIMAL(38,0))) AS r2a
  FROM mid
)
SELECT n_a, n_b,
       ROUND(CAST(r2a AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * (n_a + 1) / 2, 1)
         AS u_a,
       ROUND(CAST(n_a AS DOUBLE) * n_b
             - (CAST(r2a AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * (n_a + 1) / 2), 1)
         AS u_b,
       ROUND(CASE WHEN n_a * n_b > 0 THEN
         2 * (CAST(r2a AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * (n_a + 1) / 2)
           / (CAST(n_a AS DOUBLE) * n_b) - 1 END, 6) AS cliffs_delta
FROM agg
"""


# --- exact two-sample KS ---------------------------------------------------------
def _q_ks_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (unbinned) two-sample KS D between the same two segments
    (operators/profiling.ks_2samp_exact) — full-resolution ECDFs over the
    collapsed distinct-value table; q_ks_drift's 100-bin grid is the
    bounded-state approximation of this."""
    return ks_2samp_exact(
        _seg_prices(tables(spark, sf_dir)),
        "c_mktsegment",
        "o_totalprice",
        "BUILDING",
        "MACHINERY",
    )


_Q_KS_EXACT_SQL = f"""
WITH seg AS ({_SEG_SQL}),
per_v AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v,
         SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS cb
  FROM seg
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND o_totalprice IS NOT NULL
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
        FROM per_v),
steps AS (
  SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b
  FROM per_v
)
SELECT n_a, n_b,
       ROUND(MAX(ABS(ROUND(CAST(cum_a AS DOUBLE) / n_a, 9)
                     - ROUND(CAST(cum_b AS DOUBLE) / n_b, 9))), 6) AS d
FROM steps, tot GROUP BY n_a, n_b
"""


# --- Cramér's V -----------------------------------------------------------------
def _q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence + Cramér's V between document language and source
    (operators/features.cramers_v) — the language×source leakage screen a
    corpus split should run before assuming sources are interchangeable."""
    return cramers_v(tables(spark, sf_dir)["documents"], "lang", "source")


_Q_CRAMERS_SQL = """
WITH cells AS (
  SELECT lang AS x, source AS y, COUNT(*) AS c FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2
),
mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
dense AS (
  SELECT mx.x, my.y, mx.cx, my.cy, COALESCE(cells.c, 0) AS o
  FROM mx CROSS JOIN my
  LEFT JOIN cells ON cells.x = mx.x AND cells.y = my.y
),
chi AS (
  SELECT CAST(SUM(CAST(ROUND(
           (o - CAST(cx AS DOUBLE) * cy / n)
           * (o - CAST(cx AS DOUBLE) * cy / n)
           / (CAST(cx AS DOUBLE) * cy / n), 9) AS DECIMAL(38,9)))
         AS DOUBLE) AS chi2, MIN(n) AS n
  FROM dense, tot
),
dims AS (SELECT COUNT(DISTINCT x) AS r, COUNT(DISTINCT y) AS c2 FROM cells)
SELECT n, CAST(r AS BIGINT) AS r, CAST(c2 AS BIGINT) AS c,
       ROUND(chi2, 6) AS chi2,
       ROUND(CASE WHEN LEAST(r, c2) > 1 AND n > 0
                  THEN SQRT(chi2 / (n * (LEAST(r, c2) - 1))) END, 6) AS v
FROM chi, dims
"""


# --- HHI / CR4 concentration ------------------------------------------------------
def _q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of order revenue across
    customer nations, plus the CR4 top-4 concentration ratio — the
    market-share screen of where a corpus (or revenue) is concentrated.
    One join + one |nations|-cardinality agg; shares² decimal-folded."""
    t = tables(spark, sf_dir)
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("s_g")
        )
    )
    tot = rev.agg(F.sum(F.col("s_g").cast("decimal(38,6)")).cast("double").alias("s"))
    shares = rev.crossJoin(F.broadcast(tot)).select(
        "nation",
        (F.col("s_g") / F.col("s")).alias("share"),
        F.row_number()
        .over(Window.orderBy(F.col("s_g").desc(), F.col("nation").asc()))
        .alias("rk"),
    )
    return shares.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.round(
            F.sum(F.round(F.col("share") * F.col("share"), 9).cast("decimal(38,9)"))
            .cast("double"),
            6,
        ).alias("hhi"),
        F.round(
            F.sum(
                F.when(F.col("rk") <= 4, F.round(F.col("share"), 9)).otherwise(0)
                .cast("decimal(38,9)")
            ).cast("double"),
            6,
        ).alias("cr4"),
    )


_Q_HHI_SQL = """
WITH rev AS (
  SELECT c_nationkey AS nation,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS s_g
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(CAST(s_g AS DECIMAL(38,6))) AS DOUBLE) AS s FROM rev),
shares AS (
  SELECT nation, s_g / s AS share,
         ROW_NUMBER() OVER (ORDER BY s_g DESC, nation ASC) AS rk
  FROM rev, tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       ROUND(CAST(SUM(CAST(ROUND(share * share, 9) AS DECIMAL(38,9)))
                  AS DOUBLE), 6) AS hhi,
       ROUND(CAST(SUM(CAST(CASE WHEN rk <= 4 THEN ROUND(share, 9)
                                ELSE 0 END AS DECIMAL(38,9)))
                  AS DOUBLE), 6) AS cr4
FROM shares
"""


# --- Jensen-Shannon source drift ---------------------------------------------------
def _q_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (bits) between sources over a
    20-bin document-length histogram
    (operators/profiling.jensen_shannon_pairs) — the symmetric,
    always-finite companion of q_psi_drift for corpus-mix monitoring."""
    return jensen_shannon_pairs(
        tables(spark, sf_dir)["documents"], "source", "n_chars", n_bins=20
    )


_Q_JSD_SQL = """
WITH vals AS (
  SELECT source AS g, CAST(n_chars AS DOUBLE) AS v FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
),
scal AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM vals),
binned AS (
  SELECT g,
         CASE WHEN hi = lo THEN 0
              ELSE LEAST(CAST(FLOOR((v - lo) / (hi - lo) * 20) AS INT), 19)
         END AS bin
  FROM vals, scal
),
counts AS (SELECT g, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2),
tot AS (SELECT g, SUM(c) AS n_g FROM counts GROUP BY g),
shares AS (
  SELECT counts.g, bin, CAST(c AS DOUBLE) / n_g AS p
  FROM counts JOIN tot ON counts.g = tot.g
),
dense AS (
  SELECT gs.g, bs.bin, COALESCE(shares.p, 0.0) AS p
  FROM (SELECT DISTINCT g FROM shares) gs
  CROSS JOIN (SELECT DISTINCT bin FROM shares) bs
  LEFT JOIN shares ON shares.g = gs.g AND shares.bin = bs.bin
)
SELECT a.g AS group_a, b.g AS group_b,
       -- unhalved 9-dp terms decimal-summed, then one exact binary x0.5:
       -- halving per term creates 10th-digit ties that the two engines'
       -- rounding modes resolve differently (caught live at sf0.1)
       ROUND(CAST(SUM(CAST(
         (CASE WHEN a.p > 0
               THEN ROUND(a.p * LOG2(a.p / ((a.p + b.p) / 2)), 9) ELSE 0 END
          + CASE WHEN b.p > 0
                 THEN ROUND(b.p * LOG2(b.p / ((a.p + b.p) / 2)), 9) ELSE 0 END)
         AS DECIMAL(38,9))) AS DOUBLE) * 0.5, 6) AS jsd_bits
FROM dense a JOIN dense b ON a.bin = b.bin AND a.g < b.g
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- modal next event -------------------------------------------------------------
def _q_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per previous event type: the MODAL next event with its transition
    probability (operators/analytics.event_transitions + a row_number
    pick with a total-order tiebreak) — the argmax serving table of the
    Markov matrix q_event_transitions/q_entropy_rate summarize."""
    tr = event_transitions(tables(spark, sf_dir)["events"])
    w = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("next_type").asc()
    )
    return (
        tr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("prev_type", "next_type", "n", "prob")
        .orderBy("prev_type")
    )


_Q_NEXT_EVENT_SQL = """
WITH seq AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS prev_type,
         event_type AS next_type
  FROM (SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
        FROM events)
),
counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n FROM seq
  WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT prev_type, SUM(n) AS nt FROM counts GROUP BY prev_type),
ranked AS (
  SELECT counts.prev_type, next_type, n,
         ROUND(CAST(n AS DOUBLE) / nt, 6) AS prob,
         ROW_NUMBER() OVER (PARTITION BY counts.prev_type
                            ORDER BY n DESC, next_type ASC) AS rk
  FROM counts JOIN tot ON counts.prev_type = tot.prev_type
)
SELECT prev_type, next_type, n, prob FROM ranked WHERE rk = 1
ORDER BY prev_type
"""


# --- SMD covariate balance ---------------------------------------------------------
_SPLIT = "CAST(('0x' || substr(md5('bal_' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 2"


def _arm_col() -> F.Column:
    return F.when(
        md5_hash64(F.concat(F.lit("bal_"), F.col("c_custkey").cast("string"))) % 2
        == 0,
        "a",
    ).otherwise("b")


def _q_smd_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance (standardized mean differences) of a
    deterministic md5 hash-split of customers on account balance and
    nation key (operators/analytics.smd_balance) — the pre-flight check
    that must pass before q_cuped/q_ab_test's estimates mean anything."""
    cust = tables(spark, sf_dir)["customer"].withColumn("arm", _arm_col())
    return smd_balance(cust, "arm", ["c_acctbal", "c_nationkey"])


_Q_SMD_SQL = f"""
WITH armed AS (
  SELECT CASE WHEN {_SPLIT} = 0 THEN 'a' ELSE 'b' END AS arm,
         CAST(c_acctbal AS DOUBLE) AS c_acctbal,
         CAST(c_nationkey AS DOUBLE) AS c_nationkey
  FROM customer
),
moments AS (
  SELECT
    COUNT(CASE WHEN arm = 'a' THEN c_acctbal END) AS n_a_bal,
    CAST(SUM(CAST(CASE WHEN arm = 'a' THEN c_acctbal END AS DECIMAL(38,6))) AS DOUBLE) AS s_a_bal,
    CAST(SUM(CAST(CASE WHEN arm = 'a' THEN c_acctbal * c_acctbal END AS DECIMAL(38,6))) AS DOUBLE) AS q_a_bal,
    COUNT(CASE WHEN arm = 'b' THEN c_acctbal END) AS n_b_bal,
    CAST(SUM(CAST(CASE WHEN arm = 'b' THEN c_acctbal END AS DECIMAL(38,6))) AS DOUBLE) AS s_b_bal,
    CAST(SUM(CAST(CASE WHEN arm = 'b' THEN c_acctbal * c_acctbal END AS DECIMAL(38,6))) AS DOUBLE) AS q_b_bal,
    COUNT(CASE WHEN arm = 'a' THEN c_nationkey END) AS n_a_nat,
    CAST(SUM(CAST(CASE WHEN arm = 'a' THEN c_nationkey END AS DECIMAL(38,6))) AS DOUBLE) AS s_a_nat,
    CAST(SUM(CAST(CASE WHEN arm = 'a' THEN c_nationkey * c_nationkey END AS DECIMAL(38,6))) AS DOUBLE) AS q_a_nat,
    COUNT(CASE WHEN arm = 'b' THEN c_nationkey END) AS n_b_nat,
    CAST(SUM(CAST(CASE WHEN arm = 'b' THEN c_nationkey END AS DECIMAL(38,6))) AS DOUBLE) AS s_b_nat,
    CAST(SUM(CAST(CASE WHEN arm = 'b' THEN c_nationkey * c_nationkey END AS DECIMAL(38,6))) AS DOUBLE) AS q_b_nat
  FROM armed
),
tall AS (
  SELECT 'c_acctbal' AS covariate, n_a_bal AS n_a, s_a_bal AS s_a,
         q_a_bal AS q_a, n_b_bal AS n_b, s_b_bal AS s_b, q_b_bal AS q_b
  FROM moments
  UNION ALL
  SELECT 'c_nationkey', n_a_nat, s_a_nat, q_a_nat, n_b_nat, s_b_nat, q_b_nat
  FROM moments
)
SELECT covariate,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(s_a / n_a, 6) AS mean_a,
       ROUND(s_b / n_b, 6) AS mean_b,
       ROUND(CASE WHEN SQRT(((q_a - s_a * s_a / n_a) / (n_a - 1)
                             + (q_b - s_b * s_b / n_b) / (n_b - 1)) / 2) > 0
                  THEN (s_a / n_a - s_b / n_b)
                       / SQRT(((q_a - s_a * s_a / n_a) / (n_a - 1)
                               + (q_b - s_b * s_b / n_b) / (n_b - 1)) / 2)
             END, 6) AS smd
FROM tall ORDER BY covariate
"""


# --- sample-ratio mismatch -----------------------------------------------------------
def _q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch χ² of the same customer hash split against
    its 50/50 design (operators/analytics.srm_check) — the A/B-test
    invalidator check; a healthy md5 split should land far below the
    χ² ≈ 10.8 alarm bar."""
    cust = tables(spark, sf_dir)["customer"].withColumn("arm", _arm_col())
    return srm_check(cust, "arm", {"a": 0.5, "b": 0.5})


_Q_SRM_SQL = f"""
WITH armed AS (
  SELECT CASE WHEN {_SPLIT} = 0 THEN 'a' ELSE 'b' END AS arm FROM customer
),
counts AS (SELECT arm, COUNT(*) AS observed FROM armed GROUP BY arm),
tot AS (SELECT SUM(observed) AS n_total FROM counts),
cells AS (
  SELECT arm, observed, 0.5 * n_total AS expected_n FROM counts, tot
),
chi AS (
  SELECT CAST(SUM(CAST(ROUND((observed - expected_n) * (observed - expected_n)
                              / expected_n, 9) AS DECIMAL(38,9))) AS DOUBLE)
           AS chi2
  FROM cells
)
SELECT arm, observed, ROUND(expected_n, 6) AS expected_n,
       ROUND(chi2, 6) AS chi2
FROM cells, chi ORDER BY arm
"""


# --- Theil T inequality decomposition --------------------------------------------------
def _q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of per-customer total spend, decomposed within
    vs between nations (operators/profiling.theil_index) — the
    additively-decomposable companion of q_gini: how much spend
    inequality is explained by nation membership."""
    t = tables(spark, sf_dir)
    spend = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("spend")
        )
    )
    return theil_index(spend, "c_nationkey", "spend")


_Q_THEIL_SQL = """
WITH spend AS (
  SELECT c_custkey, c_nationkey AS g,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
mu AS (
  SELECT CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
         CAST(COUNT(*) - SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_excluded,
         CAST(SUM(CAST(CASE WHEN x > 0 THEN x END AS DECIMAL(38,6)))
              AS DOUBLE)
           / SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS mu
  FROM spend
),
per_g AS (
  SELECT g, COUNT(*) AS n_g,
         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS s_g,
         CAST(SUM(CAST(ROUND((x / mu) * LN(x / mu), 9) AS DECIMAL(38,9)))
              AS DOUBLE) AS t_g_sum,
         MIN(n) AS n, MIN(n_excluded) AS n_excluded, MIN(mu) AS mu
  FROM spend, mu WHERE x > 0 GROUP BY g
),
rows_ AS (
  SELECT n, n_excluded, mu,
         ROUND(t_g_sum / n, 9) AS tot_part,
         ROUND((s_g / (n * mu)) * ((mu / (s_g / n_g)) * (t_g_sum / n_g)
                                   - LN((s_g / n_g) / mu)), 9)
           AS within_part,
         ROUND((s_g / (n * mu)) * LN((s_g / n_g) / mu), 9) AS between_part
  FROM per_g
)
SELECT n, MIN(n_excluded) AS n_excluded,
       ROUND(MIN(mu), 6) AS mean,
       ROUND(CAST(SUM(CAST(tot_part AS DECIMAL(38,9))) AS DOUBLE), 6)
         AS theil_total,
       ROUND(CAST(SUM(CAST(within_part AS DECIMAL(38,9))) AS DOUBLE), 6)
         AS theil_within,
       ROUND(CAST(SUM(CAST(between_part AS DECIMAL(38,9))) AS DOUBLE), 6)
         AS theil_between
FROM rows_ GROUP BY n
"""


# --- Lorenz deciles ----------------------------------------------------------------
def _q_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile Lorenz curve of per-customer total spend — the curve behind
    q_gini, served as 10 rows: each revenue decile's customer count,
    revenue share, and cumulative share. Deterministic decile assignment
    via ((rank−1)·10) div n with a custkey tiebreak — the rank comes
    from skew.two_phase_rank (bucketed, bit-identical to the global
    window), never a single-task sort over all customers; the 10-row
    cumulative window is metadata-sized."""
    from lakehouse_architecture_spark.operators.skew import two_phase_rank

    t = tables(spark, sf_dir)
    spend = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("spend")
        )
    )
    n_row = spend.agg(F.count(F.lit(1)).alias("n_all"))
    # bucket_width=None: data-derived width (round 14, VERDICT r13 #1) —
    # the previous fixed 50k constant degenerates to one bucket whenever
    # per-customer spend spans less than one width
    ranked = two_phase_rank(
        spend, [], "spend", ["c_custkey"], bucket_width=None, rank_col="rk"
    ).crossJoin(F.broadcast(n_row))
    dec = ranked.select(
        F.expr("((rk - 1) * 10) div n_all").alias("decile"), "spend"
    )
    per_dec = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.col("spend").cast("decimal(38,6)")).cast("double").alias("revenue"),
    )
    tot = per_dec.agg(
        F.sum(F.col("revenue").cast("decimal(38,6)")).cast("double").alias("s")
    )
    w = Window.orderBy("decile")
    shares = per_dec.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_customers",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.col("s"), 6).alias("share"),
    )
    return shares.select(
        "decile",
        "n_customers",
        "revenue",
        "share",
        F.round(
            F.sum(F.col("share").cast("decimal(38,6)")).over(w).cast("double"), 6
        ).alias("cum_share"),
    ).orderBy("decile")


_Q_LORENZ_SQL = """
WITH spend AS (
  SELECT c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
),
ranked AS (
  SELECT spend,
         ROW_NUMBER() OVER (ORDER BY spend ASC, c_custkey ASC) AS rk,
         (SELECT COUNT(*) FROM spend) AS n_all
  FROM spend
),
dec AS (SELECT ((rk - 1) * 10) // n_all AS decile, spend FROM ranked),
per_dec AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(spend AS DECIMAL(38,6))) AS DOUBLE) AS revenue
  FROM dec GROUP BY decile
),
tot AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE) AS s
        FROM per_dec),
shares AS (
  SELECT decile, n_customers, ROUND(revenue, 2) AS revenue,
         ROUND(revenue / s, 6) AS share
  FROM per_dec, tot
)
SELECT decile, n_customers, revenue, share,
       ROUND(CAST(SUM(CAST(share AS DECIMAL(38,6)))
                  OVER (ORDER BY decile) AS DOUBLE), 6) AS cum_share
FROM shares ORDER BY decile
"""


# --- Cohen's kappa -----------------------------------------------------------------
def _q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ agreement between two deterministic document labelers —
    the metadata length flag (n_chars ≥ 200) vs a recomputed text-length
    flag at a different threshold (length(text) ≥ 150)
    (operators/analytics.cohens_kappa): the labeling-QA statistic every
    LLM training-data pipeline runs between heuristic and model raters.

    NULL n_chars/text rows are filtered BEFORE labeling (ADVICE r13):
    when().otherwise() would classify a NULL comparison as 'short' while
    the SQL oracle's WHERE drops the row — both engines must label the
    same row set."""
    docs = (
        tables(spark, sf_dir)["documents"]
        .filter(F.col("n_chars").isNotNull() & F.col("text").isNotNull())
        .select(
            F.when(F.col("n_chars") >= 200, "long")
            .otherwise("short")
            .alias("ra"),
            F.when(F.length("text") >= 150, "long")
            .otherwise("short")
            .alias("rb"),
        )
    )
    return cohens_kappa(docs, "ra", "rb")


_Q_KAPPA_SQL = """
WITH lab AS (
  SELECT CASE WHEN n_chars >= 200 THEN 'long' ELSE 'short' END AS la,
         CASE WHEN LENGTH(text) >= 150 THEN 'long' ELSE 'short' END AS lb
  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
),
cells AS (SELECT la, lb, COUNT(*) AS c FROM lab GROUP BY 1, 2),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT) AS agree
  FROM cells
),
ra AS (SELECT la, SUM(c) AS ca FROM cells GROUP BY la),
rb AS (SELECT lb, SUM(c) AS cb FROM cells GROUP BY lb),
pe AS (
  -- COALESCE: disjoint rater vocabularies have zero chance agreement
  SELECT CAST(COALESCE(SUM(CAST(ROUND(CAST(ca AS DOUBLE) * cb
                              / (CAST(n AS DOUBLE) * n), 9)
                       AS DECIMAL(38,9))), 0) AS DOUBLE) AS pe
  FROM ra JOIN rb ON ra.la = rb.lb, tot
),
labels AS (
  SELECT COUNT(DISTINCT l) AS n_labels FROM (
    SELECT la AS l FROM cells UNION ALL SELECT lb FROM cells
  )
)
SELECT n, CAST(n_labels AS BIGINT) AS n_labels,
       ROUND(CAST(agree AS DOUBLE) / n, 6) AS po,
       ROUND(pe, 6) AS pe,
       ROUND(CASE WHEN pe < 1
                  THEN (CAST(agree AS DOUBLE) / n - pe) / (1 - pe) END, 6)
         AS kappa
FROM tot, pe, labels
"""


ANALYTICS10_QUERIES: tuple[QuerySpec, ...] = (
    QuerySpec(
        "q_kendall_tau",
        "Kendall tau-b concordance of daily volume vs daily value",
        _q_kendall_tau,
        _Q_KENDALL_SQL,
    ),
    QuerySpec(
        "q_mann_whitney",
        "Mann-Whitney U + Cliff's delta between two segments",
        _q_mann_whitney,
        _Q_MANN_WHITNEY_SQL,
    ),
    QuerySpec(
        "q_ks_exact",
        "exact two-sample KS D between two segments",
        _q_ks_exact,
        _Q_KS_EXACT_SQL,
    ),
    QuerySpec(
        "q_cramers_v",
        "chi-square + Cramer's V of language vs source",
        _q_cramers_v,
        _Q_CRAMERS_SQL,
    ),
    QuerySpec(
        "q_hhi",
        "Herfindahl + CR4 revenue concentration by nation",
        _q_hhi,
        _Q_HHI_SQL,
    ),
    QuerySpec(
        "q_jsd_sources",
        "pairwise Jensen-Shannon divergence between sources",
        _q_jsd_sources,
        _Q_JSD_SQL,
    ),
    QuerySpec(
        "q_next_event",
        "modal next event per previous type (Markov argmax)",
        _q_next_event,
        _Q_NEXT_EVENT_SQL,
    ),
    QuerySpec(
        "q_smd_balance",
        "standardized-mean-difference balance of a hash split",
        _q_smd_balance,
        _Q_SMD_SQL,
    ),
    QuerySpec(
        "q_srm_check",
        "sample-ratio-mismatch chi-square of the hash split",
        _q_srm_check,
        _Q_SRM_SQL,
    ),
    QuerySpec(
        "q_theil_index",
        "Theil T inequality decomposed within/between nations",
        _q_theil_index,
        _Q_THEIL_SQL,
    ),
    QuerySpec(
        "q_lorenz",
        "decile Lorenz curve of per-customer spend",
        _q_lorenz,
        _Q_LORENZ_SQL,
    ),
    QuerySpec(
        "q_cohens_kappa",
        "Cohen's kappa between two deterministic doc labelers",
        _q_cohens_kappa,
        _Q_KAPPA_SQL,
    ),
)
