"""Round-14 depth block, 12 queries: distribution distance beyond the
sup-norm (exact 1-D Wasserstein, Bhattacharyya overlap, asymptotic KS
p-value), labeler-agreement QA beyond κ (McNemar marginal homogeneity,
Matthews correlation, Gwet's prevalence-robust AC1), the experiment
pre-flight's power leg (TOST equivalence, MDE/power), heavy-tail and
vocabulary calibration (Hill tail exponent, Chao1 + Good–Turing
richness), Monroe log-odds distinctive terms, and EWMA daily smoothing.

Registered last — the audited OVERFLOW block convention (analytics6.py):
these wait beyond the driver's 50-slot window with committed
LOCAL_ORACLE.json rows proving the local oracle check, and the
never-green-first rotation surfaces them next driver round. Round-14
additions were budgeted against registry.max_safe_additions (VERDICT r13
directive #6) before being declared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.hashing import md5_hash64
from lakehouse_architecture_spark.operators.analytics import (
    gwet_ac1,
    matthews_corr,
    mcnemar_test,
    power_mde,
    tost_equivalence,
)
from lakehouse_architecture_spark.operators.profiling import (
    bhattacharyya_pairs,
    hill_tail_exponent,
    ks_2samp_exact,
    wasserstein_1d,
)
from lakehouse_architecture_spark.operators.text import (
    log_odds_terms,
    vocabulary_richness,
)
from lakehouse_architecture_spark.operators.timeseries import ewma_daily
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

# shared fixtures (same shapes as analytics10 so statistics are
# directly comparable across the nonparametric family)
_SEG_SQL = """
  SELECT c_mktsegment, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
"""

_LAB_SQL = """
  SELECT CASE WHEN n_chars >= 200 THEN 'long' ELSE 'short' END AS la,
         CASE WHEN LENGTH(text) >= 150 THEN 'long' ELSE 'short' END AS lb
  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
"""

_SPLIT = (
    "CAST(('0x' || substr(md5('bal_' || CAST(c_custkey AS VARCHAR)), 1, 15))"
    " AS BIGINT) % 2"
)

_TOKS_CTE = """
toks AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
  FROM documents
)
"""


def _seg_prices(t) -> DataFrame:
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_totalprice")
    )


def _labelers(t) -> DataFrame:
    """The q_cohens_kappa labeler pair: metadata length flag vs recomputed
    text-length flag at a different threshold, NULLs filtered pre-label
    so both engines classify the same row set."""
    return (
        t["documents"]
        .filter(F.col("n_chars").isNotNull() & F.col("text").isNotNull())
        .select(
            F.when(F.col("n_chars") >= 200, "long")
            .otherwise("short")
            .alias("la"),
            F.when(F.length("text") >= 150, "long")
            .otherwise("short")
            .alias("lb"),
        )
    )


def _armed_orders(t) -> DataFrame:
    """Order values under the deterministic md5 customer hash-split (the
    q_smd_balance/q_srm_check arm assignment, joined down to orders)."""
    arm = F.when(
        md5_hash64(F.concat(F.lit("bal_"), F.col("c_custkey").cast("string")))
        % 2
        == 0,
        "a",
    ).otherwise("b")
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(arm.alias("arm"), F.col("o_totalprice").alias("x"))
    )


_ARMED_SQL = f"""
  SELECT CASE WHEN {_SPLIT} = 0 THEN 'a' ELSE 'b' END AS arm,
         o_totalprice AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
"""


# --- exact 1-D Wasserstein ----------------------------------------------------------
def _q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact W₁ (earth mover's) distance between the BUILDING and
    MACHINERY segments' order values
    (operators/profiling.wasserstein_1d) — the integral companion of
    q_ks_exact on the identical two samples: KS reports the worst ECDF
    gap, W₁ the total area between the ECDFs."""
    return wasserstein_1d(
        _seg_prices(tables(spark, sf_dir)),
        "c_mktsegment",
        "o_totalprice",
        "BUILDING",
        "MACHINERY",
    )


_Q_WASSERSTEIN_SQL = f"""
WITH seg AS ({_SEG_SQL}),
lab AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'a'
              WHEN c_mktsegment = 'MACHINERY' THEN 'b' END AS g,
         CAST(o_totalprice AS DOUBLE) AS v
  FROM seg
),
per_v AS (
  SELECT v,
         SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
  FROM lab WHERE g IS NOT NULL AND v IS NOT NULL AND NOT isnan(v)
  GROUP BY v
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
  FROM per_v
),
steps AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b,
         LEAD(v) OVER (ORDER BY v) AS v_next
  FROM per_v
)
SELECT n_a, n_b,
       ROUND(CAST(COALESCE(SUM(CAST(ROUND(
         ABS(ROUND(CAST(cum_a AS DOUBLE) / n_a, 9)
             - ROUND(CAST(cum_b AS DOUBLE) / n_b, 9)) * (v_next - v), 9)
         AS DECIMAL(38,9))), 0) AS DOUBLE), 6) AS w1
FROM steps, tot GROUP BY n_a, n_b
"""


# --- asymptotic KS p-value ------------------------------------------------------------
def _q_ks_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymptotic two-sided p-value for q_ks_exact's D via the
    Kolmogorov distribution (Smirnov 1948 / Stephens 1970 small-sample
    correction): λ = (√nₑ + 0.12 + 0.11/√nₑ)·D with nₑ = n_a·n_b/(n_a+n_b),
    p = 2·Σ_{k=1..100} (−1)^{k−1}·e^{−2k²λ²} clamped to [0, 1] — the
    decision layer over the exact statistic, computed entirely in-plan
    on the 1-row KS output (each series term rounded to 9 dp and
    decimal-folded)."""
    ks = ks_2samp_exact(
        _seg_prices(tables(spark, sf_dir)),
        "c_mktsegment",
        "o_totalprice",
        "BUILDING",
        "MACHINERY",
    )
    ne = (F.col("n_a") * F.col("n_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    lam = (F.sqrt(ne) + 0.12 + 0.11 / F.sqrt(ne)) * F.col("d")
    with_lam = ks.withColumn("lam", lam)
    series = F.aggregate(
        F.sequence(F.lit(1), F.lit(100)),
        F.lit(0.0).cast("decimal(38,9)"),
        # re-cast after each add: decimal + decimal widens to (38,8) under
        # Spark's precision-loss rules, and the accumulator type is fixed
        lambda acc, k: (
            acc
            + F.round(
                F.when(k % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
                * F.exp(
                    -2.0
                    * k.cast("double")
                    * k.cast("double")
                    * F.col("lam")
                    * F.col("lam")
                ),
                9,
            ).cast("decimal(38,9)")
        ).cast("decimal(38,9)"),
    )
    return with_lam.select(
        "n_a",
        "n_b",
        "d",
        F.round("lam", 6).alias("lambda"),
        F.round(
            F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2 * series.cast("double"))),
            6,
        ).alias("p_value"),
    )


_Q_KS_PVALUE_SQL = f"""
WITH seg AS ({_SEG_SQL}),
lab AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'a'
              WHEN c_mktsegment = 'MACHINERY' THEN 'b' END AS g,
         CAST(o_totalprice AS DOUBLE) AS v
  FROM seg
),
per_v AS (
  SELECT v,
         SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
  FROM lab WHERE g IS NOT NULL AND v IS NOT NULL AND NOT isnan(v)
  GROUP BY v
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
  FROM per_v
),
steps AS (
  SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b
  FROM per_v
),
ks AS (
  SELECT n_a, n_b,
         ROUND(MAX(ABS(ROUND(CAST(cum_a AS DOUBLE) / n_a, 9)
                       - ROUND(CAST(cum_b AS DOUBLE) / n_b, 9))), 6) AS d
  FROM steps, tot GROUP BY n_a, n_b
),
lamt AS (
  SELECT n_a, n_b, d,
         (SQRT(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
          + 0.11 / SQRT(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b))) * d AS lam
  FROM ks
),
ser AS (
  SELECT CAST(SUM(CAST(ROUND(
           CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
           * EXP(-2.0 * k * k * lam * lam), 9) AS DECIMAL(38,9)))
         AS DOUBLE) AS s
  FROM lamt, (SELECT unnest(generate_series(1, 100)) AS k)
)
SELECT n_a, n_b, d, ROUND(lam, 6) AS lambda,
       ROUND(LEAST(1.0, GREATEST(0.0, 2 * s)), 6) AS p_value
FROM lamt, ser
"""


# --- McNemar marginal homogeneity ----------------------------------------------------
def _q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's χ² between the two q_cohens_kappa document labelers
    (operators/analytics.mcnemar_test): does the recomputed text-length
    labeler fire systematically more often than the metadata labeler?
    κ measures agreement; this measures BIAS between the raters."""
    return mcnemar_test(_labelers(tables(spark, sf_dir)), "la", "lb", "long")


_Q_MCNEMAR_SQL = f"""
WITH lab AS ({_LAB_SQL})
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN la = 'long' AND lb <> 'long' THEN 1 ELSE 0 END)
            AS BIGINT) AS b,
       CAST(SUM(CASE WHEN la <> 'long' AND lb = 'long' THEN 1 ELSE 0 END)
            AS BIGINT) AS c,
       ROUND(CASE WHEN SUM(CASE WHEN la = 'long' AND lb <> 'long' THEN 1 ELSE 0 END)
                     + SUM(CASE WHEN la <> 'long' AND lb = 'long' THEN 1 ELSE 0 END) > 0
             THEN (SUM(CASE WHEN la = 'long' AND lb <> 'long' THEN 1 ELSE 0 END)
                   - SUM(CASE WHEN la <> 'long' AND lb = 'long' THEN 1 ELSE 0 END))
                  * (SUM(CASE WHEN la = 'long' AND lb <> 'long' THEN 1 ELSE 0 END)
                     - SUM(CASE WHEN la <> 'long' AND lb = 'long' THEN 1 ELSE 0 END))
                  / CAST(SUM(CASE WHEN la = 'long' AND lb <> 'long' THEN 1 ELSE 0 END)
                         + SUM(CASE WHEN la <> 'long' AND lb = 'long' THEN 1 ELSE 0 END)
                    AS DOUBLE)
             END, 6) AS chi2
FROM lab
"""


# --- Matthews correlation -------------------------------------------------------------
def _q_mcc_labelers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation between the same labeler pair
    (operators/analytics.matthews_corr) — the skew-robust single-number
    agreement score (accuracy saturates when one label dominates, the
    normal state of quality-filter labels)."""
    return matthews_corr(_labelers(tables(spark, sf_dir)), "la", "lb", "long")


_Q_MCC_SQL = f"""
WITH lab AS ({_LAB_SQL}),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN la = 'long' AND lb = 'long' THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN la <> 'long' AND lb = 'long' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN la = 'long' AND lb <> 'long' THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN la <> 'long' AND lb <> 'long' THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM lab
)
SELECT n, tp, fp, fn, tn,
       ROUND(CASE WHEN SQRT((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                            * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)) > 0
             THEN (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                  / SQRT((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                         * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn))
             END, 6) AS mcc
FROM m
"""


# --- Gwet's AC1 -------------------------------------------------------------------------
def _q_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 between the same labeler pair
    (operators/analytics.gwet_ac1) — the prevalence-robust chance
    correction: on skewed labels κ collapses toward 0 (the kappa
    paradox) while AC1 stays calibrated; reading both next to
    q_cohens_kappa is the standard labeling-QA practice."""
    return gwet_ac1(_labelers(tables(spark, sf_dir)), "la", "lb")


_Q_GWET_SQL = f"""
WITH lab AS ({_LAB_SQL}),
cells AS (SELECT la, lb, COUNT(*) AS c FROM lab GROUP BY 1, 2),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT) AS agree
  FROM cells
),
ra AS (SELECT la AS l, SUM(c) AS ca FROM cells GROUP BY 1),
rb AS (SELECT lb AS l, SUM(c) AS cb FROM cells GROUP BY 1),
marg AS (
  SELECT COALESCE(ra.l, rb.l) AS l,
         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
  FROM ra FULL JOIN rb ON ra.l = rb.l
),
terms AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_labels,
         CAST(SUM(CAST(ROUND(pi * (1 - pi), 9) AS DECIMAL(38,9))) AS DOUBLE) AS s
  FROM (SELECT CAST(ca + cb AS DOUBLE) / (2 * n) AS pi FROM marg, tot)
),
peg AS (
  SELECT CASE WHEN n_labels > 1 THEN s / (n_labels - 1) ELSE 0.0 END AS pg
  FROM terms
)
SELECT n, n_labels,
       ROUND(CAST(agree AS DOUBLE) / n, 6) AS po,
       ROUND(pg, 6) AS pe_gamma,
       ROUND(CASE WHEN pg < 1
                  THEN (CAST(agree AS DOUBLE) / n - pg) / (1 - pg) END, 6)
         AS ac1
FROM tot, terms, peg
"""


# --- Bhattacharyya overlap --------------------------------------------------------------
def _q_bhattacharyya(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Bhattacharyya coefficient + distance between event types
    over a 20-bin value histogram (operators/profiling.bhattacharyya_pairs)
    — the overlap companion of q_jsd_sources (BC = 1 identical, 0
    disjoint; D_B = −ln BC)."""
    return bhattacharyya_pairs(
        tables(spark, sf_dir)["events"], "event_type", "value", n_bins=20
    )


_Q_BHATTACHARYYA_SQL = """
WITH vals AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
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
       ROUND(CAST(SUM(CAST(ROUND(SQRT(a.p * b.p), 9) AS DECIMAL(38,9)))
                  AS DOUBLE), 6) AS bc,
       ROUND(CASE WHEN SUM(CAST(ROUND(SQRT(a.p * b.p), 9) AS DECIMAL(38,9))) > 0
                  THEN -LN(CAST(SUM(CAST(ROUND(SQRT(a.p * b.p), 9)
                                         AS DECIMAL(38,9))) AS DOUBLE))
             END, 6) AS d_b
FROM dense a JOIN dense b ON a.bin = b.bin AND a.g < b.g
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- Chao1 + Good-Turing vocabulary richness ----------------------------------------------
def _q_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 unseen-vocabulary estimate and Good–Turing unseen mass per
    source (operators/text.vocabulary_richness) — the extrapolating
    companions of q_hapax for crawl-depth decisions."""
    return vocabulary_richness(
        tables(spark, sf_dir)["documents"], "source", "text"
    )


_Q_CHAO1_SQL = f"""
WITH {_TOKS_CTE},
tok AS (SELECT source, unnest(tk) AS tok FROM toks),
freq AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
per AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS v_observed,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM freq GROUP BY 1
)
SELECT source, n_tokens, v_observed, f1, f2,
       ROUND(v_observed + f1 * CAST(f1 - 1 AS DOUBLE) / (2 * (f2 + 1)), 6)
         AS chao1,
       ROUND(CAST(f1 AS DOUBLE) / n_tokens, 6) AS gt_p0
FROM per ORDER BY source
"""


# --- Monroe log-odds distinctive terms ------------------------------------------------------
def _q_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 distinctive terms between src0 and src1 by Dirichlet-prior
    log-odds z-score (operators/text.log_odds_terms, Monroe et al. 2008)
    — the principled "what makes this source different" screen that raw
    frequency ratios get wrong on rare words."""
    return log_odds_terms(
        tables(spark, sf_dir)["documents"],
        "source",
        "text",
        "src0",
        "src1",
        alpha=0.01,
        k=15,
    )


_Q_LOG_ODDS_SQL = f"""
WITH {_TOKS_CTE},
tok AS (
  SELECT CASE WHEN source = 'src0' THEN 'a'
              WHEN source = 'src1' THEN 'b' END AS g,
         unnest(tk) AS term
  FROM toks WHERE source IN ('src0', 'src1')
),
counts AS (
  SELECT term,
         CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ya,
         CAST(SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS yb
  FROM tok GROUP BY term
),
tot AS (
  SELECT CAST(SUM(ya) AS BIGINT) AS na, CAST(SUM(yb) AS BIGINT) AS nb,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM counts
),
scored AS (
  SELECT term, ya, yb,
         ROUND(LN((ya + 0.01) / (na + 0.01 * v - ya - 0.01))
               - LN((yb + 0.01) / (nb + 0.01 * v - yb - 0.01)), 6) AS delta,
         ROUND((LN((ya + 0.01) / (na + 0.01 * v - ya - 0.01))
                - LN((yb + 0.01) / (nb + 0.01 * v - yb - 0.01)))
               / SQRT(1.0 / (ya + 0.01) + 1.0 / (yb + 0.01)), 6) AS z
  FROM counts, tot
)
SELECT term, ya, yb, delta, z
FROM scored ORDER BY ABS(z) DESC, term ASC LIMIT 15
"""


# --- TOST equivalence --------------------------------------------------------------------
def _q_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence readout of the customer hash-split on order value
    (operators/analytics.tost_equivalence, margin ±1% of the pooled
    mean) — the A/A validation that REJECTS non-equivalence instead of
    merely failing to find a difference."""
    return tost_equivalence(
        _armed_orders(tables(spark, sf_dir)), "arm", "x", "a", "b",
        margin_frac=0.01,
    )


_Q_TOST_SQL = f"""
WITH armed AS ({_ARMED_SQL}),
m AS (
  SELECT
    -- COUNT(CASE ... THEN x END): count NON-NULL x per arm, exactly the
    -- Spark builder's count(when(cond, x)) — a bare THEN 1 would also
    -- count rows whose metric is NULL (ADVICE-r13 parity class)
    CAST(COUNT(CASE WHEN arm = 'a' THEN x END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm = 'a' THEN CAST(CAST(x AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS s_a,
    CAST(SUM(CASE WHEN arm = 'a' THEN CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS q_a,
    CAST(COUNT(CASE WHEN arm = 'b' THEN x END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN arm = 'b' THEN CAST(CAST(x AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS s_b,
    CAST(SUM(CASE WHEN arm = 'b' THEN CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS q_b
  FROM armed
),
alg AS (
  SELECT n_a, n_b,
         s_a / n_a - s_b / n_b AS diff,
         ABS((s_a + s_b) / (n_a + n_b)) * 0.01 AS margin,
         SQRT(((q_a - s_a * s_a / n_a) / (n_a - 1)) / n_a
              + ((q_b - s_b * s_b / n_b) / (n_b - 1)) / n_b) AS se
  FROM m
)
SELECT n_a, n_b,
       ROUND(diff, 6) AS diff,
       ROUND(margin, 6) AS margin,
       ROUND(se, 6) AS se,
       ROUND((diff + margin) / se, 6) AS t_lower,
       ROUND((diff - margin) / se, 6) AS t_upper,
       CAST(ROUND((diff + margin) / se, 6) > 1.645
            AND ROUND((diff - margin) / se, 6) < -1.645 AS INT) AS equivalent
FROM alg
"""


# --- power / MDE pre-flight ------------------------------------------------------------------
def _q_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power pre-flight of the same hash split
    (operators/analytics.power_mde): the minimum detectable effect at
    the current n and the per-arm n a 1% relative effect would need
    (80% power, 5% two-sided) — the third pre-flight leg next to
    q_smd_balance and q_srm_check."""
    return power_mde(
        _armed_orders(tables(spark, sf_dir)), "arm", "x", "a", "b",
        target_mde_frac=0.01,
    )


_Q_POWER_SQL = f"""
WITH armed AS ({_ARMED_SQL}),
m AS (
  SELECT
    -- COUNT(CASE ... THEN x END): count NON-NULL x per arm, exactly the
    -- Spark builder's count(when(cond, x)) — a bare THEN 1 would also
    -- count rows whose metric is NULL (ADVICE-r13 parity class)
    CAST(COUNT(CASE WHEN arm = 'a' THEN x END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm = 'a' THEN CAST(CAST(x AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS s_a,
    CAST(SUM(CASE WHEN arm = 'a' THEN CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS q_a,
    CAST(COUNT(CASE WHEN arm = 'b' THEN x END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN arm = 'b' THEN CAST(CAST(x AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS s_b,
    CAST(SUM(CASE WHEN arm = 'b' THEN CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS q_b
  FROM armed
),
alg AS (
  SELECT n_a, n_b,
         (s_a + s_b) / (n_a + n_b) AS pooled_mean,
         ((q_a - s_a * s_a / n_a) / (n_a - 1)) AS va,
         ((q_b - s_b * s_b / n_b) / (n_b - 1)) AS vb
  FROM m
)
SELECT n_a, n_b,
       ROUND(pooled_mean, 6) AS mean,
       ROUND(SQRT((va + vb) / 2), 6) AS sd_pooled,
       ROUND(2.8016 * SQRT(va / n_a + vb / n_b), 6) AS mde_abs,
       ROUND(CASE WHEN ABS(pooled_mean) > 0
                  THEN 2.8016 * SQRT(va / n_a + vb / n_b) / ABS(pooled_mean)
             END, 6) AS mde_rel,
       CASE WHEN ABS(pooled_mean) * 0.01 > 0
            THEN CAST(CEIL(2 * ((va + vb) / 2)
                           * (2.8016 / (ABS(pooled_mean) * 0.01))
                           * (2.8016 / (ABS(pooled_mean) * 0.01))) AS BIGINT)
       END AS n_per_arm_target
FROM alg
"""


# --- Hill tail exponent -------------------------------------------------------------------
def _q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill MLE of the per-customer spend tail exponent above a fixed
    3M threshold (operators/profiling.hill_tail_exponent) — the one-number
    heavy-tail calibration next to q_gini/q_pareto: how fast does the
    whale tail decay?"""
    t = tables(spark, sf_dir)
    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("s")
        )
    )
    return hill_tail_exponent(spend, "s", 3_000_000.0)


_Q_HILL_SQL = """
WITH spend AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS s
  FROM orders GROUP BY o_custkey
),
tail AS (
  SELECT CAST(ROUND(LN(s / 3000000.0), 9) AS DECIMAL(38,9)) AS t
  FROM spend WHERE s > 3000000.0
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(t) AS DOUBLE) AS sm
  FROM tail
)
SELECT k, 3000000.0 AS xmin,
       ROUND(CASE WHEN sm > 0 THEN 1 + k / sm END, 6) AS alpha
FROM agg
"""


# --- EWMA daily smoothing --------------------------------------------------------------------
def _q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily event value (α = 0.3, pandas adjust=True
    semantics; operators/timeseries.ewma_daily) — the anomaly baseline
    under q_cusum/q_mom_growth, exact via day-index decay weights."""
    out = ewma_daily(tables(spark, sf_dir)["events"], "ts", "value", alpha=0.3)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "x", "ewma"
    ).orderBy("day")


_Q_EWMA_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS x
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
idx AS (SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily),
pairs AS (
  SELECT a.day, a.x,
         CAST(ROUND(POW(0.7, a.i - b.i) * b.x, 9) AS DECIMAL(38,9)) AS num,
         CAST(ROUND(POW(0.7, a.i - b.i), 9) AS DECIMAL(38,9)) AS den
  FROM idx a JOIN idx b ON b.i <= a.i
)
SELECT strftime(day, '%Y-%m-%d') AS day, ROUND(x, 6) AS x,
       ROUND(CAST(SUM(num) AS DOUBLE) / CAST(SUM(den) AS DOUBLE), 6) AS ewma
FROM pairs GROUP BY day, x ORDER BY day
"""


ANALYTICS11_QUERIES: list[QuerySpec] = [
    QuerySpec(
        "q_wasserstein",
        "exact 1-D Wasserstein distance between two segments",
        _q_wasserstein,
        _Q_WASSERSTEIN_SQL,
    ),
    QuerySpec(
        "q_ks_pvalue",
        "asymptotic Kolmogorov p-value on the exact two-sample D",
        _q_ks_pvalue,
        _Q_KS_PVALUE_SQL,
    ),
    QuerySpec(
        "q_mcnemar",
        "McNemar marginal-homogeneity chi-square between two labelers",
        _q_mcnemar,
        _Q_MCNEMAR_SQL,
    ),
    QuerySpec(
        "q_mcc_labelers",
        "Matthews correlation between two binary labelers",
        _q_mcc_labelers,
        _Q_MCC_SQL,
    ),
    QuerySpec(
        "q_gwet_ac1",
        "Gwet's AC1 prevalence-robust labeler agreement",
        _q_gwet_ac1,
        _Q_GWET_SQL,
    ),
    QuerySpec(
        "q_bhattacharyya",
        "pairwise Bhattacharyya overlap between event types",
        _q_bhattacharyya,
        _Q_BHATTACHARYYA_SQL,
    ),
    QuerySpec(
        "q_chao1",
        "Chao1 + Good-Turing vocabulary richness per source",
        _q_chao1,
        _Q_CHAO1_SQL,
    ),
    QuerySpec(
        "q_log_odds",
        "Monroe log-odds distinctive terms between two sources",
        _q_log_odds,
        _Q_LOG_ODDS_SQL,
    ),
    QuerySpec(
        "q_tost",
        "TOST equivalence readout of the hash split",
        _q_tost,
        _Q_TOST_SQL,
    ),
    QuerySpec(
        "q_power_mde",
        "experiment power / minimum-detectable-effect pre-flight",
        _q_power_mde,
        _Q_POWER_SQL,
    ),
    QuerySpec(
        "q_hill_tail",
        "Hill tail-exponent MLE of per-customer spend",
        _q_hill_tail,
        _Q_HILL_SQL,
    ),
    QuerySpec(
        "q_ewma_daily",
        "EWMA-smoothed daily event value (alpha=0.3)",
        _q_ewma_daily,
        _Q_EWMA_SQL,
    ),
]
