"""Round-3 profiling additions: collocation mining, cross-source overlap,
distribution drift, audit sampling, tokenizer vocabulary planning, and
join-key skew diagnostics — the pre-flight profiling passes a training-data
pipeline runs before committing 100 TB to a clean/dedup/train recipe.

Registered after ANALYTICS_QUERIES (queries/registry.py ordering note) so
earlier still-unverified queries keep their place at the head of the
driver's 50-entry correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.hashing import md5_hash64_sql
from lakehouse_architecture_spark.operators.profiling import (
    key_skew_profile,
    ks_drift,
    pmi_collocations,
    sample_k_per_group,
    source_overlap,
    vocab_coverage,
)
from lakehouse_architecture_spark.queries.analytics import _TOKS_CTE
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- PMI collocations: top-30 bigram phrases -----------------------------
def _q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return pmi_collocations(t["documents"], "text", min_count=3, k=30)


_Q_PMI_SQL = f"""
WITH {_TOKS_CTE},
uni AS (SELECT unnest(tk) AS w FROM toks),
uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
bg AS (
  SELECT tk[i.i + 1] AS w1, tk[i.i + 2] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(tk) - 2)) AS i) i
  WHERE len(tk) >= 2
),
bc AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bg GROUP BY w1, w2),
tot AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uc) AS n_uni,
         (SELECT CAST(SUM(c_xy) AS BIGINT) FROM bc) AS n_bi
)
SELECT w1, w2, c_xy,
       ROUND(LOG2((CAST(c_xy AS DOUBLE) / n_bi)
                  / ((CAST(cx.c AS DOUBLE) / n_uni)
                     * (CAST(cy.c AS DOUBLE) / n_uni))), 6) AS pmi
FROM bc JOIN uc cx ON bc.w1 = cx.w JOIN uc cy ON bc.w2 = cy.w, tot
WHERE c_xy >= 3
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT 30
"""


# --- cross-source shingle overlap matrix ---------------------------------
def _q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return source_overlap(t["documents"], "source", "text", n=5)


_SH5 = "array_to_string(list_slice(tk, i.i + 1, i.i + 5), ' ')"
_Q_SOURCE_OVERLAP_SQL = f"""
WITH {_TOKS_CTE},
sh AS (
  SELECT DISTINCT source AS g, {md5_hash64_sql(_SH5)} AS h
  FROM toks, LATERAL (SELECT unnest(generate_series(0, len(tk) - 5)) AS i) i
  WHERE len(tk) >= 5 AND length({_SH5}) > 0
),
sizes AS (SELECT g, COUNT(*) AS n_sh FROM sh GROUP BY g),
pairs AS (
  SELECT a.g AS source_a, b.g AS source_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.h = b.h AND a.g < b.g
  GROUP BY 1, 2
)
SELECT source_a, source_b, inter, sa.n_sh AS na, sb.n_sh AS nb,
       ROUND(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard,
       ROUND(CAST(inter AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
FROM pairs
JOIN sizes sa ON source_a = sa.g
JOIN sizes sb ON source_b = sb.g
ORDER BY source_a, source_b
"""


# --- binned KS drift of each event type vs the pooled distribution -------
def _q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return ks_drift(t["events"], "event_type", "value", nbins=100)


_Q_KS_DRIFT_SQL = """
WITH vals AS (
  SELECT event_type AS g, value AS v FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
scal AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM vals),
binned AS (
  SELECT g,
         CASE WHEN hi = lo THEN 0
              ELSE LEAST(CAST(FLOOR((v - lo) / (hi - lo) * 100) AS INTEGER), 99)
         END AS bin,
         COUNT(*) AS c
  FROM vals, scal GROUP BY 1, 2
),
grid AS (
  SELECT gs.g, bs.bin
  FROM (SELECT DISTINCT g FROM binned) gs,
       (SELECT unnest(generate_series(0, 99)) AS bin) bs
),
dense AS (
  SELECT grid.g, grid.bin, COALESCE(binned.c, 0) AS c
  FROM grid LEFT JOIN binned ON grid.g = binned.g AND grid.bin = binned.bin
),
cum AS (
  SELECT g, bin, SUM(c) OVER (PARTITION BY g ORDER BY bin) AS cum FROM dense
),
tot AS (SELECT g, SUM(c) AS n_g FROM dense GROUP BY g),
ocum AS (
  SELECT bin, SUM(c_all) OVER (ORDER BY bin) AS cum_all
  FROM (SELECT bin, SUM(c) AS c_all FROM dense GROUP BY bin)
),
nall AS (SELECT SUM(c) AS n_all FROM dense)
SELECT cum.g AS event_type,
       CAST(MAX(n_g) AS BIGINT) AS n_events,
       ROUND(MAX(ABS(CAST(cum AS DOUBLE) / n_g
                     - CAST(cum_all AS DOUBLE) / n_all)), 6) AS ks_stat
FROM cum JOIN tot ON cum.g = tot.g JOIN ocum ON cum.bin = ocum.bin, nall
GROUP BY cum.g
ORDER BY event_type
"""


# --- deterministic fixed-k audit sample per source -----------------------
def _q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        sample_k_per_group(t["documents"], "source", "doc_id", k=5)
        .select("source", "doc_id", "rk")
        .orderBy("source", "rk")
    )


_Q_GROUP_SAMPLE_SQL = f"""
WITH h AS (
  SELECT source, doc_id,
         {md5_hash64_sql("CAST(doc_id AS VARCHAR)")} AS hh
  FROM documents
),
r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rk
  FROM h
)
SELECT source, doc_id, rk FROM r WHERE rk <= 5 ORDER BY source, rk
"""


# --- tokenizer vocabulary size for coverage targets ----------------------
def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return vocab_coverage(t["documents"], "text", targets=(0.5, 0.8, 0.9, 0.95))


_Q_VOCAB_COVERAGE_SQL = f"""
WITH {_TOKS_CTE},
tok AS (SELECT unnest(tk) AS tok FROM toks),
tc AS (SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok),
classes AS (SELECT f, COUNT(*) AS n_types FROM tc GROUP BY f),
cum AS (
  SELECT f, n_types, f * n_types AS toks,
         SUM(f * n_types) OVER (ORDER BY f DESC) AS cum_toks,
         SUM(n_types) OVER (ORDER BY f DESC) AS cum_types
  FROM classes
),
tot AS (
  SELECT CAST(SUM(f * n_types) AS BIGINT) AS n_tokens,
         CAST(SUM(n_types) AS BIGINT) AS total_types
  FROM classes
),
tgt AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.8 AS DOUBLE),
                       CAST(0.9 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS target)
SELECT target,
       CAST(cum_types - n_types AS BIGINT)
         + CAST(CEIL((target * n_tokens
                      - CAST(cum_toks - toks AS DOUBLE)) / f) AS BIGINT)
         AS vocab_needed,
       total_types,
       n_tokens AS total_tokens
FROM cum, tot, tgt
WHERE CAST(cum_toks AS DOUBLE) >= target * n_tokens
  AND CAST(cum_toks - toks AS DOUBLE) < target * n_tokens
ORDER BY target
"""


# --- join-key skew diagnostics (salting decision input) ------------------
def _q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return key_skew_profile(t["events"], "user_id", top=10)


_Q_KEY_SKEW_SQL = """
WITH kc AS (SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY user_id),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
         MAX(cnt) AS max_cnt
  FROM kc
),
r AS (
  SELECT key, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS "rank",
         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, key ASC) AS BIGINT) AS cum_cnt
  FROM kc
)
SELECT "rank", key AS user_id, cnt,
       ROUND(CAST(cnt AS DOUBLE) / n_rows, 6) AS share,
       ROUND(CAST(cum_cnt AS DOUBLE) / n_rows, 6) AS cum_share,
       n_keys,
       ROUND(CAST(max_cnt AS DOUBLE)
             / (CAST(n_rows AS DOUBLE) / n_keys), 6) AS skew_factor
FROM r, tot
WHERE "rank" <= 10
ORDER BY "rank"
"""


# --- triangle census of the near-dup graph -------------------------------
def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.dedup import ngram_jaccard_pairs
    from lakehouse_architecture_spark.operators.graph import triangle_stats

    t = tables(spark, sf_dir)
    edges = ngram_jaccard_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=0.2
    )
    return triangle_stats(edges)


_Q_TRIANGLES_SQL = f"""
WITH {{shingles}},
shh AS (SELECT doc_id, {{hash64}} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT id_a AS a, id_b AS b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(n_inter / (sa.sz + sb.sz - n_inter), 6) >= 0.2
),
nodes AS (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges),
deg AS (SELECT v, COUNT(*) AS d FROM nodes GROUP BY v),
orient AS (
  SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS u,
         CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS v,
         CASE WHEN (da.d, e.a) < (db.d, e.b) THEN db.d ELSE da.d END AS dv
  FROM edges e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
),
wedge AS (
  SELECT o1.v AS x, o2.v AS y
  FROM orient o1 JOIN orient o2
    ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM wedge JOIN orient o ON o.u = wedge.x AND o.v = wedge.y
),
stats AS (
  SELECT COUNT(*) AS n_nodes,
         CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
  FROM deg
),
ecnt AS (SELECT COUNT(*) AS n_edges FROM edges)
SELECT n_nodes, n_edges, n_triangles, n_wedges,
       ROUND(CASE WHEN n_wedges > 0
                  THEN 3.0 * n_triangles / n_wedges ELSE 0.0 END, 6)
         AS global_clustering
FROM stats, ecnt, tri
"""


def _triangles_sql() -> str:
    from lakehouse_architecture_spark.queries.textops import (
        _HASH64,
        _SHINGLES_CTE,
    )

    return _Q_TRIANGLES_SQL.format(
        shingles=_SHINGLES_CTE.strip().removeprefix("\n"),
        hash64=_HASH64.format(expr="shingle"),
    )


# --- multi-touch attribution (time-decay) --------------------------------
def _q_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.analytics import (
        multi_touch_attribution,
    )

    t = tables(spark, sf_dir)
    return multi_touch_attribution(
        t["events"],
        conversion_type="purchase",
        touch_type="click",
        max_lag_seconds=86_400,
        model="time_decay",
        half_life_seconds=21_600,
    ).orderBy("conversion_id", "touch_id")


_Q_MULTI_TOUCH_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
),
conv AS (
  SELECT user_id AS u, event_id AS conversion_id, us AS cus
  FROM ev WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id AS u, event_id AS touch_id, us AS tus
  FROM ev WHERE event_type = 'click'
),
pairs AS (
  SELECT conversion_id, conv.u AS user_id, touch_id, cus, tus,
         POWER(0.5, CAST(cus - tus AS DOUBLE) / 21600000000) AS w_raw
  FROM conv JOIN touch ON conv.u = touch.u
  WHERE tus < cus AND cus - tus <= 86400000000
)
SELECT conversion_id, user_id, touch_id,
       (cus - tus) // 1000000 AS lag_seconds,
       ROUND(w_raw / CAST(SUM(CAST(w_raw AS DECIMAL(38,18)))
                          OVER (PARTITION BY conversion_id) AS DOUBLE), 6)
         AS weight
FROM pairs
ORDER BY conversion_id, touch_id
"""


# --- rolling exact percentiles (robust smoothing) ------------------------
def _q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-row rolling exact median and p90 of the event value —
    the robust (outlier-immune) counterpart of q_ewma's mean smoothing.
    Spark evaluates `percentile` as a window aggregate: one shuffle on the
    user key, per-frame exact interpolation, no UDF and no self-join."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-4, 0)
    )
    return t["events"].select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("roll_med"),
        F.round(F.expr("percentile(value, 0.9)").over(w), 6).alias("roll_p90"),
    )


_Q_ROLLING_MEDIAN_SQL = """
SELECT user_id, event_id, ROUND(value, 6) AS value,
       ROUND(quantile_cont(value, 0.5) OVER w, 6) AS roll_med,
       ROUND(quantile_cont(value, 0.9) OVER w, 6) AS roll_p90
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


# --- A/B experiment readout (Welch) --------------------------------------
def _q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic arm assignment (user_id parity — the hash-split
    story) and a one-pass Welch readout of the event value metric."""
    from lakehouse_architecture_spark.operators.analytics import ab_test_summary

    t = tables(spark, sf_dir)
    ev = t["events"].withColumn("arm", F.col("user_id") % 2)
    return ab_test_summary(ev, "arm", "value")


_Q_AB_TEST_SQL = """
WITH base AS (
  SELECT user_id % 2 AS arm, value FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT
    COUNT(CASE WHEN arm = 0 THEN value END) AS n_a,
    CAST(SUM(CAST(CASE WHEN arm = 0 THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS s_a,
    CAST(SUM(CAST(CASE WHEN arm = 0 THEN value END
              * CASE WHEN arm = 0 THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS ss_a,
    COUNT(CASE WHEN arm = 1 THEN value END) AS n_b,
    CAST(SUM(CAST(CASE WHEN arm = 1 THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS s_b,
    CAST(SUM(CAST(CASE WHEN arm = 1 THEN value END
              * CASE WHEN arm = 1 THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS ss_b
  FROM base
)
SELECT n_a, n_b,
       ROUND(s_a / n_a, 6) AS mean_a,
       ROUND(s_b / n_b, 6) AS mean_b,
       ROUND(s_b / n_b - s_a / n_a, 6) AS diff,
       ROUND((ss_a - n_a * (s_a / n_a) * (s_a / n_a)) / (n_a - 1), 6) AS var_a,
       ROUND((ss_b - n_b * (s_b / n_b) * (s_b / n_b)) / (n_b - 1), 6) AS var_b,
       ROUND((s_b / n_b - s_a / n_a)
             / SQRT(((ss_a - n_a * (s_a / n_a) * (s_a / n_a)) / (n_a - 1)) / n_a
                    + ((ss_b - n_b * (s_b / n_b) * (s_b / n_b)) / (n_b - 1)) / n_b), 6)
         AS welch_t,
       ROUND(((((ss_a - n_a * (s_a / n_a) * (s_a / n_a)) / (n_a - 1)) / n_a
               + ((ss_b - n_b * (s_b / n_b) * (s_b / n_b)) / (n_b - 1)) / n_b)
              * (((ss_a - n_a * (s_a / n_a) * (s_a / n_a)) / (n_a - 1)) / n_a
                 + ((ss_b - n_b * (s_b / n_b) * (s_b / n_b)) / (n_b - 1)) / n_b))
             / ((((ss_a - n_a * (s_a / n_a) * (s_a / n_a)) / (n_a - 1)) / n_a)
                * (((ss_a - n_a * (s_a / n_a) * (s_a / n_a)) / (n_a - 1)) / n_a)
                / (n_a - 1)
                + (((ss_b - n_b * (s_b / n_b) * (s_b / n_b)) / (n_b - 1)) / n_b)
                * (((ss_b - n_b * (s_b / n_b) * (s_b / n_b)) / (n_b - 1)) / n_b)
                / (n_b - 1)), 6)
         AS df_welch
FROM agg
"""


ANALYTICS2_QUERIES: list[QuerySpec] = [
    QuerySpec("q_pmi_collocations", "top-PMI bigram phrases (collocation mining)", _q_pmi, _Q_PMI_SQL),
    QuerySpec("q_source_overlap", "pairwise source shingle Jaccard/containment", _q_source_overlap, _Q_SOURCE_OVERLAP_SQL),
    QuerySpec("q_ks_drift", "binned KS drift per event type vs pooled", _q_ks_drift, _Q_KS_DRIFT_SQL),
    QuerySpec("q_group_sample", "deterministic fixed-k audit sample per source", _q_group_sample, _Q_GROUP_SAMPLE_SQL),
    QuerySpec("q_vocab_coverage", "vocab size for token-coverage targets", _q_vocab_coverage, _Q_VOCAB_COVERAGE_SQL),
    QuerySpec("q_key_skew", "heavy-key skew profile (salting decision)", _q_key_skew, _Q_KEY_SKEW_SQL),
    QuerySpec("q_triangles", "triangle census of the near-dup graph", _q_triangles, _triangles_sql()),
    QuerySpec("q_multi_touch", "time-decay multi-touch attribution weights", _q_multi_touch, _Q_MULTI_TOUCH_SQL),
    QuerySpec("q_rolling_median", "5-row rolling exact median + p90 per user", _q_rolling_median, _Q_ROLLING_MEDIAN_SQL),
    QuerySpec("q_ab_test", "one-pass Welch t-test experiment readout", _q_ab_test, _Q_AB_TEST_SQL),
]
