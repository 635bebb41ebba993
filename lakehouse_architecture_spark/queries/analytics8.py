"""Round-12 depth block, 8 queries: k-core decomposition of the part
co-occurrence graph (iterative peeling — the oracle unrolls the same
rounds as CTEs), a CDC snapshot-reconciliation audit (full-outer-join
diff with per-column drill), CUPED variance-reduced and
difference-in-differences experiment readouts, a calibration curve with
the Murphy Brier decomposition, the Nelson-Aalen cumulative-hazard
estimator (the additive sibling of q_kaplan_meier), a small-file
compaction plan (running-sum bucketing over the file manifest), and
exact Shapley-value channel attribution over a declared channel set.

Registered last — the audited OVERFLOW block convention (analytics6.py):
these wait beyond the driver's 50-slot window with committed
LOCAL_ORACLE.json rows proving the local oracle check, and the
never-green-first rotation surfaces them next driver round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.analytics import (
    calibration_bins,
    cuped_adjusted,
    diff_in_diff,
    shapley_attribution,
    shapley_coalition_pairs,
)
from lakehouse_architecture_spark.operators.graph import k_core
from lakehouse_architecture_spark.operators.integrity import snapshot_diff_audit
from lakehouse_architecture_spark.operators.partitioning import compaction_plan
from lakehouse_architecture_spark.operators.timeseries import nelson_aalen
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- k-core of the part co-occurrence graph ---------------------------------
_KCORE_K = 2
_KCORE_MIN_COMMON = 2  # edge = part pair sharing >= 2 orders
# Oracle unroll depth MUST equal the Spark side's max_rounds (ADVICE r12):
# the Spark k_core raises on non-convergence, but an under-unrolled oracle
# would silently emit a non-fixpoint filter at a deeper scale factor.
# Measured peeling depth is 3 (sf0.01) / 5 (sf0.1).
_KCORE_ROUNDS = 12


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the graph whose edges are part pairs co-ordered in ≥ 2
    orders (operators/graph.k_core): iterative peeling to the maximal
    subgraph of degree ≥ 2 — the dense-part filter run before community
    detection on co-occurrence/similarity graphs. Spark peels to the
    fixpoint (monotone, so extra rounds are the identity); the DuckDB
    oracle unrolls 8 peel rounds as CTEs — more than the measured depth
    (3 at sf0.01, 5 at sf0.1), so both engines land on the same core."""
    t = tables(spark, sf_dir)
    # Pair generation via per-order part SETS (round 16, guide §8 — use
    # what you know that the optimizer does not): an order holds at most
    # 7 line items (TPC-H schema contract), so collecting each order's
    # distinct parts is a BOUNDED-state aggregate and the co-occurrence
    # pairs expand in-plan from a ≤7-element array. This replaces the
    # former distinct + self-join-on-orderkey (3 exchanges: distinct,
    # join key, pair aggregate) with 2 (per-order set, pair aggregate)
    # and removes the join entirely. Pair multiset is identical: each
    # unordered part pair is emitted once per common order with
    # id_a < id_b, exactly as the a.n < b.n join filter did. A generic
    # co-occurrence graph with UNBOUNDED context degree must keep the
    # join form (see operators/graph.adamic_adar) — this shape is
    # query-level knowledge, not an operator default.
    per_order = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("c"))
        .agg(F.collect_set(F.col("l_partkey")).alias("ns"))
    )
    pairs = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, x -> "
                    "transform(filter(ns, y -> y > x), "
                    "y -> named_struct('id_a', x, 'id_b', y))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("nc"))
        .filter(F.col("nc") >= _KCORE_MIN_COMMON)
    )
    # edges_unique: pairs is a groupBy(id_a, id_b) output with id_a <
    # id_b — each undirected edge appears exactly once, so k_core's
    # defensive distinct() (a full edge-list shuffle) is skipped (r16)
    return k_core(
        pairs, "id_a", "id_b", k=_KCORE_K, max_rounds=12, edges_unique=True
    ).orderBy("node")


def _kcore_sql() -> str:
    head = f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS n, l_orderkey AS c FROM lineitem
),
p AS MATERIALIZED (
  SELECT a.n AS x, b.n AS y
  FROM e a JOIN e b ON a.c = b.c AND a.n < b.n
  GROUP BY 1, 2 HAVING COUNT(*) >= {_KCORE_MIN_COMMON}
),
sym0 AS MATERIALIZED (
  SELECT x AS a, y AS b FROM p UNION SELECT y, x FROM p
)"""
    rounds = []
    for i in range(_KCORE_ROUNDS):
        # every round CTE must be MATERIALIZED: sym{{i}} is referenced by
        # deg{{i}} and twice via keep{{i}} in sym{{i+1}}, so un-materialized
        # CTEs inline ~3x per round — 3^rounds plan blowup (measured: 50 s
        # vs 1 s at sf0.01)
        rounds.append(
            f""",
deg{i} AS MATERIALIZED (
  SELECT a AS node, COUNT(*) AS degree FROM sym{i} GROUP BY 1
),
keep{i} AS MATERIALIZED (SELECT node FROM deg{i} WHERE degree >= {_KCORE_K}),
sym{i + 1} AS MATERIALIZED (
  SELECT s.a, s.b FROM sym{i} s
  JOIN keep{i} ka ON s.a = ka.node
  JOIN keep{i} kb ON s.b = kb.node
)"""
        )
    tail = f""",
degF AS (SELECT a AS node, COUNT(*) AS degree FROM sym{_KCORE_ROUNDS} GROUP BY 1)
SELECT node, degree FROM degF WHERE degree >= {_KCORE_K} ORDER BY node"""
    return head + "".join(rounds) + tail


# --- snapshot reconciliation audit ------------------------------------------
def _q_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC reconciliation of two synthetic-but-deterministic snapshots of
    the orders table (operators/integrity.snapshot_diff_audit): old = orders
    with key % 7 != 0, new = orders with key % 5 != 0 and o_totalprice
    bumped by +1.0 for key % 3 == 0 — so all four statuses occur and the
    per-column drill shows exactly one drifting column. One full outer
    join on the PK + one hash aggregate expanded to a tall audit."""
    t = tables(spark, sf_dir)
    o = t["orders"]
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    return snapshot_diff_audit(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


_Q_DIFF_AUDIT_SQL = """
WITH old AS (
  SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
  FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS price,
         o_orderstatus AS status
  FROM orders WHERE o_orderkey % 5 <> 0
),
j AS (
  SELECT o.k AS ko, n.k AS kn, o.price AS po, n.price AS pn,
         o.status AS so, n.status AS sn
  FROM old o FULL OUTER JOIN new n ON o.k = n.k
),
flags AS (
  SELECT CASE WHEN ko IS NULL THEN 'added'
              WHEN kn IS NULL THEN 'removed'
              WHEN (po IS DISTINCT FROM pn) OR (so IS DISTINCT FROM sn)
                THEN 'changed'
              ELSE 'unchanged' END AS st,
         CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                   AND (po IS DISTINCT FROM pn) THEN 1 ELSE 0 END AS chp,
         CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                   AND (so IS DISTINCT FROM sn) THEN 1 ELSE 0 END AS chs
  FROM j
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
    CAST(SUM(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
    CAST(SUM(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
    CAST(SUM(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_unchanged,
    CAST(SUM(chp) AS BIGINT) AS nc_price,
    CAST(SUM(chs) AS BIGINT) AS nc_status
  FROM flags
)
SELECT kind, name, n FROM (
  SELECT 'status' AS kind, 'added' AS name, n_added AS n FROM agg
  UNION ALL SELECT 'status', 'changed', n_changed FROM agg
  UNION ALL SELECT 'status', 'removed', n_removed FROM agg
  UNION ALL SELECT 'status', 'unchanged', n_unchanged FROM agg
  UNION ALL SELECT 'column', 'o_totalprice', nc_price FROM agg
  UNION ALL SELECT 'column', 'o_orderstatus', nc_status FROM agg
)
ORDER BY kind, name
"""


# --- CUPED variance-reduced experiment readout -------------------------------
_EXP_CUT = "2024-01-16"  # events span 2024-01-01..2024-01-30; midpoint split


def _q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED readout (operators/analytics.cuped_adjusted — Deng et al.
    2013) of per-user post-period spend with the pre-period spend as the
    covariate, arms by user-id parity. One per-user hash aggregate (the
    corpus-sized step, decimal-exact) + one moments pass; the oracle
    replicates the full θ/adjustment algebra expression-for-expression."""
    t = tables(spark, sf_dir)
    cut = F.to_timestamp(F.lit(_EXP_CUT))
    per_user = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts") >= cut, F.col("value")).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("y"),
            F.sum(
                F.when(F.col("ts") < cut, F.col("value")).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("x"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "y", "x")
    )
    return cuped_adjusted(per_user, "arm", "y", "x")


_Q_CUPED_SQL = f"""
WITH per_user AS (
  SELECT user_id % 2 AS arm,
         CAST(SUM(CAST(CASE WHEN ts >= TIMESTAMP '{_EXP_CUT}' THEN value END
                       AS DECIMAL(38,6))) AS DOUBLE) AS y,
         CAST(SUM(CAST(CASE WHEN ts < TIMESTAMP '{_EXP_CUT}' THEN value END
                       AS DECIMAL(38,6))) AS DOUBLE) AS x
  FROM events GROUP BY user_id
),
agg AS (
  SELECT COUNT(*) AS n,
         COUNT(x) AS n_x,
         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(CASE WHEN x IS NOT NULL THEN y END
                       AS DECIMAL(38,6))) AS DOUBLE) AS sy_x,
         CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         COUNT(CASE WHEN arm = 0 THEN 1 END) AS n_a,
         COUNT(CASE WHEN arm = 1 THEN 1 END) AS n_b,
         CAST(SUM(CAST(CASE WHEN arm = 0 THEN y END AS DECIMAL(38,6)))
              AS DOUBLE) AS sy_a,
         CAST(SUM(CAST(CASE WHEN arm = 1 THEN y END AS DECIMAL(38,6)))
              AS DOUBLE) AS sy_b,
         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy,
         COUNT(CASE WHEN arm = 0 AND x IS NOT NULL THEN 1 END) AS nx_a,
         COUNT(CASE WHEN arm = 1 AND x IS NOT NULL THEN 1 END) AS nx_b,
         CAST(SUM(CAST(CASE WHEN arm = 0 THEN x END AS DECIMAL(38,6)))
              AS DOUBLE) AS sx_a,
         CAST(SUM(CAST(CASE WHEN arm = 1 THEN x END AS DECIMAL(38,6)))
              AS DOUBLE) AS sx_b
  FROM per_user WHERE y IS NOT NULL
),
d1 AS (SELECT *, sx / n_x AS xbar FROM agg),
d2 AS (
  SELECT *, (sxy - xbar * sy_x) / (sxx - xbar * sx) AS theta FROM d1
),
d3 AS (
  SELECT *,
         sy_a / n_a AS mean_a,
         sy_b / n_b AS mean_b,
         (sy_a - theta * (sx_a - nx_a * xbar)) / n_a AS adj_a,
         (sy_b - theta * (sx_b - nx_b * xbar)) / n_b AS adj_b,
         (syy - n * (sy / n) * (sy / n)) / (n - 1) AS var_y,
         (syy - 2 * theta * (sxy - xbar * sy_x)
              + theta * theta * (sxx - 2 * xbar * sx + n_x * xbar * xbar)
          - n * (sy / n) * (sy / n)) / (n - 1) AS var_y_adj
  FROM d2
)
SELECT n, n_a, n_b,
       ROUND(theta, 6) AS theta,
       ROUND(mean_a, 6) AS mean_a,
       ROUND(mean_b, 6) AS mean_b,
       ROUND(mean_b - mean_a, 6) AS diff_raw,
       ROUND(adj_a, 6) AS adj_mean_a,
       ROUND(adj_b, 6) AS adj_mean_b,
       ROUND(adj_b - adj_a, 6) AS diff_adj,
       ROUND(var_y, 6) AS var_y,
       ROUND(var_y_adj, 6) AS var_y_adj,
       ROUND(1 - var_y_adj / var_y, 6) AS var_reduction
FROM d3
"""


# --- difference-in-differences ----------------------------------------------
def _q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD readout (operators/analytics.diff_in_diff) over raw event
    values: groups by user-id parity, periods split at the experiment
    cut — one hash aggregate of four conditional decimal sums."""
    t = tables(spark, sf_dir)
    ev = t["events"].select(
        (F.col("user_id") % 2).alias("grp"),
        (F.col("ts") >= F.to_timestamp(F.lit(_EXP_CUT))).cast("int").alias("period"),
        F.col("value"),
    )
    return diff_in_diff(ev, "grp", "period", "value")


_Q_DID_SQL = f"""
WITH base AS (
  SELECT user_id % 2 AS grp,
         CASE WHEN ts >= TIMESTAMP '{_EXP_CUT}' THEN 1 ELSE 0 END AS period,
         value
  FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT
    COUNT(CASE WHEN grp = 0 AND period = 0 THEN 1 END) AS n_c_pre,
    COUNT(CASE WHEN grp = 0 AND period = 1 THEN 1 END) AS n_c_post,
    COUNT(CASE WHEN grp = 1 AND period = 0 THEN 1 END) AS n_t_pre,
    COUNT(CASE WHEN grp = 1 AND period = 1 THEN 1 END) AS n_t_post,
    CAST(SUM(CAST(CASE WHEN grp = 0 AND period = 0 THEN value END
                  AS DECIMAL(38,6))) AS DOUBLE) AS s_c_pre,
    CAST(SUM(CAST(CASE WHEN grp = 0 AND period = 1 THEN value END
                  AS DECIMAL(38,6))) AS DOUBLE) AS s_c_post,
    CAST(SUM(CAST(CASE WHEN grp = 1 AND period = 0 THEN value END
                  AS DECIMAL(38,6))) AS DOUBLE) AS s_t_pre,
    CAST(SUM(CAST(CASE WHEN grp = 1 AND period = 1 THEN value END
                  AS DECIMAL(38,6))) AS DOUBLE) AS s_t_post
  FROM base
)
SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
       ROUND(s_c_pre / n_c_pre, 6) AS mean_c_pre,
       ROUND(s_c_post / n_c_post, 6) AS mean_c_post,
       ROUND(s_t_pre / n_t_pre, 6) AS mean_t_pre,
       ROUND(s_t_post / n_t_post, 6) AS mean_t_post,
       ROUND((s_t_post / n_t_post - s_t_pre / n_t_pre)
             - (s_c_post / n_c_post - s_c_pre / n_c_pre), 6) AS did
FROM agg
"""


# --- calibration curve + Brier decomposition ---------------------------------
def _q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration of a deterministic pseudo-score (value mod 100 / 100)
    against the purchase outcome (operators/analytics.calibration_bins):
    10 fixed literal bins + the Murphy (1973) Brier decomposition in a
    bin = −1 summary row."""
    t = tables(spark, sf_dir)
    scored = t["events"].select(
        ((F.col("value") % 100) / 100).alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return calibration_bins(scored, "score", "label", n_bins=10)


_Q_CALIBRATION_SQL = """
WITH scored AS (
  SELECT (value % 100) / 100 AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  -- event_type IS NOT NULL mirrors the operator's NULL-label drop
  -- (a NULL event_type yields a NULL comparison, which calibration_bins
  -- filters out); without it the oracle would map NULLs to label 0
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
cells AS (
  SELECT LEAST(GREATEST(CAST(FLOOR(score * 10) AS INT), 0), 9) AS bin,
         COUNT(*) AS n,
         CAST(SUM(CAST(score AS DECIMAL(38,6))) AS DOUBLE) AS ss,
         CAST(SUM(label) AS BIGINT) AS sy
  FROM scored GROUP BY 1
),
cm AS (
  SELECT bin, n, ss, sy,
         ROUND(ss / n, 9) AS mean_score,
         ROUND(CAST(sy AS DOUBLE) / n, 9) AS event_rate
  FROM cells
),
tot AS (
  SELECT CAST(SUM(cm.n) AS BIGINT) AS n,
         CAST(SUM(CAST(cm.ss AS DECIMAL(38,6))) AS DOUBLE) / SUM(cm.n)
           AS mean_score,
         CAST(SUM(cm.sy) AS DOUBLE) / SUM(cm.n) AS event_rate,
         CAST(SUM(CAST(ROUND(cm.n * (cm.mean_score - cm.event_rate)
                             * (cm.mean_score - cm.event_rate), 9)
                       AS DECIMAL(38,6))) AS DOUBLE) / SUM(cm.n)
           AS reliability
  FROM cm
),
res AS (
  SELECT CAST(SUM(CAST(ROUND(cm.n * (cm.event_rate - g.__g)
                             * (cm.event_rate - g.__g), 9)
                       AS DECIMAL(38,6))) AS DOUBLE) / SUM(cm.n) AS resolution
  FROM cm, (SELECT ROUND(event_rate, 9) AS __g FROM tot) g
)
SELECT bin, n,
       ROUND(mean_score, 6) AS mean_score,
       ROUND(event_rate, 6) AS event_rate,
       CAST(NULL AS DOUBLE) AS reliability,
       CAST(NULL AS DOUBLE) AS resolution,
       CAST(NULL AS DOUBLE) AS uncertainty,
       CAST(NULL AS DOUBLE) AS brier
FROM cm
UNION ALL
SELECT -1, tot.n,
       ROUND(tot.mean_score, 6),
       ROUND(tot.event_rate, 6),
       ROUND(tot.reliability, 6),
       ROUND(res.resolution, 6),
       ROUND(tot.event_rate * (1 - tot.event_rate), 6),
       ROUND(tot.reliability - res.resolution
             + tot.event_rate * (1 - tot.event_rate), 6)
FROM tot, res
ORDER BY bin
"""


# --- Nelson-Aalen cumulative hazard ------------------------------------------
def _q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative hazard of the click→next-purchase latency (hours) with
    right-censoring at the user's last event — the same duration table as
    q_kaplan_meier, through operators/timeseries.nelson_aalen (additive
    hazard instead of the KM product)."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = t["events"].select("user_id", "event_type", "event_id", us.alias("us"))
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
    return nelson_aalen(clicks, "t", "e")


_Q_NELSON_AALEN_SQL = """
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
)
SELECT t, n_risk, d,
       ROUND(CAST(SUM(CAST(ROUND(CAST(d AS DOUBLE) / n_risk, 9)
                           AS DECIMAL(38,9))) OVER (ORDER BY t ASC)
                  AS DOUBLE), 6) AS cum_hazard
FROM wr WHERE d > 0 ORDER BY t
"""


# --- small-file compaction plan ----------------------------------------------
_COMPACT_TARGET = 50_000
_COMPACT_ROW_BYTES = 100  # declared per-row estimate for the synthetic manifest


def _q_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan over a per-ship-day file manifest derived from
    lineitem (operators/partitioning.compaction_plan): ~2,500 small
    "files" packed into ≈50 KB bins by a single running-sum window over
    the manifest — metadata-cardinality work at any corpus size."""
    t = tables(spark, sf_dir)
    files = (
        t["lineitem"]
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg((F.count(F.lit(1)) * _COMPACT_ROW_BYTES).alias("bytes"))
    )
    plan = compaction_plan(files, "bytes", "day", _COMPACT_TARGET)
    return plan.select(
        "bin",
        "n_files",
        "total_bytes",
        F.date_format("first_key", "yyyy-MM-dd").alias("first_key"),
        F.date_format("last_key", "yyyy-MM-dd").alias("last_key"),
    )


_Q_COMPACTION_SQL = f"""
WITH files AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         COUNT(*) * {_COMPACT_ROW_BYTES} AS bytes
  FROM lineitem GROUP BY 1
),
binned AS (
  SELECT day, bytes,
         CAST((SUM(bytes) OVER (ORDER BY day ASC) - bytes)
              // {_COMPACT_TARGET} AS BIGINT) AS bin
  FROM files
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       strftime(MIN(day), '%Y-%m-%d') AS first_key,
       strftime(MAX(day), '%Y-%m-%d') AS last_key
FROM binned GROUP BY bin ORDER BY bin
"""


# --- exact Shapley channel attribution ---------------------------------------
_SHAPLEY_CHANNELS = ("click", "error", "signup", "view")


def _q_shapley_attr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value conversion credit for the four declared
    non-conversion event types (operators/analytics.shapley_attribution):
    v(S) = purchase rate among users whose touched-channel set is exactly
    S; each channel's φ folds the 2⁴×4 literal coalition-pair table
    against the |sets| rate rows."""
    t = tables(spark, sf_dir)
    return shapley_attribution(
        t["events"],
        "user_id",
        "event_type",
        (F.col("event_type") == "purchase"),
        _SHAPLEY_CHANNELS,
    )


def _shapley_sql() -> str:
    ch_list = ", ".join(f"'{c}'" for c in sorted(_SHAPLEY_CHANNELS))
    values = ",\n    ".join(
        f"('{c}', '{wo}', '{wi}', {w!r})"
        for c, wo, wi, w in shapley_coalition_pairs(_SHAPLEY_CHANNELS)
    )
    return f"""
WITH pu_ch AS (
  SELECT DISTINCT user_id, event_type AS ch
  FROM events WHERE event_type IN ({ch_list})
),
pu_key AS (
  SELECT user_id, string_agg(ch, ',' ORDER BY ch) AS set_key
  FROM pu_ch GROUP BY user_id
),
pu_conv AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
pu AS (
  SELECT c.user_id, COALESCE(k.set_key, '') AS set_key, c.converted
  FROM pu_conv c LEFT JOIN pu_key k USING (user_id)
),
rates AS (
  SELECT set_key, ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 9) AS v
  FROM pu GROUP BY set_key
),
pairs AS (
  SELECT * FROM (VALUES
    {values}
  ) AS t(channel, wo, wi, w)
),
terms AS (
  SELECT pairs.channel,
         ROUND(pairs.w * (COALESCE(rw.v, 0.0) - COALESCE(ro.v, 0.0)), 12)
           AS term
  FROM pairs
  LEFT JOIN rates rw ON rw.set_key = pairs.wi
  LEFT JOIN rates ro ON ro.set_key = pairs.wo
)
SELECT channel,
       ROUND(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6) AS phi
FROM terms GROUP BY channel ORDER BY channel
"""


ANALYTICS8_QUERIES: tuple[QuerySpec, ...] = (
    QuerySpec(
        "q_kcore",
        "2-core of the part co-occurrence graph via iterative peeling",
        _q_kcore,
        _kcore_sql(),
    ),
    QuerySpec(
        "q_diff_audit",
        "CDC snapshot audit w/ per-column drill (vs q_snapshot_diff's per-key stream)",
        _q_diff_audit,
        _Q_DIFF_AUDIT_SQL,
    ),
    QuerySpec(
        "q_cuped",
        "CUPED variance-reduced experiment readout",
        _q_cuped,
        _Q_CUPED_SQL,
    ),
    QuerySpec(
        "q_diff_in_diff",
        "difference-in-differences causal readout",
        _q_diff_in_diff,
        _Q_DID_SQL,
    ),
    QuerySpec(
        "q_calibration",
        "calibration bins + Murphy Brier decomposition",
        _q_calibration,
        _Q_CALIBRATION_SQL,
    ),
    QuerySpec(
        "q_nelson_aalen",
        "Nelson-Aalen cumulative hazard of click->purchase latency",
        _q_nelson_aalen,
        _Q_NELSON_AALEN_SQL,
    ),
    QuerySpec(
        "q_compaction",
        "small-file compaction plan via running-sum bucketing",
        _q_compaction,
        _Q_COMPACTION_SQL,
    ),
    QuerySpec(
        "q_shapley_attr",
        "exact Shapley-value channel attribution",
        _q_shapley_attr,
        _shapley_sql(),
    ),
)
