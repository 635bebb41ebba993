"""Round-4 closing batch: Tukey-fence outliers, weekly churn, DAU/WAU
stickiness, ship-latency distribution, Pareto 80/20 concentration,
token-graph degree profile, rational recency-decayed aggregates, and SAX
symbolization. Registered last (after the 50-slot window;
queries/registry.py ordering note)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.materialize import materialize_small

from lakehouse_architecture_spark.functions.aggregates import dsum, dsum_sql
from lakehouse_architecture_spark.operators.skew import exact_quantiles
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

_US = "unix_micros(cast(ts as timestamp))"
_DUCK_US = "(epoch_ns(ts) // 1000)"
_DAY_US = 86400000000


# --- Tukey IQR outlier fences -----------------------------------------------
def _q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census per return flag: Q1/Q3 from exact
    percentiles, fences at 1.5 IQR, one pass counts rows outside — the
    rank-free robust complement of q_zscore_outliers (quantile aggregate
    broadcast back; no sort of the data). Quantiles come from
    :func:`exact_quantiles` (bounded-state two-phase rank, bit-compatible
    with Spark's ``percentile``), never a raw-row value-map aggregate."""
    t = tables(spark, sf_dir)
    li = t["lineitem"].select("l_returnflag", "l_extendedprice")
    q = exact_quantiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        {"__q1": 0.25, "__q3": 0.75},
        bucket_width=100.0,  # price range ~1e5 -> ~1k counted buckets
    )
    fenced = li.join(F.broadcast(q), on="l_returnflag").select(
        "l_returnflag",
        "__q1",
        "__q3",
        (
            (F.col("l_extendedprice") < F.col("__q1") - 1.5 * (F.col("__q3") - F.col("__q1")))
            | (F.col("l_extendedprice") > F.col("__q3") + 1.5 * (F.col("__q3") - F.col("__q1")))
        ).alias("__out"),
    )
    return (
        fenced.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("__q1"), 4).alias("q1"),
            F.round(F.max("__q3"), 4).alias("q3"),
            F.sum(F.col("__out").cast("bigint")).alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            "n",
            "q1",
            "q3",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 6).alias("outlier_share"),
        )
        .orderBy("l_returnflag")
    )


_Q_IQR_SQL = """
WITH q AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.25) AS q1,
         quantile_cont(l_extendedprice, 0.75) AS q3
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag, COUNT(*) AS n,
       ROUND(MAX(q1), 4) AS q1, ROUND(MAX(q3), 4) AS q3,
       CAST(SUM(CASE WHEN l_extendedprice < q1 - 1.5 * (q3 - q1)
                      OR l_extendedprice > q3 + 1.5 * (q3 - q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN l_extendedprice < q1 - 1.5 * (q3 - q1)
                       OR l_extendedprice > q3 + 1.5 * (q3 - q1)
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS outlier_share
FROM lineitem l JOIN q USING (l_returnflag)
GROUP BY 1 ORDER BY 1
"""


# --- monthly churn ----------------------------------------------------------
def _q_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week churn: users active in week w with NO activity in
    w+1 (anti-join on the distinct (user, week-index) table — churn over
    the user-week cardinality, never raw events). Week index is epoch-day
    arithmetic, identical on both engines. (Weekly, not monthly: the
    events fixture spans 30 days.)"""
    t = tables(spark, sf_dir)
    um = (
        t["events"]
        .select(
            "user_id",
            F.expr(f"{_US} div {_DAY_US} div 7").alias("mon"),
        )
        .distinct()
    )
    # user-week table referenced 4x (shifted copy, anti-join, active
    # counts, last-week scalar) — materialized so events dedups ONCE
    um = materialize_small(um)
    nxt = um.select("user_id", (F.col("mon") - 1).alias("mon"))
    churned = um.join(nxt, on=["user_id", "mon"], how="left_anti")
    active = um.groupBy("mon").agg(F.count(F.lit(1)).alias("n_active"))
    chn = churned.groupBy("mon").agg(F.count(F.lit(1)).alias("n_churned"))
    last = um.agg(F.max("mon").alias("__last"))
    return (
        active.join(chn, on="mon", how="left")
        .crossJoin(F.broadcast(last))
        .filter(F.col("mon") < F.col("__last"))  # final month has no m+1
        .select(
            "mon",
            "n_active",
            F.coalesce(F.col("n_churned"), F.lit(0)).alias("n_churned"),
            F.round(
                F.coalesce(F.col("n_churned"), F.lit(0)) / F.col("n_active"), 6
            ).alias("churn_rate"),
        )
        .orderBy("mon")
    )


_Q_CHURN_SQL = """
WITH um AS (
  SELECT DISTINCT user_id,
         (epoch_ns(ts) // 1000) // 86400000000 // 7 AS mon
  FROM events
),
churned AS (
  SELECT a.mon, COUNT(*) AS n_churned
  FROM um a
  WHERE NOT EXISTS (
    SELECT 1 FROM um b WHERE b.user_id = a.user_id AND b.mon = a.mon + 1
  )
  GROUP BY 1
),
active AS (SELECT mon, COUNT(*) AS n_active FROM um GROUP BY 1),
last AS (SELECT MAX(mon) AS last_mon FROM um)
SELECT CAST(a.mon AS BIGINT) AS mon, a.n_active,
       COALESCE(c.n_churned, 0) AS n_churned,
       ROUND(COALESCE(c.n_churned, 0) * 1.0 / a.n_active, 6) AS churn_rate
FROM active a LEFT JOIN churned c USING (mon), last
WHERE a.mon < last.last_mon
ORDER BY mon
"""


# --- DAU/MAU stickiness -----------------------------------------------------
def _q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product stickiness per week: mean daily active users over weekly
    active users (DAU/WAU) — two distinct-count aggregates on (user, day)
    and (user, week) cardinalities. (Weekly: the events fixture spans 30
    days.)"""
    t = tables(spark, sf_dir)
    base = t["events"].select(
        "user_id",
        F.expr(f"{_US} div {_DAY_US}").alias("day"),
        F.expr(f"{_US} div {_DAY_US} div 7").alias("mon"),
    )
    dau = (
        base.select("user_id", "day", "mon")
        .distinct()
        .groupBy("mon", "day")
        .agg(F.count(F.lit(1)).alias("dau"))
        .groupBy("mon")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.sum("dau") / F.count(F.lit(1)), 4).alias("avg_dau"),
        )
    )
    mau = (
        base.select("user_id", "mon")
        .distinct()
        .groupBy("mon")
        .agg(F.count(F.lit(1)).alias("mau"))
    )
    return (
        dau.join(mau, on="mon")
        .select(
            "mon",
            "n_days",
            "avg_dau",
            "mau",
            F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("mon")
    )


_Q_STICKINESS_SQL = f"""
WITH base AS (
  SELECT user_id, {_DUCK_US} // {_DAY_US} AS day,
         {_DUCK_US} // {_DAY_US} // 7 AS mon
  FROM events
),
dau AS (
  SELECT mon, COUNT(*) AS n_days,
         ROUND(SUM(dau) * 1.0 / COUNT(*), 4) AS avg_dau
  FROM (
    SELECT mon, day, COUNT(*) AS dau
    FROM (SELECT DISTINCT user_id, day, mon FROM base)
    GROUP BY 1, 2
  ) GROUP BY 1
),
mau AS (
  SELECT mon, COUNT(*) AS mau
  FROM (SELECT DISTINCT user_id, mon FROM base) GROUP BY 1
)
SELECT CAST(d.mon AS BIGINT) AS mon, d.n_days, d.avg_dau, m.mau,
       ROUND(d.avg_dau / m.mau, 6) AS stickiness
FROM dau d JOIN mau m USING (mon)
ORDER BY mon
"""


# --- order-to-ship latency distribution ------------------------------------
def _q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency (days) per order priority: exact median/p90
    plus min/max — the fulfillment-SLA readout. One join on the order key
    + one quantile aggregate over the latency column."""
    t = tables(spark, sf_dir)
    j = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    lat = j.select(
        "o_orderpriority",
        (
            F.expr(f"unix_micros(cast(l_shipdate as timestamp)) div {_DAY_US}")
            - F.expr(f"unix_micros(cast(o_orderdate as timestamp)) div {_DAY_US}")
        ).alias("lat_days"),
    )
    base = lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lat_days").alias("min_days"),
        F.max("lat_days").alias("max_days"),
    )
    # exact median/p90 with bounded state (integer day latencies: width 1)
    qtl = exact_quantiles(
        lat,
        ["o_orderpriority"],
        "lat_days",
        {"__med": 0.5, "__p90": 0.9},
        bucket_width=1.0,
    )
    return (
        base.join(F.broadcast(qtl), on="o_orderpriority")
        .select(
            "o_orderpriority",
            "n",
            "min_days",
            F.round("__med", 4).alias("median_days"),
            F.round("__p90", 4).alias("p90_days"),
            "max_days",
        )
        .orderBy("o_orderpriority")
    )


_Q_SHIP_LATENCY_SQL = f"""
WITH lat AS (
  SELECT o_orderpriority,
         (epoch_ns(l_shipdate) // 1000) // {_DAY_US}
           - (epoch_ns(o_orderdate) // 1000) // {_DAY_US} AS lat_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority, COUNT(*) AS n,
       MIN(lat_days) AS min_days,
       ROUND(quantile_cont(lat_days, 0.5), 4) AS median_days,
       ROUND(quantile_cont(lat_days, 0.9), 4) AS p90_days,
       MAX(lat_days) AS max_days
FROM lat GROUP BY 1 ORDER BY 1
"""


# --- Pareto 80/20 concentration --------------------------------------------
def _q_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many top customers cover 80% of each nation's revenue — the
    80/20 readout that complements q_gini. Revenue first collapses to one
    row per (nation, customer); the rank/cumulative windows then run over
    customer-cardinality aggregates, never raw orders."""
    t = tables(spark, sf_dir)
    rev = (
        t["orders"]
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(dsum("o_totalprice", "rev"))
    )
    # totals as UNBOUNDED windows over the same nation partitioning — the
    # naive tot-aggregate-then-join form scans and aggregates orders twice
    # (Spark does not share the subtree); these windows reuse the cum
    # window's exchange+sort for free
    w = (
        Window.partitionBy("nation")
        .orderBy(F.col("rev").desc(), F.col("c_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("nation").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = rev.select(
        "nation",
        F.sum(F.col("rev").cast("decimal(38,6)")).over(w).cast("double").alias("__cum"),
        F.sum(F.col("rev").cast("decimal(38,6)")).over(wall).cast("double").alias("__tot"),
        F.count(F.lit(1)).over(wall).alias("n_cust"),
    )
    # customers strictly below the 80% running mark, +1 for the one that
    # crosses it
    return (
        cum.groupBy("nation")
        .agg(
            F.max("n_cust").alias("n_cust"),
            (
                F.sum(
                    (F.col("__cum") < F.lit(0.8) * F.col("__tot")).cast("bigint")
                )
                + 1
            ).alias("n_top80"),
        )
        .select(
            "nation",
            "n_cust",
            "n_top80",
            F.round(F.col("n_top80") / F.col("n_cust"), 6).alias("top80_share"),
        )
        .orderBy("nation")
    )


_Q_PARETO_SQL = f"""
WITH rev AS (
  SELECT c_nationkey AS nation, c_custkey, {dsum_sql('o_totalprice')} AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT nation, {dsum_sql('rev')} AS tot, COUNT(*) AS n_cust
  FROM rev GROUP BY 1
),
cum AS (
  SELECT nation, c_custkey, rev,
         CAST(SUM(CAST(rev AS DECIMAL(38,6))) OVER (
           PARTITION BY nation ORDER BY rev DESC, c_custkey
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS c
  FROM rev
)
SELECT cum.nation, MAX(n_cust) AS n_cust,
       CAST(SUM(CASE WHEN c < 0.8 * tot THEN 1 ELSE 0 END) + 1 AS BIGINT)
         AS n_top80,
       ROUND((SUM(CASE WHEN c < 0.8 * tot THEN 1 ELSE 0 END) + 1) * 1.0
             / MAX(n_cust), 6) AS top80_share
FROM cum JOIN tot USING (nation)
GROUP BY 1 ORDER BY 1
"""


# --- token-graph degree profile --------------------------------------------
_DEG_CAP = 20


def _q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the token-adjacency graph (distinct bigram
    edges over the corpus, undirected): how many words have k distinct
    neighbors, capped at 20+ — the graph-shape profile that flags
    templated text (a spike of identical high-degree hubs). Edge list and
    degree counts are vocabulary-sized aggregates."""
    from lakehouse_architecture_spark.operators.text import tokens

    t = tables(spark, sf_dir)
    # adjacent pairs via an array zip of the token list against itself
    # shifted by one — a NARROW map (no positional self-join; the naive
    # join formulation broadcasts the whole token table)
    tk = tokens(F.lower(F.col("text")))
    pairs = t["documents"].select(
        F.explode(
            F.arrays_zip(
                F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
                F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
            )
        ).alias("p")
    )
    edges = (
        pairs.select(F.col("p.0").alias("w"), F.col("p.1").alias("w2"))
        .filter(F.col("w") != F.col("w2"))
        .distinct()
    )
    und = edges.select("w", "w2").unionByName(
        edges.select(F.col("w2").alias("w"), F.col("w").alias("w2"))
    ).distinct()
    deg = und.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    capped = deg.select(
        F.least(F.col("deg"), F.lit(_DEG_CAP)).alias("degree")
    )
    return (
        capped.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_words"))
        .orderBy("degree")
    )


_Q_DEGREE_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
  FROM documents WHERE trim(text) <> ''
),
edges AS (
  SELECT DISTINCT tk[i.i] AS w, tk[i.i + 1] AS w2
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) i
  WHERE tk[i.i] <> tk[i.i + 1]
),
und AS (
  SELECT w, w2 FROM edges UNION SELECT w2, w FROM edges
),
deg AS (SELECT w, COUNT(*) AS deg FROM und GROUP BY 1)
SELECT CAST(LEAST(deg, {_DEG_CAP}) AS INTEGER) AS degree,
       COUNT(*) AS n_words
FROM deg GROUP BY 1 ORDER BY 1
"""


# --- rational recency-decayed aggregates -----------------------------------
def _q_decay_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted revenue per market segment with a RATIONAL decay
    w = 1 / (1 + age_days/90) — hyperbolic decay chosen over exp()
    because division is bit-identical across engines while exp() is not;
    the operator shape (narrow map + decimal-weighted aggregate) is the
    same either way."""
    t = tables(spark, sf_dir)
    day = F.expr(f"unix_micros(cast(o_orderdate as timestamp)) div {_DAY_US}")
    o = t["orders"].select("o_custkey", "o_totalprice", day.alias("day"))
    maxd = o.agg(F.max("day").alias("__maxd"))
    seg = t["customer"].select("c_custkey", "c_mktsegment")
    weighted = (
        o.crossJoin(F.broadcast(maxd))
        .join(F.broadcast(seg), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            "o_totalprice",
            (
                F.lit(1.0)
                / (F.lit(1.0) + (F.col("__maxd") - F.col("day")) / F.lit(90.0))
            ).alias("__w"),
        )
    )
    return (
        weighted.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(dsum(F.col("o_totalprice") * F.col("__w")), 2).alias(
                "decayed_revenue"
            ),
            F.round(dsum("o_totalprice"), 2).alias("raw_revenue"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            "decayed_revenue",
            "raw_revenue",
            F.round(F.col("decayed_revenue") / F.col("raw_revenue"), 6).alias(
                "recency_index"
            ),
        )
        .orderBy("c_mktsegment")
    )


_Q_DECAY_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_totalprice,
         (epoch_ns(o_orderdate) // 1000) // {_DAY_US} AS day
  FROM orders
),
maxd AS (SELECT MAX(day) AS maxd FROM o),
weighted AS (
  SELECT c_mktsegment, o_totalprice,
         1.0 / (1.0 + (maxd - day) / 90.0) AS w
  FROM o JOIN customer ON o_custkey = c_custkey, maxd
)
SELECT c_mktsegment, COUNT(*) AS n_orders,
       ROUND({dsum_sql('o_totalprice * w')}, 2) AS decayed_revenue,
       ROUND({dsum_sql('o_totalprice')}, 2) AS raw_revenue,
       ROUND(ROUND({dsum_sql('o_totalprice * w')}, 2)
             / ROUND({dsum_sql('o_totalprice')}, 2), 6) AS recency_index
FROM weighted GROUP BY 1 ORDER BY 1
"""


# --- SAX symbolization ------------------------------------------------------
_SAX_SEGMENTS = 8


def _q_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin et al. 2003) of the daily value series:
    z-normalize (decimal-exact moments), Piecewise Aggregate Approximation
    into 8 equal-count segments, then map each segment mean onto the
    4-symbol Gaussian breakpoints (-0.6745, 0, 0.6745) — the standard
    shape-indexing transform for similarity search over time series. Every
    window runs over day- or segment-cardinality aggregates."""
    t = tables(spark, sf_dir)
    daily = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .groupBy(F.expr(f"{_US} div {_DAY_US}").alias("day"))
        .agg(dsum("value", "x"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("__n"),
        dsum("x", "__s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)"))
        .cast("double")
        .alias("__s2"),
    )
    w = Window.orderBy("day")
    z = (
        daily.crossJoin(F.broadcast(stats))
        .select(
            "day",
            F.row_number().over(w).alias("__i"),
            (
                (F.col("x") - F.col("__s") / F.col("__n"))
                / F.sqrt(
                    (F.col("__s2") - F.col("__s") * F.col("__s") / F.col("__n"))
                    / (F.col("__n") - 1)
                )
            ).alias("z"),
            "__n",
        )
    )
    seg = F.floor((F.col("__i") - 1) * _SAX_SEGMENTS / F.col("__n")).cast("int")
    paa = z.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum(F.col("z").cast("decimal(38,18)")) / F.count(F.lit(1)))
        .cast("double")
        .alias("__paa"),
    )
    sym = (
        F.when(F.col("__paa") < -0.6745, F.lit("a"))
        .when(F.col("__paa") < 0.0, F.lit("b"))
        .when(F.col("__paa") < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return paa.select(
        "segment",
        "n_days",
        F.round("__paa", 6).alias("paa"),
        sym.alias("symbol"),
    ).orderBy("segment")


_Q_SAX_SQL = f"""
WITH daily AS (
  SELECT {_DUCK_US} // {_DAY_US} AS day, {dsum_sql('value')} AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
stats AS (
  SELECT COUNT(*) AS n, {dsum_sql('x')} AS s,
         {dsum_sql('x * x')} AS s2
  FROM daily
),
z AS (
  SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS i,
         (x - s / n) / SQRT((s2 - s * s / n) / (n - 1)) AS z, n
  FROM daily, stats
),
paa AS (
  SELECT CAST(FLOOR((i - 1) * {_SAX_SEGMENTS} / n) AS INTEGER) AS segment,
         COUNT(*) AS n_days,
         CAST(SUM(CAST(z AS DECIMAL(38,18))) / COUNT(*) AS DOUBLE) AS paa
  FROM z GROUP BY 1
)
SELECT segment, n_days, ROUND(paa, 6) AS paa,
       CASE WHEN paa < -0.6745 THEN 'a'
            WHEN paa < 0.0 THEN 'b'
            WHEN paa < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM paa ORDER BY segment
"""


ANALYTICS5_QUERIES = [
    QuerySpec("q_iqr_outliers", "Tukey IQR fence outlier census", _q_iqr_outliers, _Q_IQR_SQL),
    QuerySpec("q_churn", "week-over-week user churn", _q_churn, _Q_CHURN_SQL),
    QuerySpec("q_stickiness", "DAU/WAU stickiness per week", _q_stickiness, _Q_STICKINESS_SQL),
    QuerySpec("q_ship_latency", "order-to-ship latency distribution", _q_ship_latency, _Q_SHIP_LATENCY_SQL),
    QuerySpec("q_pareto_8020", "customers covering 80% of revenue per nation", _q_pareto_8020, _Q_PARETO_SQL),
    QuerySpec("q_degree_dist", "token-adjacency graph degree distribution", _q_degree_dist, _Q_DEGREE_SQL),
    QuerySpec("q_decay_weighted", "rational recency-decayed revenue", _q_decay_weighted, _Q_DECAY_SQL),
    QuerySpec("q_sax", "SAX symbolization of the daily series", _q_sax, _Q_SAX_SQL),
]
