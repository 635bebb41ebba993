"""Round-11 depth block, 15 queries: one-permutation-hashing MinHash (the
O(tokens) signature path), classical seasonal decomposition, Adamic-Adar
link prediction, forest transitive closure with exact depth (pointer
doubling — the engine's recursive-CTE answer), a deterministic
Poisson-bootstrap confidence interval, a referential-integrity orphan
audit across the star schema's FK relations (one scan per table), Theil-Sen
robust regression + the Mann-Kendall trend test (collapsed-series pair
joins), PSI distribution drift, deterministic hash-thinned negative
sampling, Neyman-optimal stratified allocation, rendezvous-hash shard
assignment, a Gumbel block-maxima fit with return levels, the bucketed
two-phase weighted median, and shingle novelty scoring. Round 12 appends
the capped Adamic-Adar production path and the group-level Poisson
bootstrap.

Registered last — the audited OVERFLOW block convention (analytics6.py):
these wait beyond the driver's 50-slot window with committed
LOCAL_ORACLE.json rows proving the local oracle check, and the round-10
never-green-first rotation surfaces them next driver round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.curation import neyman_allocation
from lakehouse_architecture_spark.operators.dedup import oph_candidate_pairs
from lakehouse_architecture_spark.operators.features import negative_sample
from lakehouse_architecture_spark.operators.partitioning import rendezvous_assign
from lakehouse_architecture_spark.operators.graph import adamic_adar, tree_closure
from lakehouse_architecture_spark.operators.profiling import (
    POISSON1_THRESHOLDS,
    poisson_bootstrap_grouped,
    poisson_bootstrap_mean,
    psi_drift,
    shingle_novelty,
)
from lakehouse_architecture_spark.operators.skew import weighted_median
from lakehouse_architecture_spark.operators.timeseries import (
    mann_kendall,
    seasonal_decompose,
    theil_sen,
)
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

# shared with the classic-minhash oracle so the shingle semantics (clamped
# n-grams, distinct, empty-filtered) can never diverge between the two
# signature families' mirrors
from lakehouse_architecture_spark.queries.textops import _HASH64, _SHINGLES_CTE


# --- OPH MinHash: one hash pass instead of num_perm ------------------------
_OPH_BINS, _OPH_BANDS = 64, 16


def _q_oph_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-Permutation-Hashing near-dup candidates (operators/dedup.py:
    oph_candidate_pairs). Same banded sub-quadratic candidate join as
    q_minhash_lsh, but the signature build hashes each shingle ONCE and
    routes it to one of 64 bins — at 100 TB the hash-aggregate CPU drops
    by the permutation count (the shuffle shape is unchanged)."""
    t = tables(spark, sf_dir)
    return oph_candidate_pairs(
        t["documents"], "doc_id", "text", bins=_OPH_BINS, bands=_OPH_BANDS, shingle_n=3
    ).orderBy("id_a", "id_b")


_Q_OPH_SQL = f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, {_HASH64.format(expr='shingle')} AS h FROM sh
),
hp AS (
  SELECT doc_id,
         ((1 * 2654435761 % 1000000007) * (h % 1000000007)
          + (1 * 40503 % 1000000007)) % 1000000007 AS hp
  FROM hashed
),
present AS (
  SELECT doc_id, hp % {_OPH_BINS} AS bin, MIN(hp) AS v FROM hp GROUP BY 1, 2
),
spine AS (
  SELECT doc_id, b.b AS bin
  FROM (SELECT DISTINCT doc_id FROM present),
       (SELECT unnest(generate_series(0, {_OPH_BINS - 1})) AS b) b
),
empty AS (
  SELECT s.doc_id, s.bin
  FROM spine s LEFT JOIN present p ON p.doc_id = s.doc_id AND p.bin = s.bin
  WHERE p.v IS NULL
),
borrowed AS (
  SELECT doc_id, bin, v FROM (
    SELECT e.doc_id, e.bin,
           p.v + ((p.bin - e.bin + {_OPH_BINS}) % {_OPH_BINS}) AS v,
           ROW_NUMBER() OVER (
             PARTITION BY e.doc_id, e.bin
             ORDER BY (p.bin - e.bin + {_OPH_BINS}) % {_OPH_BINS}, p.v
           ) AS rn
    FROM empty e JOIN present p ON p.doc_id = e.doc_id
  ) WHERE rn = 1
),
filled AS (
  SELECT * FROM present UNION ALL SELECT * FROM borrowed
),
bands AS (
  SELECT doc_id, bin // {_OPH_BINS // _OPH_BANDS} AS band,
         string_agg(CAST(v AS VARCHAR), '_' ORDER BY bin) AS sig
  FROM filled GROUP BY 1, 2
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_bands
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b, c.n_shared_bands,
       CAST(SUM(CASE WHEN fa.v = fb.v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_equal_bins,
       ROUND(SUM(CASE WHEN fa.v = fb.v THEN 1 ELSE 0 END) / {_OPH_BINS}.0, 6)
         AS est_jaccard
FROM cand c
JOIN filled fa ON fa.doc_id = c.id_a
JOIN filled fb ON fb.doc_id = c.id_b AND fb.bin = fa.bin
GROUP BY 1, 2, 3
ORDER BY 1, 2
"""


# --- classical seasonal decomposition ---------------------------------------
def _q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event value decomposed into trend (centered 7-day MA) +
    day-of-week seasonal + residual (operators/timeseries.py:
    seasonal_decompose). The 100 TB step is the daily hash-aggregate; the
    decomposition itself runs over |days| rows."""
    t = tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total"))
    )
    out = seasonal_decompose(daily, "day", "total", period=7)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow",
        "value",
        "trend",
        "seasonal",
        "residual",
    ).orderBy("day")


_Q_SEASONAL_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value
  FROM events GROUP BY 1
),
tr AS (
  SELECT day, value, CAST(isodow(day) AS INT) AS dow,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) / 7
         END AS trend
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (SELECT *, value - trend AS d FROM tr),
dow_means AS (
  SELECT dow,
         CAST(SUM(CAST(d AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS s_raw
  FROM detr WHERE d IS NOT NULL GROUP BY 1
),
grand AS (
  SELECT CAST(SUM(CAST(s_raw AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS s_mean
  FROM dow_means
),
seasonal AS (
  SELECT dow, s_raw - s_mean AS seasonal FROM dow_means, grand
)
SELECT strftime(t.day, '%Y-%m-%d') AS day, t.dow,
       ROUND(t.value, 4) AS value,
       ROUND(t.trend, 4) AS trend,
       ROUND(s.seasonal, 4) AS seasonal,
       ROUND(t.value - t.trend - s.seasonal, 4) AS residual
FROM detr t LEFT JOIN seasonal s ON s.dow = t.dow
ORDER BY t.day
"""


# --- Adamic-Adar link prediction --------------------------------------------
_AA_TOP = 100


def _q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part pairs by Adamic-Adar score over the part × order
    co-occurrence graph (operators/graph.py:adamic_adar): common orders
    weighted by 1/ln(order's part count). Candidate space is Σ m² over
    orders (m = parts per order), never |parts|²."""
    t = tables(spark, sf_dir)
    edges = t["lineitem"].select(
        F.col("l_partkey").alias("node"), F.col("l_orderkey").alias("ctx")
    )
    scores = adamic_adar(edges, "node", "ctx")
    return (
        scores.orderBy(F.desc("score"), "node_a", "node_b")
        .limit(_AA_TOP)
        .select("node_a", "node_b", "n_common", "score")
    )


_Q_ADAMIC_SQL = f"""
WITH e AS (
  SELECT DISTINCT l_partkey AS n, l_orderkey AS c FROM lineitem
),
deg AS (SELECT c, COUNT(*) AS deg FROM e GROUP BY 1),
w AS (
  SELECT e.n, e.c,
         CAST(ROUND(1.0 / LN(CAST(deg AS DOUBLE)), 9) AS DECIMAL(38,12)) AS w
  FROM e JOIN deg USING (c)
),
pairs AS (
  SELECT a.n AS node_a, b.n AS node_b, COUNT(*) AS n_common,
         ROUND(CAST(SUM(a.w) AS DOUBLE), 6) AS score
  FROM w a JOIN w b ON a.c = b.c AND a.n < b.n
  GROUP BY 1, 2
)
SELECT node_a, node_b, n_common, score
FROM pairs
ORDER BY score DESC, node_a, node_b
LIMIT {_AA_TOP}
"""


_AA_CAP = 8


def _q_adamic_adar_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION Adamic-Adar path: same part × order co-occurrence
    graph, with the ``max_ctx_degree`` hub guard engaged (cap 8 — drops
    the deg ≥ 9 context tail, ~1% of orders at sf0.01). A hub context
    with m nodes emits m(m−1)/2 pair rows for terms worth only
    1/ln(m) each, so the cap is what keeps the candidate space flat as
    the corpus grows; scores become a documented lower bound. This query
    oracle-gates the capped semantics the uncapped q_adamic_adar cannot
    see."""
    t = tables(spark, sf_dir)
    edges = t["lineitem"].select(
        F.col("l_partkey").alias("node"), F.col("l_orderkey").alias("ctx")
    )
    scores = adamic_adar(edges, "node", "ctx", max_ctx_degree=_AA_CAP)
    return (
        scores.orderBy(F.desc("score"), "node_a", "node_b")
        .limit(_AA_TOP)
        .select("node_a", "node_b", "n_common", "score")
    )


_Q_ADAMIC_CAPPED_SQL = f"""
WITH e AS (
  SELECT DISTINCT l_partkey AS n, l_orderkey AS c FROM lineitem
),
deg AS (
  SELECT c, COUNT(*) AS deg FROM e GROUP BY 1 HAVING COUNT(*) <= {_AA_CAP}
),
w AS (
  SELECT e.n, e.c,
         CAST(ROUND(1.0 / LN(CAST(deg AS DOUBLE)), 9) AS DECIMAL(38,12)) AS w
  FROM e JOIN deg USING (c)
),
pairs AS (
  SELECT a.n AS node_a, b.n AS node_b, COUNT(*) AS n_common,
         ROUND(CAST(SUM(a.w) AS DOUBLE), 6) AS score
  FROM w a JOIN w b ON a.c = b.c AND a.n < b.n
  GROUP BY 1, 2
)
SELECT node_a, node_b, n_common, score
FROM pairs
ORDER BY score DESC, node_a, node_b
LIMIT {_AA_TOP}
"""


# --- forest transitive closure (recursive-CTE parity) -----------------------
def _q_tree_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor closure of the binary-tree hierarchy parent(k) = k div 2
    over part keys ≥ 2, summarized per depth. Spark has no recursive CTE;
    tree_closure (operators/graph.py) computes the identical relation in
    ⌈log₂ depth⌉ self-joins (pointer doubling) — the DuckDB oracle runs
    the real WITH RECURSIVE. The depth bound comes from one scalar
    aggregate over the dim table (max key ⇒ tree height), not a guess."""
    t = tables(spark, sf_dir)
    max_key = t["part"].agg(F.max("p_partkey")).collect()[0][0]
    height = max(1, int(max_key).bit_length() - 1)  # floor(log2(max_key))
    edges = (
        t["part"]
        .filter(F.col("p_partkey") >= 2)
        .select(
            F.col("p_partkey").alias("child"),
            F.expr("p_partkey div 2").alias("parent"),
        )
    )
    paths = tree_closure(edges, "child", "parent", max_depth=height)
    return (
        paths.groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.count_distinct("node").alias("n_nodes"),
            F.sum(F.when(F.col("anc") == 1, 1).otherwise(0)).alias("n_to_root"),
            F.min("anc").alias("min_anc"),
            F.max("anc").alias("max_anc"),
        )
        .orderBy("depth")
    )


_Q_TREE_CLOSURE_SQL = """
WITH RECURSIVE r AS (
  SELECT p_partkey AS node, p_partkey // 2 AS anc, 1 AS depth
  FROM part WHERE p_partkey >= 2
  UNION ALL
  SELECT node, anc // 2, depth + 1 FROM r WHERE anc >= 2
)
SELECT depth,
       COUNT(*) AS n_paths,
       COUNT(DISTINCT node) AS n_nodes,
       CAST(SUM(CASE WHEN anc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_to_root,
       MIN(anc) AS min_anc,
       MAX(anc) AS max_anc
FROM r
GROUP BY depth
ORDER BY depth
"""


# --- Poisson-bootstrap confidence interval ----------------------------------
_BOOT_B, _BOOT_LO, _BOOT_HI = 100, 3, 98


def _q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95%-ish CI for mean extended price of 1995-Q1 shipments via the
    deterministic Poisson bootstrap (operators/profiling.py:
    poisson_bootstrap_mean) — hash-derived Poisson(1) row weights, no RNG
    state, embarrassingly parallel at 100 TB."""
    t = tables(spark, sf_dir)
    sub = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") <= "1995-03-31")
    )
    return poisson_bootstrap_mean(
        sub,
        F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber")),
        F.col("l_extendedprice"),
        n_resamples=_BOOT_B,
        lo_rank=_BOOT_LO,
        hi_rank=_BOOT_HI,
    )


def _q_bootstrap_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-level CLUSTER bootstrap of the same 1995-Q1 mean extended
    price (operators/profiling.py:poisson_bootstrap_grouped): lineitem
    collapses to (order, Σprice, count) first, and the Poisson(1) weight
    applies per ORDER — B×|orders| bootstrap work instead of B×|rows|,
    and the statistically right resampling unit when lines within an
    order are correlated."""
    t = tables(spark, sf_dir)
    sub = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") <= "1995-03-31")
    )
    return poisson_bootstrap_grouped(
        sub,
        F.col("l_orderkey"),
        F.col("l_extendedprice"),
        n_resamples=_BOOT_B,
        lo_rank=_BOOT_LO,
        hi_rank=_BOOT_HI,
    )


_BOOT_CASE = " + ".join(
    f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in POISSON1_THRESHOLDS
)
_Q_BOOTSTRAP_SQL = f"""
WITH sub AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
           AS hid,
         CAST(l_extendedprice AS DOUBLE) AS v
  FROM lineitem
  WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
),
expanded AS (
  SELECT hid, v, b.b AS b,
         {_HASH64.format(expr="hid || '_' || CAST(b.b AS VARCHAR)")} % 1000000
           AS u
  FROM sub, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
),
means AS (
  SELECT b,
         CAST(SUM(CAST(v * ({_BOOT_CASE}) AS DECIMAL(38,6))) AS DOUBLE)
           / SUM({_BOOT_CASE}) AS mean_b
  FROM expanded GROUP BY b
),
ranked AS (
  SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn FROM means
),
point AS (
  SELECT CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS point
  FROM sub
)
SELECT (SELECT COUNT(*) FROM ranked) AS n_resamples,
       ROUND(point, 4) AS point,
       (SELECT ROUND(MIN(mean_b), 4) FROM ranked WHERE rn = {_BOOT_LO}) AS lo,
       (SELECT ROUND(MIN(mean_b), 4) FROM ranked WHERE rn = {_BOOT_HI}) AS hi
FROM point
"""


_Q_BOOTSTRAP_GROUPED_SQL = f"""
WITH sub AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS g,
         CAST(l_extendedprice AS DOUBLE) AS v
  FROM lineitem
  WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
),
grp AS (
  SELECT g, SUM(CAST(v AS DECIMAL(38,6))) AS s, COUNT(*) AS n
  FROM sub GROUP BY g
),
expanded AS (
  SELECT g, s, n, b.b AS b,
         {_HASH64.format(expr="g || '_' || CAST(b.b AS VARCHAR)")} % 1000000
           AS u
  FROM grp, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
),
means AS (
  SELECT b,
         CAST(SUM(CAST(s * ({_BOOT_CASE}) AS DECIMAL(38,6))) AS DOUBLE)
           / SUM(n * ({_BOOT_CASE})) AS mean_b
  FROM expanded GROUP BY b
),
ranked AS (
  SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn FROM means
),
point AS (
  SELECT CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE) / SUM(n) AS point
  FROM grp
)
SELECT (SELECT COUNT(*) FROM ranked) AS n_resamples,
       ROUND(point, 4) AS point,
       (SELECT ROUND(MIN(mean_b), 4) FROM ranked WHERE rn = {_BOOT_LO}) AS lo,
       (SELECT ROUND(MIN(mean_b), 4) FROM ranked WHERE rn = {_BOOT_HI}) AS hi
FROM point
"""


# --- referential-integrity orphan audit --------------------------------------
_RI_RELATIONS: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _q_ri_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One audit row per FK relation of the star schema: child rows,
    distinct child keys, and orphan rows/keys (non-NULL FKs missing from
    the parent). All-zero orphan columns == integrity holds, and the
    audit proves it instead of assuming it.

    ONE scan per table, total: each table's scan explodes into tall
    (relation, key) rows for every FK/PK role the table plays (lineitem
    emits its three FK streams from one pass; orders emits its PK stream
    for the lineitem relation AND its o_custkey FK stream); orphans are
    then one co-partitioned anti-join on (relation, key) and the counts
    one hash-agg onto 7 rows. The naive per-relation formulation scanned
    the fact tables twice per relation — 20 live scans, caught by the
    registry-wide ≤8 live-scan gate (tests/test_plans.py) — and at 100 TB
    would re-read lineitem six times for an audit one pass can answer."""
    t = tables(spark, sf_dir)
    child_roles: dict[str, list[tuple[str, str]]] = {}
    parent_roles: dict[str, list[tuple[str, str]]] = {}
    for child, fk, parent, pk in _RI_RELATIONS:
        rel = f"{child}.{fk}->{parent}.{pk}"
        child_roles.setdefault(child, []).append((rel, fk))
        parent_roles.setdefault(parent, []).append((rel, pk))

    def tall(table: str, roles: list[tuple[str, str]]) -> DataFrame:
        arr = F.array(
            *[
                F.struct(
                    F.lit(rel).alias("rel"), F.col(col).cast("long").alias("k")
                )
                for rel, col in roles
            ]
        )
        return t[table].select(F.explode(arr).alias("e")).select("e.rel", "e.k")

    def union_all(parts: list[DataFrame]) -> DataFrame:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    children = union_all([tall(tb, rs) for tb, rs in child_roles.items()])
    parents = union_all([tall(tb, rs) for tb, rs in parent_roles.items()]).distinct()
    counts = children.groupBy("rel").agg(
        F.count(F.lit(1)).alias("child_rows"),
        F.count("k").alias("nonnull_fk_rows"),
        F.count_distinct("k").alias("distinct_fks"),
    )
    orph = children.filter(F.col("k").isNotNull()).join(
        parents, ["rel", "k"], "left_anti"
    )
    ocounts = orph.groupBy("rel").agg(
        F.count(F.lit(1)).alias("orphan_rows"),
        F.count_distinct("k").alias("orphan_keys"),
    )
    return (
        counts.join(ocounts, "rel", "left")
        .select(
            "rel",
            "child_rows",
            "nonnull_fk_rows",
            "distinct_fks",
            F.coalesce("orphan_rows", F.lit(0)).alias("orphan_rows"),
            F.coalesce("orphan_keys", F.lit(0)).alias("orphan_keys"),
        )
        .orderBy("rel")
    )


def _ri_sql_one(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{child}.{fk}->{parent}.{pk}' AS rel,
       (SELECT COUNT(*) FROM {child}) AS child_rows,
       (SELECT COUNT({fk}) FROM {child}) AS nonnull_fk_rows,
       (SELECT COUNT(DISTINCT {fk}) FROM {child}) AS distinct_fks,
       (SELECT COUNT(*) FROM {child}
        WHERE {fk} IS NOT NULL
          AND {fk} NOT IN (SELECT {pk} FROM {parent} WHERE {pk} IS NOT NULL))
         AS orphan_rows,
       (SELECT COUNT(DISTINCT {fk}) FROM {child}
        WHERE {fk} IS NOT NULL
          AND {fk} NOT IN (SELECT {pk} FROM {parent} WHERE {pk} IS NOT NULL))
         AS orphan_keys
"""


_Q_RI_SQL = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(_ri_sql_one(*r) for r in _RI_RELATIONS)
    + "\n) ORDER BY rel"
)


# --- robust trend: Theil-Sen + Mann-Kendall ---------------------------------
_DAILY_CTE = """
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
pts AS (SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS x, y FROM daily)
"""


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("y"))
        .select(F.datediff("day", F.lit("1970-01-01")).cast("long").alias("x"), "y")
    )


def _q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope/intercept of the daily event-value series
    (operators/timeseries.py:theil_sen) — median-of-pairwise-slopes, run
    on the collapsed day-cardinality series, never raw rows."""
    return theil_sen(_daily_series(spark, sf_dir), "x", "y")


_Q_THEIL_SEN_SQL = f"""
WITH {_DAILY_CTE},
slopes AS (
  SELECT (b.y - a.y) / (b.x - a.x) AS m
  FROM pts a JOIN pts b ON a.x < b.x
),
ranked AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn FROM slopes),
med AS (
  SELECT (SELECT MAX(rn) FROM ranked) AS n_pairs, m AS slope
  FROM ranked
  WHERE rn = ((SELECT MAX(rn) FROM ranked) + 1) // 2
),
b0s AS (
  SELECT n_pairs, slope, y - slope * x AS b0 FROM pts, med
),
ranked_b AS (
  SELECT n_pairs, slope, b0, ROW_NUMBER() OVER (ORDER BY b0) AS rn FROM b0s
)
SELECT (SELECT MAX(rn) FROM ranked_b) AS n_points,
       n_pairs,
       ROUND(slope, 6) AS slope,
       ROUND(b0, 6) AS intercept
FROM ranked_b
WHERE rn = ((SELECT MAX(rn) FROM ranked_b) + 1) // 2
"""


def _q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on the same collapsed daily series
    (operators/timeseries.py:mann_kendall): S from pairwise signs,
    tie-corrected variance, continuity-corrected z."""
    return mann_kendall(_daily_series(spark, sf_dir), "x", "y")


_Q_MANN_KENDALL_SQL = f"""
WITH {_DAILY_CTE},
s AS (
  SELECT CAST(SUM(CAST(SIGN(b.y - a.y) AS BIGINT)) AS BIGINT) AS s
  FROM pts a JOIN pts b ON a.x < b.x
),
n AS (SELECT COUNT(*) AS n FROM pts),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_sum
  FROM (SELECT COUNT(*) AS t FROM pts GROUP BY y HAVING COUNT(*) > 1)
)
SELECT n AS n_points, s AS s_stat,
       ROUND(CAST(n * (n - 1) * (2 * n + 5) - tie_sum AS DOUBLE) / 18, 6)
         AS var_s,
       ROUND(CASE
         WHEN s > 0 THEN (s - 1) / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tie_sum AS DOUBLE) / 18)
         WHEN s < 0 THEN (s + 1) / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tie_sum AS DOUBLE) / 18)
         ELSE 0.0 END, 6) AS z
FROM s, n, ties
"""


# --- PSI distribution drift ---------------------------------------------------
def _q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of event values, first half of the month
    vs second (operators/profiling.py:psi_drift): fixed literal bins, both
    sides one hash-agg, per-bin terms + a bin=-1 total row."""
    t = tables(spark, sf_dir)
    ev = t["events"].select(F.dayofmonth(F.col("ts")).alias("dom"), "value")
    ref = ev.filter(F.col("dom") <= 15)
    cur = ev.filter(F.col("dom") > 15)
    return psi_drift(ref, cur, "value", bin_width=50.0, n_bins=10).orderBy("bin")


_Q_PSI_SQL = """
WITH binned AS (
  SELECT CASE WHEN day(ts) <= 15 THEN 'ref' ELSE 'cur' END AS side,
         LEAST(GREATEST(CAST(FLOOR(value / 50.0) AS INT), 0), 9) AS bin
  FROM events
),
shares AS (
  SELECT side, bin,
         CAST(COUNT(*) AS DOUBLE)
           / SUM(COUNT(*)) OVER (PARTITION BY side) AS p
  FROM binned GROUP BY side, bin
),
spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
grid AS (
  SELECT s.bin,
         GREATEST(COALESCE(r.p, 0.0), 0.0001) AS p_ref,
         GREATEST(COALESCE(c.p, 0.0), 0.0001) AS p_cur
  FROM spine s
  LEFT JOIN shares r ON r.bin = s.bin AND r.side = 'ref'
  LEFT JOIN shares c ON c.bin = s.bin AND c.side = 'cur'
),
terms AS (
  SELECT bin, ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
         ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 9) AS term
  FROM grid
)
SELECT * FROM (
  SELECT bin, p_ref, p_cur, term FROM terms
  UNION ALL
  SELECT -1 AS bin, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         ROUND(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6)
  FROM terms
) ORDER BY bin
"""


# --- deterministic negative sampling ------------------------------------------
_NEG_K, _NEG_THIN = 5, 16


def _q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per selected customer, the 5 lowest-hash parts they never ordered
    (operators/features.py:negative_sample) — RNG-free negatives for
    contrastive training; the hash-prefix thin cuts the user×item cross
    join 16× before the anti-join."""
    t = tables(spark, sf_dir)
    users = t["customer"].filter(F.col("c_custkey") % 100 == 0)
    inter = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c_custkey"), F.col("l_partkey").alias("p_partkey"))
    )
    return (
        negative_sample(
            inter, users, t["part"], "c_custkey", "p_partkey", k=_NEG_K, thin_mod=_NEG_THIN
        )
        .select(F.col("user").alias("c_custkey"), F.col("item").alias("p_partkey"), "rk")
        .orderBy("c_custkey", "rk")
    )


_Q_NEG_SQL = f"""
WITH u AS (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0),
cand AS (
  SELECT u.c_custkey, p.p_partkey,
         {_HASH64.format(expr="CAST(u.c_custkey AS VARCHAR) || '_' || CAST(p.p_partkey AS VARCHAR)")} AS h
  FROM u, part p
),
thin AS (SELECT * FROM cand WHERE h % {_NEG_THIN} = 0),
seen AS (
  SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
neg AS (
  SELECT t.c_custkey, t.p_partkey,
         ROW_NUMBER() OVER (PARTITION BY t.c_custkey ORDER BY t.h, t.p_partkey) AS rk
  FROM thin t
  LEFT JOIN seen s ON s.c_custkey = t.c_custkey AND s.p_partkey = t.p_partkey
  WHERE s.c_custkey IS NULL
)
SELECT c_custkey, p_partkey, rk FROM neg WHERE rk <= {_NEG_K}
ORDER BY c_custkey, rk
"""


# --- Neyman stratified-sample allocation -------------------------------------
_NEYMAN_N = 100


def _q_neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 100-doc sample across sources by
    size × n_chars dispersion (operators/curation.py:neyman_allocation) —
    the planning aggregate in front of stratified_hash_sample."""
    t = tables(spark, sf_dir)
    return neyman_allocation(t["documents"], "source", "n_chars", _NEYMAN_N).orderBy(
        "stratum"
    )


_Q_NEYMAN_SQL = f"""
WITH moms AS (
  SELECT source AS stratum, COUNT(*) AS n_rows,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(CAST(n_chars AS DECIMAL(18,6))
                       * CAST(n_chars AS DECIMAL(18,6)) AS DECIMAL(38,12)))
              AS DOUBLE) AS sxx
  FROM documents GROUP BY 1
),
sized AS (
  SELECT stratum, n_rows,
         CASE WHEN n_rows > 1
              THEN SQRT((sxx - sx * sx / n_rows) / (n_rows - 1))
              ELSE 0.0 END AS s_h
  FROM moms
),
tot AS (
  SELECT CAST(SUM(CAST(n_rows * s_h AS DECIMAL(38,12))) AS DOUBLE) AS t
  FROM sized
)
SELECT stratum, n_rows, ROUND(s_h, 6) AS s_h,
       ROUND(n_rows * s_h / t, 6) AS weight,
       CAST(FLOOR(n_rows * s_h / t * {_NEYMAN_N} + 0.5) AS INT) AS alloc
FROM sized, tot
ORDER BY stratum
"""


# --- rendezvous-hash shard assignment ------------------------------------------
_RV_SHARDS = 8


def _q_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash shard census (operators/partitioning.py:
    rendezvous_assign): docs routed to argmax-hash of 8 shards, next to
    the count that would MOVE if a 9th shard joined — measuring the
    consistent-hashing guarantee (expected 1/9 moves; mod-hash would move
    8/9). Both assignments are pure narrow maps over one scan."""
    t = tables(spark, sf_dir)
    assigned = rendezvous_assign(
        rendezvous_assign(t["documents"], "doc_id", _RV_SHARDS, "shard"),
        "doc_id",
        _RV_SHARDS + 1,
        "shard9",
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("shard") != F.col("shard9")).cast("int")).cast(
                "bigint"
            ).alias("n_moved"),
        )
        .orderBy("shard")
    )


_RV_HASH = _HASH64.format(expr="CAST(doc_id AS VARCHAR) || '_' || CAST(s.s AS VARCHAR)")
_Q_RENDEZVOUS_SQL = f"""
WITH h8 AS (
  SELECT doc_id, s.s AS s, {_RV_HASH} AS h
  FROM documents, (SELECT unnest(generate_series(0, {_RV_SHARDS - 1})) AS s) s
),
a8 AS (
  SELECT doc_id, s AS shard FROM (
    SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
    FROM h8
  ) WHERE rn = 1
),
h9 AS (
  SELECT doc_id, s.s AS s, {_RV_HASH} AS h
  FROM documents, (SELECT unnest(generate_series(0, {_RV_SHARDS})) AS s) s
),
a9 AS (
  SELECT doc_id, s AS shard9 FROM (
    SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
    FROM h9
  ) WHERE rn = 1
)
SELECT a8.shard, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN a8.shard <> a9.shard9 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved
FROM a8 JOIN a9 USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


# --- Gumbel block-maxima fit (extreme-value readout) -----------------------------
#: frozen literals (computed once, identical text in builder and oracle):
#: √6/π, the Euler–Mascheroni constant, and ln(−ln(0.99)) for the
#: 100-block return level — no engine libm call decides a constant
_SQRT6_PI = 0.7796968012336761
_EULER_GAMMA = 0.5772156649015329
_L100 = -4.600149226776579


def _q_evt_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel method-of-moments fit over daily block maxima of the event
    value: β = s·√6/π, μ = m − γβ, and the 100-block return level
    μ − β·ln(−ln(1−1/100)) — the capacity-planning readout (how big a
    daily spike to expect once per 100 days). One daily max aggregate
    (the 100 TB step) + decimal-exact moments over block cardinality."""
    t = tables(spark, sf_dir)
    blocks = (
        t["events"]
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.max("value").alias("mx"))
    )
    d = "decimal(38,6)"
    moms = blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("mx").cast(d)).cast("double").alias("__sx"),
        F.sum(
            (
                F.col("mx").cast("decimal(18,6)")
                * F.col("mx").cast("decimal(18,6)")
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("__sxx"),
    )
    m = F.col("__sx") / F.col("n_blocks")
    s = F.sqrt(
        (F.col("__sxx") - F.col("__sx") * F.col("__sx") / F.col("n_blocks"))
        / (F.col("n_blocks") - 1)
    )
    beta = s * _SQRT6_PI
    mu = m - F.lit(_EULER_GAMMA) * beta
    return moms.select(
        "n_blocks",
        F.round(m, 6).alias("mean_max"),
        F.round(s, 6).alias("std_max"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(mu - beta * _L100, 6).alias("return_level_100"),
    )


_Q_EVT_SQL = f"""
WITH blocks AS (
  SELECT CAST(ts AS DATE) AS day, MAX(value) AS mx FROM events GROUP BY 1
),
moms AS (
  SELECT COUNT(*) AS n_blocks,
         CAST(SUM(CAST(mx AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(CAST(mx AS DECIMAL(18,6))
                       * CAST(mx AS DECIMAL(18,6)) AS DECIMAL(38,12)))
              AS DOUBLE) AS sxx
  FROM blocks
)
SELECT n_blocks,
       ROUND(sx / n_blocks, 6) AS mean_max,
       ROUND(SQRT((sxx - sx * sx / n_blocks) / (n_blocks - 1)), 6) AS std_max,
       ROUND(SQRT((sxx - sx * sx / n_blocks) / (n_blocks - 1)) * {_SQRT6_PI!r}, 6)
         AS gumbel_beta,
       ROUND(sx / n_blocks - {_EULER_GAMMA!r}
             * (SQRT((sxx - sx * sx / n_blocks) / (n_blocks - 1)) * {_SQRT6_PI!r}), 6)
         AS gumbel_mu,
       ROUND((sx / n_blocks - {_EULER_GAMMA!r}
              * (SQRT((sxx - sx * sx / n_blocks) / (n_blocks - 1)) * {_SQRT6_PI!r}))
             - (SQRT((sxx - sx * sx / n_blocks) / (n_blocks - 1)) * {_SQRT6_PI!r})
               * {_L100!r}, 6)
         AS return_level_100
FROM moms
"""


# --- weighted median (bucketed two-phase) ------------------------------------
def _q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower weighted median of extended price weighted by quantity, per
    return flag (operators/skew.py:weighted_median) — the bucketed
    two-phase formulation: one cell aggregate over raw rows, windows over
    the cell table, one bucket's rows re-read. The oracle states the
    DEFINITION (min value whose running weight crosses half the total,
    one plain window) — the hash match proves the two-phase mechanics
    equivalent, the q_gini / two_phase_rank discipline."""
    t = tables(spark, sf_dir)
    return weighted_median(
        t["lineitem"], ["l_returnflag"], "l_extendedprice", "l_quantity",
        bucket_width=100.0,
    ).orderBy("l_returnflag")


_Q_WMEDIAN_SQL = """
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(l_quantity AS DECIMAL(38,6)) AS wt
  FROM lineitem
),
tot AS (
  SELECT l_returnflag, SUM(wt) AS tot FROM w GROUP BY 1
),
cum AS (
  SELECT l_returnflag, v,
         SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v, wt) AS c
  FROM w
)
SELECT c.l_returnflag,
       CAST(MAX(t.tot) AS DOUBLE) AS total_weight,
       MIN(c.v) AS median
FROM cum c JOIN tot t USING (l_returnflag)
WHERE c.c >= t.tot / 2
GROUP BY 1
ORDER BY 1
"""


# --- shingle novelty ----------------------------------------------------------
def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: share of the doc's distinct 3-gram shingles
    appearing in no other document (operators/profiling.py:
    shingle_novelty) — the inverse lens of the dedup family and a
    curriculum/quality signal."""
    t = tables(spark, sf_dir)
    return (
        shingle_novelty(t["documents"], "doc_id", "text", n=3)
        .select(
            F.col("id").alias("doc_id"), "n_shingles", "n_unique", "novelty"
        )
        .orderBy("doc_id")
    )


_Q_NOVELTY_SQL = f"""
WITH {_SHINGLES_CTE},
shh AS (SELECT doc_id, {_HASH64.format(expr='shingle')} AS h FROM sh),
dfreq AS (SELECT h, COUNT(*) AS df FROM shh GROUP BY 1)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       ROUND(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
         AS novelty
FROM shh JOIN dfreq USING (h)
GROUP BY 1
ORDER BY 1
"""


ANALYTICS7_QUERIES: tuple[QuerySpec, ...] = (
    QuerySpec(
        "q_oph_minhash",
        "one-permutation-hashing near-dup candidates (1 hash pass)",
        _q_oph_minhash,
        _Q_OPH_SQL,
    ),
    QuerySpec(
        "q_seasonal_decompose",
        "daily series = 7-day-MA trend + dow seasonal + residual",
        _q_seasonal_decompose,
        _Q_SEASONAL_SQL,
    ),
    QuerySpec(
        "q_adamic_adar",
        "Adamic-Adar link prediction over part-order co-occurrence",
        _q_adamic_adar,
        _Q_ADAMIC_SQL,
    ),
    QuerySpec(
        "q_tree_closure",
        "forest ancestor closure w/ depth via pointer doubling",
        _q_tree_closure,
        _Q_TREE_CLOSURE_SQL,
    ),
    QuerySpec(
        "q_bootstrap_ci",
        "deterministic Poisson-bootstrap CI for a subset mean",
        _q_bootstrap_ci,
        _Q_BOOTSTRAP_SQL,
    ),
    QuerySpec(
        "q_ri_orphans",
        "FK orphan audit across the star schema relations",
        _q_ri_orphans,
        _Q_RI_SQL,
    ),
    QuerySpec(
        "q_theil_sen",
        "Theil-Sen robust slope/intercept of the daily series",
        _q_theil_sen,
        _Q_THEIL_SEN_SQL,
    ),
    QuerySpec(
        "q_mann_kendall",
        "Mann-Kendall trend test w/ tie-corrected variance",
        _q_mann_kendall,
        _Q_MANN_KENDALL_SQL,
    ),
    QuerySpec(
        "q_psi_drift",
        "Population Stability Index, first vs second half-month",
        _q_psi_drift,
        _Q_PSI_SQL,
    ),
    QuerySpec(
        "q_negative_sample",
        "deterministic hash-thinned negative item sampling",
        _q_negative_sample,
        _Q_NEG_SQL,
    ),
    QuerySpec(
        "q_neyman_alloc",
        "Neyman-optimal stratified sample allocation per source",
        _q_neyman_alloc,
        _Q_NEYMAN_SQL,
    ),
    QuerySpec(
        "q_rendezvous_shards",
        "rendezvous-hash shard census + 9th-shard move count",
        _q_rendezvous_shards,
        _Q_RENDEZVOUS_SQL,
    ),
    QuerySpec(
        "q_evt_maxima",
        "Gumbel block-maxima fit + 100-day return level",
        _q_evt_maxima,
        _Q_EVT_SQL,
    ),
    QuerySpec(
        "q_weighted_median",
        "bucketed two-phase weighted median per return flag",
        _q_weighted_median,
        _Q_WMEDIAN_SQL,
    ),
    QuerySpec(
        "q_ngram_novelty",
        "per-doc share of corpus-unique shingles",
        _q_ngram_novelty,
        _Q_NOVELTY_SQL,
    ),
    # round 12 (VERDICT r11 #2, #5): the capped production Adamic-Adar
    # path and the group-level bootstrap, both previously implemented but
    # un-gated semantics
    QuerySpec(
        "q_adamic_adar_capped",
        "Adamic-Adar with the max_ctx_degree hub guard engaged",
        _q_adamic_adar_capped,
        _Q_ADAMIC_CAPPED_SQL,
    ),
    QuerySpec(
        "q_bootstrap_grouped",
        "order-level cluster Poisson bootstrap of the Q1-95 mean price",
        _q_bootstrap_grouped,
        _Q_BOOTSTRAP_GROUPED_SQL,
    ),
)
