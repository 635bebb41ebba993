"""Round-3 additions: event-path analytics, training-corpus quality
signals, and embedding-cluster statistics — each with an exact DuckDB
oracle. Registered after CORPUS2/RELATIONAL5 so this round's still-
unverified queries keep their place at the head of the driver's 50-entry
correctness window (queries/registry.py ordering note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.materialize import materialize_small

from lakehouse_architecture_spark.functions.aggregates import davg, davg_sql, dsum, dsum_sql
from lakehouse_architecture_spark.operators import similarity as sim
from lakehouse_architecture_spark.operators.analytics import (
    event_transitions,
    last_touch_attribution,
    out_of_order_stats,
)
from lakehouse_architecture_spark.operators.dedup import ngram_jaccard_pairs
from lakehouse_architecture_spark.operators.graph import dedup_clusters
from lakehouse_architecture_spark.operators.skew import exact_quantiles
from lakehouse_architecture_spark.operators.text import (
    bigram_lm_scores,
    token_entropy,
    tokens,
)
from lakehouse_architecture_spark.functions.hashing import md5_hash64_sql
from lakehouse_architecture_spark.queries.base import QuerySpec, tables
from lakehouse_architecture_spark.queries.textops import (
    _DIMS_CTE,
    _JACCARD_THRESHOLD,
    _NORMS_CTE,
    _SHINGLES_CTE,
    _HASH64,
)

# DuckDB twin of operators/text.py tokens(): empty/blank text -> no tokens
_TOKS_CTE = """
toks AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
  FROM documents
)
"""


# --- corpus quality: per-doc token entropy + unique ratio -----------------
def _q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return token_entropy(t["documents"], "doc_id", "text").orderBy("doc_id")


_Q_TOKEN_ENTROPY_SQL = f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
counts AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_unique,
         CAST(SUM(CAST(CAST(c AS DOUBLE) * log2(c) AS DECIMAL(38,6)))
              AS DOUBLE) AS clgc
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_unique,
       ROUND(n_unique / CAST(n_tokens AS DOUBLE), 6) AS unique_ratio,
       ROUND(log2(n_tokens) - clgc / n_tokens, 6) AS entropy_bits
FROM per_doc
ORDER BY doc_id
"""


# --- corpus quality: corpus-trained bigram LM fluency score ---------------
def _q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return bigram_lm_scores(t["documents"], "doc_id", "text").orderBy("doc_id")


_Q_BIGRAM_LM_SQL = f"""
WITH {_TOKS_CTE},
bg AS (
  SELECT doc_id,
         tk[i.i] AS w1,
         tk[i.i] || chr(31) || tk[i.i + 1] AS b
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) i
  WHERE len(tk) >= 2
),
bgc AS (SELECT b, COUNT(*) AS cbg FROM bg GROUP BY b),
w1c AS (SELECT w1, COUNT(*) AS cw1 FROM bg GROUP BY w1)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       ROUND({davg_sql("log10(CAST(cbg AS DOUBLE) / cw1)")}, 6) AS mean_log10_p
FROM bg JOIN bgc USING (b) JOIN w1c USING (w1)
GROUP BY doc_id
ORDER BY doc_id
"""


# --- corpus hygiene: exact-duplicate mass per source ----------------------
def _q_dup_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    d = t["documents"]
    sizes = d.groupBy(F.md5("text").alias("__h")).agg(
        F.count("*").alias("__sz")
    )
    flagged = d.join(F.broadcast(sizes), F.md5("text") == F.col("__h"))
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("__sz") > 1).cast("bigint")).alias("n_dup_docs"),
            F.round(
                F.sum((F.col("__sz") > 1).cast("bigint")) / F.count("*"), 6
            ).alias("dup_ratio"),
        )
        .orderBy("source")
    )


_Q_DUP_RATIO_SQL = """
WITH sizes AS (SELECT md5(text) AS h, COUNT(*) AS sz FROM documents GROUP BY 1)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       ROUND(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE),
             6) AS dup_ratio
FROM documents JOIN sizes ON md5(text) = h
GROUP BY source
ORDER BY source
"""


# --- corpus hygiene: near-dup cluster representatives ---------------------
def _q_neardup_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    d = t["documents"]
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=_JACCARD_THRESHOLD)
    clustered = dedup_clusters(d, pairs, "doc_id")
    return (
        clustered.groupBy("canonical_id")
        .agg(
            F.count("*").alias("cluster_size"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_member"),
        )
        .filter(F.col("cluster_size") > 1)
        .orderBy("canonical_id")
    )


_Q_NEARDUP_REP_SQL = f"""
WITH RECURSIVE {_SHINGLES_CTE},
shh AS (SELECT doc_id, {_HASH64.format(expr='shingle')} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(n_inter / (sa.sz + sb.sz - n_inter), 6) >= {_JACCARD_THRESHOLD}
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM sym
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
),
comp AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src),
labeled AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(comp.component, d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN comp ON comp.node = d.doc_id
)
SELECT canonical_id,
       COUNT(*) AS cluster_size,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MAX(doc_id) AS max_member
FROM labeled
GROUP BY canonical_id
HAVING COUNT(*) > 1
ORDER BY canonical_id
"""


# --- event paths: first-order transition matrix ---------------------------
def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return event_transitions(t["events"]).orderBy("prev_type", "next_type")


_Q_EVENT_TRANSITIONS_SQL = """
WITH steps AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
),
counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       ROUND(n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
         AS prob
FROM counts
ORDER BY prev_type, next_type
"""


# --- event paths: last-touch attribution ----------------------------------
_ATTR_LAG_S = 6 * 3600


def _q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # NTZ -> TZ timestamp (exact under the pinned UTC session) so the
    # operator's epoch-seconds cast resolves
    ev = t["events"].withColumn("ts", F.col("ts").cast("timestamp"))
    out = last_touch_attribution(
        ev, "purchase", "click", max_lag_seconds=_ATTR_LAG_S
    )
    return out.select(
        "conversion_id",
        "user_id",
        "touch_id",
        F.date_format("touch_ts", "yyyy-MM-dd HH:mm:ss").alias("touch_ts_s"),
    ).orderBy("conversion_id")


_Q_ATTRIBUTION_SQL = f"""
WITH marked AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS touch_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS conversion_id,
       user_id,
       CASE WHEN epoch(ts) - epoch(touch_ts) <= {_ATTR_LAG_S} THEN touch_id END
         AS touch_id,
       CASE WHEN epoch(ts) - epoch(touch_ts) <= {_ATTR_LAG_S}
            THEN strftime(touch_ts, '%Y-%m-%d %H:%M:%S') END AS touch_ts_s
FROM marked
WHERE event_type = 'purchase'
ORDER BY conversion_id
"""


# --- streaming health: out-of-order arrival stats -------------------------
def _q_ooo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    ev = t["events"].select(
        "user_id",
        "event_id",
        "event_type",
        # fixture ts is TIMESTAMP_NTZ; session TZ is pinned UTC (base.py),
        # so the NTZ->TZ cast is exact and micros match DuckDB's epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    out = out_of_order_stats(
        ev, key_col="user_id", ts_col="ts_us", seq_col="event_id",
        group_col="event_type",
    )
    return out.select(
        "event_type",
        "n_events",
        "n_late",
        "late_ratio",
        F.round(F.col("max_lateness") / 1e6, 6).alias("max_lateness_s"),
    ).orderBy("event_type")


_Q_OOO_STATS_SQL = """
WITH seq AS (
  SELECT event_type, epoch_us(ts) AS ts_us,
         max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS high
  FROM events
),
flagged AS (
  SELECT event_type,
         CASE WHEN high IS NOT NULL AND ts_us < high
              THEN CAST(high AS DOUBLE) - ts_us ELSE 0.0 END AS late_us
  FROM seq
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       ROUND(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS late_ratio,
       ROUND(MAX(late_us) / 1e6, 6) AS max_lateness_s
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


# --- SQL belt: positional explode ----------------------------------------
_POS_LIMIT = 10


def _q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    pos_tok = t["documents"].select(
        F.posexplode(tokens("text")).alias("pos", "token")
    ).filter(F.col("pos") < _POS_LIMIT)
    counts = pos_tok.groupBy("pos", "token").agg(F.count("*").alias("n"))
    from lakehouse_architecture_spark.operators.relational import top_k_per_group

    best = top_k_per_group(
        counts, ["pos"], [F.col("n").desc(), F.col("token").asc()], 1
    )
    return best.select("pos", "token", "n").orderBy("pos")


_Q_POSEXPLODE_SQL = f"""
WITH {_TOKS_CTE},
pos_tok AS (
  SELECT CAST(i.i AS INT) AS pos, tk[i.i + 1] AS token
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0,
                  least({_POS_LIMIT} - 1, len(tk) - 1))) AS i) i
  WHERE len(tk) > 0
),
counts AS (SELECT pos, token, COUNT(*) AS n FROM pos_tok GROUP BY pos, token),
ranked AS (
  SELECT pos, token, n,
         ROW_NUMBER() OVER (PARTITION BY pos ORDER BY n DESC, token ASC) AS rn
  FROM counts
)
SELECT pos, token, n FROM ranked WHERE rn = 1 ORDER BY pos
"""


# --- embeddings: semantic cell statistics ---------------------------------
_N_CELLS = 8


def _q_centroid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    assigned = sim.centroid_assignment(t["embeddings"], n_cells=_N_CELLS)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(davg("ccos"), 6).alias("avg_cos"),
            F.min("vec_id").alias("min_member"),
            F.max("vec_id").alias("max_member"),
        )
        .orderBy("cell")
    )


_Q_CENTROID_CELLS_SQL = f"""
WITH {_DIMS_CTE},
{_NORMS_CTE},
cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec
  FROM embeddings ORDER BY vec_id ASC LIMIT {_N_CELLS}
),
cdots AS (
  SELECT e.vec_id, c.cent_id,
         ROUND(SUM(CAST(e.embedding[d.d] AS DOUBLE) * CAST(c.cvec[d.d] AS DOUBLE))
               / (ne.nrm * nc.nrm), 6) AS ccos
  FROM embeddings e
  JOIN norms ne ON ne.vec_id = e.vec_id
  CROSS JOIN cents c
  JOIN norms nc ON nc.vec_id = c.cent_id
  CROSS JOIN dims d
  GROUP BY e.vec_id, c.cent_id, ne.nrm, nc.nrm
),
best AS (
  SELECT vec_id, cent_id AS cell, ccos,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY ccos DESC, cent_id ASC) AS rn
  FROM cdots
)
SELECT cell,
       COUNT(*) AS n_vectors,
       ROUND({davg_sql("ccos")}, 6) AS avg_cos,
       MIN(vec_id) AS min_member,
       MAX(vec_id) AS max_member
FROM best WHERE rn = 1
GROUP BY cell
ORDER BY cell
"""


# --- packing planner: token-length buckets --------------------------------
def _q_token_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    n = F.size(tokens("text"))
    bucket = (
        F.when(n < 20, "xs[0-19]")
        .when(n < 30, "s[20-29]")
        .when(n < 40, "m[30-39]")
        .otherwise("l[40+]")
    )
    from pyspark.sql import Window

    d = t["documents"].select(n.alias("__n"), bucket.alias("bucket"))
    agg = d.groupBy("bucket").agg(
        F.count("*").alias("n_docs"), F.sum("__n").alias("total_tokens")
    )
    # share denominator via an all-rows window over the 4-row aggregate —
    # no separate count() job, no driver scalar
    return agg.select(
        "bucket",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("n_docs")
            / F.sum("n_docs").over(Window.partitionBy(F.lit(1))).cast("double"),
            6,
        ).alias("doc_share"),
    ).orderBy("bucket")


_Q_TOKEN_BUCKETS_SQL = f"""
WITH {_TOKS_CTE},
b AS (
  SELECT len(tk) AS n,
         CASE WHEN len(tk) < 20 THEN 'xs[0-19]'
              WHEN len(tk) < 30 THEN 's[20-29]'
              WHEN len(tk) < 40 THEN 'm[30-39]'
              ELSE 'l[40+]' END AS bucket
  FROM toks
)
SELECT bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM b) AS DOUBLE), 6)
         AS doc_share
FROM b
GROUP BY bucket
ORDER BY bucket
"""


# --- skyline: cheapest-and-biggest part frontier --------------------------
def _q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.relational import (
        pareto_frontier_2d,
    )

    t = tables(spark, sf_dir)
    return (
        pareto_frontier_2d(
            t["part"], minimize="p_retailprice", maximize="p_size",
            tiebreak="p_partkey",
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_retailprice")
    )


_Q_SKYLINE_SQL = """
WITH scan AS (
  SELECT p_partkey, p_size, p_retailprice,
         max(p_size) OVER (ORDER BY p_retailprice ASC, p_size DESC, p_partkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_best
  FROM part
)
SELECT p_partkey, p_size, p_retailprice
FROM scan
WHERE prev_best IS NULL OR p_size > prev_best
ORDER BY p_retailprice
"""

# --- time series: lagged cross-correlation of event streams ---------------
_XCORR_LAGS = (0, 1, 2, 3)


def _q_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag relationship between the hourly click and purchase series:
    Pearson correlation of c(h) vs p(h+lag) for small lags, computed from
    decimal-exact sums (order-invariant, engine-portable). The hourly
    series is one hash aggregate over events; each lag joins the (tiny)
    series to itself — broadcastable at any corpus scale."""
    t = tables(spark, sf_dir)
    ev = t["events"]
    base = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum((F.col("event_type") == "click").cast("bigint")).alias("c"),
            F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("p"),
        )
    )
    # hour-cardinality series referenced twice per lag — materialized so
    # the events fact aggregates ONCE, not 2x|lags| times
    base = materialize_small(base)
    out = None
    for lag in _XCORR_LAGS:
        a = base.select(F.col("h"), F.col("c"))
        b = base.select(
            (F.col("h") - F.expr(f"INTERVAL {lag} HOURS")).alias("h"),
            F.col("p"),
        )
        j = a.join(b, on="h")
        x = F.col("c").cast("double")
        y = F.col("p").cast("double")
        agg = j.agg(
            F.count(F.lit(1)).alias("n"),
            dsum(x, "sx"),
            dsum(y, "sy"),
            dsum(x * y, "sxy"),
            dsum(x * x, "sxx"),
            dsum(y * y, "syy"),
        ).select(
            F.lit(lag).alias("lag_hours"),
            "n",
            F.round(
                (F.col("n").cast("double") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (
                    F.sqrt(
                        F.col("n").cast("double") * F.col("sxx")
                        - F.col("sx") * F.col("sx")
                    )
                    * F.sqrt(
                        F.col("n").cast("double") * F.col("syy")
                        - F.col("sy") * F.col("sy")
                    )
                ),
                6,
            ).alias("corr_click_purchase"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("lag_hours")


_XCORR_ONE = """
SELECT {lag} AS lag_hours,
       COUNT(*) AS n,
       ROUND((CAST(COUNT(*) AS DOUBLE) * {sxy} - {sx} * {sy})
             / (sqrt(CAST(COUNT(*) AS DOUBLE) * {sxx} - {sx} * {sx})
                * sqrt(CAST(COUNT(*) AS DOUBLE) * {syy} - {sy} * {sy})), 6)
         AS corr_click_purchase
FROM hourly a JOIN hourly b ON b.h = a.h + INTERVAL {lag} HOUR
"""


def _xcorr_sql() -> str:
    parts = []
    fills = dict(
        sx=dsum_sql("CAST(a.c AS DOUBLE)"),
        sy=dsum_sql("CAST(b.p AS DOUBLE)"),
        sxy=dsum_sql("CAST(a.c AS DOUBLE) * CAST(b.p AS DOUBLE)"),
        sxx=dsum_sql("CAST(a.c AS DOUBLE) * CAST(a.c AS DOUBLE)"),
        syy=dsum_sql("CAST(b.p AS DOUBLE) * CAST(b.p AS DOUBLE)"),
    )
    for lag in _XCORR_LAGS:
        parts.append(_XCORR_ONE.format(lag=lag, **fills))
    return (
        """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
)
"""
        + " UNION ALL ".join(parts)
        + " ORDER BY lag_hours"
    )


_Q_CROSS_CORR_SQL = _xcorr_sql()


# --- embeddings: intra- vs inter-label cosine separation ------------------
_PAIR_STRIDE = 20


def _q_emb_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space quality metric: over a deterministic sample of
    vector pairs, how much higher is cosine within a label than across
    labels. The pair set is the cross of a strided id sample with itself
    (sample² pairs — the stride keeps that quadratic term bounded)."""
    t = tables(spark, sf_dir)
    emb = t["embeddings"].filter(F.col("vec_id") % _PAIR_STRIDE == 0)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("label").alias("la"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("label").alias("lb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).withColumn(
        "cos", F.round(sim.cosine(F.col("va"), F.col("vb")), 6)
    )
    return (
        pairs.groupBy((F.col("la") == F.col("lb")).alias("same_label"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(davg("cos"), 6).alias("avg_cos"),
            F.round(F.min("cos"), 6).alias("min_cos"),
            F.round(F.max("cos"), 6).alias("max_cos"),
        )
        .orderBy("same_label")
    )


_Q_EMB_PAIR_STATS_SQL = f"""
WITH {_DIMS_CTE},
samp AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE vec_id % {_PAIR_STRIDE} = 0
),
nrm AS (
  SELECT vec_id,
         sqrt(SUM(CAST(embedding[d.d] AS DOUBLE) * CAST(embedding[d.d] AS DOUBLE))) AS nrm
  FROM samp, dims d GROUP BY vec_id
),
pair AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS la, b.label AS lb,
         ROUND(SUM(CAST(a.embedding[d.d] AS DOUBLE) * CAST(b.embedding[d.d] AS DOUBLE))
               / (na.nrm * nb.nrm), 6) AS cos
  FROM samp a
  JOIN samp b ON a.vec_id < b.vec_id
  JOIN nrm na ON na.vec_id = a.vec_id
  JOIN nrm nb ON nb.vec_id = b.vec_id
  CROSS JOIN dims d
  GROUP BY a.vec_id, b.vec_id, a.label, b.label, na.nrm, nb.nrm
)
SELECT (la = lb) AS same_label,
       COUNT(*) AS n_pairs,
       ROUND({davg_sql("cos")}, 6) AS avg_cos,
       ROUND(MIN(cos), 6) AS min_cos,
       ROUND(MAX(cos), 6) AS max_cos
FROM pair
GROUP BY same_label
ORDER BY same_label
"""

# --- training prep: fixed-window document chunking ------------------------
_CHUNK_TOKENS = 24
_CHUNK_OVERLAP = 8


def _q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.text import chunk_documents

    t = tables(spark, sf_dir)
    return chunk_documents(
        t["documents"], "doc_id", "text",
        chunk_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP,
    ).orderBy("doc_id", "chunk_index")


_Q_CHUNK_DOCS_SQL = f"""
WITH {_TOKS_CTE},
starts AS (
  SELECT doc_id, tk,
         CAST(i.i AS INT) AS chunk_index,
         CAST(i.i * {_CHUNK_TOKENS - _CHUNK_OVERLAP} AS INT) AS chunk_start
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0,
                  CAST(greatest(ceil((len(tk) - {_CHUNK_TOKENS})
                        / {_CHUNK_TOKENS - _CHUNK_OVERLAP}.0), 0) AS BIGINT))) AS i) i
  WHERE len(tk) > 0
)
SELECT doc_id, chunk_index, chunk_start,
       CAST(len(list_slice(tk, chunk_start + 1, chunk_start + {_CHUNK_TOKENS})) AS INT)
         AS n_chunk_tokens,
       array_to_string(list_slice(tk, chunk_start + 1, chunk_start + {_CHUNK_TOKENS}), ' ')
         AS chunk_text
FROM starts
ORDER BY doc_id, chunk_index
"""

# --- graph: PageRank centrality over the near-dup graph -------------------
_PR_ITERS = 3
_PR_DAMP = 0.85


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.graph import pagerank

    t = tables(spark, sf_dir)
    d = t["documents"]
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=_JACCARD_THRESHOLD)
    sym = pairs.select("id_a", "id_b").unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
        )
    )
    pr = pagerank(
        d.select(F.col("doc_id").alias("node")), sym,
        iterations=_PR_ITERS, damping=_PR_DAMP,
    )
    return (
        pr.select(F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _pr_sql() -> str:
    from lakehouse_architecture_spark.functions.aggregates import dsum_sql

    n = 500  # documents at any sf: driver fixture keeps 500 docs at sf0.01
    # NB: the oracle must not hard-code corpus size; compute it in SQL
    tele = f"((1.0 - {_PR_DAMP}) / (SELECT COUNT(*) FROM documents))"
    body = f"""
sym AS (
  SELECT id_a AS a, id_b AS b FROM prs
  UNION
  SELECT id_b, id_a FROM prs
),
deg AS (SELECT a AS src, COUNT(*) AS out_deg FROM sym GROUP BY a),
r0 AS (SELECT doc_id AS nid,
              ROUND(1.0 / (SELECT COUNT(*) FROM documents), 9) AS rank
       FROM documents)"""
    for i in range(1, _PR_ITERS + 1):
        body += f""",
c{i} AS (
  SELECT s.b AS dst, {dsum_sql(f"r.rank / d.out_deg")} AS in_mass
  FROM sym s JOIN r{i-1} r ON r.nid = s.a JOIN deg d ON d.src = s.a
  GROUP BY s.b
),
r{i} AS (
  SELECT n.doc_id AS nid,
         ROUND({tele} + {_PR_DAMP} * COALESCE(c.in_mass, 0.0), 9) AS rank
  FROM documents n LEFT JOIN c{i} c ON c.dst = n.doc_id
)"""
    return (
        f"""
WITH {_SHINGLES_CTE},
shh AS (SELECT doc_id, {_HASH64.format(expr='shingle')} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(n_inter / (sa.sz + sb.sz - n_inter), 6) >= {_JACCARD_THRESHOLD}
),"""
        + body
        + f"""
SELECT nid AS doc_id, ROUND(rank, 6) AS rank
FROM r{_PR_ITERS}
ORDER BY rank DESC, doc_id ASC
LIMIT 20
"""
    )


_Q_PAGERANK_SQL = _pr_sql()

# --- training prep: deterministic train/val/test split --------------------
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.curation import hash_split

    t = tables(spark, sf_dir)
    out = hash_split(t["documents"], "doc_id", _SPLIT_WEIGHTS)
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


_Q_HASH_SPLIT_SQL = f"""
WITH b AS (
  SELECT doc_id, n_chars,
         {md5_hash64_sql("'split_' || CAST(doc_id AS VARCHAR)")} % 1000000
           AS bucket
  FROM documents
),
lab AS (
  SELECT doc_id, n_chars,
         CASE WHEN bucket < 800000 THEN 'train'
              WHEN bucket < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id
FROM lab
GROUP BY split
ORDER BY split
"""

# --- robust stats: per-group median + MAD ---------------------------------
def _q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and median-absolute-deviation of extended price per return
    flag — the outlier-resistant twin of mean/stddev screening. Exact
    percentiles (not approx) so the oracle matches bit-for-bit; two grouped
    aggregates (medians, then deviations against the broadcast medians)."""
    t = tables(spark, sf_dir)
    li = t["lineitem"].select("l_returnflag", "l_extendedprice")
    med = exact_quantiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        {"med": 0.5},
        bucket_width=100.0,
    )
    dev = li.join(F.broadcast(med), on="l_returnflag").select(
        "l_returnflag",
        "med",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"),
    )
    mad = exact_quantiles(
        dev,
        ["l_returnflag"],
        "adev",
        {"__mad": 0.5},
        bucket_width=100.0,
    )
    return (
        dev.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med"), 4).alias("median_price"),
        )
        .join(F.broadcast(mad), on="l_returnflag")
        .select(
            "l_returnflag",
            "n",
            "median_price",
            F.round("__mad", 4).alias("mad_price"),
        )
        .orderBy("l_returnflag")
    )


_Q_ROBUST_STATS_SQL = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY l_returnflag
),
dev AS (
  SELECT l.l_returnflag, m.med, abs(l.l_extendedprice - m.med) AS adev
  FROM lineitem l JOIN med m USING (l_returnflag)
)
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(ANY_VALUE(med), 4) AS median_price,
       ROUND(quantile_cont(adev, 0.5), 4) AS mad_price
FROM dev
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# --- SemDeDup: semantic prune within embedding cells ----------------------
_SEMDEDUP_MIN_COS = 0.3


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2303.09540) keep-lowest-id variant; the
    fixture embeddings are isotropic so the threshold sits at 0.3 (~2.4
    sigma for 64-dim random cosines) to exercise both branches."""
    t = tables(spark, sf_dir)
    return sim.semdedup_prune(
        t["embeddings"], n_cells=_N_CELLS, min_cos=_SEMDEDUP_MIN_COS
    ).orderBy("vec_id")


_Q_SEMDEDUP_SQL = f"""
WITH {_DIMS_CTE},
{_NORMS_CTE},
cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec
  FROM embeddings ORDER BY vec_id ASC LIMIT {_N_CELLS}
),
cdots AS (
  SELECT e.vec_id, c.cent_id,
         ROUND(SUM(CAST(e.embedding[d.d] AS DOUBLE) * CAST(c.cvec[d.d] AS DOUBLE))
               / (ne.nrm * nc.nrm), 6) AS ccos
  FROM embeddings e
  JOIN norms ne ON ne.vec_id = e.vec_id
  CROSS JOIN cents c
  JOIN norms nc ON nc.vec_id = c.cent_id
  CROSS JOIN dims d
  GROUP BY e.vec_id, c.cent_id, ne.nrm, nc.nrm
),
best AS (
  SELECT vec_id, cent_id AS cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY ccos DESC, cent_id ASC) AS rn
  FROM cdots
),
assign AS (SELECT vec_id, cell FROM best WHERE rn = 1),
paircos AS (
  SELECT b.vec_id AS id_prune,
         ROUND(SUM(CAST(ea.embedding[d.d] AS DOUBLE) * CAST(eb.embedding[d.d] AS DOUBLE))
               / (na.nrm * nb.nrm), 6) AS cos
  FROM assign a
  JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  JOIN norms na ON na.vec_id = a.vec_id
  JOIN norms nb ON nb.vec_id = b.vec_id
  CROSS JOIN dims d
  GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm
),
pruned AS (SELECT DISTINCT id_prune FROM paircos WHERE cos >= {_SEMDEDUP_MIN_COS}),
sel AS (
  SELECT a.vec_id, a.cell, (p.id_prune IS NOT NULL) AS pruned
  FROM assign a LEFT JOIN pruned p ON p.id_prune = a.vec_id
)
SELECT vec_id, cell, pruned FROM sel ORDER BY vec_id
"""


# --- equi-depth quartile bins over lineitem price -------------------------
def _q_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth binning via exact quantile cut-points (the q_histogram
    twin: that one is equi-WIDTH). No global sort/ranking anywhere — the
    cuts come from :func:`exact_quantiles` (bounded-state two-phase rank,
    100 TB-safe), broadcast back, then a single hash agg."""
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    # global (no group cols) exact cuts with bounded state everywhere
    cuts = exact_quantiles(
        li,
        [],
        "l_extendedprice",
        {"c1": 0.25, "c2": 0.5, "c3": 0.75},
        bucket_width=100.0,
    )
    price = F.col("l_extendedprice")
    binned = li.crossJoin(F.broadcast(cuts)).select(
        F.when(price <= F.col("c1"), "q1")
        .when(price <= F.col("c2"), "q2")
        .when(price <= F.col("c3"), "q3")
        .otherwise("q4")
        .alias("bin"),
        price,
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min(price), 2).alias("min_price"),
            F.round(F.max(price), 2).alias("max_price"),
            F.round(dsum(price), 2).alias("sum_price"),
        )
        .orderBy("bin")
    )


_Q_EQUIDEPTH_SQL = f"""
WITH cuts AS (
  SELECT quantile_cont(l_extendedprice, 0.25) AS c1,
         quantile_cont(l_extendedprice, 0.50) AS c2,
         quantile_cont(l_extendedprice, 0.75) AS c3
  FROM lineitem
),
binned AS (
  SELECT CASE WHEN l_extendedprice <= c1 THEN 'q1'
              WHEN l_extendedprice <= c2 THEN 'q2'
              WHEN l_extendedprice <= c3 THEN 'q3'
              ELSE 'q4' END AS bin,
         l_extendedprice
  FROM lineitem, cuts
)
SELECT bin,
       COUNT(*) AS n_rows,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price,
       ROUND({dsum_sql('l_extendedprice')}, 2) AS sum_price
FROM binned
GROUP BY bin
ORDER BY bin
"""


# --- corpus diversity: bigram type-token ratio per source -----------------
def _q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram type-token ratio; see operators/text.ngram_diversity
    for the scale-shape rationale (spread, hashed two-level agg)."""
    from lakehouse_architecture_spark.operators.text import ngram_diversity

    t = tables(spark, sf_dir)
    return ngram_diversity(t["documents"], "source", "text", n=2).orderBy("source")


_Q_NGRAM_DIVERSITY_SQL = f"""
WITH {_TOKS_CTE},
bg AS (
  SELECT source,
         {_HASH64.format(expr="array_to_string(list_slice(tk, i.i + 1, i.i + 2), ' ')")} AS bg
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, len(tk) - 2)) AS i) i
)
SELECT source,
       COUNT(*) AS n_bigrams,
       COUNT(DISTINCT bg) AS n_distinct,
       ROUND(COUNT(DISTINCT bg) / CAST(COUNT(*) AS DOUBLE), 6) AS ttr
FROM bg
GROUP BY source
ORDER BY source
"""


# --- vocabulary tail: hapax legomena per source ---------------------------
def _q_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena vocabulary-tail stats; see operators/text.hapax_stats."""
    from lakehouse_architecture_spark.operators.text import hapax_stats

    t = tables(spark, sf_dir)
    return hapax_stats(t["documents"], "source", "text").orderBy("source")


_Q_HAPAX_SQL = f"""
WITH {_TOKS_CTE},
tok AS (SELECT source, unnest(tk) AS tok FROM toks),
freq AS (SELECT tok, COUNT(*) AS c, MAX(source) AS src FROM tok GROUP BY tok),
hapax AS (
  SELECT src AS source, COUNT(*) AS n_hapax FROM freq WHERE c = 1 GROUP BY src
),
dist AS (
  SELECT source, COUNT(DISTINCT tok) AS n_distinct FROM tok GROUP BY source
)
SELECT d.source,
       d.n_distinct,
       CAST(COALESCE(h.n_hapax, 0) AS BIGINT) AS n_hapax,
       ROUND(COALESCE(h.n_hapax, 0) / CAST(d.n_distinct AS DOUBLE), 6)
         AS hapax_ratio
FROM dist d LEFT JOIN hapax h ON h.source = d.source
ORDER BY d.source
"""


# --- DSIR importance scores against a target domain -----------------------
_DSIR_TARGETS = ("src0", "src1", "src2")


def _q_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.curation import dsir_scores

    t = tables(spark, sf_dir)
    return dsir_scores(
        t["documents"],
        "doc_id",
        "text",
        F.col("source").isin(*_DSIR_TARGETS),
    ).orderBy("doc_id")


_DSIR_IN = ", ".join(f"'{s}'" for s in _DSIR_TARGETS)
_Q_DSIR_SQL = f"""
WITH {_TOKS_CTE},
tok AS (
  SELECT doc_id, (source IN ({_DSIR_IN})) AS tgt, unnest(tk) AS tok
  FROM toks
),
cnt AS (
  SELECT tok, COUNT(*) AS cr,
         CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
  FROM tok GROUP BY tok
),
tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt,
         COUNT(*) AS v
  FROM cnt
),
w AS (
  SELECT tok,
         ln((ct + 1) / CAST(nt + v AS DOUBLE))
           - ln((cr + 1) / CAST(nr + v AS DOUBLE)) AS w
  FROM cnt, tot
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       FLOOR(({davg_sql('w')}) * 1000000.0) / 1000000.0 + 0.0 AS dsir_score
FROM tok JOIN w USING (tok)
GROUP BY doc_id
ORDER BY doc_id
"""


ANALYTICS_QUERIES: tuple[QuerySpec, ...] = (
    QuerySpec("q_token_entropy", "per-doc token entropy + unique ratio", _q_token_entropy, _Q_TOKEN_ENTROPY_SQL),
    QuerySpec("q_bigram_lm", "corpus bigram-LM fluency score per doc", _q_bigram_lm, _Q_BIGRAM_LM_SQL),
    QuerySpec("q_dup_ratio_by_source", "exact-duplicate mass per source", _q_dup_ratio_by_source, _Q_DUP_RATIO_SQL),
    QuerySpec("q_neardup_representative", "near-dup cluster representatives + mass", _q_neardup_representative, _Q_NEARDUP_REP_SQL),
    QuerySpec("q_event_transitions", "first-order event transition matrix", _q_event_transitions, _Q_EVENT_TRANSITIONS_SQL),
    QuerySpec("q_attribution", "last-touch conversion attribution", _q_attribution, _Q_ATTRIBUTION_SQL),
    QuerySpec("q_ooo_stats", "out-of-order arrival / watermark sizing stats", _q_ooo_stats, _Q_OOO_STATS_SQL),
    QuerySpec("q_posexplode_tokens", "positional explode: top token per position", _q_posexplode_tokens, _Q_POSEXPLODE_SQL),
    QuerySpec("q_centroid_cells", "embedding centroid-cell statistics", _q_centroid_cells, _Q_CENTROID_CELLS_SQL),
    QuerySpec("q_token_buckets", "token-length bucket packing planner", _q_token_buckets, _Q_TOKEN_BUCKETS_SQL),
    QuerySpec("q_skyline", "2-D pareto frontier (cheapest-and-biggest part)", _q_skyline, _Q_SKYLINE_SQL),
    QuerySpec("q_cross_corr", "lagged cross-correlation of event series", _q_cross_corr, _Q_CROSS_CORR_SQL),
    QuerySpec("q_emb_pair_stats", "intra- vs inter-label embedding cosine", _q_emb_pair_stats, _Q_EMB_PAIR_STATS_SQL),
    QuerySpec("q_chunk_docs", "fixed-window token chunking with overlap", _q_chunk_docs, _Q_CHUNK_DOCS_SQL),
    QuerySpec("q_pagerank", "fixed-iteration PageRank on the near-dup graph", _q_pagerank, _Q_PAGERANK_SQL),
    QuerySpec("q_hash_split", "deterministic train/val/test hash split", _q_hash_split, _Q_HASH_SPLIT_SQL),
    QuerySpec("q_robust_stats", "per-group median + MAD (robust outlier stats)", _q_robust_stats, _Q_ROBUST_STATS_SQL),
    QuerySpec("q_semdedup", "SemDeDup within-cell semantic prune", _q_semdedup, _Q_SEMDEDUP_SQL),
    QuerySpec("q_equidepth_bins", "equi-depth quartile bins via exact cut-points", _q_equidepth_bins, _Q_EQUIDEPTH_SQL),
    QuerySpec("q_ngram_diversity", "per-source bigram type-token ratio", _q_ngram_diversity, _Q_NGRAM_DIVERSITY_SQL),
    QuerySpec("q_hapax", "hapax legomena vocabulary-tail stats per source", _q_hapax, _Q_HAPAX_SQL),
    QuerySpec("q_dsir_score", "DSIR importance scores vs target domain", _q_dsir_score, _Q_DSIR_SQL),
)
