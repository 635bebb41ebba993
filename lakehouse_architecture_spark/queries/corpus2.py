"""Round-2 corpus operators: span-level substring dedup, URL
canonicalization, and Z-order clustering keys — each with an exact DuckDB
oracle. Registered LAST so never-verified queries ahead of them keep their
place in the driver's 50-entry correctness window (queries/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.dedup import duplicated_kgram_spans
from lakehouse_architecture_spark.operators.partitioning import (
    zorder_value,
    zorder_value_sql,
)
from lakehouse_architecture_spark.operators.web import (
    canonicalize_url,
    canonicalize_url_sql,
)
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

_HASH64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

# --- span-level substring dedup (Lee et al. 2107.06499) -------------------
_SPAN_K = 8


def _q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return duplicated_kgram_spans(
        t["documents"], "doc_id", "text", k=_SPAN_K, min_docs=2
    ).orderBy("id", "span_start")


_Q_DUP_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
pos AS (
  SELECT doc_id, CAST(i.i AS INT) AS pos,
         {_HASH64.format(expr=f"array_to_string(list_slice(tk, i.i + 1, i.i + {_SPAN_K}), ' ')")} AS h
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, len(tk) - {_SPAN_K})) AS i) i
  WHERE len(tk) >= {_SPAN_K}
),
hot AS (
  SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM pos
  GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
dup AS (SELECT p.doc_id, p.pos, hot.n_docs FROM pos p JOIN hot USING (h)),
isl AS (
  SELECT doc_id, pos, n_docs,
         SUM(CASE WHEN prev IS NULL OR pos - prev > {_SPAN_K} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT *, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dup)
)
SELECT doc_id AS id,
       MIN(pos) AS span_start,
       MAX(pos) + {_SPAN_K - 1} AS span_end,
       MAX(pos) + {_SPAN_K - 1} - MIN(pos) + 1 AS span_tokens,
       MAX(n_docs) AS n_docs
FROM isl
GROUP BY doc_id, island
ORDER BY id, span_start
"""


def _q_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.dedup import remove_duplicated_spans

    t = tables(spark, sf_dir)
    out = remove_duplicated_spans(
        t["documents"], "doc_id", "text", k=_SPAN_K, min_docs=2
    )
    return out.select("doc_id", "text").orderBy("doc_id")


_Q_REMOVE_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
pos AS (
  SELECT doc_id, CAST(i.i AS INT) AS pos,
         {_HASH64.format(expr=f"array_to_string(list_slice(tk, i.i + 1, i.i + {_SPAN_K}), ' ')")} AS h
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, len(tk) - {_SPAN_K})) AS i) i
  WHERE len(tk) >= {_SPAN_K}
),
hot AS (
  SELECT h FROM pos GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
dup AS (SELECT p.doc_id, p.pos FROM pos p JOIN hot USING (h)),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev > {_SPAN_K} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT *, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dup)
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_K - 1} AS e
  FROM isl GROUP BY doc_id, island
),
tokpos AS (
  SELECT doc_id, CAST(t.i - 1 AS INT) AS pos, tk[t.i] AS tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) t
),
keep AS (
  SELECT tp.doc_id, tp.pos, tp.tok
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = tp.doc_id AND tp.pos BETWEEN s.s AND s.e
  )
)
SELECT d.doc_id,
       CASE WHEN EXISTS (SELECT 1 FROM spans s WHERE s.doc_id = d.doc_id)
            THEN COALESCE((SELECT string_agg(k.tok, ' ' ORDER BY k.pos)
                           FROM keep k WHERE k.doc_id = d.doc_id), '')
            ELSE d.text END AS text
FROM documents d
ORDER BY d.doc_id
"""


# --- URL canonicalization + dedup -----------------------------------------
# The corpus has no URL column, so both engines derive the SAME synthetic
# URLs from doc_id (case/port/fragment/tracking/trailing-slash variants) and
# the canonicalizer is what gets differentially verified.


def _synth_url() -> F.Column:
    m7 = (F.col("doc_id") % 7).cast("string")
    m13 = (F.col("doc_id") % 13).cast("string")
    return (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("HTTPS://WWW.Site"), m7, F.lit(".COM:443/Articles/Item"), m13,
                     F.lit("/?utm_source=feed&b=2&a=1#top")),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("https://site"), m7, F.lit(".com/Articles/Item"), m13,
                     F.lit("?a=1&b=2")),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(F.lit("HTTP://Site"), m7, F.lit(".COM:80/Articles/Item"), m13,
                     F.lit("//?b=2&a=1&fbclid=xyz")),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit("https://Site"), m7, F.lit(".com/")),
        )
        .otherwise(F.concat(F.lit("not a url "), F.col("doc_id").cast("string")))
    )


_SYNTH_URL_SQL = """
CASE
  WHEN doc_id % 5 = 0 THEN 'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
       || '.COM:443/Articles/Item' || CAST(doc_id % 13 AS VARCHAR)
       || '/?utm_source=feed&b=2&a=1#top'
  WHEN doc_id % 5 = 1 THEN 'https://site' || CAST(doc_id % 7 AS VARCHAR)
       || '.com/Articles/Item' || CAST(doc_id % 13 AS VARCHAR) || '?a=1&b=2'
  WHEN doc_id % 5 = 2 THEN 'HTTP://Site' || CAST(doc_id % 7 AS VARCHAR)
       || '.COM:80/Articles/Item' || CAST(doc_id % 13 AS VARCHAR)
       || '//?b=2&a=1&fbclid=xyz'
  WHEN doc_id % 5 = 3 THEN 'https://Site' || CAST(doc_id % 7 AS VARCHAR) || '.com/'
  ELSE 'not a url ' || CAST(doc_id AS VARCHAR)
END
"""


def _q_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .select("doc_id", _synth_url().alias("url"))
        .withColumn("canonical_url", canonicalize_url("url"))
        .orderBy("doc_id")
    )


_Q_URL_CANON_SQL = f"""
SELECT doc_id, url, {canonicalize_url_sql('url')} AS canonical_url
FROM (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents)
ORDER BY doc_id
"""


# --- Z-order clustering key -----------------------------------------------
_Z_BITS = 8


def _q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    z = zorder_value([F.col("p_size"), F.col("p_partkey") % 256], bits=_Z_BITS)
    return (
        t["part"]
        .select("p_partkey", "p_size", z.alias("z"))
        .orderBy("p_partkey")
    )


_Q_ZORDER_SQL = f"""
SELECT p_partkey, p_size,
       {zorder_value_sql(['p_size', 'p_partkey % 256'], bits=_Z_BITS)} AS z
FROM part
ORDER BY p_partkey
"""


# --- domain-mix rebalancing -----------------------------------------------
_MIX = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def _q_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.curation import mix_rebalance

    t = tables(spark, sf_dir)
    return (
        mix_rebalance(t["documents"], "source", "doc_id", _MIX)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


_MIX_VALUES = ", ".join(f"('{s}', CAST({w} AS DOUBLE))" for s, w in sorted(_MIX.items()))
_Q_MIX_SQL = f"""
WITH tw(source, w) AS (VALUES {_MIX_VALUES}),
counts AS (
  SELECT d.source, COUNT(*) AS n, MIN(w) AS w
  FROM documents d JOIN tw USING (source)
  GROUP BY d.source
),
t AS (SELECT MIN(n / w) AS t FROM counts),
frac AS (SELECT source, w * t.t / n AS keep FROM counts, t)
SELECT doc_id, d.source
FROM documents d JOIN frac USING (source)
WHERE {_HASH64.format(expr='CAST(doc_id AS VARCHAR)')} % 1000000
      < CAST(FLOOR(keep * 1000000) AS BIGINT)
ORDER BY doc_id
"""


# --- C4 / Gopher heuristic quality rules ----------------------------------
def _q_heuristic_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.text import heuristic_flags

    t = tables(spark, sf_dir)
    out = heuristic_flags(t["documents"], "text")
    return out.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("alpha_word_frac", 6).alias("alpha_word_frac"),
        F.round("symbol_word_ratio", 6).alias("symbol_word_ratio"),
        "fails_gopher",
        "fails_c4",
    ).orderBy("doc_id")


_Q_HEURISTIC_SQL = """
WITH w AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS words
  FROM documents
),
s AS (
  SELECT doc_id, text, len(words) AS n_words,
         CASE WHEN len(words) > 0 THEN
           CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words)
         END AS mean_word_len,
         CASE WHEN len(words) > 0 THEN
           CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(words)
         END AS alpha_word_frac,
         CASE WHEN len(words) > 0 THEN
           CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE) / len(words)
         END AS symbol_word_ratio,
         CASE WHEN len(string_split(text, chr(10))) > 0 THEN
           CAST(len(list_filter(string_split(text, chr(10)),
                l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
           / len(string_split(text, chr(10)))
         END AS bullet_frac,
         CASE WHEN len(string_split(text, chr(10))) > 0 THEN
           CAST(len(list_filter(string_split(text, chr(10)),
                l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE)
           / len(string_split(text, chr(10)))
         END AS ellipsis_frac
  FROM w
)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(alpha_word_frac, 6) AS alpha_word_frac,
       ROUND(symbol_word_ratio, 6) AS symbol_word_ratio,
       COALESCE(n_words < 50 OR n_words > 100000
                OR mean_word_len < 3.0 OR mean_word_len > 10.0
                OR alpha_word_frac < 0.8 OR symbol_word_ratio > 0.1
                OR bullet_frac > 0.9 OR ellipsis_frac > 0.3, TRUE) AS fails_gopher,
       (lower(text) LIKE '%lorem ipsum%' OR contains(text, '{')) AS fails_c4
FROM s
ORDER BY doc_id
"""


def _q_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold assignment census: every document
    lands in fold md5(doc_id) % 5 — a pure function of the id, so the
    split is stable across partitioning, retries, engines, and reruns (no
    RNG state to ship). Output: per (fold, lang) counts + the fold's
    share of its language, the balance readout a training pipeline checks
    before cross-validation. One narrow map + one hash-agg; the window
    runs on the fold x lang grid, never on rows."""
    from lakehouse_architecture_spark.functions.hashing import md5_hash64

    t = tables(spark, sf_dir)
    w = Window.partitionBy("lang")
    return (
        t["documents"]
        .select(
            (md5_hash64(F.col("doc_id").cast("string")) % 5).alias("fold"),
            "lang",
        )
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "lang_share",
            F.round(
                F.col("n_docs") / F.sum("n_docs").over(w), 6
            ),
        )
        .orderBy("fold", "lang")
    )


_Q_KFOLD_SQL = """
WITH f AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5 AS fold,
         lang
  FROM documents
),
g AS (
  SELECT fold, lang, COUNT(*) AS n_docs FROM f GROUP BY fold, lang
)
SELECT fold, lang, n_docs,
       ROUND(n_docs / SUM(n_docs) OVER (PARTITION BY lang), 6) AS lang_share
FROM g
ORDER BY fold, lang
"""


def _q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (the alpha-sampling used to set
    pretraining mixture weights): per-source token mass t_s (n_chars as
    the proxy), sampling weight w_s = t_s^alpha / sum(t^alpha) with
    alpha = 0.7 (upweights small sources), and the implied epochs over
    each source at a fixed token budget — epochs > 1 means the source
    repeats. One hash-agg + a broadcast scalar; nothing row-sized moves
    after the aggregate."""
    from lakehouse_architecture_spark.functions.aggregates import dsum

    alpha, budget = 0.7, 1_000_000.0
    t = tables(spark, sf_dir)
    per = (
        t["documents"]
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), dsum("n_chars", "toks"))
        .withColumn("wraw", F.pow(F.col("toks"), F.lit(alpha)))
    )
    tot = per.agg(F.sum(F.col("wraw").cast("decimal(38,6)")).alias("wsum"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.col("toks").cast("bigint").alias("toks"),
            F.round(
                F.col("wraw") / F.col("wsum").cast("double"), 6
            ).alias("weight"),
            F.round(
                F.lit(budget)
                * (F.col("wraw") / F.col("wsum").cast("double"))
                / F.col("toks"),
                4,
            ).alias("epochs"),
        )
        .orderBy("source")
    )


_Q_TEMPERATURE_MIX_SQL = """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) AS toks
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(CAST(POWER(toks, 0.7) AS DECIMAL(38,6))) AS DOUBLE) AS wsum
  FROM per
)
SELECT source, n_docs, CAST(toks AS BIGINT) AS toks,
       ROUND(POWER(toks, 0.7) / wsum, 6) AS weight,
       ROUND(1000000.0 * (POWER(toks, 0.7) / wsum) / toks, 4) AS epochs
FROM per, tot
ORDER BY source
"""


CORPUS2_QUERIES: list[QuerySpec] = [
    QuerySpec(
        "q_dup_spans",
        "cross-doc duplicated k-gram substring spans (Lee et al. span dedup)",
        _q_dup_spans,
        _Q_DUP_SPANS_SQL,
    ),
    QuerySpec(
        "q_url_canon",
        "URL canonicalization: case/port/fragment/tracking/slash/param-order",
        _q_url_canon,
        _Q_URL_CANON_SQL,
    ),
    QuerySpec(
        "q_zorder",
        "Morton Z-order interleaved clustering key",
        _q_zorder,
        _Q_ZORDER_SQL,
    ),
    QuerySpec(
        "q_remove_spans",
        "scrubbed corpus: duplicated k-gram spans removed (span dedup end-to-end)",
        _q_remove_spans,
        _Q_REMOVE_SPANS_SQL,
    ),
    QuerySpec(
        "q_mix_rebalance",
        "target domain-mix rebalancing via limiting-stratum hash sampling",
        _q_mix_rebalance,
        _Q_MIX_SQL,
    ),
    QuerySpec(
        "q_heuristic_flags",
        "C4/Gopher rule-based quality screens as narrow Catalyst exprs",
        _q_heuristic_flags,
        _Q_HEURISTIC_SQL,
    ),
    # round-7 additions
    QuerySpec(
        "q_kfold",
        "deterministic stratified k-fold census (hash fold ids)",
        _q_kfold,
        _Q_KFOLD_SQL,
    ),
    QuerySpec(
        "q_temperature_mix",
        "alpha-temperature source mixing weights + implied epochs",
        _q_temperature_mix,
        _Q_TEMPERATURE_MIX_SQL,
    ),
]
