"""Round-2 corpus operators: span-level substring dedup, URL
canonicalization, and Z-order clustering keys — each with an exact DuckDB
oracle. Registered LAST so never-verified queries ahead of them keep their
place in the driver's 50-entry correctness window (queries/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
]
