"""Registry query for the composed corpus-curation pipeline
(pipeline/corpus.py): language filter -> quality filter -> exact dedup ->
per-source quota -> token-budget packing, verified end-to-end against one
DuckDB oracle that chains the SAME stage semantics as CTEs.

The optional near-dedup stage is excluded here (its LSH + connected-
components semantics are oracle-covered by q_minhash_lsh /
q_dedup_components); pytest exercises the full chain including it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.pipeline.corpus import (
    CurationConfig,
    curate_corpus,
)
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

_MIN_QUALITY = 98.0
_SOURCE_CAP = 8
_TOKEN_BUDGET = 2000

_HASH64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_NTOK = (
    "CASE WHEN trim(text) = '' THEN 0 ELSE "
    "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) END"
)


def _q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    cfg = CurationConfig(
        languages=("en",),
        min_quality=_MIN_QUALITY,
        source_cap=_SOURCE_CAP,
        token_budget=_TOKEN_BUDGET,
        near_dedup=False,
    )
    out = curate_corpus(t["documents"], cfg)
    return out.select(
        "doc_id",
        "source",
        "quality",
        "n_tokens",
        F.col("running_tokens").cast("bigint").alias("running_tokens"),
    )


def _corpus_sql() -> str:
    # stage CTEs mirror pipeline/corpus.curate_corpus one-for-one
    from lakehouse_architecture_spark.operators.text import LANG_MARKERS

    en = ", ".join(f"'{w}'" for w in LANG_MARKERS["en"])
    langs_desc = sorted(LANG_MARKERS, reverse=True)
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_cols.append(
            f"CASE WHEN trim(text) = '' THEN 0 ELSE CAST(len(list_filter("
            f"regexp_split_to_array(trim(text), '\\s+'), x -> x IN ({markers})))"
            f" AS INT) END AS score_{lang}"
        )
    argmax = " ".join(f"WHEN score_{lang} = g THEN '{lang}'" for lang in langs_desc)
    idhash = _HASH64.format(expr="CAST(doc_id AS VARCHAR)")
    return f"""
WITH scored AS (
  SELECT *, {', '.join(score_cols)} FROM documents
),
lang_f AS (  -- stage 1: language filter (pred_lang = 'en')
  SELECT * FROM (
    SELECT *, CASE WHEN g = 0 THEN 'und' {argmax} END AS pred_lang
    FROM (SELECT *, greatest({', '.join('score_' + x for x in sorted(LANG_MARKERS))}) AS g
          FROM scored)
  ) WHERE pred_lang = 'en'
),
qual AS (  -- stage 2: quality filter on the ROUNDED score
  SELECT * FROM (
    SELECT *,
      ROUND(100.0
        - least(40.0, abs(CASE WHEN n_tok > 0 THEN (n_chars_d - (n_tok - 1)) / n_tok ELSE 0.0 END - 5.0) * 8.0)
        - least(30.0, CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d ELSE 0.0 END * 100.0)
        + least(10.0, CASE WHEN n_tok > 0 THEN stop / n_tok ELSE 0.0 END * 50.0), 2) AS quality
    FROM (
      SELECT *,
             CAST(length(text) AS DOUBLE) AS n_chars_d,
             CASE WHEN trim(text) = '' THEN CAST(0 AS DOUBLE)
                  ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) END AS n_tok,
             CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) AS n_punct,
             CASE WHEN trim(text) = '' THEN CAST(0 AS DOUBLE)
                  ELSE CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                       x -> x IN ({en}))) AS DOUBLE) END AS stop
      FROM lang_f)
  ) WHERE quality >= {_MIN_QUALITY}
),
deduped AS (  -- stage 3: exact dedup, keep lowest doc_id per fingerprint
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY {_HASH64.format(expr=_NORM)} ORDER BY doc_id) AS fp_rn
    FROM qual
  ) WHERE fp_rn = 1
),
capped AS (  -- stage 5: per-source quota, hash-ordered unbiased draw
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY {idhash} ASC, doc_id ASC) AS cap_rn
    FROM deduped
  ) WHERE cap_rn <= {_SOURCE_CAP}
),
packed AS (  -- stage 6: token-budget packing per language, best first
  SELECT * FROM (
    SELECT *, {_NTOK} AS n_tokens,
           CAST(SUM({_NTOK}) OVER (
             PARTITION BY pred_lang ORDER BY quality DESC, doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_tokens
    FROM capped
  ) WHERE running_tokens <= {_TOKEN_BUDGET}
)
SELECT doc_id, source, quality, n_tokens, running_tokens FROM packed
"""


CORPUS_QUERIES: list[QuerySpec] = [
    QuerySpec(
        "q_corpus_curation",
        "composed curation pipeline: language+quality filter, dedup, quota, budget",
        _q_corpus_curation,
        _corpus_sql(),
    ),
]
