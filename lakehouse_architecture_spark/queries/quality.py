"""Data-quality expectation queries (pipeline/expectations.py).

The suites below intentionally mix passing and failing rules against the
fixture data so the violation counters are exercised in both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.pipeline.expectations import (
    dq_summary,
    expect,
    quarantine_split,
)
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

_LINEITEM_SUITE = [
    expect("qty_in_range", "l_quantity BETWEEN 1 AND 50"),
    expect("price_positive", "l_extendedprice > 0"),
    expect("low_discount", "l_discount <= 0.05"),
    expect("low_tax", "l_tax < 0.03"),
    expect("keys_present", "l_orderkey IS NOT NULL AND l_partkey IS NOT NULL"),
]


def _q_dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return dq_summary(t["lineitem"], _LINEITEM_SUITE)


def _viol_sql(pred: str) -> str:
    # twin of Expectation.holds(): NULL predicate counts as a violation
    return (
        f"CAST(SUM(CASE WHEN NOT COALESCE({pred}, FALSE) THEN 1 ELSE 0 END)"
        " AS BIGINT)"
    )


_Q_DQ_SUMMARY_SQL = f"""
WITH base AS (
  SELECT COUNT(*) AS n_rows,
         {_viol_sql('l_quantity BETWEEN 1 AND 50')} AS v_qty,
         {_viol_sql('l_extendedprice > 0')} AS v_price,
         {_viol_sql('l_discount <= 0.05')} AS v_disc,
         {_viol_sql('l_tax < 0.03')} AS v_tax,
         {_viol_sql('l_orderkey IS NOT NULL AND l_partkey IS NOT NULL')} AS v_keys
  FROM lineitem
),
rules AS (
  SELECT 'qty_in_range' AS expectation, 'warn' AS action, n_rows, v_qty AS n_violations FROM base
  UNION ALL SELECT 'price_positive', 'warn', n_rows, v_price FROM base
  UNION ALL SELECT 'low_discount', 'warn', n_rows, v_disc FROM base
  UNION ALL SELECT 'low_tax', 'warn', n_rows, v_tax FROM base
  UNION ALL SELECT 'keys_present', 'warn', n_rows, v_keys FROM base
)
SELECT expectation, action, n_rows, n_violations,
       ROUND(CAST(n_violations AS DOUBLE) / n_rows, 6) AS violation_rate
FROM rules
ORDER BY expectation
"""

_DOCS_SUITE = [
    expect("len_in_band", "n_chars BETWEEN 100 AND 500"),
    expect("major_lang", "lang IN ('en', 'fr')"),
    expect("has_text", "trim(text) <> ''"),
]


def _q_dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    _clean, bad = quarantine_split(t["documents"], _DOCS_SUITE)
    return bad.select(
        "doc_id",
        "source",
        F.array_join("_violations", ",").alias("violations"),
    ).orderBy("doc_id")


_Q_DQ_QUARANTINE_SQL = """
WITH tagged AS (
  SELECT doc_id, source,
         list_filter([
           CASE WHEN NOT COALESCE(n_chars BETWEEN 100 AND 500, FALSE) THEN 'len_in_band' END,
           CASE WHEN NOT COALESCE(lang IN ('en', 'fr'), FALSE) THEN 'major_lang' END,
           CASE WHEN NOT COALESCE(trim(text) <> '', FALSE) THEN 'has_text' END
         ], x -> x IS NOT NULL) AS v
  FROM documents
)
SELECT doc_id, source, array_to_string(v, ',') AS violations
FROM tagged
WHERE len(v) > 0
ORDER BY doc_id
"""

QUALITY_QUERIES: list[QuerySpec] = [
    QuerySpec("q_dq_summary", "single-pass expectation audit over lineitem", _q_dq_summary, _Q_DQ_SUMMARY_SQL),
    QuerySpec("q_dq_quarantine", "quarantined docs with violated-rule list", _q_dq_quarantine, _Q_DQ_QUARANTINE_SQL),
]
