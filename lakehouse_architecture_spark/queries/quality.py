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

def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.privacy import (
        k_anonymity_violations,
    )

    t = tables(spark, sf_dir)
    # fine-grained QI (nation x balance band of 100) so violating groups
    # exist at every fixture scale — a 0-row result proves nothing
    cust = t["customer"].withColumn(
        "bal_100", F.floor(F.col("c_acctbal") / 100)
    )
    return k_anonymity_violations(cust, ["c_nationkey", "bal_100"], k=5).orderBy(
        "c_nationkey", "bal_100"
    )


_Q_K_ANONYMITY_SQL = """
WITH cust AS (
  SELECT c_nationkey, CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS bal_100
  FROM customer
)
SELECT c_nationkey, bal_100, COUNT(*) AS n_rows
FROM cust
GROUP BY c_nationkey, bal_100
HAVING COUNT(*) < 5
ORDER BY c_nationkey, bal_100
"""


def _q_anonymity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.privacy import anonymity_summary

    t = tables(spark, sf_dir)
    # sensitive attribute: the account-balance sign band
    cust = t["customer"].withColumn(
        "bal_band",
        F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise(F.lit("pos")),
    )
    return anonymity_summary(cust, ["c_nationkey", "c_mktsegment"], "bal_band")


_Q_ANONYMITY_SUMMARY_SQL = """
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_band
  FROM customer
),
groups AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_rows
  FROM cust GROUP BY 1, 2
),
lgroups AS (
  -- COUNT(bal_band), not COUNT(*): NULL secrets carry no diversity
  SELECT c_nationkey, c_mktsegment, COUNT(bal_band) AS n_sens
  FROM (SELECT DISTINCT c_nationkey, c_mktsegment, bal_band FROM cust)
  GROUP BY 1, 2
),
gstats AS (
  SELECT COUNT(*) AS n_groups, MIN(n_rows) AS achieved_k,
         CAST(SUM(n_rows) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN n_rows = 1 THEN n_rows ELSE 0 END) AS BIGINT)
           AS n_singleton_rows
  FROM groups
),
lstats AS (SELECT MIN(n_sens) AS achieved_l FROM lgroups)
SELECT n_groups, achieved_k, achieved_l, n_total,
       ROUND(CAST(n_singleton_rows AS DOUBLE) / n_total, 6)
         AS singleton_row_share
FROM gstats, lstats
"""


def _q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.integrity import (
        dataset_fingerprint,
    )

    t = tables(spark, sf_dir)
    # doubles routed through DECIMAL(38,6): raw double->string formatting
    # is not engine-portable (operators/integrity.py caller contract)
    cols = [
        F.col("l_orderkey"),
        F.col("l_partkey"),
        F.col("l_suppkey"),
        F.col("l_linenumber"),
        F.col("l_quantity").cast("decimal(38,6)"),
        F.col("l_extendedprice").cast("decimal(38,6)"),
        F.col("l_discount").cast("decimal(38,6)"),
        F.col("l_tax").cast("decimal(38,6)"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.col("l_shipdate"),
    ]
    return dataset_fingerprint(t["lineitem"], cols)


def _fp_canon_sql() -> str:
    from lakehouse_architecture_spark.functions.hashing import md5_hash64_sql

    # length-prefixed framing in lockstep with operators/integrity._framed
    # (round 11): '<len>:<value>' per value, bare 'n' for NULL
    frame = (
        "CASE WHEN {v} IS NULL THEN 'n'"
        " ELSE CONCAT(CAST(LENGTH({v}) AS VARCHAR), ':', {v}) END"
    )
    ints = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    decs = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    strs = ["l_returnflag", "l_linestatus", "l_shipdate"]
    parts = [frame.format(v=f"CAST({c} AS VARCHAR)") for c in ints]
    parts += [
        frame.format(v=f"CAST(CAST({c} AS DECIMAL(38,6)) AS VARCHAR)")
        for c in decs
    ]
    parts += [frame.format(v=f"CAST({c} AS VARCHAR)") for c in strs]
    canon = f"concat_ws(chr(31), {', '.join(parts)})"
    return md5_hash64_sql(canon)


_Q_DATASET_FINGERPRINT_SQL = f"""
WITH rh AS (SELECT ({_fp_canon_sql()}) % 2147483647 AS h FROM lineitem)
SELECT COUNT(*) AS n_rows, CAST(SUM(h) % 2147483647 AS BIGINT) AS fingerprint
FROM rh
"""


def _q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.curation import temporal_split

    t = tables(spark, sf_dir)
    s = temporal_split(t["events"], "ts", test_frac=0.2, embargo_us=3_600_000_000)
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(
                F.timestamp_micros(F.min(F.unix_micros(F.col("ts").cast("timestamp")))),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("first_ts"),
            F.date_format(
                F.timestamp_micros(F.max(F.unix_micros(F.col("ts").cast("timestamp")))),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("last_ts"),
        )
        .orderBy("split")
    )


_Q_TEMPORAL_SPLIT_SQL = """
WITH us AS (SELECT epoch_ns(ts) // 1000 AS u FROM events),
cut AS (SELECT quantile_cont(u, 0.8) AS c FROM us),
lab AS (
  SELECT u,
         CASE WHEN u >= c THEN 'test'
              WHEN u < c - 3600000000 THEN 'train'
              ELSE 'embargo' END AS split
  FROM us, cut
)
SELECT split, COUNT(*) AS n,
       strftime(make_timestamp(MIN(u)), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(make_timestamp(MAX(u)), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM lab GROUP BY split ORDER BY split
"""


QUALITY_QUERIES: list[QuerySpec] = [
    QuerySpec("q_dq_summary", "single-pass expectation audit over lineitem", _q_dq_summary, _Q_DQ_SUMMARY_SQL),
    QuerySpec("q_dq_quarantine", "quarantined docs with violated-rule list", _q_dq_quarantine, _Q_DQ_QUARANTINE_SQL),
    QuerySpec("q_k_anonymity", "QI groups below the k-anonymity threshold", _q_k_anonymity, _Q_K_ANONYMITY_SQL),
    QuerySpec("q_anonymity_summary", "achieved k/l + singleton-row share", _q_anonymity_summary, _Q_ANONYMITY_SUMMARY_SQL),
    QuerySpec("q_dataset_fingerprint", "order-insensitive content hash of lineitem", _q_dataset_fingerprint, _Q_DATASET_FINGERPRINT_SQL),
    QuerySpec("q_temporal_split", "purged/embargoed time split summary", _q_temporal_split, _Q_TEMPORAL_SPLIT_SQL),
]
