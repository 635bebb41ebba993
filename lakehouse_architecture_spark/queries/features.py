"""Feature-engineering queries (operators/features.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import dsum_sql
from lakehouse_architecture_spark.functions.hashing import md5_hash64_sql
from lakehouse_architecture_spark.operators.features import (
    feature_hashing,
    loo_target_encode,
    mutual_information,
)
from lakehouse_architecture_spark.queries.analytics import _TOKS_CTE
from lakehouse_architecture_spark.queries.base import QuerySpec, tables


def _q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return feature_hashing(t["documents"], "doc_id", "text", n_features=64).orderBy(
        "id", "bucket"
    )


_H = md5_hash64_sql("tok")
_Q_FEATURE_HASHING_SQL = f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id AS id, unnest(tk) AS tok FROM toks),
hb AS (
  SELECT id, CAST({_H} % 64 AS INTEGER) AS bucket,
         CASE WHEN ({_H} % 128) >= 64 THEN -1 ELSE 1 END AS s
  FROM tok
)
SELECT id, bucket, CAST(SUM(s) AS BIGINT) AS weight
FROM hb GROUP BY id, bucket
ORDER BY id, bucket
"""


def _q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    return loo_target_encode(base, "o_custkey", "o_totalprice", prior_weight=0.0).orderBy(
        "o_orderkey"
    )


_Q_TARGET_ENCODE_SQL = f"""
WITH stats AS (
  SELECT o_custkey, {dsum_sql('o_totalprice')} AS s, COUNT(o_totalprice) AS n
  FROM orders GROUP BY o_custkey
),
g AS (SELECT {dsum_sql('o_totalprice')} / COUNT(o_totalprice) AS gmean FROM orders)
SELECT o_orderkey, o_custkey, o_totalprice,
       ROUND(CASE WHEN n - 1 + 0.0 > 0
                  THEN (s - o_totalprice + 0.0 * gmean) / (n - 1 + 0.0)
                  ELSE gmean END, 6) AS loo_encoding
FROM orders JOIN stats USING (o_custkey), g
ORDER BY o_orderkey
"""


def _q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    base = t["events"].select(
        "event_type", (F.col("user_id") % 10).alias("ubucket")
    )
    return mutual_information(base, "event_type", "ubucket")


_Q_MUTUAL_INFO_SQL = """
WITH base AS (
  SELECT event_type AS x, user_id % 10 AS y FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
),
joint AS (SELECT x, y, COUNT(*) AS c FROM base GROUP BY x, y),
mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM joint GROUP BY x),
my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM joint GROUP BY y),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM joint),
terms AS (
  SELECT n, x, y,
         (CAST(c AS DOUBLE) / n)
           * LOG2((CAST(c AS DOUBLE) * n) / (CAST(cx AS DOUBLE) * cy)) AS term
  FROM joint JOIN mx USING (x) JOIN my USING (y), tot
)
SELECT n, COUNT(DISTINCT x) AS n_x, COUNT(DISTINCT y) AS n_y,
       ROUND(CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE), 6) AS mi_bits
FROM terms GROUP BY n
"""


FEATURES_QUERIES: list[QuerySpec] = [
    QuerySpec("q_feature_hashing", "signed hashing-trick bag-of-words (long form)", _q_feature_hashing, _Q_FEATURE_HASHING_SQL),
    QuerySpec("q_target_encode", "leave-one-out target encoding (leak-free)", _q_target_encode, _Q_TARGET_ENCODE_SQL),
    QuerySpec("q_mutual_info", "MI(event_type; user bucket) in bits", _q_mutual_info, _Q_MUTUAL_INFO_SQL),
]
