"""TPC-H Q2 shape (min-cost supplier), completing the nominal q1-q22 set.

The testdata has no ``partsupp`` table, so — as with the rest of the TPC-H
tail (queries/relational4.py) — the shape is adapted to the available
schema: per-(part, supplier) supply cost = MIN(l_extendedprice) over
lineitem. What the shape exercises is unchanged: a correlated
equality-on-aggregate subquery over a multi-dimension join, decorrelated
Spark-side into a per-part window minimum over ONE regional cost build
(the subquery's joins are not repeated), with every dimension broadcast.

Registered last (registry ordering note in queries/corpus2.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.queries.base import QuerySpec, tables

_REGION = "EUROPE"
_PTYPE = "ECONOMY"
_MAX_SIZE = 15


def _q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    cost = t["lineitem"].groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("l_extendedprice").alias("supplycost"))
    eu_sup = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == _REGION)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = cost.join(eu_sup, cost["suppkey"] == eu_sup["s_suppkey"])
    w = Window.partitionBy("partkey")
    best = regional.withColumn("mincost", F.min("supplycost").over(w)).filter(
        F.col("supplycost") == F.col("mincost")
    )
    parts = t["part"].filter(
        (F.col("p_size") <= _MAX_SIZE) & (F.col("p_type") == _PTYPE)
    )
    return (
        best.join(parts, best["partkey"] == parts["p_partkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q02_SQL = f"""
WITH cost AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice) AS supplycost
  FROM lineitem GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, c1.supplycost AS supplycost
FROM part, cost c1, supplier, nation, region
WHERE p_partkey = c1.partkey AND s_suppkey = c1.suppkey
  AND p_size <= {_MAX_SIZE} AND p_type = '{_PTYPE}'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{_REGION}'
  AND c1.supplycost = (
    SELECT MIN(c2.supplycost)
    FROM cost c2, supplier s2, nation n2, region r2
    WHERE c2.partkey = c1.partkey AND s2.s_suppkey = c2.suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = '{_REGION}'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


RELATIONAL5_QUERIES: list[QuerySpec] = [
    QuerySpec(
        "q02_min_cost_supplier",
        "TPC-H Q2 shape: correlated min-on-aggregate decorrelated to a window",
        _q02_min_cost_supplier,
        _Q02_SQL,
    ),
]
