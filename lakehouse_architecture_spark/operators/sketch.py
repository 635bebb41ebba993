"""Distributed frequency sketches.

``count_min_sketch`` builds the classic CMS (Cormode & Muthukrishnan) as a
DataFrame: ``depth`` pairwise-independent hash rows × ``width`` buckets,
each cell the count of rows hashing there. The sketch is a pure additive
aggregate — partial sketches from any partitioning merge by cell-wise
addition, which is exactly what Spark's map-side partial aggregation does
for the (depth, bucket) groupBy — so it scales like a word count no matter
the key cardinality, and the full sketch (depth×width rows, e.g. 3×256)
broadcasts for free.

``cms_estimate`` answers point frequency queries: est(key) = min over
depth rows of cell[d][h_d(key)] — an upper bound with the standard
(ε=e/width, δ=e^-depth) guarantee.

Spark ships ``DataFrame.stat.countMinSketch`` with engine-private hashing;
this build keeps the hash math portable (functions/hashing.py), so the
whole sketch is oracle-checkable cell by cell in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.hashing import md5_hash64, minhash_perm


def _bucket(key_hash: F.Column, d: int, width: int) -> F.Column:
    return (minhash_perm(key_hash, F.lit(d)) % width).cast("int")


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """(d, bucket, cnt) rows of a depth×width count-min sketch of
    ``key_col`` occurrences. One explode (×depth) + one shuffle on the
    (d, bucket) cell key; partial aggregation collapses the expansion
    map-side. Empty cells are absent (implicitly zero).
    """
    h = md5_hash64(F.col(key_col).cast("string"))
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(h, d, width).alias("bucket"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Point frequency estimates: min over depth rows of the key's cell.

    ``keys`` is expected small (it is broadcast against the tiny sketch).
    Missing cells count as zero via the left join + coalesce.
    """
    h = md5_hash64(F.col(key_col).cast("string"))
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), _bucket(h, d, width).alias("bucket"))
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("key", F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), on=["d", "bucket"], how="left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
