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


def bloom_build(
    df: DataFrame, key_col: str, k: int = 4, m_bits: int = 16384
) -> DataFrame:
    """Distributed Bloom filter over ``key_col`` as (word, bits) rows.

    Bit positions come from the portable double-hash scheme h_i(x) =
    (perm_0(x) + i*perm_1(x)) mod m (Kirsch–Mitzenmacher); each key sets
    ``k`` bits. Built sparse: explode k positions per key, distinct to one
    row per set bit, then OR the bits of each 32-bit word in one hash
    aggregation — partial aggregation merges partition-local filters
    map-side exactly like a word count, so the build is one shuffle whose
    volume is bounded by the FILTER size (≤ m/32 words per partition), not
    the key count. Absent words are all-zero.

    The result (≤ m/32 rows) broadcasts for probing. All hash math is
    md5-derived (functions/hashing.py) → the whole filter is
    oracle-checkable word by word.
    """
    h = md5_hash64(F.col(key_col).cast("string"))
    h1 = minhash_perm(h, F.lit(0))
    h2 = minhash_perm(h, F.lit(1))
    pos = F.array(*[((h1 + F.lit(i) * h2) % m_bits).cast("int") for i in range(k)])
    return (
        df.select(F.explode(pos).alias("p"))
        .select(
            (F.col("p") / 32).cast("int").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), p % 32)").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    k: int = 4,
    m_bits: int = 16384,
) -> DataFrame:
    """Membership probe: a key "may be present" iff ALL its k bits are set.

    The filter broadcasts (≤ m/32 rows); the probe side streams through an
    explode + broadcast join + one count-style aggregation per key — no
    shuffle of the probed table beyond the per-key regroup, which AQE
    coalesces. No false negatives; false-positive rate ~(1-e^{-kn/m})^k,
    deterministic here because the hashes are.

    Returns ``df`` plus ``maybe_present``.
    """
    h = md5_hash64(F.col(key_col).cast("string"))
    h1 = minhash_perm(h, F.lit(0))
    h2 = minhash_perm(h, F.lit(1))
    pos = F.array(*[((h1 + F.lit(i) * h2) % m_bits).cast("int") for i in range(k)])
    probes = df.select(key_col).distinct().select(
        F.col(key_col), F.posexplode(pos).alias("i", "p")
    ).select(
        key_col,
        (F.col("p") / 32).cast("int").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), p % 32)").alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            F.when(
                (F.col("bits").isNotNull())
                & (F.col("bits").bitwiseAND(F.col("bit")) == F.col("bit")),
                1,
            ).otherwise(0),
        )
        .groupBy(key_col)
        .agg((F.sum("hit") == F.lit(k)).alias("maybe_present"))
    )
    # plain key join: hits has one row per distinct probed key, which can be
    # as large as the probe table — let AQE pick broadcast when it is small
    return df.join(hits, key_col, "left")
