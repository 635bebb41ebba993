"""Skew-mitigation helpers for joins and aggregations.

AQE's skew-join handling (on by default in SessionFactory) covers most
cases at runtime by splitting oversized shuffle partitions. These helpers
cover the cases AQE cannot: a broadcast-ineligible join against a table
where a handful of keys dominate (the classic power-law key problem at
100 TB — one 'null'/'unknown' key holding 30% of rows lands on one task).

``salted_join`` replicates the *small* side SALT ways and scatters the big
side's hot keys uniformly across the replicas: shuffle parallelism on a hot
key improves by SALT× at the cost of replicating the small side SALT×.
Correct for inner and left joins on equality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's keys salted across ``salt`` buckets.

    big gains a uniform random-ish salt derived from a stable row hash (no
    rand(): deterministic across retries — a task retry with rand() would
    change row placement and can duplicate/lose rows under speculative
    execution); small is replicated to every salt value. Only
    hash-eligible columns feed the salt (``F.hash`` rejects MapType —
    hashing every column blindly crashes on tables with map columns, e.g.
    the bronze listing schema's ``attrs``).

    Correct ONLY for inner/left joins (the documented restriction is now
    enforced): a right/full join would emit ``salt`` copies of unmatched
    small rows, and semi/anti joins drop the small columns the final
    select needs.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}"
        )
    from pyspark.sql import types as T

    big_cols = big.columns
    small_cols = [c for c in small.columns if c != on]
    hashable = [
        f.name
        for f in big.schema.fields
        if not isinstance(f.dataType, T.MapType)
    ]
    b = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in hashable]), F.lit(salt))
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = b.join(s, on=[on, "__salt"], how=how).drop("__salt")
    return out.select(*big_cols, *small_cols)


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Top-N heaviest keys with their share — the diagnosis step before
    choosing a salt factor. ONE scan: the total comes from an all-rows
    window over the (tiny) grouped result, not a second full count()."""
    from pyspark.sql import Window

    grouped = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy(F.lit(1)))
    return (
        grouped.withColumn("share", F.round(F.col("n") / total.cast("double"), 6))
        .orderBy(F.col("n").desc())
        .limit(top)
    )
