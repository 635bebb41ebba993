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


def two_phase_rank(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    tiebreak_cols: list[str],
    bucket_width: float,
    rank_col: str = "i",
) -> DataFrame:
    """Global per-group ``row_number`` ordered by ``(value_col,
    *tiebreak_cols)`` WITHOUT a single-task-per-group sort.

    A plain ``row_number() OVER (PARTITION BY part ORDER BY value)`` caps
    parallelism at the number of groups — fatal when groups are few and
    huge (e.g. 25 nations over every order ever placed). This is the
    two-phase bucketed formulation:

    phase 1: bucket every row by ``floor(value / bucket_width)`` (monotone
      in the value, so bucket order == value order and equal values share
      a bucket) and count rows per (group, bucket) — one hash aggregate.
    phase 2: a prefix sum over the tiny (group, bucket) table yields each
      bucket's starting offset; broadcast-join the offsets back and add an
      INTRA-bucket ``row_number`` — the sort window now partitions by
      (group, bucket), so parallelism scales with buckets, not groups.

    ``rank = offset + intra_rank`` is bit-identical to the single-window
    form because bucketing is monotone and tie-breaking never crosses a
    bucket boundary (equal values always share one). The offsets table is
    |groups|·|buckets| rows — broadcastable by construction.

    ``value_col`` must be non-null numeric; rows with NULL values are
    dropped (a NULL cannot be ranked deterministically).
    """
    b = F.floor(F.col(value_col).cast("double") / F.lit(float(bucket_width))).cast(
        "bigint"
    )
    with_b = df.filter(F.col(value_col).isNotNull()).withColumn("__bkt", b)
    counts = with_b.groupBy(*part_cols, "__bkt").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    from pyspark.sql import Window

    woff = (
        Window.partitionBy(*part_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *[F.col(c).alias(f"__k_{c}") for c in part_cols],
        F.col("__bkt").alias("__obkt"),
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
    )
    # NULL-SAFE key equality: a NULL group key is a valid window partition
    # for the single-window form this must stay bit-identical to — a plain
    # equi-join would silently drop those rows
    cond = F.col("__bkt").eqNullSafe(F.col("__obkt"))
    for c in part_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__k_{c}"))
    wint = Window.partitionBy(*part_cols, "__bkt").orderBy(
        F.col(value_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    return (
        with_b.join(F.broadcast(offsets), on=cond)
        .withColumn(
            # bigint, not int: the whole point is exact global ranks on
            # tables past 2^31 rows
            rank_col,
            (F.col("__off") + F.row_number().over(wint)).cast("bigint"),
        )
        .drop("__bkt", "__off", "__obkt", *[f"__k_{c}" for c in part_cols])
    )
