"""Relational operators Spark lacks as single calls, built scale-first.

The reference contains no joins at all (SURVEY.md §2.6) — its only join-like
behavior is a driver-side seen-ID anti-join (``app/bronze.py:113-116``).
Spark's built-in join surface covers inner/outer/semi/anti/cross; this module
adds the composite operators a full analytics engine needs: top-k per group,
as-of join, and point-in-interval (range) join — each implemented as a
composition of DataFrame ops so Catalyst/AQE still plan the physical join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number over a window.

    ``order_cols`` must define a TOTAL order (include a unique tiebreak
    column) or results are nondeterministic under parallelism.

    Scale: one shuffle on ``group_cols``; with AQE the per-group sort is a
    partial top-k (Spark pushes a WindowGroupLimit when a row_number filter
    is detected), so skewed groups do not sort their full partition.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    strict: bool = False,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the nearest right row with equal key
    and ``right_time <= left_time`` (``backward``, the default; ``<`` when
    ``strict``) or ``right_time >= left_time`` (``forward``; ``>`` when
    ``strict``) — pandas.merge_asof's full direction surface, distributed.

    Implemented with the union + fill-window trick rather than a range
    cross-join: tag both sides, sort within key by (time, side) — time
    DESCENDING for forward, so "carry the last seen right row" always
    means "nearest in the match direction" — and fill the right-side ROW
    across. The whole right row (match time + all value columns) travels as
    ONE struct filled by a single ``last(ignorenulls=True)``, so the output
    never mixes value columns from different right rows even when some
    value columns contain NULLs, and the tolerance check always refers to
    the same row the values came from — exactly pandas.merge_asof's
    row-level semantics. One shuffle on the key, no cartesian blow-up (a
    per-key merge join in disguise; the scalable formulation for 100 TB).

    ``tolerance`` bounds the match distance: a carried match farther than
    this (in SECONDS for timestamp columns, same units for numerics) is
    nulled out, exactly like merge_asof's tolerance.

    Returns the left rows plus ``value_cols`` (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if "__rt" in value_cols:
        raise ValueError("value column name '__rt' is reserved by asof_join")
    # side ordering: right rows must sort before left rows at equal time for
    # non-strict semantics, after them for strict — in TRAVERSAL order
    # (ascending for backward, descending for forward).
    right_tag = 0 if not strict else 1
    left_tag = 1 - right_tag

    # One struct per right row: its time plus every value column. Filling
    # this single struct (not each column independently) is what guarantees
    # a single-right-row match under NULL-bearing value columns.
    rrow = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r2 = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__side"),
        rrow.alias("__rrow"),
    )
    l2 = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(left_tag).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(r2.schema["__rrow"].dataType).alias("__rrow"),
    )
    r2 = r2.withColumn("__left", F.lit(None).cast(l2.schema["__left"].dataType))
    unioned = l2.unionByName(r2)
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__side",
        "__left",
        F.col("__t"),
        F.last("__rrow", ignorenulls=True).over(w).alias("__f"),
    )
    lefts = filled.filter(F.col("__side") == left_tag)
    matched = F.col("__f").isNotNull()
    if tolerance is not None:
        dist = F.abs(
            F.col("__t").cast("double") - F.col("__f.__rt").cast("double")
        )
        matched = matched & (dist <= F.lit(float(tolerance)))
    return lefts.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[
            F.when(matched, F.col(f"__f.{c}")).alias(c)
            for c in value_cols
        ],
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    extra_key: str | None = None,
) -> DataFrame:
    """Point-in-interval join without a cartesian product.

    Buckets both sides on ``floor(value / bucket_width)``; an interval is
    replicated to every bucket it overlaps, the join becomes an equi-join on
    the bucket id (+ optional extra key), and the exact range predicate is
    applied post-join. With ``bucket_width`` ≈ the typical interval length,
    replication is O(1) per interval and the join is a plain shuffled hash
    join — the standard scalable formulation (vs Spark's default
    BroadcastNestedLoopJoin for pure theta joins, which is O(n·m)).

    ``point_col``/``start_col``/``end_col`` must be numeric (cast timestamps
    to epoch seconds first). Inclusive bounds on both ends.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("bigint")
    )
    iv = intervals.withColumn(
        "__b0", F.floor(F.col(start_col) / F.lit(bucket_width)).cast("bigint")
    ).withColumn(
        "__b1", F.floor(F.col(end_col) / F.lit(bucket_width)).cast("bigint")
    )
    iv = iv.withColumn(
        "__bucket", F.explode(F.sequence(F.col("__b0"), F.col("__b1")))
    ).drop("__b0", "__b1")
    keys = ["__bucket"] + ([extra_key] if extra_key else [])
    joined = p.join(iv, on=keys, how="inner").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__bucket")


def pareto_frontier_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    tiebreak: str,
) -> DataFrame:
    """Two-dimensional skyline: rows not weakly dominated by any other row
    (another row with ``minimize`` <=, ``maximize`` >=, earlier tiebreak on
    full ties). The classic "cheapest AND biggest" frontier query.

    Sort-scan formulation instead of the naive dominance self-join: ordered
    by (minimize asc, maximize desc, tiebreak), a row is on the frontier
    iff its ``maximize`` strictly exceeds the running max of every earlier
    row — O(n log n) versus the self-join's O(n²) candidate space.

    Distributed two-phase: phase 1 computes each input partition's LOCAL
    frontier in parallel (windows partitioned by ``spark_partition_id``, so
    no shuffle and no single-task sort) — lossless, since a globally
    non-dominated row is non-dominated within its partition. Phase 2 runs
    the same scan globally over only the local survivors (bounded by the
    sum of per-partition frontier sizes, typically ~log n each), so the
    single-partition window touches a small set, never the full table.
    """
    order = [F.col(minimize).asc(), F.col(maximize).desc(), F.col(tiebreak)]

    def scan(frame: DataFrame, w: Window) -> DataFrame:
        prev_best = F.max(F.col(maximize)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            frame.withColumn("__prev_best", prev_best)
            .filter(
                F.col("__prev_best").isNull()
                | (F.col(maximize) > F.col("__prev_best"))
            )
            .drop("__prev_best")
        )

    local = scan(
        df.withColumn("__p", F.spark_partition_id()),
        Window.partitionBy("__p").orderBy(*order),
    ).drop("__p")
    return scan(local, Window.orderBy(*order))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    extra_key: str | None = None,
) -> DataFrame:
    """Interval × interval overlap join (inclusive ends) without a
    cartesian product — the generalization of :func:`range_join_bucketed`
    to two interval sets.

    Both sides replicate to every bucket their interval covers and meet in
    a plain equi-join on the bucket id. A pair overlapping several buckets
    would emit duplicates, so each pair is kept only in its CANONICAL
    bucket — the one containing max(start_l, start_r) (the first bucket
    where both intervals are live) — making the join exactly-once without
    a distinct. Replication is O(length/width) per interval; pick
    ``bucket_width`` near the typical interval length.

    Degenerate intervals (``end < start`` — an empty set under inclusive
    ends) are FILTERED OUT before the explode: ``F.sequence(a, b)``
    generates a DESCENDING sequence when a > b, so without the guard an
    empty interval would silently replicate into every bucket back to its
    end and could match rows it does not overlap.
    """
    left = left.filter(F.col(left_end) >= F.col(left_start))
    right = right.filter(F.col(right_end) >= F.col(right_start))
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / F.lit(bucket_width)).cast("bigint"),
                F.floor(F.col(left_end) / F.lit(bucket_width)).cast("bigint"),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(bucket_width)).cast("bigint"),
                F.floor(F.col(right_end) / F.lit(bucket_width)).cast("bigint"),
            )
        ),
    )
    keys = ["__bucket"] + ([extra_key] if extra_key else [])
    canon = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / F.lit(bucket_width)
    ).cast("bigint")
    return (
        lb.join(rb, on=keys, how="inner")
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("__bucket") == canon)
        )
        .drop("__bucket")
    )
