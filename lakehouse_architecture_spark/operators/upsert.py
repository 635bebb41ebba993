"""MERGE-style upsert without a table format — anti-join + union.

The north star names Delta/Iceberg for MERGE (SURVEY.md §7.3 phase 5); the
jars are not in this environment, so the engine provides the same semantics
on plain tables: given a target and a batch of updates keyed by ``keys``,

* matched rows are replaced by the update row (WHEN MATCHED THEN UPDATE SET *)
* unmatched update rows are inserted (WHEN NOT MATCHED THEN INSERT *)

* matched rows satisfying ``delete_condition`` are dropped
  (WHEN MATCHED AND cond THEN DELETE; an unmatched delete-marked row is a
  no-op, exactly as in Delta's MERGE)
* with ``evolve_schema``, columns present only in the updates are added to
  the table, existing rows reading NULL (Delta's ``mergeSchema``)

One shuffle on the key for the anti-join; the union is shuffle-free. With a
partitioned target, rewrite only the partitions the updates touch (dynamic
partition overwrite) — pass ``partition_col`` to get the pruned write set.

This is also the scalable replacement for the reference's seen-ID ledger
(``app/bronze.py:50-63``): ``upsert(..., insert_only=True)`` keeps first-
writer-wins semantics (WHEN NOT MATCHED THEN INSERT, matched rows kept).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    insert_only: bool = False,
    delete_condition: str | Column | None = None,
    evolve_schema: bool = False,
) -> DataFrame:
    """Return the merged table (caller writes it back / to a new snapshot).

    ``delete_condition`` is evaluated over the update row's columns (the
    source side of the MERGE): matched targets whose update row satisfies it
    are deleted; unmatched delete-marked rows are ignored. ``evolve_schema``
    widens the result to the union of both schemas instead of requiring the
    updates to carry every target column.
    """
    surviving = updates
    if delete_condition is not None:
        cond = (
            F.expr(delete_condition)
            if isinstance(delete_condition, str)
            else delete_condition
        )
        # NULL condition == not deleted, matching SQL WHEN MATCHED AND cond
        surviving = updates.filter(~F.coalesce(cond, F.lit(False)))
    if insert_only:
        new_rows = surviving.join(target.select(*keys), on=keys, how="left_anti")
        return target.unionByName(new_rows, allowMissingColumns=evolve_schema)
    # the anti-join sees EVERY update key — delete-marked rows must evict
    # their matched target row even though they are not re-inserted below
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    if evolve_schema:
        return kept.unionByName(surviving, allowMissingColumns=True)
    return kept.unionByName(surviving.select(*target.columns))


def touched_partitions(updates: DataFrame, partition_col: str) -> list:
    """Distinct partition values in the update batch — the only partitions a
    partitioned MERGE needs to rewrite (everything else is untouched)."""
    return [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Table reconciliation: per-key status between two snapshots —
    ``added`` / ``removed`` / ``changed`` / ``same``.

    The standard validation step after a migration, backfill, or MERGE:
    one full-outer shuffle join on the key, with each side reduced to a
    single md5 row-hash over ``compare_cols`` (default: all non-key
    columns, in name order) BEFORE the join — so the shuffle carries
    (key, 60-bit hash), not full rows, no matter how wide the table. For a
    count-only report, aggregate the result on ``status``.

    Row canonicalization is LENGTH-PREFIXED (round 11): each value
    frames as ``<char length>:<value>`` and NULL as the bare marker
    ``n``, so no value content can shift a column boundary — the old
    separator-joined form collided ``('a\\x1f', 'b')`` with
    ``('a', '\\x1fb')`` (and NULL with a literal ``'\\x00'`` string),
    reporting a changed row as ``same`` and silently corrupting any CDC
    or incremental-view fold built on the diff.
    """
    cmp_cols = compare_cols or sorted(c for c in before.columns if c not in keys)

    def hashed(df: DataFrame, out: str) -> DataFrame:
        from lakehouse_architecture_spark.functions.hashing import md5_hash64

        def framed(c: str):
            s = F.col(c).cast("string")
            return F.when(s.isNull(), F.lit("n")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )

        row = F.concat_ws("\x1f", *[framed(c) for c in cmp_cols])
        return df.select(*keys, md5_hash64(row).alias(out))

    b = hashed(before, "h_before")
    a = hashed(after, "h_after")
    joined = b.join(a, on=keys, how="full_outer")
    return joined.select(
        *keys,
        F.when(F.col("h_before").isNull(), F.lit("added"))
        .when(F.col("h_after").isNull(), F.lit("removed"))
        .when(F.col("h_before") == F.col("h_after"), F.lit("same"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
