"""MERGE-style upsert without a table format — anti-join + union.

The north star names Delta/Iceberg for MERGE (SURVEY.md §7.3 phase 5); the
jars are not in this environment, so the engine provides the same semantics
on plain tables: given a target and a batch of updates keyed by ``keys``,

* matched rows are replaced by the update row (WHEN MATCHED THEN UPDATE SET *)
* unmatched update rows are inserted (WHEN NOT MATCHED THEN INSERT *)

One shuffle on the key for the anti-join; the union is shuffle-free. With a
partitioned target, rewrite only the partitions the updates touch (dynamic
partition overwrite) — pass ``partition_col`` to get the pruned write set.

This is also the scalable replacement for the reference's seen-ID ledger
(``app/bronze.py:50-63``): ``upsert(..., insert_only=True)`` keeps first-
writer-wins semantics (WHEN NOT MATCHED THEN INSERT, matched rows kept).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    insert_only: bool = False,
) -> DataFrame:
    """Return the merged table (caller writes it back / to a new snapshot)."""
    if insert_only:
        new_rows = updates.join(target.select(*keys), on=keys, how="left_anti")
        return target.unionByName(new_rows)
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates.select(*target.columns))


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
    """
    cmp_cols = compare_cols or sorted(c for c in before.columns if c not in keys)

    def hashed(df: DataFrame, out: str) -> DataFrame:
        from lakehouse_architecture_spark.functions.hashing import md5_hash64

        row = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cmp_cols]
        )
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
