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
