"""Table-format abstraction: Delta/Iceberg when available, parquet fallback.

The north star names Delta/Iceberg (transactional MERGE, time travel,
compaction). Their jars are not in this environment, so the engine exposes
one interface with two implementations:

* ``delta`` — used automatically when the delta-spark package and jars are
  importable: transactional writes and a real ``MERGE INTO``.
* ``parquet`` — snapshot semantics: MERGE = anti-join + union + atomic-ish
  directory overwrite (operators/upsert). Correct, replay-idempotent, and
  what the tests exercise here.

``resolve_format()`` picks at runtime; callers never branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_architecture_spark.operators.upsert import merge_upsert


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def resolve_format(requested: str = "auto") -> str:
    if requested == "auto":
        return "delta" if delta_available() else "parquet"
    return requested


class ManagedTable:
    """A keyed table with upsert semantics, format-agnostic."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        format: str = "auto",
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = keys
        self.format = resolve_format(format)

    def exists(self) -> bool:
        try:
            self.read().limit(1).collect()
            return True
        except Exception:
            return False

    def read(self) -> DataFrame:
        return self.spark.read.format(self.format).load(self.path)

    def overwrite(self, df: DataFrame) -> None:
        df.write.format(self.format).mode("overwrite").save(self.path)

    def merge(self, updates: DataFrame) -> None:
        """MERGE: update matched keys, insert new ones."""
        if not self.exists():
            self.overwrite(updates)
            return
        if self.format == "delta":
            from delta.tables import DeltaTable

            target = DeltaTable.forPath(self.spark, self.path)
            cond = " AND ".join(f"t.{k} = s.{k}" for k in self.keys)
            (
                target.alias("t")
                .merge(updates.alias("s"), cond)
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            return
        # The merged snapshot must be durable BEFORE the source dir is
        # touched: cache()+count() is not (evicted/lost partitions would
        # recompute from a half-overwritten source).
        merged = merge_upsert(self.read(), updates, self.keys)
        if "://" in self.path:
            # Object store / remote FS: no POSIX rename. Truncate lineage
            # with an eager localCheckpoint so the overwrite cannot re-read
            # the source; a transactional format (delta branch above) is
            # the real answer for concurrent-safe merges there.
            merged = merged.localCheckpoint(eager=True)
            self.overwrite(merged)
            return
        # Local path: write to a temp sibling, then atomically swap.
        import os
        import shutil

        target = self.path.rstrip("/")
        tmp = target + "__merging"
        merged.write.format(self.format).mode("overwrite").save(tmp)
        shutil.rmtree(target)
        os.rename(tmp, target)
