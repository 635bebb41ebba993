"""Streaming sinks: exactly-once upsert via foreachBatch.

The reference's silver write is a blind per-file overwrite with a
non-atomic move protocol (``app/sliver.py:173-187``). The streaming-native
replacement is ``foreachBatch`` + MERGE semantics: each micro-batch upserts
into the target keyed table; the checkpoint guarantees each batch is applied
once per epoch, and the upsert makes replays idempotent (same keys → same
final state) — the standard exactly-once recipe for non-transactional sinks.

With a transactional table format (see pipeline/table_format.py) the
per-batch rewrite becomes a real MERGE INTO; on plain parquet the engine
rewrites the snapshot — correct, if heavier, and partition-prunable via
operators/upsert.touched_partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from lakehouse_architecture_spark.operators.upsert import merge_upsert


def foreach_batch_upsert(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Run the stream with each micro-batch MERGEd into ``target_path``."""
    spark = stream.sparkSession

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        import os
        import shutil
        import uuid

        batch = batch.dropDuplicates(keys)  # last-writer within a batch is
        # arbitrary; dedup first so the upsert is well-defined
        target = target_path.rstrip("/")
        # PATH check, not a read probe: a transient read failure must not
        # route a later epoch onto the create branch, where the overwrite
        # would replace all previously merged data with one micro-batch
        # (same rationale as pipeline/table_format.ManagedTable.exists)
        if not os.path.exists(target):
            batch.write.mode("overwrite").parquet(target)
            return
        merged = merge_upsert(spark.read.parquet(target), batch, keys)
        # The merged snapshot must be durable BEFORE the source dir is
        # touched — cache()+count() is not (an evicted/lost partition would
        # recompute from the dir mid-overwrite). Two-rename swap, same as
        # ManagedTable.merge: rmtree-then-rename would leave NO target on a
        # crash between the steps, and the restart's create branch would
        # then wipe every prior epoch's data. The checkpoint + idempotent
        # merge carry the exactly-once guarantee.
        token = uuid.uuid4().hex[:12]
        tmp = f"{target}__epoch_tmp-{token}"
        old = f"{target}__old-{token}"
        merged.write.mode("overwrite").parquet(tmp)
        os.rename(target, old)
        os.rename(tmp, target)
        shutil.rmtree(old)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_versioned(
    stream: DataFrame,
    table,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Stream into a :class:`~lakehouse_architecture_spark.pipeline.
    table_format.VersionedTable`: one MERGE-committed snapshot version per
    micro-batch, so the streaming history is time-travelable and each
    batch's delta is recoverable via ``read_changes``.

    Exactly-once across restarts: every version is stamped with the epoch
    that produced it (``_epoch`` marker staged in the commit's tmp dir, so
    the atomic rename covers data + marker together); a replayed epoch —
    the checkpoint re-delivers the last unacknowledged batch after a crash
    — is detected and skipped instead of committing a duplicate version.
    """

    import hashlib

    # markers are scoped to the checkpoint: epoch ids restart at 0 under a
    # fresh checkpoint dir (or a second query), so a bare epoch_id would
    # collide with stale markers and silently DROP the new batches as
    # "replays" — the scope makes the dedup key valid per query lineage
    scope = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def _committed_epochs() -> set[str]:
        import os

        out = set()
        for v in table.versions():
            marker = os.path.join(table._vdir(v), "_epoch")
            try:
                with open(marker) as f:
                    out.add(f.read().strip())
            except OSError:
                continue
        return out

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        stamp = f"{scope}:{epoch_id}"
        if stamp in _committed_epochs():
            return  # crash-replay of an already-committed batch
        batch = batch.dropDuplicates(table.keys)
        table.merge(batch, epoch=stamp)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
