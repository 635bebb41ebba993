"""Incremental near-dedup corpus ingest — the streaming form of the batch
curation pipeline (pipeline/corpus.py).

A pretraining corpus is not built in one shot; crawl batches arrive
continuously and each must be deduplicated against EVERYTHING ingested so
far without re-scanning the corpus. The standard design (used by every
large-scale dedup system) is a persistent *signature store*: per document,
``bands`` LSH band signatures (operators/dedup.band_signatures — a few
dozen bytes, no text). Per micro-batch:

1. batch docs -> band signatures (narrow + one signature shuffle)
2. drop docs sharing ANY (band, sig) bucket with the store — one semi-join
   against the store, which is orders of magnitude smaller than the corpus
   (bands rows per doc); the join key is the band signature, so it shuffles
   the BATCH, not the store or corpus
3. drop in-batch near-dups (same banding, self-join within the batch only)
4. append survivors to the corpus and their signatures to the store,
   each epoch into its own ``epoch=N`` subdirectory with overwrite — a
   replayed epoch rewrites the same directory, making the append
   idempotent and the pipeline exactly-once under the checkpoint

State never grows past O(docs x bands) signature rows and each batch's
cost is O(batch) — no re-scan, no unbounded driver state. At 100 TB the
store is a bucketed table on (band, sig) so step 2 is a co-located join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lakehouse_architecture_spark.operators.dedup import band_signatures


def _near_dedup_batch(
    batch: DataFrame,
    store: DataFrame | None,
    id_col: str,
    text_col: str,
    num_perm: int,
    bands: int,
) -> tuple[DataFrame, DataFrame]:
    """Returns (surviving docs, their band signatures)."""
    sigs = band_signatures(batch, id_col, text_col, num_perm, bands)
    if store is not None:
        dup_ids = (
            sigs.join(store.select("band", "sig"), ["band", "sig"], "left_semi")
            .select("id")
            .distinct()
        )
        batch = batch.join(
            dup_ids.withColumnRenamed("id", id_col), id_col, "left_anti"
        )
        sigs = sigs.join(dup_ids, "id", "left_anti")
    # in-batch near-dups: min id in each shared bucket wins (greedy — a
    # chain a~b~c keeps only the smallest, matching batch connected-
    # components canonicalization for the common 2-doc case)
    w = Window.partitionBy("band", "sig")
    losers = (
        sigs.withColumn("__min", F.min("id").over(w))
        .filter(F.col("id") != F.col("__min"))
        .select("id")
        .distinct()
    )
    batch = batch.join(losers.withColumnRenamed("id", id_col), id_col, "left_anti")
    sigs = sigs.join(losers, "id", "left_anti")
    return batch, sigs


def foreach_batch_neardedup_ingest(
    stream: DataFrame,
    corpus_path: str,
    sig_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 8,
) -> StreamingQuery:
    """Run the stream with each micro-batch near-dedup'd against the
    signature store, then appended epoch-atomically."""
    spark = stream.sparkSession

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        try:
            store = spark.read.parquet(sig_path)
        except Exception:  # first epoch: no store yet
            store = None
        kept, sigs = _near_dedup_batch(
            batch, store, id_col, text_col, num_perm, bands
        )
        # per-epoch overwrite = idempotent append under checkpoint replay
        kept.write.mode("overwrite").parquet(f"{corpus_path}/epoch={epoch_id}")
        sigs.write.mode("overwrite").parquet(f"{sig_path}/epoch={epoch_id}")

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _semantic_dedup_batch(
    batch: DataFrame,
    store: DataFrame | None,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos: float,
) -> DataFrame:
    """One micro-batch of incremental SemDeDup: returns the surviving
    (id, cell, vector) rows. The store holds the kept vectors of all prior
    epochs keyed by cell; a batch vector is dropped when it sits within
    ``min_cos`` of any stored vector in its cell, then in-batch near-dups
    collapse to the lowest id (operators/similarity.semdedup_prune with
    the SAME fixed codebook — centroids must be stable across epochs or
    cell membership shifts and history stops matching)."""
    from lakehouse_architecture_spark.operators.similarity import (
        centroid_assignment,
        cosine,
        semdedup_prune,
    )

    assign = centroid_assignment(batch, id_col, vec_col, centroids=centroids)
    rows = (
        batch.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(assign.select(F.col(id_col).alias("id"), "cell"), "id")
        .cache()
    )
    if store is not None:
        dup_ids = (
            rows.join(
                store.select("cell", F.col("v").alias("__sv")), "cell"
            )
            .filter(F.round(cosine(F.col("v"), F.col("__sv")), 6) >= F.lit(min_cos))
            .select("id")
            .distinct()
        )
        rows = rows.join(dup_ids, "id", "left_anti")
    survivors = rows.select(
        F.col("id").alias(id_col), F.col("v").alias(vec_col)
    )
    pruned = semdedup_prune(
        survivors, id_col, vec_col, centroids=centroids, min_cos=min_cos
    )
    keep = pruned.filter(~F.col("pruned")).select(
        F.col(id_col).alias("id"), "cell"
    )
    return rows.join(keep.select("id"), "id", "left_semi")


def foreach_batch_semantic_dedup_ingest(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.9,
) -> StreamingQuery:
    """Streaming SemDeDup: every micro-batch is semantically deduplicated
    against the kept-vector store, then its survivors append to the store
    epoch-atomically (same exactly-once epoch-dir pattern as the text
    near-dedup ingest above).

    State trade vs the text path: the store must hold full VECTORS (cosine
    needs them), not few-byte signatures — at scale keep it bucketed by
    cell so the per-batch join is co-located, and grow the codebook with
    the corpus so cells stay small."""
    spark = stream.sparkSession

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        try:
            store = spark.read.parquet(store_path)
        except Exception:  # first epoch: no store yet
            store = None
        kept = _semantic_dedup_batch(
            batch, store, centroids, id_col, vec_col, min_cos
        )
        kept.write.mode("overwrite").parquet(f"{store_path}/epoch={epoch_id}")

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
