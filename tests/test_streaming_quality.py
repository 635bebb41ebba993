"""Streaming DQ: per-batch expectation audits and drift monitoring."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from lakehouse_architecture_spark.pipeline.expectations import expect
from lakehouse_architecture_spark.streaming.quality import (
    foreach_batch_dq_ingest,
    foreach_batch_drift_monitor,
    reference_histogram,
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _write(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(src)


def test_dq_ingest_splits_and_audits_per_epoch(spark, tmp_path):
    src = str(tmp_path / "src")
    clean = str(tmp_path / "clean")
    quar = str(tmp_path / "quar")
    metrics = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")
    suite = [expect("amount_nonneg", "amount >= 0", "drop")]

    def run():
        stream = spark.readStream.schema(_SCHEMA).parquet(src)
        q = foreach_batch_dq_ingest(stream, clean, quar, metrics, suite, ckpt)
        q.awaitTermination(120)

    _write(spark, src, [(1, 5.0), (2, -1.0), (3, 2.0)])
    run()
    assert {r["id"] for r in spark.read.parquet(clean).collect()} == {1, 3}
    bad = spark.read.parquet(quar).collect()
    assert [(r["id"], r["_violations"]) for r in bad] == [(2, "amount_nonneg")]

    _write(spark, src, [(4, -7.0), (5, 1.0)])
    run()
    assert {r["id"] for r in spark.read.parquet(clean).collect()} == {1, 3, 5}
    assert {r["id"] for r in spark.read.parquet(quar).collect()} == {2, 4}
    m = spark.read.parquet(metrics).orderBy("epoch").collect()
    assert [(r["epoch"], r["n_rows"], r["n_violations"]) for r in m] == [
        (0, 3, 1),
        (1, 2, 1),
    ]


def test_dq_ingest_rerun_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    clean = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")
    suite = [expect("amount_nonneg", "amount >= 0", "drop")]

    def run():
        stream = spark.readStream.schema(_SCHEMA).parquet(src)
        q = foreach_batch_dq_ingest(
            stream, clean, str(tmp_path / "q"), str(tmp_path / "m"), suite, ckpt
        )
        q.awaitTermination(120)

    _write(spark, src, [(1, 5.0)])
    run()
    run()  # no new files: no new epoch, no duplicated rows
    assert [r["id"] for r in spark.read.parquet(clean).collect()] == [1]


def test_drift_monitor_flags_shifted_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    metrics = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")

    ref = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], _SCHEMA
    )
    hist = reference_histogram(ref, "amount", nbins=50).cache()
    hist.count()

    def run():
        stream = spark.readStream.schema(_SCHEMA).parquet(src)
        q = foreach_batch_drift_monitor(stream, hist, "amount", metrics, ckpt, nbins=50)
        q.awaitTermination(120)

    # epoch 0: same distribution; epoch 1: shifted way outside the range
    _write(spark, src, [(i, float(i % 100)) for i in range(500)])
    run()
    _write(spark, src, [(i, 1000.0 + i) for i in range(500)])
    run()

    m = {r["epoch"]: r for r in spark.read.parquet(metrics).collect()}
    assert m[0]["ks_stat"] < 0.05
    # all shifted mass clamps into the top bin -> CDF gap ~ max ref cum below it
    assert m[1]["ks_stat"] > 0.9
    assert m[0]["n_values"] == 500 and m[1]["n_values"] == 500
