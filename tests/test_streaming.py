"""Structured Streaming replacements for the reference's batch bookkeeping
(SURVEY.md §2.9): checkpointed file source, exactly-once across restarts,
watermarked windows, streaming dedup."""

import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_architecture_spark.streaming.incremental import (
    incremental_file_source,
    run_available_now,
    sessionized_counts,
    streaming_dedup,
    windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_file_source_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    _write_batch(spark, src, [(1, t0, 1, "click", 1.0), (2, t0, 1, "view", 2.0)])

    stream = incremental_file_source(spark, src, SCHEMA)
    q = run_available_now(stream, ckpt, sink_path=out)
    q.awaitTermination(60)

    assert spark.read.parquet(out).count() == 2

    # second batch arrives; restart processes ONLY the new file
    _write_batch(spark, src, [(3, t0, 2, "click", 3.0)])
    q2 = run_available_now(incremental_file_source(spark, src, SCHEMA), ckpt, sink_path=out)
    q2.awaitTermination(60)

    df = spark.read.parquet(out)
    assert df.count() == 3  # no reprocessing of files 1-2 (the reference's
    # copy+delete protocol could double-process on crash; checkpoint cannot)
    assert {r["event_id"] for r in df.collect()} == {1, 2, 3}
    shutil.rmtree(src)


def test_streaming_windowed_counts(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "wsrc")
    ckpt = str(tmp_path / "wckpt")
    t0 = dt.datetime(2024, 1, 1, 10, 5)
    t1 = dt.datetime(2024, 1, 1, 10, 55)
    t2 = dt.datetime(2024, 1, 1, 11, 5)
    t3 = dt.datetime(2024, 1, 1, 12, 30)

    sink = str(tmp_path / "wsink")

    def run_once():
        stream = incremental_file_source(spark, src, SCHEMA)
        agg = windowed_counts(stream, window="1 hour", watermark="10 minutes")
        q = run_available_now(agg, ckpt, sink_path=sink)
        q.awaitTermination(60)
        try:
            return {
                (r["window_start"], r["n"], r["total_value"])
                for r in spark.read.parquet(sink).collect()
            }
        except Exception:  # no closed windows emitted yet -> empty sink
            return set()

    # batch 1: both 10:xx events — watermark (persisted in the checkpoint)
    # ends below 11:00, so append mode emits nothing yet
    _write_batch(spark, src, [(1, t0, 1, "click", 1.0), (2, t1, 1, "click", 2.0)])
    assert run_once() == set()

    # batch 2 (11:05) lifts the watermark only to 10:55 — still below the
    # 10:00 window's end (11:00), so nothing closes yet. Batch 3 (12:30)
    # lifts it to 12:20, closing both the 10:00 and 11:00 windows. The
    # watermark survives query restarts because it lives in the checkpoint.
    _write_batch(spark, src, [(3, t2, 1, "click", 4.0)])
    assert run_once() == set()
    _write_batch(spark, src, [(4, t3, 1, "click", 8.0)])
    assert run_once() == {
        ("2024-01-01 10:00:00", 2, 3.0),
        ("2024-01-01 11:00:00", 1, 4.0),
    }

    # batch mode over the same data emits all windows (watermark is a no-op)
    batch = spark.read.parquet(src)
    brows = {
        (r["window_start"], r["n"])
        for r in windowed_counts(batch, window="1 hour").collect()
    }
    assert brows == {
        ("2024-01-01 10:00:00", 2),
        ("2024-01-01 11:00:00", 1),
        ("2024-01-01 12:00:00", 1),
    }


def test_sliding_windows_batch_equals_streaming_shape(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "slsrc")
    t0 = dt.datetime(2024, 1, 1, 10, 20)
    _write_batch(spark, src, [(1, t0, 1, "click", 1.0)])

    # one event falls in exactly four 1h/15min sliding windows
    batch = spark.read.parquet(src)
    rows = sorted(
        r["window_start"] for r in windowed_counts(batch, window="1 hour", slide="15 minutes").collect()
    )
    assert rows == [
        "2024-01-01 09:30:00",
        "2024-01-01 09:45:00",
        "2024-01-01 10:00:00",
        "2024-01-01 10:15:00",
    ]

    # the same operator compiles and runs as a stream
    stream = incremental_file_source(spark, src, SCHEMA)
    agg = windowed_counts(stream, window="1 hour", slide="15 minutes")
    q = run_available_now(agg, str(tmp_path / "slckpt"), query_name="slout")
    q.awaitTermination(60)  # append mode: nothing emitted yet, but the
    # stateful plan executed and checkpointed without error
    assert spark.sql("SELECT count(*) AS n FROM slout").collect()[0]["n"] == 0


def test_streaming_dedup_seen_ids(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "dsrc")
    t0 = dt.datetime(2024, 1, 1, 9, 0)
    _write_batch(
        spark,
        src,
        [(1, t0, 1, "click", 1.0), (1, t0, 1, "click", 1.0), (2, t0, 2, "view", 2.0)],
    )
    stream = incremental_file_source(spark, src, SCHEMA)
    deduped = streaming_dedup(stream, ["event_id"], watermark="1 hour")
    q = run_available_now(deduped, str(tmp_path / "dckpt"), query_name="dout")
    q.awaitTermination(60)
    assert spark.sql("SELECT count(*) AS n FROM dout").collect()[0]["n"] == 2


def test_sessionized_counts_batch(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        (1, base, 1, "click", 1.0),
        (2, base + dt.timedelta(minutes=10), 1, "click", 1.0),  # same session
        (3, base + dt.timedelta(hours=3), 1, "click", 1.0),     # new session
        (4, base, 2, "view", 1.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sessionized_counts(df, gap="30 minutes")
    got = {(r["user_id"], r["session_start"], r["n_events"]) for r in out.collect()}
    assert got == {
        (1, "2024-01-01 09:00:00", 2),
        (1, "2024-01-01 12:00:00", 1),
        (2, "2024-01-01 09:00:00", 1),
    }


def test_neardedup_ingest_across_batches(spark, tmp_path):
    from lakehouse_architecture_spark.streaming.corpus_ingest import (
        foreach_batch_neardedup_ingest,
    )

    doc_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "docs_src")
    corpus = str(tmp_path / "corpus")
    sigs = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "ckpt")

    base = "the cat sat of the mat and it is a fine day today ok"
    near = "the cat sat of the mat and it is a fine day today no"

    def write_docs(rows):
        spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(doc_schema).parquet(src)
        q = foreach_batch_neardedup_ingest(stream, corpus, sigs, ckpt)
        q.awaitTermination(120)

    # epoch 1: doc 3 is an in-batch near-dup of doc 1 -> dropped
    write_docs([(1, base), (2, "completely different words entirely here"), (3, near)])
    run()
    kept1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept1 == {1, 2}

    # epoch 2: doc 4 near-dups doc 1 ACROSS batches (store hit), 5 is new
    write_docs([(4, near), (5, "novel content appears in this new document")])
    run()
    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 5}
    # the store holds signatures only for surviving docs
    assert {r["id"] for r in spark.read.parquet(sigs).select("id").distinct().collect()} == {1, 2, 5}


def test_streaming_url_dedup_on_canonical_key(spark, tmp_path):
    """Crawl-stream dedup keyed on the CANONICAL url: spelling variants of
    one page collapse to a single emitted row — the reference's seen-ID
    ledger (app/bronze.py) with canonicalization folded into the key,
    watermark-bounded state, restart-safe via the checkpoint."""
    import datetime as dt

    from pyspark.sql import types as T

    from lakehouse_architecture_spark.operators.web import canonicalize_url

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        ("https://example.com/a?b=2&a=1", t0),
        ("HTTPS://WWW.example.com/a/?a=1&b=2&utm_source=z", t0),  # same page
        ("https://example.com/other", t0),
    ]
    src = str(tmp_path / "usrc")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    keyed = stream.withColumn("canonical_url", canonicalize_url("url"))
    deduped = streaming_dedup(keyed, ["canonical_url"], watermark="1 hour")
    q = run_available_now(deduped, str(tmp_path / "uckpt"), query_name="uout")
    q.awaitTermination(60)
    got = {r.canonical_url for r in spark.sql("SELECT canonical_url FROM uout").collect()}
    assert got == {"https://example.com/a?a=1&b=2", "https://example.com/other"}


def test_semantic_dedup_ingest_across_batches(spark, tmp_path):
    """Streaming SemDeDup: near-dup vectors are dropped in-batch AND
    against the kept-vector store of earlier epochs; distinct vectors
    survive. Fixed 2-cell codebook on orthogonal axes."""
    from lakehouse_architecture_spark.streaming.corpus_ingest import (
        foreach_batch_semantic_dedup_ingest,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    src = str(tmp_path / "vec_src")
    store = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])], ["cent_id", "cvec"]
    )

    def write_vecs(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = foreach_batch_semantic_dedup_ingest(
            stream, store, ckpt, cents, min_cos=0.95
        )
        q.awaitTermination(120)

    # epoch 1: 11 near-dups 10 in-batch (same cell 0); 20 is cell 1
    write_vecs(
        [
            (10, [1.0, 0.05, 0.0]),
            (11, [1.0, 0.06, 0.0]),
            (20, [0.0, 0.05, 1.0]),
        ]
    )
    run()
    kept1 = {r["id"] for r in spark.read.parquet(store).collect()}
    assert kept1 == {10, 20}

    # epoch 2: 12 near-dups 10 ACROSS epochs (store hit); 30 is genuinely
    # new in cell 1 (orthogonal-ish to 20? no — opposite sign, cos < 0.95)
    write_vecs(
        [
            (12, [1.0, 0.04, 0.0]),
            (30, [0.35, 0.0, 0.9]),
        ]
    )
    run()
    kept = {r["id"] for r in spark.read.parquet(store).collect()}
    assert kept == {10, 20, 30}


def test_store_before_filters_current_epoch(spark, tmp_path):
    from lakehouse_architecture_spark.streaming.corpus_ingest import _store_before

    path = str(tmp_path / "store")
    spark.createDataFrame([(1, "x")], ["id", "v"]).write.parquet(f"{path}/epoch=0")
    spark.createDataFrame([(2, "y")], ["id", "v"]).write.parquet(f"{path}/epoch=1")
    # replaying epoch 1 must see ONLY epoch 0 (not its own partial write)
    assert {r["id"] for r in _store_before(spark, path, 1).collect()} == {1}
    # the next fresh epoch sees the full store
    assert {r["id"] for r in _store_before(spark, path, 2).collect()} == {1, 2}
    assert _store_before(spark, str(tmp_path / "missing"), 0) is None


def test_neardedup_ingest_replay_does_not_lose_data(spark, tmp_path):
    """Crash between the epoch write and the checkpoint commit leaves the
    epoch's store partition on disk; the replayed epoch must not dedup the
    batch against its OWN partial write (which would drop every doc and
    overwrite the epoch dir empty — permanent loss)."""
    from lakehouse_architecture_spark.operators.dedup import band_signatures
    from lakehouse_architecture_spark.streaming.corpus_ingest import (
        foreach_batch_neardedup_ingest,
    )

    doc_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    sigs = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(doc_schema).parquet(src)
        q = foreach_batch_neardedup_ingest(stream, corpus, sigs, ckpt)
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog today fine")],
        doc_schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == {1}

    # simulate epoch 1 crashing AFTER its store write but BEFORE the
    # checkpoint commit: its signatures are already under sigs/epoch=1
    # when the batch is (re)processed as epoch 1
    doc2 = spark.createDataFrame(
        [(2, "entirely different words appear within this new document now")],
        doc_schema,
    )
    band_signatures(doc2, "doc_id", "text", 16, 8).write.mode(
        "overwrite"
    ).parquet(f"{sigs}/epoch=1")
    doc2.coalesce(1).write.mode("append").parquet(src)
    run()
    # without the epoch<current store filter, doc 2 matches its own
    # epoch-1 signatures and is silently dropped
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == {1, 2}
    assert spark.read.parquet(sigs).select("id").distinct().count() == 2


def test_semantic_ingest_replay_does_not_lose_data(spark, tmp_path):
    """Semantic twin of the near-dedup replay test: a crashed epoch's
    kept-vector partition must not dedup the replayed batch against
    itself."""
    from lakehouse_architecture_spark.streaming.corpus_ingest import (
        foreach_batch_semantic_dedup_ingest,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    src = str(tmp_path / "src")
    store = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["cent_id", "cvec"]
    )

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = foreach_batch_semantic_dedup_ingest(stream, store, ckpt, cents)
        q.awaitTermination(120)

    spark.createDataFrame([(10, [1.0, 0.05])], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert {r["id"] for r in spark.read.parquet(store).collect()} == {10}

    # crashed epoch 1: its own kept rows already sit under epoch=1
    spark.createDataFrame(
        [(20, 0, [0.0, 1.0])], "id long, cell int, v array<double>"
    ).write.mode("overwrite").parquet(f"{store}/epoch=1")
    spark.createDataFrame([(20, [0.0, 1.0])], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert {r["id"] for r in spark.read.parquet(store).collect()} == {10, 20}


def test_store_before_rejects_stale_store(spark, tmp_path):
    """A fresh checkpoint pointed at an existing multi-epoch store must
    fail loudly — the epoch filter would otherwise silently disable all
    cross-epoch dedup and the overwrites would clobber old partitions."""
    import pytest

    from lakehouse_architecture_spark.streaming.corpus_ingest import _store_before

    path = str(tmp_path / "store")
    spark.createDataFrame([(1, "x")], ["id", "v"]).write.parquet(f"{path}/epoch=0")
    spark.createDataFrame([(2, "y")], ["id", "v"]).write.parquet(f"{path}/epoch=5")
    with pytest.raises(ValueError, match="does not match this store"):
        _store_before(spark, path, 0)
    # the same store is fine when the checkpoint is actually at epoch 6
    assert _store_before(spark, path, 6).count() == 2
