"""foreachBatch upsert sink + format-agnostic ManagedTable MERGE."""

import datetime as dt

from pyspark.sql import types as T

from lakehouse_architecture_spark.pipeline.table_format import (
    ManagedTable,
    resolve_format,
)
from lakehouse_architecture_spark.streaming.sinks import foreach_batch_upsert

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_resolve_format_falls_back():
    # delta jars are not in this environment -> parquet fallback
    assert resolve_format("auto") == "parquet"
    assert resolve_format("parquet") == "parquet"


def test_managed_table_merge(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    tbl = ManagedTable(spark, str(tmp_path / "tbl"), keys=["id"])
    tbl.merge(spark.createDataFrame([(1, t0, "a"), (2, t0, "b")], SCHEMA))
    tbl.merge(spark.createDataFrame([(2, t0, "B"), (3, t0, "c")], SCHEMA))
    got = {(r["id"], r["v"]) for r in tbl.read().collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_foreach_batch_upsert_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = foreach_batch_upsert(stream, target, keys=["id"], checkpoint_dir=ckpt)
        q.awaitTermination(120)

    spark.createDataFrame([(1, t0, "a"), (2, t0, "b")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert {(r["id"], r["v"]) for r in spark.read.parquet(target).collect()} == {
        (1, "a"),
        (2, "b"),
    }

    # second file updates id=2 and adds id=3; restart applies it once
    spark.createDataFrame([(2, t0, "B"), (3, t0, "c")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    got = {(r["id"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}

    # replay with no new data: checkpoint prevents reprocessing, state stable
    run()
    got2 = {(r["id"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert got2 == got
