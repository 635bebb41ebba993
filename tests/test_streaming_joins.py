"""Streaming joins: stream-static enrichment and watermarked stream-stream."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_stream_static_enrichment(spark, tmp_path):
    """The bread-and-butter streaming pattern: enrich an event stream with a
    broadcastable static dimension (no state, no watermark needed)."""
    src = str(tmp_path / "ssj")
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, t0, 10, 1.0), (2, t0, 20, 2.0), (3, t0, 30, 3.0)], SCHEMA
    ).write.parquet(src)
    dim = spark.createDataFrame(
        [(10, "gold"), (20, "silver")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ssjck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["event_id"], r["tier"]) for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    assert got == {(1, "gold"), (2, "silver"), (3, None)}


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join: clicks joined to purchases of the same user
    within 1 hour — both sides watermarked so join state is bounded."""
    clicks_p = str(tmp_path / "clicks")
    buys_p = str(tmp_path / "buys")
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    spark.createDataFrame(
        [(1, t0, 1, 0.0), (2, t0 + dt.timedelta(hours=3), 2, 0.0)], SCHEMA
    ).write.parquet(clicks_p)
    spark.createDataFrame(
        [(100, t0 + dt.timedelta(minutes=30), 1, 9.0),   # within 1h of click 1
         (200, t0 + dt.timedelta(hours=6), 2, 8.0)],     # too late for click 2
        SCHEMA,
    ).write.parquet(buys_p)

    clicks = (
        spark.readStream.schema(SCHEMA).parquet(clicks_p)
        .withWatermark("ts", "2 hours")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts"))
    )
    buys = (
        spark.readStream.schema(SCHEMA).parquet(buys_p)
        .withWatermark("ts", "2 hours")
        .select(F.col("event_id").alias("buy_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("bts"))
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("bts") >= F.col("cts"))
        & (F.col("bts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj2_out")
        .option("checkpointLocation", str(tmp_path / "ssj2ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["buy_id"])
        for r in spark.sql("SELECT * FROM ssj2_out").collect()
    }
    assert got == {(1, 100)}  # the in-window pair only
