"""Custom Python DataSource: registration, parallelism, determinism, and
end-to-end flow into the silver cleaning pipeline."""

from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.cleaning import normalize_price_expr, parse_area_expr
from lakehouse_architecture_spark.sources.synthetic import register


def test_synthetic_source_reads_and_is_deterministic(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_listings")
        .option("rows", "40")
        .option("partitions", "3")
        .load()
    )
    assert df.count() == 40
    assert df.rdd.getNumPartitions() == 3

    # identical rows regardless of partitioning (pure function of index)
    other = (
        spark.read.format("synthetic_listings")
        .option("rows", "40")
        .option("partitions", "8")
        .load()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, other.collect()))


def test_synthetic_source_feeds_cleaning(spark):
    register(spark)
    df = spark.read.format("synthetic_listings").option("rows", "60").load()
    cleaned = df.select(
        "list_id",
        normalize_price_expr(F.col("price")).alias("price_bn"),
        parse_area_expr(F.col("area")).alias("area_m2"),
    )
    rows = cleaned.collect()
    # every generated price style (tỷ / triệu / raw) must normalize
    assert all(r["price_bn"] is not None and r["price_bn"] > 0 for r in rows)
    assert all(20 <= r["area_m2"] <= 170 for r in rows)


def test_synthetic_source_streams_in_batches(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("synthetic_listings")
        .option("rowsPerBatch", "25")
        .option("maxRows", "60")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM synth_stream").collect()
    # finite stream: exactly maxRows rows, identical to the batch reader's
    assert len(got) == 60
    batch = spark.read.format("synthetic_listings").option("rows", "60").load()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch.collect()))
