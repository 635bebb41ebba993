"""Salted join must match the plain join exactly while spreading hot keys."""

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.skew import key_histogram, salted_join


def test_salted_join_matches_plain(spark):
    # hot key: 80% of big-side rows share key 0 (power-law shape)
    big = spark.createDataFrame(
        [(i, 0 if i % 5 != 0 else i % 7) for i in range(1000)], "row_id int, k int"
    )
    small = spark.createDataFrame([(i, f"v{i}") for i in range(7)], "k int, label string")

    salted = salted_join(big, small, on="k", salt=8)
    plain = big.join(small, on="k")
    assert salted.count() == plain.count()
    a = {(r["row_id"], r["label"]) for r in salted.collect()}
    b = {(r["row_id"], r["label"]) for r in plain.collect()}
    assert a == b

    # left join keeps unmatched big rows
    small_partial = small.filter(F.col("k") <= 1)
    lsalted = salted_join(big, small_partial, on="k", salt=4, how="left")
    lplain = big.join(small_partial, on="k", how="left")
    assert lsalted.count() == lplain.count()


def test_key_histogram(spark):
    df = spark.createDataFrame([(0,)] * 80 + [(1,)] * 20, "k int")
    hist = {r["k"]: (r["n"], r["share"]) for r in key_histogram(df, "k").collect()}
    assert hist[0] == (80, 0.8) and hist[1] == (20, 0.2)


def test_salted_join_tolerates_map_columns_and_rejects_bad_how(spark):
    import pytest

    from pyspark.sql import functions as F

    big = spark.createDataFrame(
        [(1, {"a": "b"}), (1, {"c": "d"}), (2, {})], "k int, attrs map<string,string>"
    )
    small = spark.createDataFrame([(1, "x")], "k int, v string")
    # map columns must not feed F.hash (it rejects MapType)
    out = salted_join(big, small, on="k", salt=4).collect()
    assert sorted((r["k"], r["v"]) for r in out) == [(1, "x"), (1, "x")]
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, on="k", how="right")
