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


# --- exact_quantiles: parity with Spark's percentile aggregate -------------
def _pct(df, group_cols, value_col, qs):
    """Reference answer via Spark's own percentile aggregate."""
    aggs = [
        F.expr(f"percentile({value_col}, {p!r})").alias(k) for k, p in qs.items()
    ]
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_exact_quantiles_matches_percentile_grouped(spark):
    from lakehouse_architecture_spark.operators.skew import exact_quantiles

    import random

    rnd = random.Random(42)
    data = [
        (f"g{i % 5}", rnd.uniform(-1000.0, 1000.0)) for i in range(1500)
    ]
    df = spark.createDataFrame(data, "g string, v double")
    qs = {"p0": 0.0, "p25": 0.25, "med": 0.5, "p90": 0.9, "p100": 1.0}
    got = exact_quantiles(df, ["g"], "v", qs, bucket_width=37.0)
    want = _pct(df, ["g"], "v", qs)
    cols = ["g", *qs]
    assert _rows(got, cols) == _rows(want, cols)  # bit-exact, incl. q=0/1


def test_exact_quantiles_matches_percentile_global(spark):
    from lakehouse_architecture_spark.operators.skew import exact_quantiles

    import random

    rnd = random.Random(7)
    df = spark.createDataFrame(
        [(rnd.gauss(0.0, 50.0),) for _ in range(800)], "v double"
    )
    qs = {"q1": 0.25, "q3": 0.75}
    got = exact_quantiles(df, [], "v", qs, bucket_width=5.0)
    want = _pct(df, [], "v", qs)
    assert _rows(got, list(qs)) == _rows(want, list(qs))


def test_exact_quantiles_null_values_and_null_group_keys(spark):
    from lakehouse_architecture_spark.operators.skew import exact_quantiles

    # NULL values ignored (percentile semantics); NULL group key is a group
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), (None, 5.0), (None, 7.0)],
        "g string, v double",
    )
    qs = {"med": 0.5}
    got = {r["g"]: r["med"] for r in exact_quantiles(df, ["g"], "v", qs, 1.0).collect()}
    assert got == {"a": 2.0, None: 6.0}
    # a group whose values are ALL null: aggregate emits NULL, we emit no
    # row — the documented difference (callers joining back see no match)
    df2 = spark.createDataFrame([("z", None)], "g string, v double")
    assert exact_quantiles(df2, ["g"], "v", qs, 1.0).count() == 0


def test_exact_quantiles_single_value_groups_and_negatives(spark):
    from lakehouse_architecture_spark.operators.skew import exact_quantiles

    df = spark.createDataFrame(
        [("a", -42.5), ("b", -1.0), ("b", -2.0), ("b", -3.0)], "g string, v double"
    )
    qs = {"p10": 0.1, "med": 0.5, "p90": 0.9}
    got = exact_quantiles(df, ["g"], "v", qs, bucket_width=0.7)
    want = _pct(df, ["g"], "v", qs)
    cols = ["g", *qs]
    assert _rows(got, cols) == _rows(want, cols)


def test_exact_quantiles_validates_inputs(spark):
    import pytest

    from lakehouse_architecture_spark.operators.skew import exact_quantiles

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="at least one"):
        exact_quantiles(df, ["g"], "v", {}, 1.0)
    with pytest.raises(ValueError, match="outside"):
        exact_quantiles(df, ["g"], "v", {"bad": 1.5}, 1.0)
    with pytest.raises(ValueError, match="positive"):
        exact_quantiles(df, ["g"], "v", {"med": 0.5}, 0.0)


def test_two_phase_rank_excludes_nan_values(spark):
    """ADVICE r14 (round 15): a NaN in value_col made max(v) = NaN, hence
    NaN bucket width and NULL buckets for EVERY row — corrupting ranks.
    NaN rows are now dropped like NULLs; finite rows rank identically."""
    from pyspark.sql import Row

    from lakehouse_architecture_spark.operators.skew import two_phase_rank

    rows = [Row(g="x", v=float(i), k=i) for i in range(20)]
    bad = rows + [Row(g="x", v=float("nan"), k=99), Row(g="x", v=None, k=98)]
    got = two_phase_rank(
        spark.createDataFrame(bad), ["g"], "v", ["k"], bucket_width=None
    ).collect()
    assert len(got) == 20  # NaN and NULL rows dropped, finite rows kept
    assert {(r.k, r.i) for r in got} == {(i, i + 1) for i in range(20)}
