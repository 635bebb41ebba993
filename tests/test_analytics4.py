"""Hand-checkable cases for the round-4 operator math (the registry
oracle verifies the fixture path; these pin the semantics on tiny
inputs)."""

from pyspark.sql import functions as F


def test_interval_overlap_join_inclusive_and_exactly_once(spark):
    from lakehouse_architecture_spark.operators.relational import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0.0, 100.0), (2, 50.0, 55.0), (3, 200.0, 210.0)],
        "lid int, ls double, le double",
    )
    right = spark.createDataFrame(
        [(10, 100.0, 150.0), (11, 40.0, 52.0), (12, 300.0, 310.0)],
        "rid int, rs double, re double",
    )
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=10.0
    )
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    # (1,10): boundary touch le==rs is INCLUSIVE; (1,11) spans many shared
    # buckets but must appear exactly once; (2,11) overlaps [50,52]
    assert got == [(1, 10), (1, 11), (2, 11)]


def test_chi2_independence_extremes(spark):
    from lakehouse_architecture_spark.operators.features import chi2_independence

    # perfectly independent 2x2 with equal counts -> chi2 = 0
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(10)]
    ind = spark.createDataFrame(rows, "x string, y string")
    r = chi2_independence(ind, "x", "y").collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 1 and r["n"] == 40

    # perfect dependence (bijection) -> chi2 = n
    dep = spark.createDataFrame(
        [("a", "c")] * 10 + [("b", "d")] * 10, "x string, y string"
    )
    r2 = chi2_independence(dep, "x", "y").collect()[0]
    assert abs(r2["chi2"] - 20.0) < 1e-9


def test_standard_scale_hand_case_and_degenerate(spark):
    from lakehouse_architecture_spark.operators.features import standard_scale

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("z", 7.0), ("z", 7.0)],
        "k string, v double",
    )
    out = {
        (r["k"], r["v"]): r["z"]
        for r in standard_scale(df, "v", ["k"]).collect()
    }
    # mean 2, sample std 1 -> z = v - 2
    assert out[("g", 1.0)] == -1.0 and out[("g", 3.0)] == 1.0
    # zero-variance group -> NULL z, never a division blow-up
    assert out[("z", 7.0)] is None


def test_cooccurrence_cosine_hand_case(spark):
    from lakehouse_architecture_spark.operators.analytics import (
        cooccurrence_cosine,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (1, "a")],
        "u int, item string",
    )
    r = cooccurrence_cosine(df, "u", "item").collect()
    assert len(r) == 1
    row = r[0]
    # |a|=3, |b|=2, both=2 -> 2/sqrt(6)
    assert row["item_a"] == "a" and row["item_b"] == "b"
    assert row["n_both"] == 2
    assert abs(row["cosine"] - round(2 / (6 ** 0.5), 6)) < 1e-9


def test_rake_scores_hand_case(spark):
    from lakehouse_architecture_spark.operators.text import rake_keyword_scores

    df = spark.createDataFrame(
        [("the fast key of fast sort",)], "text string"
    )
    # phrases: "fast key", "fast sort"
    # deg(fast)=2+2=4 freq=2 -> 2.0 ; deg(key)=2 freq=1 -> 2.0 ; sort same
    got = {r["word"]: (r["freq"], r["degree"], r["rake_score"])
           for r in rake_keyword_scores(df, "text").collect()}
    assert got == {
        "fast": (2, 4, 2.0),
        "key": (1, 2, 2.0),
        "sort": (1, 2, 2.0),
    }


def test_two_phase_rank_empty_group_is_global(spark):
    """part_cols=[] gives an exact GLOBAL row_number with no global sort
    (the q_global_rank formulation)."""
    from pyspark.sql import Window

    from lakehouse_architecture_spark.operators.skew import two_phase_rank

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(300)], "id long, v double"
    )
    fast = two_phase_rank(df, [], "v", ["id"], bucket_width=7.0)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    slow = df.withColumn("i", F.row_number().over(w))
    assert {(r["id"], r["i"]) for r in fast.collect()} == {
        (r["id"], r["i"]) for r in slow.collect()
    }
