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


def test_interval_overlap_join_drops_degenerate_intervals(spark):
    """end < start is an EMPTY interval under inclusive ends: it must
    match nothing. Without the guard, F.sequence(floor(start/w),
    floor(end/w)) descends and replicates the row into wrong buckets
    (ADVICE r4)."""
    from lakehouse_architecture_spark.operators.relational import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 90.0, 10.0), (2, 20.0, 30.0)], "lid int, ls double, le double"
    )
    right = spark.createDataFrame(
        [(10, 0.0, 100.0), (11, 60.0, 50.0)], "rid int, rs double, re double"
    )
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=10.0
    )
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(2, 10)]


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


def test_two_phase_rank_keeps_null_group(spark):
    """Code-review r4: a NULL group key is a valid window partition —
    rows must rank, not vanish (null-safe offsets join)."""
    from pyspark.sql import Window

    from lakehouse_architecture_spark.operators.skew import two_phase_rank

    df = spark.createDataFrame(
        [(None, 3.0, 1), (None, 1.0, 2), ("a", 2.0, 3)],
        "g string, v double, id long",
    )
    fast = two_phase_rank(df, ["g"], "v", ["id"], bucket_width=1.0)
    got = {(r["g"], r["id"], r["i"]) for r in fast.collect()}
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    want = {
        (r["g"], r["id"], r["i"])
        for r in df.withColumn("i", F.row_number().over(w)).collect()
    }
    assert got == want and len(got) == 3


def test_standard_scale_keeps_null_group(spark):
    from lakehouse_architecture_spark.operators.features import standard_scale

    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("a", 5.0)], "k string, v double"
    )
    out = standard_scale(df, "v", ["k"]).collect()
    assert len(out) == 3  # NULL-key rows are scaled, not dropped
    nulls = {r["v"]: r["z"] for r in out if r["k"] is None}
    assert nulls[1.0] is not None and nulls[1.0] < 0 < nulls[3.0]


def test_materialized_broadcast_fold_null_group_key(spark, tmp_path):
    """Code-review r4: a NULL group key must fold into its single view row
    under the broadcast path — not go stale + duplicate."""
    from lakehouse_architecture_spark.pipeline.materialized import (
        MaterializedAggregate,
    )
    from lakehouse_architecture_spark.pipeline.table_format import VersionedTable

    src = VersionedTable(spark, str(tmp_path / "src"), keys=["id"])
    view = MaterializedAggregate(
        src, str(tmp_path / "view"), group_cols=["g"], sum_cols=["x"]
    )
    view.BIG_VIEW_BYTES = 0
    src.write(spark.createDataFrame(
        [(1, None, 10), (2, None, 5), (3, "b", 7)], "id long, g string, x long"
    ))
    view.refresh()
    src.merge(
        spark.createDataFrame([(2, None, 25)], "id long, g string, x long"),
        log_changes=True,
    )
    view.refresh()
    rows = {(r["g"], r["n"], r["sum_x"]) for r in view.read().collect()}
    assert rows == {(None, 2, 35), ("b", 1, 7)}


def test_catalog_pruned_read_keeps_partition_columns(spark, tmp_path):
    """Code-review r4: pruned reads of a hive-partitioned table must keep
    the partition column (basePath) and match the plain path's schema."""
    from lakehouse_architecture_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    spec = cat.define("pt", partition_by=("dt",), stats_cols=("x",))
    df = spark.range(200).select(
        F.col("id").alias("rid"),
        (F.col("id") % 4).cast("string").alias("dt"),
        (F.col("id") % 50).cast("double").alias("x"),
    )
    cat.write(df, "pt")
    got = cat.read("pt", where=("x", 10.0, 12.0))
    assert "dt" in got.columns
    assert set(got.columns) == set(cat.read("pt").columns)
    assert got.count() == df.filter("x between 10 and 12").count()


def test_hll_estimate_within_tolerance(spark):
    """The hand-rolled HLL estimate must land within the standard-error
    envelope (~1.04/sqrt(256) ~ 6.5%; allow 4 sigma) of the exact count."""
    from lakehouse_architecture_spark.queries.registry import ALL_QUERIES

    r = ALL_QUERIES["q_hll_custom"].build(
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert 0.74 <= r["ratio"] <= 1.26, r


def test_mode_deterministic_tiebreak(spark):
    """Equal-count modes must resolve to the SMALLEST value."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("g", 5.0), ("g", 5.0), ("g", 2.0), ("g", 2.0), ("g", 9.0)],
        "k string, v double",
    )
    counts = df.groupBy("k", "v").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("k").orderBy(F.col("cnt").desc(), F.col("v").asc())
    top = counts.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    assert top.collect()[0]["v"] == 2.0


def test_runs_test_hand_case(spark):
    """A strictly alternating series has the MAX possible runs; the query
    math (runs, expected) is pinned on a tiny alternating frame."""
    rows = [(d, float(10 if d % 2 == 0 else 1)) for d in range(8)]
    daily = spark.createDataFrame(rows, "day int, x double")
    from pyspark.sql import Window

    w = Window.orderBy("day")
    signed = (
        daily.withColumn("prev", F.lag("x", 1).over(w))
        .filter(F.col("prev").isNotNull() & (F.col("x") != F.col("prev")))
        .withColumn("up", (F.col("x") > F.col("prev")).cast("int"))
    )
    runs = signed.withColumn(
        "chg", (F.col("up") != F.lag("up", 1).over(w)).cast("int")
    ).agg((F.coalesce(F.sum("chg"), F.lit(0)) + 1).alias("n_runs")).collect()
    assert runs[0]["n_runs"] == 7  # 7 deltas, all alternating


def test_mode_builder_matches_independent_formulation(spark):
    """Guard the SHIPPED q_mode builder (not a local copy of its math):
    its answer must equal an independently-computed per-flag argmax with
    the same (count desc, value asc) tie rule."""
    from lakehouse_architecture_spark.queries.base import tables
    from lakehouse_architecture_spark.queries.registry import ALL_QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["l_returnflag"]: (r["mode_quantity"], r["mode_count"])
        for r in ALL_QUERIES["q_mode"].build(spark, sf).collect()
    }
    counts = (
        tables(spark, sf)["lineitem"]
        .groupBy("l_returnflag", "l_quantity")
        .count()
        .collect()
    )
    best: dict = {}
    for r in counts:
        k, v, c = r["l_returnflag"], r["l_quantity"], r["count"]
        cur = best.get(k)
        if cur is None or (c, -v) > (cur[1], -cur[0]):
            best[k] = (v, c)
    assert got == best


def test_runs_test_builder_invariants(spark):
    """Guard the SHIPPED q_runs_test builder: run count bounds and the
    Wald-Wolfowitz expectation identity hold on the fixture."""
    from lakehouse_architecture_spark.queries.registry import ALL_QUERIES

    r = ALL_QUERIES["q_runs_test"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    n = r["n_up"] + r["n_down"]
    assert 1 <= r["n_runs"] <= n
    want = round(1.0 + 2.0 * r["n_up"] * r["n_down"] / n, 4)
    assert abs(r["expected_runs"] - want) < 1e-9
    assert abs(r["runs_ratio"] - round(r["n_runs"] / want, 6)) < 1e-9
