"""Hand-checkable cases for the analytics3 query logic (the registry
oracle verifies the fixture path; these pin the math on tiny inputs by
reusing the same builders through a temp-view swap)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.aggregates import dsum


def _gini(spark, values):
    df = spark.createDataFrame(
        [(1, float(v), i) for i, v in enumerate(values)], "g int, x double, id int"
    )
    w = Window.partitionBy("g").orderBy(F.col("x").asc(), F.col("id").asc())
    ranked = df.withColumn("i", F.row_number().over(w))
    row = (
        ranked.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("x", "s"),
            F.sum((F.col("i") * F.col("x")).cast("decimal(38,6)"))
            .cast("double")
            .alias("t"),
        )
        .select(
            (
                (F.lit(2.0) * F.col("t")) / (F.col("n") * F.col("s"))
                - ((F.col("n") + 1).cast("double") / F.col("n"))
            ).alias("gini")
        )
        .collect()[0]
    )
    return row["gini"]


def test_gini_extremes(spark):
    # perfect equality -> 0
    assert abs(_gini(spark, [5, 5, 5, 5])) < 1e-12
    # total concentration in 1 of n -> (n-1)/n
    assert abs(_gini(spark, [0, 0, 0, 12]) - 0.75) < 1e-12


def test_cusum_detects_level_shift(spark):
    # series: 10 days at 0, then 10 days at 10 -> |CUSUM| peaks at the shift
    rows = [(d, 0.0 if d < 10 else 10.0) for d in range(20)]
    daily = spark.createDataFrame(rows, "day int, x double")
    mean = daily.agg((dsum("x") / F.count(F.lit(1))).alias("md"))
    wc = Window.orderBy("day")
    cusum = (
        daily.crossJoin(F.broadcast(mean))
        .withColumn(
            "cusum",
            F.sum((F.col("x") - F.col("md")).cast("decimal(38,6)"))
            .over(wc)
            .cast("double"),
        )
        .orderBy(F.abs("cusum").desc(), F.col("day").asc())
        .first()
    )
    assert cusum["day"] == 9  # last pre-shift day carries the extreme
    assert abs(abs(cusum["cusum"]) - 50.0) < 1e-9  # 10 days * |0 - 5|


def test_benford_natural_vs_uniform_shape(spark):
    from lakehouse_architecture_spark.queries.registry import ALL_QUERIES

    rows = ALL_QUERIES["q_benford"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    # shares sum to ~1 and expected follows Benford exactly
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    import math

    for r in rows:
        assert r["expected"] == round(math.log10(1 + 1 / r["digit"]), 6)


def test_cohort_ltv_monotone_within_cohort(spark):
    from lakehouse_architecture_spark.queries.registry import ALL_QUERIES

    rows = ALL_QUERIES["q_cohort_ltv"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_m"], []).append((r["age"], r["ltv"]))
    for curve in by_cohort.values():
        curve.sort()
        ltvs = [v for _, v in curve]
        # cumulative revenue per customer never decreases with age
        assert all(b >= a for a, b in zip(ltvs, ltvs[1:]))


def test_two_phase_rank_matches_single_window(spark):
    """two_phase_rank must be bit-identical to the plain per-group window
    row_number — including ties (equal values share a bucket, so the
    tiebreak never crosses a bucket boundary)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.skew import two_phase_rank

    rows = [
        (g, float(v), i)
        for i, (g, v) in enumerate(
            [("a", (7 * k * k + 3 * k) % 97) for k in range(200)]
            + [("b", (5 * k + 11) % 23) for k in range(150)]
            + [("a", 50)] * 5  # ties at a bucket boundary candidate
        )
    ]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    fast = two_phase_rank(df, ["g"], "v", ["id"], bucket_width=10.0)
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    slow = df.withColumn("i", F.row_number().over(w))
    got = {(r["g"], r["id"]): r["i"] for r in fast.collect()}
    want = {(r["g"], r["id"]): r["i"] for r in slow.collect()}
    assert got == want


def test_gini_plan_has_no_group_only_sort(spark):
    """The 100 TB guard: q_gini's physical plan must not contain a sort
    whose window/sort key set is ONLY the 25-value nation key — every sort
    must include the bucket column (parallelism = nation x bucket)."""
    import re

    from lakehouse_architecture_spark.queries.registry import ALL_QUERIES

    df = ALL_QUERIES["q_gini"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the row-level rank window must co-partition by the bucket
    specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no row_number window found in q_gini plan"
    for spec in specs:
        assert "__bkt" in spec, f"row-level rank partitioned by nation alone: {spec}"
    # the full-data sort (the one ordering o_totalprice) must also key on
    # the bucket; nation-only sorts may exist only on aggregated subtrees
    for m in re.finditer(r"Sort \[([^\]]*)\], false", plan):
        keys = m.group(1)
        if "o_totalprice" in keys and "nation" in keys:
            assert "__bkt" in keys, f"full-orders sort without bucket key: {keys}"


def test_aes_weighted_sample_properties(spark):
    """A-ES weighted sampling: deterministic under repartitioning, sample
    size exactly k, non-positive weights excluded, and heavy items
    overrepresented vs uniform (statistical direction check on a fixed
    population, no RNG)."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.curation import (
        weighted_sample_topk,
    )

    rows = [(i, 100.0 if i % 10 == 0 else 1.0) for i in range(1, 1001)]
    rows += [(2000, -5.0), (2001, 0.0)]  # must be excluded
    df = spark.createDataFrame(rows, "id long, w double")
    s1 = weighted_sample_topk(df, "id", "w", k=100)
    got = {r["id"] for r in s1.collect()}
    assert len(got) == 100
    assert not ({2000, 2001} & got)
    # determinism under a different physical layout
    s2 = weighted_sample_topk(df.repartition(13), "id", "w", k=100)
    assert {r["id"] for r in s2.collect()} == got
    # 10% of ids carry 100x weight -> should dominate the sample well above
    # their population share
    heavy = sum(1 for i in got if i % 10 == 0 and i <= 1000)
    assert heavy > 50
