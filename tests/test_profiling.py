"""Semantic tests for operators/profiling.py (the oracle harness covers the
registry wiring; these pin the math on hand-checkable inputs)."""

import math

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.profiling import (
    key_skew_profile,
    ks_drift,
    pmi_collocations,
    sample_k_per_group,
    source_overlap,
    vocab_coverage,
)
from lakehouse_architecture_spark.plans.inspect import formatted_plan


def test_pmi_ranks_exclusive_pair_first(spark):
    # "aa bb" always co-occur; "cc" pairs with everything -> low PMI
    docs = spark.createDataFrame(
        [("aa bb",)] * 4 + [("cc aa", ), ("cc bb",), ("cc cc",)],
        "text string",
    )
    out = pmi_collocations(docs, "text", min_count=2, k=5).collect()
    assert out[0]["w1"] == "aa" and out[0]["w2"] == "bb"
    # hand-check: c_xy=4, n_bi=7, c_aa=5, c_bb=5, n_uni=14
    expect = math.log2((4 / 7) / ((5 / 14) * (5 / 14)))
    assert abs(out[0]["pmi"] - round(expect, 6)) < 1e-9


def test_source_overlap_identical_groups(spark):
    text = "one two three four five six seven"
    docs = spark.createDataFrame(
        [("a", text), ("b", text), ("b", "totally different words here now ok yes")],
        "source string, text string",
    )
    row = source_overlap(docs, "source", "text", n=5).collect()[0]
    # every shingle of a appears in b: containment 1, jaccard = na/nb
    assert row["containment"] == 1.0
    assert row["jaccard"] == round(row["na"] / row["nb"], 6)


def test_ks_drift_zero_for_identical_and_positive_for_shifted(spark):
    rows = [("same", float(i % 10)) for i in range(100)]
    rows += [("same2", float(i % 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["event_type"]: r["ks_stat"] for r in ks_drift(df).collect()}
    assert out["same"] == 0.0 and out["same2"] == 0.0

    rows2 = [("lo", float(i % 10)) for i in range(100)]
    rows2 += [("hi", float(i % 10) + 50.0) for i in range(100)]
    out2 = {r["event_type"]: r["ks_stat"] for r in ks_drift(
        spark.createDataFrame(rows2, "event_type string, value double")
    ).collect()}
    # disjoint supports: each group is maximally far from the pooled CDF
    assert out2["lo"] == 0.5 and out2["hi"] == 0.5


def test_sample_k_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(g, i) for g in ("x", "y") for i in range(40)],
        "source string, doc_id long",
    )
    a = sample_k_per_group(df, "source", "doc_id", k=3).collect()
    b = sample_k_per_group(df, "source", "doc_id", k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per.setdefault(r["source"], set()).add(r["doc_id"])
    assert all(len(v) == 3 for v in per.values())


def test_vocab_coverage_exact_small_case(spark):
    # counts: a=6, b=3, c=1  (N=10, V=3)
    df = spark.createDataFrame([("a a a a a a b b b c",)], "text string")
    out = {r["target"]: r["vocab_needed"] for r in vocab_coverage(
        df, "text", targets=(0.5, 0.6, 0.9, 1.0)
    ).collect()}
    # 50% of 10 = 5 tokens -> "a" alone (6) covers it
    assert out[0.5] == 1
    assert out[0.6] == 1
    # 90% -> 9 tokens: a(6)+b(3) = 9 -> 2 types
    assert out[0.9] == 2
    assert out[1.0] == 3


def test_key_skew_profile_values(spark):
    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1
    df = spark.createDataFrame(rows, "user_id long")
    out = key_skew_profile(df, "user_id", top=2).collect()
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["user_id"] == 1 and out[0]["cnt"] == 6
    assert out[0]["share"] == 0.6
    assert out[1]["cum_share"] == 0.9
    # max=6, mean=10/3 -> skew 1.8
    assert out[0]["skew_factor"] == 1.8


def test_profiling_plans_have_no_cartesian_product(spark):
    from lakehouse_architecture_spark.queries.registry import ALL_QUERIES

    for name in ("q_pmi_collocations", "q_source_overlap", "q_ks_drift",
                 "q_vocab_coverage", "q_key_skew"):
        plan = formatted_plan(ALL_QUERIES[name].build(spark, "/root/testdata/sf0.001"))
        # scalar broadcasts plan as 1-row BroadcastNestedLoopJoin (intended);
        # a true CartesianProduct would mean a lost equi-join condition
        assert "CartesianProduct" not in plan, name


def test_group_sample_window_partitions_by_group(spark):
    from lakehouse_architecture_spark.queries.registry import ALL_QUERIES

    plan = formatted_plan(
        ALL_QUERIES["q_group_sample"].build(spark, "/root/testdata/sf0.001")
    )
    assert "Window" in plan and "CartesianProduct" not in plan
