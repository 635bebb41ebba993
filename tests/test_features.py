"""Semantic tests for operators/features.py."""

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.features import (
    feature_hashing,
    loo_target_encode,
    mutual_information,
)


def test_feature_hashing_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "alpha beta beta"), (3, "")],
        "doc_id long, text string",
    )
    out = feature_hashing(df, "doc_id", "text", n_features=16)
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], set()).add((r["bucket"], r["weight"]))
    # identical text -> identical feature set; empty text -> no rows
    assert by_id[1] == by_id[2]
    assert 3 not in by_id
    assert all(0 <= b < 16 for b, _ in by_id[1])
    # 3 tokens, 2 distinct -> abs weights total 3 unless a +/- collision
    assert sum(abs(w) for _, w in by_id[1]) <= 3


def test_loo_target_encode_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 10.0)],
        "id long, k string, y double",
    )
    out = {r["id"]: r["loo_encoding"] for r in loo_target_encode(df, "k", "y").collect()}
    # leave-one-out within 'a': each row sees only its peer
    assert out[1] == 3.0 and out[2] == 1.0
    # singleton 'b' falls back to the global mean (1+3+10)/3
    assert abs(out[3] - round(14.0 / 3, 6)) < 1e-9


def test_loo_target_encode_prior_smoothing(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0)], "id long, k string, y double"
    )
    out = {
        r["id"]: r["loo_encoding"]
        for r in loo_target_encode(df, "k", "y", prior_weight=1.0).collect()
    }
    # (sum - own + w*gmean) / (n - 1 + w): gmean=2 -> (3 + 2)/2 and (1 + 2)/2
    assert out[1] == 2.5 and out[2] == 1.5


def test_mutual_information_extremes(spark):
    # independent: y constant -> MI 0
    indep = spark.createDataFrame(
        [("a", 1), ("b", 1), ("a", 1), ("b", 1)], "x string, y int"
    )
    assert mutual_information(indep, "x", "y").collect()[0]["mi_bits"] == 0.0
    # deterministic mapping, uniform marginals -> MI = log2(4) = 2 bits
    dep = spark.createDataFrame(
        [(str(i), i) for i in range(4) for _ in range(3)], "x string, y int"
    )
    row = mutual_information(dep, "x", "y").collect()[0]
    assert row["mi_bits"] == 2.0
    assert row["n_x"] == 4 and row["n_y"] == 4 and row["n"] == 12


def test_mutual_information_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), (None, 3), ("c", None)], "x string, y int"
    )
    assert mutual_information(df, "x", "y").collect()[0]["n"] == 2
