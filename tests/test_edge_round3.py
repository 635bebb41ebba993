"""Edge-input behavior of the round-3 operators: degenerate corpora and
groups must yield empty/identity results, never errors."""

from lakehouse_architecture_spark.operators.features import loo_target_encode
from lakehouse_architecture_spark.operators.pq import pq_codebooks, pq_encode
from lakehouse_architecture_spark.operators.profiling import (
    key_skew_profile,
    ks_drift,
    pmi_collocations,
    source_overlap,
    vocab_coverage,
)


def test_pq_fewer_vectors_than_codebook(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [2.0] * 8)], "vec_id long, embedding array<float>"
    )
    cb = pq_codebooks(df, m=4, ksub=16, iters=0)
    # codebook truncates to the available vectors, codes stay dense 0..1
    assert cb.count() == 4 * 2
    codes = pq_encode(df, cb, m=4)
    assert {tuple(r["codes"]) for r in codes.collect()} <= {(0, 0, 0, 0), (1, 1, 1, 1)}


def test_pmi_empty_after_min_count(spark):
    df = spark.createDataFrame(
        [("unique words only here",), ("nothing repeats twice",)], "text string"
    )
    assert pmi_collocations(df, "text", min_count=5, k=10).count() == 0


def test_ks_drift_single_value_group(spark):
    df = spark.createDataFrame(
        [("only", 1.0)], "event_type string, value double"
    )
    out = ks_drift(df).collect()
    assert len(out) == 1 and out[0]["ks_stat"] == 0.0


def test_source_overlap_single_source_empty(spark):
    df = spark.createDataFrame(
        [("a", "one two three four five six")], "source string, text string"
    )
    assert source_overlap(df).count() == 0


def test_vocab_coverage_empty_corpus(spark):
    df = spark.createDataFrame([("",), ("   ",)], "text string")
    assert vocab_coverage(df, "text").count() == 0


def test_key_skew_profile_empty_input(spark):
    df = spark.createDataFrame([], "user_id long")
    assert key_skew_profile(df, "user_id").count() == 0


def test_loo_encode_all_singletons_fall_back_to_global_mean(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 4.0)], "id long, k string, y double"
    )
    out = {r["id"]: r["loo_encoding"] for r in loo_target_encode(df, "k", "y").collect()}
    assert out == {1: 3.0, 2: 3.0}
