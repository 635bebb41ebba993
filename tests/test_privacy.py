"""Tests for operators/privacy.py."""

from lakehouse_architecture_spark.operators.privacy import (
    anonymity_summary,
    k_anonymity_violations,
    l_diversity_violations,
)


def _df(spark):
    # QI (zip, age): (10, 30) x3 rows, (10, 40) x1, (20, 30) x2
    rows = [
        (1, 10, 30, "flu"),
        (2, 10, 30, "flu"),
        (3, 10, 30, "cold"),
        (4, 10, 40, "flu"),
        (5, 20, 30, "flu"),
        (6, 20, 30, "flu"),
    ]
    return spark.createDataFrame(rows, "id long, zip int, age int, dx string")


def test_k_anonymity_violations(spark):
    out = k_anonymity_violations(_df(spark), ["zip", "age"], k=3).collect()
    got = {(r["zip"], r["age"]): r["n_rows"] for r in out}
    assert got == {(10, 40): 1, (20, 30): 2}


def test_l_diversity_violations(spark):
    out = l_diversity_violations(_df(spark), ["zip", "age"], "dx", l_required=2)
    got = {(r["zip"], r["age"]): r["n_distinct_sensitive"] for r in out.collect()}
    # (10,30) has {flu, cold} -> diverse; the others are single-secret groups
    assert got == {(10, 40): 1, (20, 30): 1}


def test_l_diversity_ignores_null_secrets(spark):
    """ADVICE r3: a NULL sensitive value is a missing secret, not a secret.
    A {flu, NULL} group must report l=1 (flagged at l>=2), and an all-NULL
    group l=0."""
    rows = [
        (1, 10, 30, "flu"),
        (2, 10, 30, None),
        (3, 20, 30, None),
        (4, 20, 30, None),
    ]
    df = spark.createDataFrame(rows, "id long, zip int, age int, dx string")
    out = l_diversity_violations(df, ["zip", "age"], "dx", l_required=2)
    got = {(r["zip"], r["age"]): r["n_distinct_sensitive"] for r in out.collect()}
    assert got == {(10, 30): 1, (20, 30): 0}
    summary = anonymity_summary(df, ["zip", "age"], "dx").collect()[0]
    assert summary["achieved_l"] == 0


def test_anonymity_summary(spark):
    r = anonymity_summary(_df(spark), ["zip", "age"], "dx").collect()[0]
    assert r["n_groups"] == 3
    assert r["achieved_k"] == 1
    assert r["achieved_l"] == 1
    assert r["n_total"] == 6
    assert abs(r["singleton_row_share"] - round(1 / 6, 6)) < 1e-12


def test_summary_gates_with_expectations(spark):
    """anonymity_summary composes with the expectations engine as a
    publish gate."""
    import pytest

    from lakehouse_architecture_spark.pipeline.expectations import (
        ExpectationsViolated,
        expect,
        validate,
    )

    summary = anonymity_summary(_df(spark), ["zip", "age"], "dx")
    with pytest.raises(ExpectationsViolated):
        validate(summary, [expect("k_at_least_3", "achieved_k >= 3", "fail")])


def test_temporal_split_purges_embargo_window(spark):
    import datetime as dt

    from lakehouse_architecture_spark.operators.curation import temporal_split

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(hours=i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = temporal_split(df, "ts", test_frac=0.2, embargo_us=3_600_000_000)
    got = {r["id"]: r["split"] for r in out.collect()}
    # cutoff = 80th pct of hours 0..9 -> hour 7.2; test = hours >= 7.2
    assert {i for i, s in got.items() if s == "test"} == {8, 9}
    # embargo = 1h before the cutoff: hour 7 falls inside (7.2-1 <= 7 < 7.2)
    assert {i for i, s in got.items() if s == "embargo"} == {7}
    assert {i for i, s in got.items() if s == "train"} == set(range(7))


def test_temporal_split_all_null_timestamps_label_embargo(spark):
    """Degenerate input (round-7 ADVICE fix): with every timestamp NULL,
    exact_quantiles emits no cut row — rows must survive (labeled
    'embargo', the pre-round-6 NULL-cut behavior), not silently vanish
    in a crossJoin against an empty cut table."""
    from lakehouse_architecture_spark.operators.curation import temporal_split

    df = spark.createDataFrame(
        [(i, None) for i in range(5)], "id long, ts timestamp"
    )
    out = temporal_split(df, "ts", test_frac=0.2).collect()
    assert len(out) == 5
    assert {r["split"] for r in out} == {"embargo"}


def test_temporal_split_rejects_bad_frac(spark):
    import pytest

    from lakehouse_architecture_spark.operators.curation import temporal_split

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        temporal_split(df, "id", test_frac=1.5)
