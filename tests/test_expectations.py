"""Tests for pipeline/expectations.py — actions, observe metrics,
quarantine routing, and table-level checks."""

import pytest

from lakehouse_architecture_spark.pipeline.expectations import (
    ExpectationsViolated,
    apply_expectations,
    dq_summary,
    expect,
    expect_ref_integrity,
    expect_unique,
    quarantine_split,
    validate,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, 7.0, None), (4, 0.0, "d")],
        "id long, amount double, tag string",
    )


def test_validate_counts_and_drop(spark):
    clean, counts = validate(
        _df(spark),
        [
            expect("amount_nonneg", "amount >= 0", "drop"),
            expect("tag_present", "tag IS NOT NULL", "warn"),
        ],
    )
    assert counts == {"amount_nonneg": 1, "tag_present": 1, "__rows_seen": 4}
    assert sorted(r["id"] for r in clean.collect()) == [1, 3, 4]  # warn keeps row 3


def test_validate_fail_action_raises(spark):
    with pytest.raises(ExpectationsViolated) as ei:
        validate(_df(spark), [expect("amount_positive", "amount > 0", "fail")])
    assert ei.value.counts == {"amount_positive": 2}


def test_null_predicate_is_a_violation(spark):
    _clean, counts = validate(
        _df(spark), [expect("tag_is_a", "tag = 'a'", "warn")]
    )
    # rows b, NULL, d all violate; NULL comparison must not escape counting
    assert counts["tag_is_a"] == 3


def test_apply_expectations_observe_single_pass(spark):
    enforced, metrics = apply_expectations(
        _df(spark),
        [
            expect("amount_nonneg", "amount >= 0", "drop"),
            expect("tag_present", "tag IS NOT NULL", "warn"),
        ],
    )
    rows = enforced.collect()  # the caller's action drives the observation
    assert sorted(r["id"] for r in rows) == [1, 3, 4]
    counts = metrics.counts()
    assert counts["amount_nonneg"] == 1
    assert counts["tag_present"] == 1
    assert counts["__rows_seen"] == 4


def test_apply_expectations_fail_raises_on_counts(spark):
    enforced, metrics = apply_expectations(
        _df(spark), [expect("amount_nonneg", "amount >= 0", "fail")]
    )
    with pytest.raises(ExpectationsViolated):
        metrics.counts(force=True)
    # but the enforced output itself is clean
    assert sorted(r["id"] for r in enforced.collect()) == [1, 3, 4]


def test_quarantine_split_reasons(spark):
    clean, bad = quarantine_split(
        _df(spark),
        [
            expect("amount_nonneg", "amount >= 0"),
            expect("tag_present", "tag IS NOT NULL"),
        ],
    )
    assert sorted(r["id"] for r in clean.collect()) == [1, 4]
    reasons = {r["id"]: r["_violations"] for r in bad.collect()}
    assert reasons == {2: ["amount_nonneg"], 3: ["tag_present"]}
    assert "_violations" not in clean.columns


def test_dq_summary_rates(spark):
    out = dq_summary(
        _df(spark),
        [expect("amount_nonneg", "amount >= 0"), expect("id_low", "id <= 2")],
    ).collect()
    by = {r["expectation"]: r for r in out}
    assert by["amount_nonneg"]["n_violations"] == 1
    assert by["amount_nonneg"]["violation_rate"] == 0.25
    assert by["id_low"]["n_violations"] == 2
    assert all(r["n_rows"] == 4 for r in out)


def test_expect_unique_and_ref_integrity(spark):
    fact = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (9, "w")], "k long, v string"
    )
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    dups = expect_unique(fact, ["k"]).collect()
    assert {(r["k"], r["n_dup"]) for r in dups} == {(1, 2)}
    orphans = expect_ref_integrity(fact, "k", dim, "k").collect()
    assert {(r["orphan_key"], r["n_rows"]) for r in orphans} == {(9, 1)}


def test_duplicate_names_and_empty_suite_rejected(spark):
    with pytest.raises(ValueError):
        validate(_df(spark), [])
    with pytest.raises(ValueError):
        validate(
            _df(spark),
            [expect("same", "id > 0"), expect("same", "id < 10")],
        )
    with pytest.raises(ValueError):
        expect("bad_action", "id > 0", "explode")
