"""Tests for operators/integrity.py (dataset fingerprints)."""

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.integrity import (
    column_fingerprints,
    dataset_fingerprint,
    fingerprints_match,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y")],
        "id long, s string, t string",
    )


def test_fingerprint_order_and_partitioning_invariant(spark):
    df = _df(spark)
    fp1 = dataset_fingerprint(df).collect()[0]
    fp2 = dataset_fingerprint(df.orderBy(F.col("id").desc())).collect()[0]
    fp3 = dataset_fingerprint(df.repartition(7)).collect()[0]
    assert fp1 == fp2 == fp3
    assert fp1["n_rows"] == 3


def test_fingerprint_detects_content_change(spark):
    base = _df(spark)
    changed = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "z")],  # y -> z
        "id long, s string, t string",
    )
    assert fingerprints_match(base, _df(spark))
    assert not fingerprints_match(base, changed)


def test_fingerprint_distinguishes_null_from_literal(spark):
    a = spark.createDataFrame([(1, None)], "id long, s string")
    b = spark.createDataFrame([(1, "<<NULL>>")], "id long, s string")
    # round 11: the old marker-based canonicalization collided here by
    # construction (pinned as documented behavior); length-prefixed
    # framing removed the collision — NULL frames as the bare 'n', the
    # literal string as '8:<<NULL>>'
    assert not fingerprints_match(a, b)


def test_column_fingerprints_localize_drift(spark):
    base = _df(spark)
    changed = spark.createDataFrame(
        [(1, "a", None), (2, "B", "x"), (3, "c", "y")],  # s column drifts
        "id long, s string, t string",
    )
    f1 = {r["column"]: r for r in column_fingerprints(base).collect()}
    f2 = {r["column"]: r for r in column_fingerprints(changed).collect()}
    assert f1["id"]["fingerprint"] == f2["id"]["fingerprint"]
    assert f1["t"]["fingerprint"] == f2["t"]["fingerprint"]
    assert f1["s"]["fingerprint"] != f2["s"]["fingerprint"]
    assert f1["t"]["n_nonnull"] == 2


def test_fingerprint_separator_injection_differs(spark):
    """Round 11 (same family as the snapshot_diff fix): length-prefixed
    framing means value content cannot shift a column boundary and a NULL
    cannot collide with any literal marker string — each pair below
    hashed IDENTICALLY under the old separator-joined canonicalization."""
    from lakehouse_architecture_spark.operators.integrity import (
        dataset_fingerprint,
        fingerprints_match,
    )

    a = spark.createDataFrame([("a\x1f", "b")], "c1 string, c2 string")
    b = spark.createDataFrame([("a", "\x1fb")], "c1 string, c2 string")
    assert not fingerprints_match(a, b)

    c = spark.createDataFrame([(None, "y")], "c1 string, c2 string")
    d = spark.createDataFrame([("<<NULL>>", "y")], "c1 string, c2 string")
    assert not fingerprints_match(c, d)

    # identical content still matches, order-insensitively
    e = spark.createDataFrame([("p", "q"), ("r", "s")], "c1 string, c2 string")
    f = spark.createDataFrame([("r", "s"), ("p", "q")], "c1 string, c2 string")
    assert fingerprints_match(e, f)
    assert dataset_fingerprint(e).collect()[0]["n_rows"] == 2
