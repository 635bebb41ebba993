"""U1-U3 cleaning expressions vs the reference UDF semantics
(app/sliver.py:41-83) on the edge cases SURVEY.md §2.4 calls out."""

import pytest

from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.cleaning import (
    normalize_price_expr,
    parse_area_expr,
    parse_number_expr,
)


def _run(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r[0] for r in df.select(expr_fn(F.col("s")).alias("v")).collect()]


def test_parse_area(spark):
    # reference: first [\d,.]+ token, ',' -> '.', float()  (sliver.py:41-51)
    vals = _run(spark, parse_area_expr, ["80 m²", "80,5 m²", "1.5", "abc", "", None])
    assert vals == [80.0, 80.5, 1.5, None, None, None]


def test_parse_number(spark):
    # reference: int(float(s)) with failure -> None  (sliver.py:54-60)
    vals = _run(spark, parse_number_expr, ["3", "3.7", "2,5", "x", None])
    assert vals == [3, 3, 2, None, None]


def test_normalize_price(spark):
    # reference semantics (sliver.py:63-83): tỷ=billions, triệu=millions/1000,
    # bare digits / 1e9
    vals = _run(
        spark,
        normalize_price_expr,
        ["5,2 tỷ", "800 triệu", "5200000000", "Thỏa thuận", "", None],
    )
    assert vals[0] == pytest.approx(5.2)
    assert vals[1] == pytest.approx(0.8)
    assert vals[2] == pytest.approx(5.2)
    assert vals[3:] == [None, None, None]


def test_hash_split_stable_and_disjoint(spark):
    from lakehouse_architecture_spark.operators.curation import hash_split

    df = spark.createDataFrame([(i,) for i in range(1000)], ["id"])
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["id"]: r["split"] for r in hash_split(df, "id", w).collect()}
    # repartitioning must not move any row between splits
    b = {
        r["id"]: r["split"]
        for r in hash_split(df.repartition(7), "id", w).collect()
    }
    assert a == b
    # growing the corpus must not reassign existing ids
    big = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    c = {r["id"]: r["split"] for r in hash_split(big, "id", w).collect()}
    assert all(c[i] == a[i] for i in a)
    # proportions roughly honored
    from collections import Counter

    frac = Counter(a.values())
    assert 0.7 < frac["train"] / 1000 < 0.9
    import pytest

    with pytest.raises(ValueError):
        hash_split(df, "id", {"train": 0.5, "val": 0.1})
