"""Tests for operators/pq.py (product quantization)."""

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.pq import (
    pq_adc_knn,
    pq_codebooks,
    pq_encode,
)


def _synthetic(spark, n=40, m=4, d_sub=2, vals=(0.0, 1.0, 2.0, 3.0)):
    """Vectors whose subvectors are drawn EXACTLY from `len(vals)` patterns
    per subspace — quantization is lossless, so PQ distance == true L2."""
    rows = []
    for i in range(n):
        v = []
        for j in range(m):
            pick = vals[(i + j) % len(vals)]
            v.extend([pick] * d_sub)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_lossless_when_subvectors_are_codewords(spark):
    df = _synthetic(spark)
    cb = pq_codebooks(df, m=4, ksub=4, iters=0)
    codes = pq_encode(df, cb, m=4)
    q = df.orderBy("vec_id").first()["embedding"]
    out = pq_adc_knn(codes, cb, [float(x) for x in q], k=40)
    got = {r["vec_id"]: r["pq_dist"] for r in out.collect()}
    # exact distances: compare against brute-force L2 computed in Python
    base = [float(x) for x in q]
    for r in df.collect():
        v = [float(x) for x in r["embedding"]]
        true_d = 0.0
        for a, b in zip(base, v):
            true_d += (b - a) * (b - a)
        assert abs(got[r["vec_id"]] - true_d) < 1e-9
    assert got[0] == 0.0


def test_pq_codes_shape_and_range(spark):
    df = _synthetic(spark, n=30, m=4)
    cb = pq_codebooks(df, m=4, ksub=8, iters=0)
    assert cb.count() == 4 * 8
    codes = pq_encode(df, cb, m=4)
    rows = codes.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])


def test_pq_training_reduces_or_keeps_distortion(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def distortion(cb):
        codes = pq_encode(df, cb, m=4)
        q = rows[0][1]
        out = pq_adc_knn(codes, cb, q, k=60)
        # proxy: total ADC distance mass vs the same query
        return sum(r["pq_dist"] for r in out.collect())

    d0 = distortion(pq_codebooks(df, m=4, ksub=8, iters=0))
    d2 = distortion(pq_codebooks(df, m=4, ksub=8, iters=2))
    # Lloyd iterations must not blow up the distance field; typically shrink
    assert d2 <= d0 * 1.25


def test_pq_ragged_vectors_dropped(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 16), (2, [1.0] * 15)], "vec_id long, embedding array<float>"
    )
    cb = pq_codebooks(df, m=4, ksub=2, iters=0)
    codes = pq_encode(df, cb, m=4)
    assert [r["vec_id"] for r in codes.collect()] == [1]


def test_pq_adc_plan_is_projection_only(spark):
    from lakehouse_architecture_spark.plans.inspect import formatted_plan

    df = _synthetic(spark)
    cb = pq_codebooks(df, m=4, ksub=4, iters=0)
    codes = pq_encode(df, cb, m=4).localCheckpoint(eager=True)
    q = [float(x) for x in df.orderBy("vec_id").first()["embedding"]]
    plan = formatted_plan(pq_adc_knn(codes, cb, q, k=5))
    # distance table baked into the projection: no join on the search path
    for op in ("Join", "CartesianProduct", "Exchange hashpartitioning"):
        assert op not in plan, f"{op} leaked into the ADC search plan"
    assert "TakeOrderedAndProject" in plan


def test_pq_adc_rejects_gapped_codebook(spark):
    """ADVICE r3: the ADC literal tables are positional — a codebook with a
    gap in sub ids or code ids must raise a clear ValueError, not
    IndexError or silent wrong distances."""
    import pytest

    df = _synthetic(spark)
    cb = pq_codebooks(df, m=4, ksub=4, iters=0)
    codes = pq_encode(df, cb, m=4)
    q = [0.0] * 8

    no_sub = cb.filter(F.col("sub") != 1)  # gap in sub ids
    with pytest.raises(ValueError, match="sub ids must be dense"):
        pq_adc_knn(codes, no_sub, q, k=5)

    no_code = cb.filter(~((F.col("sub") == 2) & (F.col("code") == 0)))
    with pytest.raises(ValueError, match="codes for sub 2 must be dense"):
        pq_adc_knn(codes, no_code, q, k=5)
