"""Property-based invariants for the round-11 operators: randomized parity
with brute-force Python references (the test_properties_round4.py model)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


# --- forest transitive closure: parity with a Python walk over random forests


@settings(**SETTINGS)
@given(
    st.dictionaries(
        st.integers(1, 40),
        st.integers(0, 39),
        min_size=1,
        max_size=30,
    )
)
def test_tree_closure_random_forest_parity(spark, raw):
    from lakehouse_architecture_spark.operators.graph import tree_closure

    # force a forest with no cycles: parent strictly less than child
    edges = {c: p for c, p in raw.items() if p < c}
    if not edges:
        return
    df = spark.createDataFrame(
        [(c, p) for c, p in edges.items()], "child long, parent long"
    )

    def walk(k):
        d, node = 0, k
        while node in edges:
            node = edges[node]
            d += 1
            yield (k, node, d)
            if d > 64:  # safety; cannot trigger with parent < child
                raise AssertionError("cycle")

    expected = {t for k in edges for t in walk(k)}
    max_depth = max(d for (_, _, d) in expected)
    got = {
        (r.node, r.anc, r.depth)
        for r in tree_closure(df, max_depth=max_depth).collect()
    }
    assert got == expected


# --- Adamic-Adar: parity with a brute-force score over random bipartite graphs


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 5)),
        min_size=1,
        max_size=40,
    )
)
def test_adamic_adar_random_parity(spark, incid):
    from lakehouse_architecture_spark.operators.graph import adamic_adar

    pairs = sorted(set(incid))
    df = spark.createDataFrame(pairs, "node long, ctx long")
    # brute force
    members: dict[int, set[int]] = {}
    for n, c in pairs:
        members.setdefault(c, set()).add(n)
    expected: dict[tuple[int, int], tuple[int, float]] = {}
    for c, ns in members.items():
        deg = len(ns)
        if deg < 2:
            continue
        w = round(1.0 / math.log(deg), 9)
        for a in ns:
            for b in ns:
                if a < b:
                    n_common, score = expected.get((a, b), (0, 0.0))
                    expected[(a, b)] = (n_common + 1, score + w)
    got = {
        (r.node_a, r.node_b): (r.n_common, r.score)
        for r in adamic_adar(df, "node", "ctx").collect()
    }
    assert set(got) == set(expected)
    for k, (n_common, score) in expected.items():
        assert got[k][0] == n_common
        assert abs(got[k][1] - round(score, 6)) < 1e-9


# --- Theil-Sen / Mann-Kendall: parity with a brute-force Python reference


@settings(**SETTINGS)
@given(
    st.lists(
        st.integers(-50, 50).map(float),
        min_size=2,
        max_size=20,
    )
)
def test_theil_sen_random_parity(spark, ys):
    from lakehouse_architecture_spark.operators.timeseries import theil_sen

    df = spark.createDataFrame(list(enumerate(ys)), "x long, y double")
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    m = slopes[(len(slopes) + 1) // 2 - 1]  # lower median, 1-indexed rank
    b0s = sorted(y - m * x for x, y in enumerate(ys))
    b = b0s[(len(b0s) + 1) // 2 - 1]
    out = theil_sen(df, "x", "y").collect()[0]
    assert out.n_pairs == len(slopes)
    assert out.n_points == len(ys)
    assert out.slope == round(m, 6)
    assert out.intercept == round(b, 6)


@settings(**SETTINGS)
@given(
    st.lists(
        st.integers(-10, 10).map(float),
        min_size=2,
        max_size=20,
    )
)
def test_mann_kendall_random_parity(spark, ys):
    from lakehouse_architecture_spark.operators.timeseries import mann_kendall

    df = spark.createDataFrame(list(enumerate(ys)), "x long, y double")
    n = len(ys)
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie_sum = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(ys).values() if t > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tie_sum) / 18
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    out = mann_kendall(df, "x", "y").collect()[0]
    assert out.n_points == n
    assert out.s_stat == s
    assert out.var_s == round(var, 6)
    assert out.z == round(z, 6)


# --- OPH: structural invariants under random corpora


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=30).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    )
)
def test_oph_densified_structure_random(spark, texts):
    from lakehouse_architecture_spark.operators.dedup import oph_densified

    bins = 8
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = oph_densified(df, "doc_id", "text", bins=bins).collect()
    per_doc: dict[int, dict[int, int]] = {}
    for r in rows:
        assert r.v >= 0
        per_doc.setdefault(r.id, {})[r.bin] = r.v
    # every doc with >=3 tokens has shingles, hence a FULL densified row set
    for _id, filled in per_doc.items():
        assert set(filled) == set(range(bins))
    # identical texts must produce identical signatures (pure function)
    by_text: dict[str, dict[int, int]] = {}
    for i, t in enumerate(texts):
        if i in per_doc:
            sig = per_doc[i]
            if t in by_text:
                assert by_text[t] == sig
            else:
                by_text[t] = sig


# --- Poisson bootstrap: the weight function is the frozen inverse CDF


@settings(**SETTINGS)
@given(st.integers(0, 999999))
def test_poisson_threshold_weight_is_inverse_cdf(u):
    from lakehouse_architecture_spark.operators.profiling import (
        POISSON1_THRESHOLDS,
    )

    k = sum(u >= t for t in POISSON1_THRESHOLDS)
    # the thresholds are the floored cumulative Poisson(1) CDF * 1e6:
    # weight k iff u lands in [cdf(k-1), cdf(k))
    lo = 0 if k == 0 else POISSON1_THRESHOLDS[k - 1]
    hi = POISSON1_THRESHOLDS[k] if k < len(POISSON1_THRESHOLDS) else 10**6
    assert lo <= u < hi
    assert 0 <= k <= 6


def test_poisson_thresholds_match_analytic_cdf():
    from lakehouse_architecture_spark.operators.profiling import (
        POISSON1_THRESHOLDS,
    )

    cdf = 0.0
    for k, t in enumerate(POISSON1_THRESHOLDS):
        cdf += math.exp(-1) / math.factorial(k)
        assert t == int(cdf * 1_000_000)


# --- PSI: total is invariant to swapping sides up to sign of each term


@settings(**SETTINGS)
@given(
    st.lists(st.integers(0, 499), min_size=5, max_size=60),
    st.lists(st.integers(0, 499), min_size=5, max_size=60),
)
def test_psi_brute_force_parity(spark, ref_vals, cur_vals):
    from lakehouse_architecture_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame([(float(v),) for v in ref_vals], "v double")
    cur = spark.createDataFrame([(float(v),) for v in cur_vals], "v double")
    out = {r.bin: r for r in psi_drift(ref, cur, "v").collect()}

    def shares(vals):
        counts = [0] * 10
        for v in vals:
            counts[min(max(int(v // 50), 0), 9)] += 1
        return [max(c / len(vals), 1e-4) for c in counts]

    p, q = shares(ref_vals), shares(cur_vals)
    expect_terms = [round((q[b] - p[b]) * math.log(q[b] / p[b]), 9) for b in range(10)]
    for b in range(10):
        assert out[b].term == expect_terms[b]
    assert out[-1].term == round(sum(expect_terms), 6)


# --- grouped bootstrap: collapsible-input parity with the row-level form


@settings(**SETTINGS)
@given(
    st.lists(
        st.integers(-1000, 1000).map(lambda v: v / 10.0),
        min_size=3,
        max_size=40,
    )
)
def test_bootstrap_grouped_collapsible_fuzz_parity(spark, vals):
    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.profiling import (
        poisson_bootstrap_grouped,
        poisson_bootstrap_mean,
    )

    # singleton groups sharing the row id: the group collapse is the
    # identity, so the two estimators must agree on every field
    df = spark.createDataFrame(list(enumerate(vals)), "id long, v double")
    kw = dict(n_resamples=30, lo_rank=2, hi_rank=29)
    row = poisson_bootstrap_mean(df, F.col("id"), F.col("v"), **kw).collect()[0]
    grp = poisson_bootstrap_grouped(df, F.col("id"), F.col("v"), **kw).collect()[0]
    assert row == grp


# Round 16 (VERDICT r15 #1): heavy plan-executing / randomized-fuzz
# suite, gated out of the default (driver-budget) run; run with
# pytest -m slow  (or -m 'slow or not slow' for everything).
# See pytest.ini.
import pytest  # noqa: E402  (slow-marker gate)
pytestmark = pytest.mark.slow
