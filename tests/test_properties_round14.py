"""Property-based invariants for the round-14 operators: randomized parity
with brute-force Python references (the test_properties_round13 model) —
exact 1-D Wasserstein, McNemar, Matthews correlation, Gwet's AC1, Hill
tail exponent, EWMA vs pandas, Monroe log-odds."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


def _approx(x, tol=1e-6):
    return pytest.approx(x, abs=tol)


# --- Wasserstein: parity with the sorted-union ECDF integral ---------------------


@settings(**SETTINGS)
@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=18),
    st.lists(st.integers(0, 15), min_size=1, max_size=18),
)
def test_wasserstein_random_parity(spark, xs, ys):
    from lakehouse_architecture_spark.operators.profiling import wasserstein_1d

    vals = sorted(set(xs) | set(ys))
    brute = sum(
        abs(
            round(sum(1 for a in xs if a <= v) / len(xs), 9)
            - round(sum(1 for b in ys if b <= v) / len(ys), 9)
        )
        * (vn - v)
        for v, vn in zip(vals, vals[1:])
    )
    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    for tb in (2, 4096):
        r = wasserstein_1d(df, "g", "v", "a", "b", target_buckets=tb).collect()[0]
        assert (r.n_a, r.n_b) == (len(xs), len(ys))
        assert r.w1 == _approx(round(brute, 6), tol=2e-6)


# --- paired-labeler stats: parity with the confusion-matrix definitions -----------


@st.composite
def _paired_labels(draw):
    n = draw(st.integers(2, 40))
    return [
        (draw(st.sampled_from("pq")), draw(st.sampled_from("pq")))
        for _ in range(n)
    ]


@settings(**SETTINGS)
@given(_paired_labels())
def test_mcnemar_mcc_random_parity(spark, pairs):
    from lakehouse_architecture_spark.operators.analytics import (
        matthews_corr,
        mcnemar_test,
    )

    df = spark.createDataFrame(pairs, "la string, lb string")
    tp = sum(1 for a, b in pairs if a == "p" and b == "p")
    fp = sum(1 for a, b in pairs if a != "p" and b == "p")
    fn = sum(1 for a, b in pairs if a == "p" and b != "p")
    tn = sum(1 for a, b in pairs if a != "p" and b != "p")

    r = mcnemar_test(df, "la", "lb", "p").collect()[0]
    assert (r.b, r.c) == (fn, fp)
    if fn + fp > 0:
        assert r.chi2 == _approx(round((fn - fp) ** 2 / (fn + fp), 6))
    else:
        assert r.chi2 is None

    m = matthews_corr(df, "la", "lb", "p").collect()[0]
    den = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    if den > 0:
        assert m.mcc == _approx(round((tp * tn - fp * fn) / den, 6))
    else:
        assert m.mcc is None


@settings(**SETTINGS)
@given(_paired_labels())
def test_gwet_ac1_random_parity(spark, pairs):
    from lakehouse_architecture_spark.operators.analytics import gwet_ac1

    df = spark.createDataFrame(pairs, "la string, lb string")
    n = len(pairs)
    labels = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    po = sum(1 for a, b in pairs if a == b) / n
    s = sum(
        round(
            (
                (sum(1 for a, _ in pairs if a == l) + sum(1 for _, b in pairs if b == l))
                / (2 * n)
            )
            * (
                1
                - (
                    sum(1 for a, _ in pairs if a == l)
                    + sum(1 for _, b in pairs if b == l)
                )
                / (2 * n)
            ),
            9,
        )
        for l in labels
    )
    pe = s / (len(labels) - 1) if len(labels) > 1 else 0.0
    r = gwet_ac1(df, "la", "lb").collect()[0]
    assert r.n_labels == len(labels)
    assert r.po == _approx(round(po, 6))
    assert r.pe_gamma == _approx(round(pe, 6), tol=2e-6)
    if pe < 1:
        assert r.ac1 == _approx(round((po - pe) / (1 - pe), 6), tol=2e-6)
    else:
        assert r.ac1 is None


# --- Hill: parity with the closed-form MLE ------------------------------------------


@settings(**SETTINGS)
@given(st.lists(st.floats(0.1, 1000.0, allow_nan=False), min_size=1, max_size=30))
def test_hill_random_parity(spark, xs):
    from lakehouse_architecture_spark.operators.profiling import (
        hill_tail_exponent,
    )

    xmin = 5.0
    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    tail = [x for x in xs if x > xmin]
    r = hill_tail_exponent(df, "v", xmin).collect()[0]
    assert r.k == len(tail)
    logsum = sum(round(math.log(x / xmin), 9) for x in tail)
    if logsum > 0:
        assert r.alpha == _approx(round(1 + len(tail) / logsum, 6), tol=2e-6)
    else:
        assert r.alpha is None


# --- EWMA: parity with pandas ewm(adjust=True) ------------------------------------------


@settings(**SETTINGS)
@given(
    st.lists(st.floats(-100.0, 100.0, allow_nan=False), min_size=1, max_size=15),
    st.floats(0.05, 0.95),
)
def test_ewma_random_parity_with_pandas(spark, xs, alpha):
    import pandas as pd

    from lakehouse_architecture_spark.operators.timeseries import ewma_daily

    days = pd.date_range("2024-03-01", periods=len(xs))
    rows = [(d.to_pydatetime(), float(x)) for d, x in zip(days, xs)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = ewma_daily(df, "ts", "value", alpha=alpha).orderBy("day").collect()
    expect = pd.Series(xs).ewm(alpha=alpha, adjust=True).mean()
    for row, e in zip(got, expect):
        assert row.ewma == _approx(round(e, 6), tol=5e-6)


# --- Monroe log-odds: parity with the published formula --------------------------------


@settings(**SETTINGS)
@given(
    st.lists(st.sampled_from(["ant", "bee", "cat", "dog"]), min_size=1, max_size=25),
    st.lists(st.sampled_from(["ant", "bee", "cat", "dog"]), min_size=1, max_size=25),
)
def test_log_odds_random_parity(spark, ta, tb):
    from lakehouse_architecture_spark.operators.text import log_odds_terms

    rows = [("a", " ".join(ta)), ("b", " ".join(tb))]
    df = spark.createDataFrame(rows, "g string, text string")
    out = {r.term: r for r in log_odds_terms(df, "g", "text", "a", "b", k=10).collect()}
    vocab = sorted(set(ta) | set(tb))
    na, nb, v, al = len(ta), len(tb), len(vocab), 0.01
    for w in vocab:
        ya, yb = ta.count(w), tb.count(w)
        delta = math.log((ya + al) / (na + al * v - ya - al)) - math.log(
            (yb + al) / (nb + al * v - yb - al)
        )
        z = delta / math.sqrt(1 / (ya + al) + 1 / (yb + al))
        assert out[w].delta == _approx(round(delta, 6), tol=2e-6)
        assert out[w].z == _approx(round(z, 6), tol=2e-6)


# Round 16 (VERDICT r15 #1): heavy plan-executing / randomized-fuzz
# suite, gated out of the default (driver-budget) run; run with
# pytest -m slow  (or -m 'slow or not slow' for everything).
# See pytest.ini.
pytestmark = pytest.mark.slow
