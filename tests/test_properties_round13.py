"""Property-based invariants for the round-13 operators: randomized parity
with brute-force Python references (the test_properties_round4/round12
model) — Kendall τ-b, Mann-Whitney U / Cliff's δ, exact two-sample KS,
Cramér's V, Cohen's κ, Theil decomposition, Jensen-Shannon symmetry."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


def _approx(x, tol=1e-6):
    return pytest.approx(x, abs=tol)


# --- Kendall tau-b: parity with the O(n²) definition ---------------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(-8, 8), st.integers(-8, 8)),
        min_size=2,
        max_size=20,
    )
)
def test_kendall_tau_b_random_parity(spark, pts):
    from lakehouse_architecture_spark.operators.profiling import kendall_tau_b

    n = len(pts)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (pts[j][0] - pts[i][0]) * (pts[j][1] - pts[i][1])
            if s > 0:
                c += 1
            elif s < 0:
                d += 1
    from collections import Counter

    tx2 = sum(t * (t - 1) for t in Counter(x for x, _ in pts).values())
    ty2 = sum(t * (t - 1) for t in Counter(y for _, y in pts).values())
    den = (n * (n - 1) - tx2) * (n * (n - 1) - ty2)
    expect = 2 * (c - d) / math.sqrt(den) if den > 0 else None

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    r = kendall_tau_b(df, "x", "y").collect()[0]
    assert (r.concordant, r.discordant) == (c, d)
    assert r.n_pairs == n * (n - 1) // 2
    if expect is None:
        assert r.tau_b is None
    else:
        assert r.tau_b == _approx(round(expect, 6))


# --- Mann-Whitney / Cliff's delta: parity with the pairwise definition -----------


@settings(**SETTINGS)
@given(
    st.lists(st.integers(0, 12), min_size=1, max_size=15),
    st.lists(st.integers(0, 12), min_size=1, max_size=15),
)
def test_mann_whitney_random_parity(spark, xs, ys):
    from lakehouse_architecture_spark.operators.profiling import mann_whitney_u

    # brute force: U_a = #(a > b) + 0.5 * #(a == b)
    wins = sum(1 for a in xs for b in ys if a > b)
    ties = sum(1 for a in xs for b in ys if a == b)
    u_a = wins + ties / 2
    delta = (2 * u_a / (len(xs) * len(ys))) - 1

    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    # few buckets stress intra-bucket assembly; many stress the offsets path
    for tb in (2, 4096):
        r = mann_whitney_u(df, "g", "v", "a", "b", target_buckets=tb).collect()[0]
        assert (r.n_a, r.n_b) == (len(xs), len(ys))
        assert r.u_a == _approx(round(u_a, 1))
        assert r.u_b == _approx(round(len(xs) * len(ys) - u_a, 1))
        assert r.cliffs_delta == _approx(round(delta, 6))


# --- exact KS: parity with the sorted-ECDF definition -----------------------------


@settings(**SETTINGS)
@given(
    st.lists(st.integers(0, 20), min_size=1, max_size=18),
    st.lists(st.integers(0, 20), min_size=1, max_size=18),
)
def test_ks_exact_random_parity(spark, xs, ys):
    from lakehouse_architecture_spark.operators.profiling import ks_2samp_exact

    vals = sorted(set(xs) | set(ys))
    d = max(
        abs(
            round(sum(1 for a in xs if a <= v) / len(xs), 9)
            - round(sum(1 for b in ys if b <= v) / len(ys), 9)
        )
        for v in vals
    )

    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    for tb in (2, 4096):
        r = ks_2samp_exact(df, "g", "v", "a", "b", target_buckets=tb).collect()[0]
        assert (r.n_a, r.n_b) == (len(xs), len(ys))
        assert r.d == _approx(round(d, 6))


# --- Cramér's V: parity with the textbook chi-square ------------------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("pqr"), st.sampled_from("uvw")),
        min_size=2,
        max_size=40,
    )
)
def test_cramers_v_random_parity(spark, rows):
    from collections import Counter

    from lakehouse_architecture_spark.operators.features import cramers_v

    n = len(rows)
    cells = Counter(rows)
    rx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    chi2 = sum(
        round(
            (cells.get((x, y), 0) - rx[x] * cy[y] / n) ** 2 / (rx[x] * cy[y] / n),
            9,
        )
        for x in rx
        for y in cy
    )
    r_, c_ = len(rx), len(cy)
    v = math.sqrt(chi2 / (n * (min(r_, c_) - 1))) if min(r_, c_) > 1 else None

    df = spark.createDataFrame(rows, "x string, y string")
    out = cramers_v(df, "x", "y").collect()[0]
    assert (out.n, out.r, out.c) == (n, r_, c_)
    assert out.chi2 == _approx(round(chi2, 6), tol=1e-5)
    if v is None:
        assert out.v is None
    else:
        assert out.v == _approx(round(v, 6), tol=1e-5)


# --- Cohen's kappa: parity with the definition -------------------------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("pq"), st.sampled_from("pq")),
        min_size=2,
        max_size=40,
    )
)
def test_cohens_kappa_random_parity(spark, rows):
    from collections import Counter

    from lakehouse_architecture_spark.operators.analytics import cohens_kappa

    n = len(rows)
    po = sum(1 for a, b in rows if a == b) / n
    ra = Counter(a for a, _ in rows)
    rb = Counter(b for _, b in rows)
    pe = sum(
        round(ra[l] * rb[l] / (n * n), 9) for l in set(ra) & set(rb)
    )
    df = spark.createDataFrame(rows, "ra string, rb string")
    out = cohens_kappa(df, "ra", "rb").collect()[0]
    assert out.n == n
    assert out.po == _approx(round(po, 6))
    assert out.pe == _approx(round(pe, 6), tol=1e-5)
    if pe < 1:
        assert out.kappa == _approx(round((po - pe) / (1 - pe), 6), tol=1e-4)


# --- Theil: total == within + between on random groups ------------------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 50)),
        min_size=2,
        max_size=30,
    )
)
def test_theil_decomposition_random(spark, rows):
    from lakehouse_architecture_spark.operators.profiling import theil_index

    df = spark.createDataFrame(
        [(str(g), float(v)) for g, v in rows], "g string, x double"
    )
    out = theil_index(df, "g", "x").collect()[0]
    # brute force total
    mu = sum(v for _, v in rows) / len(rows)
    t = sum((v / mu) * math.log(v / mu) for _, v in rows) / len(rows)
    assert out.theil_total == _approx(round(t, 6), tol=1e-4)
    assert out.theil_within + out.theil_between == _approx(
        out.theil_total, tol=1e-4
    )
    assert out.theil_total >= -1e-6  # Theil T is non-negative


# --- JSD: symmetry-by-construction, bounds, zero on identical -----------------------


@settings(**SETTINGS)
@given(
    st.lists(st.integers(0, 30), min_size=2, max_size=25),
    st.lists(st.integers(0, 30), min_size=2, max_size=25),
)
def test_jsd_bounds_random(spark, xs, ys):
    from lakehouse_architecture_spark.operators.profiling import (
        jensen_shannon_pairs,
    )

    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    out = jensen_shannon_pairs(df, "g", "v", n_bins=8).collect()
    assert len(out) == 1
    assert -1e-9 <= out[0].jsd_bits <= 1 + 1e-9
    if sorted(xs) == sorted(ys):
        assert out[0].jsd_bits == _approx(0.0)


# Round 16 (VERDICT r15 #1): heavy plan-executing / randomized-fuzz
# suite, gated out of the default (driver-budget) run; run with
# pytest -m slow  (or -m 'slow or not slow' for everything).
# See pytest.ini.
pytestmark = pytest.mark.slow
