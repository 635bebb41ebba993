"""Hand-case and invariant tests for the round-13 operator block:
Kendall τ-b, Mann–Whitney U / Cliff's δ, exact 2-sample KS, Cramér's V,
Cohen's κ, SMD balance, SRM χ², Theil decomposition, Jensen–Shannon."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.analytics import (
    cohens_kappa,
    smd_balance,
    srm_check,
)
from lakehouse_architecture_spark.operators.features import cramers_v
from lakehouse_architecture_spark.operators.profiling import (
    jensen_shannon_pairs,
    kendall_tau_b,
    ks_2samp_exact,
    mann_whitney_u,
    theil_index,
)


def _xy(spark, pairs):
    return spark.createDataFrame([Row(x=float(a), y=float(b)) for a, b in pairs])


def _gv(spark, rows):
    return spark.createDataFrame([Row(g=g, v=float(v)) for g, v in rows])


# --- Kendall tau-b -----------------------------------------------------------


def test_kendall_perfect_and_reversed(spark):
    up = _xy(spark, [(1, 10), (2, 20), (3, 30), (4, 40)])
    r = kendall_tau_b(up, "x", "y").collect()[0]
    assert (r.n, r.n_pairs, r.concordant, r.discordant) == (4, 6, 6, 0)
    assert r.tau_b == pytest.approx(1.0)
    down = _xy(spark, [(1, 40), (2, 30), (3, 20), (4, 10)])
    assert kendall_tau_b(down, "x", "y").collect()[0].tau_b == pytest.approx(-1.0)


def test_kendall_tau_b_tie_correction_hand_case(spark):
    # x = (1,2,2,3), y = (1,3,2,4): of the 6 pairs, the x-tied pair
    # (2,3)-(2,2) is neither concordant nor discordant -> C=5, D=0;
    # doubled tie sums tx2 = 2 (one tied x pair), ty2 = 0
    # tau_b = 2*(5-0)/sqrt((12-2)*(12-0)) = 10/sqrt(120)
    r = kendall_tau_b(
        _xy(spark, [(1, 1), (2, 3), (2, 2), (3, 4)]), "x", "y"
    ).collect()[0]
    assert (r.concordant, r.discordant) == (5, 0)
    assert r.tau_b == pytest.approx(10 / math.sqrt(120), abs=1e-6)


def test_kendall_guard_trips_on_raw_rows(spark):
    big = spark.range(20001).select(
        F.col("id").cast("double").alias("x"), F.col("id").cast("double").alias("y")
    )
    with pytest.raises(ValueError, match="kendall_tau_b"):
        kendall_tau_b(big, "x", "y", max_points=10_000)


# --- Mann-Whitney ------------------------------------------------------------


def test_mann_whitney_hand_case(spark):
    # a = {1,2,3}, b = {4,5}: all b above all a -> U_a = 0, delta = -1
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5)]
    r = mann_whitney_u(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.u_a == 0.0 and r.u_b == 6.0
    assert r.cliffs_delta == pytest.approx(-1.0)


def test_mann_whitney_ties_midranks(spark):
    # a = {1,2}, b = {2,3}: pooled midranks 1->1, 2->2.5, 3->4;
    # R_a = 3.5 -> U_a = 3.5 - 3 = 0.5 (the tied (2,2) pair's half-win);
    # Cliff's delta = (#a>b - #a<b)/(n_a*n_b) = (0 - 3)/4 = -0.75
    rows = [("a", 1), ("a", 2), ("b", 2), ("b", 3)]
    r = mann_whitney_u(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert r.u_a == pytest.approx(0.5)
    assert r.u_b == pytest.approx(3.5)
    assert r.cliffs_delta == pytest.approx(-0.75)


def test_mann_whitney_identical_groups_delta_zero(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    r = mann_whitney_u(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert r.cliffs_delta == pytest.approx(0.0)


# --- exact KS ---------------------------------------------------------------


def test_ks_exact_hand_case(spark):
    # a = {1,2}, b = {3,4}: disjoint supports -> D = 1
    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4)]
    r = ks_2samp_exact(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert r.d == pytest.approx(1.0)
    # identical samples -> D = 0
    rows = [("a", 1), ("a", 2), ("b", 1), ("b", 2)]
    r = ks_2samp_exact(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert r.d == pytest.approx(0.0)


def test_ks_exact_interleaved(spark):
    # a = {1,3}, b = {2,4}: D = 1/2 at v=1 (and every step)
    rows = [("a", 1), ("a", 3), ("b", 2), ("b", 4)]
    r = ks_2samp_exact(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert r.d == pytest.approx(0.5)


# --- Cramér's V --------------------------------------------------------------


def test_cramers_v_perfect_association(spark):
    rows = [("x1", "y1")] * 5 + [("x2", "y2")] * 5
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert (r.n, r.r, r.c) == (10, 2, 2)
    assert r.chi2 == pytest.approx(10.0, abs=1e-6)
    assert r.v == pytest.approx(1.0, abs=1e-6)


def test_cramers_v_independence(spark):
    # uniform 2x2 -> chi2 = 0, V = 0
    rows = [("x1", "y1"), ("x1", "y2"), ("x2", "y1"), ("x2", "y2")] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert r.v == pytest.approx(0.0, abs=1e-6)


def test_cramers_v_counts_absent_cells(spark):
    # a structurally-absent cell must contribute (0-e)^2/e: 2x2 with one
    # empty cell; chi2 hand value: cells (x1,y1)=2,(x1,y2)=0,(x2,y1)=1,
    # (x2,y2)=1; e11=1.8/... n=4, e(x1,y1)=2*3/4=1.5, e(x1,y2)=0.5,
    # e(x2,y1)=1.5, e(x2,y2)=0.5 -> chi2 = (0.5^2/1.5)+(0.5^2/0.5)*... =
    # 0.16667+0.5+0.16667+0.5 = 1.333333
    rows = [("x1", "y1"), ("x1", "y1"), ("x2", "y1"), ("x2", "y2")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert r.chi2 == pytest.approx(4 / 3, abs=1e-5)


# --- Cohen's kappa -----------------------------------------------------------


def test_cohens_kappa_hand_cases(spark):
    # perfect agreement -> kappa = 1
    rows = [("p", "p")] * 6 + [("q", "q")] * 4
    df = spark.createDataFrame(rows, "ra string, rb string")
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    assert r.po == pytest.approx(1.0) and r.kappa == pytest.approx(1.0)
    # the classic 2x2 example: po=0.7, pe=0.5 -> kappa = 0.4
    rows = (
        [("p", "p")] * 20 + [("p", "q")] * 5 + [("q", "p")] * 10 + [("q", "q")] * 15
    )
    df = spark.createDataFrame(rows, "ra string, rb string")
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    assert r.n == 50
    assert r.po == pytest.approx(0.7)
    assert r.pe == pytest.approx((25 * 30 + 25 * 20) / 2500, abs=1e-6)
    assert r.kappa == pytest.approx((0.7 - 0.5) / 0.5, abs=1e-5)


# --- SMD balance --------------------------------------------------------------


def test_smd_balance_identical_arms_zero(spark):
    rows = [("a", 1.0, 10.0), ("a", 2.0, 20.0), ("b", 1.0, 10.0), ("b", 2.0, 20.0)]
    df = spark.createDataFrame(rows, "arm string, u double, w double")
    out = {r.covariate: r for r in smd_balance(df, "arm", ["u", "w"]).collect()}
    assert out["u"].smd == pytest.approx(0.0)
    assert out["w"].smd == pytest.approx(0.0)
    assert out["u"].n_a == 2 and out["u"].n_b == 2


def test_smd_balance_hand_case(spark):
    # arm a: {0, 2} (mean 1, var 2); arm b: {2, 4} (mean 3, var 2)
    # SMD = (1-3)/sqrt((2+2)/2) = -2/sqrt(2)
    rows = [("a", 0.0), ("a", 2.0), ("b", 2.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "arm string, u double")
    r = smd_balance(df, "arm", ["u"]).collect()[0]
    assert r.mean_a == pytest.approx(1.0) and r.mean_b == pytest.approx(3.0)
    assert r.smd == pytest.approx(-2 / math.sqrt(2), abs=1e-6)


# --- SRM ----------------------------------------------------------------------


def test_srm_check_balanced_and_broken(spark):
    rows = [("a",)] * 50 + [("b",)] * 50
    df = spark.createDataFrame(rows, "arm string")
    out = srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()
    assert all(r.chi2 == pytest.approx(0.0) for r in out)
    # 80/20 against a 50/50 design: chi2 = (30^2/50)*2 = 36
    rows = [("a",)] * 80 + [("b",)] * 20
    df = spark.createDataFrame(rows, "arm string")
    r = srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    assert r.chi2 == pytest.approx(36.0)
    # arms outside the design are ignored, not crashed on
    rows = [("a",)] * 5 + [("b",)] * 5 + [("junk",)] * 3
    df = spark.createDataFrame(rows, "arm string")
    out = srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()
    assert {r.arm for r in out} == {"a", "b"}


# --- Theil ----------------------------------------------------------------------


def test_theil_equal_values_zero(spark):
    rows = [("g1", 5.0)] * 4 + [("g2", 5.0)] * 4
    df = spark.createDataFrame(rows, "g string, x double")
    r = theil_index(df, "g", "x").collect()[0]
    assert r.theil_total == pytest.approx(0.0, abs=1e-6)
    assert r.theil_within == pytest.approx(0.0, abs=1e-6)
    assert r.theil_between == pytest.approx(0.0, abs=1e-6)


def test_theil_decomposition_adds_up_and_excludes_nonpositive(spark):
    rows = [("g1", 1.0), ("g1", 2.0), ("g2", 4.0), ("g2", 8.0), ("g2", 0.0), ("g1", -3.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = theil_index(df, "g", "x").collect()[0]
    assert r.n == 4 and r.n_excluded == 2
    # hand: mu = 3.75; T = mean((x/mu)ln(x/mu))
    mu = 3.75
    t = sum((x / mu) * math.log(x / mu) for x in (1, 2, 4, 8)) / 4
    assert r.theil_total == pytest.approx(t, abs=1e-5)
    # decomposition identity (within + between == total, up to rounding)
    assert r.theil_within + r.theil_between == pytest.approx(
        r.theil_total, abs=1e-4
    )
    assert r.theil_between > 0  # the groups genuinely differ


# --- Jensen-Shannon ---------------------------------------------------------------


def test_jsd_identical_zero_disjoint_one_bit(spark):
    # identical distributions -> JSD 0
    rows = [("s1", v) for v in (1, 2, 3, 4)] + [("s2", v) for v in (1, 2, 3, 4)]
    out = jensen_shannon_pairs(_gv(spark, rows), "g", "v", n_bins=4).collect()
    assert out[0].jsd_bits == pytest.approx(0.0, abs=1e-6)
    # fully disjoint bin mass -> exactly 1 bit
    rows = [("s1", 0.0)] * 4 + [("s2", 100.0)] * 4
    out = jensen_shannon_pairs(_gv(spark, rows), "g", "v", n_bins=4).collect()
    assert out[0].jsd_bits == pytest.approx(1.0, abs=1e-6)


def test_jsd_pairs_cover_all_groups(spark):
    rows = [(f"s{i}", float(v)) for i in range(4) for v in range(i, i + 5)]
    out = jensen_shannon_pairs(_gv(spark, rows), "g", "v", n_bins=5).collect()
    assert len(out) == 6  # C(4,2)
    assert all(0.0 <= r.jsd_bits <= 1.0 for r in out)


# --- round 14: ADVICE r13 + VERDICT #1 hardening -----------------------------------


def test_srm_zero_traffic_arm_counted(spark):
    """ADVICE r13: an arm in the design that got NO traffic is the most
    extreme mismatch — it must contribute its (0-e)^2/e term and a row."""
    rows = [("a",)] * 60 + [("b",)] * 40
    df = spark.createDataFrame(rows, "arm string")
    out = {r.arm: r for r in srm_check(df, "arm", {"a": 0.4, "b": 0.4, "c": 0.2}).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["c"].observed == 0
    assert out["c"].expected_n == pytest.approx(20.0)
    # chi2 = (60-40)^2/40 + (40-40)^2/40 + (0-20)^2/20 = 10 + 0 + 20
    assert out["a"].chi2 == pytest.approx(30.0)


def test_theil_all_excluded_still_one_row(spark):
    """ADVICE r13: every value non-positive -> (n=0, n_excluded=N, NULL
    stats), not an empty DataFrame."""
    rows = [("g1", 0.0), ("g1", -1.0), ("g2", -2.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = theil_index(df, "g", "x").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 0 and r.n_excluded == 3
    assert r.mean is None and r.theil_total is None
    assert r.theil_within is None and r.theil_between is None


def test_smd_balance_rejects_non_identifier_covariates(spark):
    df = spark.createDataFrame([("a", 1.0)], "arm string, u double")
    for bad in ("u-v", "u v", "u'v", "u.v", ""):
        with pytest.raises(ValueError, match="identifier"):
            smd_balance(df, "arm", [bad])
    with pytest.raises(ValueError, match="at least one"):
        smd_balance(df, "arm", [])


def test_mann_whitney_and_ks_exclude_nan_like_null(spark):
    """ADVICE r13: a NaN value floors to a NULL bucket and would silently
    vanish from the cum table post-totals; both stats must EXCLUDE NaN
    alongside NULL so pre-join totals and joined rows stay consistent."""
    clean = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    dirty = clean + [("a", float("nan")), ("b", float("nan")), ("a", None)]
    dfc = spark.createDataFrame(clean, "g string, v double")
    dfd = spark.createDataFrame(dirty, "g string, v double")
    rc, rd = (
        mann_whitney_u(d, "g", "v", "a", "b").collect()[0] for d in (dfc, dfd)
    )
    assert (rd.n_a, rd.n_b, rd.u_a, rd.cliffs_delta) == (
        rc.n_a, rc.n_b, rc.u_a, rc.cliffs_delta
    )
    kc, kd = (
        ks_2samp_exact(d, "g", "v", "a", "b").collect()[0] for d in (dfc, dfd)
    )
    assert (kd.n_a, kd.n_b, kd.d) == (kc.n_a, kc.n_b, kc.d)


def test_rank_family_derived_width_spreads_tiny_range(spark):
    """VERDICT r13 #1: a value range far below any fixed guess (here
    [0, 1e-3)) must STILL spread across >1 bucket — the data-derived
    width kills the silent one-bucket degeneration — while staying
    bit-identical to the global-window definition."""
    from lakehouse_architecture_spark.operators.profiling import (
        _bucketed_value_prefix,
    )

    n = 64
    per_v = spark.createDataFrame(
        [(i * 1e-5, 1) for i in range(n)], "v double, c int"
    )
    out = _bucketed_value_prefix(per_v, ["c"], target_buckets=16, _keep_bucket=True)
    rows = out.orderBy("v").collect()
    assert [r.cum_c for r in rows] == list(range(1, n + 1))  # exact prefix
    n_buckets = len({r["__bkt"] for r in rows})
    assert 1 < n_buckets <= 16
    # degenerate single distinct value: one bucket is CORRECT, not silent
    one = spark.createDataFrame([(5.0, 3)], "v double, c int")
    r = _bucketed_value_prefix(one, ["c"]).collect()[0]
    assert r.cum_c == 3


def test_two_phase_rank_derived_width_matches_window(spark):
    """two_phase_rank(bucket_width=None) derives width in-plan; ranks must
    stay bit-identical to the single-window form on a range (0..1e-4)
    where the old fixed 50k default would collapse to one bucket."""
    from pyspark.sql import Window

    from lakehouse_architecture_spark.operators.skew import two_phase_rank

    rows = [(i % 3, (i * 7 % 97) * 1e-6, i) for i in range(97)]
    df = spark.createDataFrame(rows, "g int, v double, id int")
    fast = two_phase_rank(df, ["g"], "v", ["id"], bucket_width=None)
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    slow = df.withColumn("i", F.row_number().over(w).cast("bigint"))
    assert fast.orderBy("g", "i").collect() == slow.orderBy("g", "i").collect()
    # all-equal values: every rank still assigned, tiebreak order holds
    eq = spark.createDataFrame([(0, 1.0, i) for i in range(10)], "g int, v double, id int")
    got = two_phase_rank(eq, [], "v", ["id"], bucket_width=None, rank_col="r")
    assert [r.id for r in got.orderBy("r").collect()] == list(range(10))
