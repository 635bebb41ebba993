"""Round-12 closing block: Spearman, burstiness, entropy rate, WoE/IV,
funnel time-to-convert. Hand-computable cases + invariants; exact
end-to-end parity is the DuckDB oracle's job (LOCAL_ORACLE.json)."""

import datetime
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.features import woe_iv
from lakehouse_architecture_spark.operators.profiling import (
    spearman_corr,
    transition_entropy,
)
from lakehouse_architecture_spark.operators.timeseries import (
    burstiness,
    funnel_time_to_convert,
)


def _xy(spark, pairs):
    return spark.createDataFrame([Row(x=float(a), y=float(b)) for a, b in pairs])


# --- Spearman ------------------------------------------------------------------


def test_spearman_monotone_is_one(spark):
    out = spearman_corr(_xy(spark, [(1, 10), (2, 300), (3, 301), (4, 9000)]), "x", "y").collect()[0]
    assert out.rho == pytest.approx(1.0)
    out = spearman_corr(_xy(spark, [(1, 10), (2, 5), (3, 4), (4, 1)]), "x", "y").collect()[0]
    assert out.rho == pytest.approx(-1.0)


def test_spearman_midrank_ties(spark):
    # scipy.stats.spearmanr([1,2,3,4], [10,20,20,30]) = 0.94868...
    out = spearman_corr(_xy(spark, [(1, 10), (2, 20), (3, 20), (4, 30)]), "x", "y").collect()[0]
    assert out.n == 4
    assert out.rho == pytest.approx(0.948683, abs=1e-6)


def test_spearman_constant_side_is_null(spark):
    out = spearman_corr(_xy(spark, [(1, 5), (2, 5), (3, 5)]), "x", "y").collect()[0]
    assert out.rho is None  # zero rank variance -> undefined, never a crash


# --- burstiness ----------------------------------------------------------------


def _events(spark, rows):
    d0 = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(
                user_id=u,
                ts=d0 + datetime.timedelta(seconds=s),
                event_type=t,
                event_id=i,
            )
            for i, (u, s, t) in enumerate(rows)
        ]
    )


def test_burstiness_periodic_is_minus_one(spark):
    # perfectly periodic gaps -> sigma = 0 -> B = -1
    rows = [(1, 60 * i, "tick") for i in range(10)]
    out = burstiness(_events(spark, rows), "user_id", "ts", "event_type", "event_id").collect()[0]
    assert out.n_gaps == 9
    assert out.mean_gap_s == pytest.approx(60.0)
    assert out.std_gap_s == pytest.approx(0.0)
    assert out.burstiness == pytest.approx(-1.0)


def test_burstiness_bursty_positive(spark):
    # nine 1-second gaps then one enormous gap: sigma >> mu. The finite-n
    # ceiling is (sqrt(n-1)-1)/(sqrt(n-1)+1) = 0.5 at n=10 gaps — one
    # dominant gap drives B essentially to it
    secs = list(range(10)) + [100000]
    rows = [(1, s, "tick") for s in secs]
    out = burstiness(_events(spark, rows), "user_id", "ts", "event_type", "event_id").collect()[0]
    assert 0.4 < out.burstiness <= 0.52


def test_burstiness_groups_by_current_event_type(spark):
    rows = [(1, 0, "a"), (1, 10, "b"), (1, 30, "b")]
    out = {r.event_type: r for r in burstiness(
        _events(spark, rows), "user_id", "ts", "event_type", "event_id"
    ).collect()}
    # gap rows: the 10s gap belongs to the first 'b', the 20s to the second
    assert "a" not in out  # first event has no gap
    assert out["b"].n_gaps == 2 and out["b"].mean_gap_s == pytest.approx(15.0)


# --- conditional entropy rate ----------------------------------------------------


def test_transition_entropy_deterministic_chain_is_zero(spark):
    # a -> b -> a -> b ...: next is fully determined by prev -> H = 0
    rows = [(1, i, "a" if i % 2 == 0 else "b") for i in range(20)]
    out = transition_entropy(_events(spark, rows), "user_id", "ts", "event_type", "event_id").collect()[0]
    assert out.cond_entropy_bits == pytest.approx(0.0, abs=1e-9)
    assert out.n_states == 2
    assert out.normalized == pytest.approx(0.0, abs=1e-9)


def test_transition_entropy_uniform_is_max(spark):
    # from each of a/b, next is a or b with equal counts -> H = 1 bit
    seq = ["a", "a", "b", "b", "a"]  # transitions: aa, ab, bb, ba
    rows = [(1, i, t) for i, t in enumerate(seq)]
    out = transition_entropy(_events(spark, rows), "user_id", "ts", "event_type", "event_id").collect()[0]
    assert out.n_transitions == 4
    assert out.cond_entropy_bits == pytest.approx(1.0, abs=1e-6)
    assert out.max_bits == pytest.approx(1.0)
    assert out.normalized == pytest.approx(1.0, abs=1e-6)


def test_transition_entropy_counts_terminal_states(spark):
    """ADVICE r12: a state appearing only as a successor (terminal event
    type) must count toward |states| — else max_bits understates the
    log2|states| ceiling and normalized can exceed 1."""
    # a -> b -> c, c terminal (never a prev); prev-only counting would say
    # 2 states; the union says 3
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "c")]
    out = transition_entropy(
        _events(spark, rows), "user_id", "ts", "event_type", "event_id"
    ).collect()[0]
    assert out.n_states == 3
    assert out.max_bits == pytest.approx(math.log2(3), abs=1e-6)
    assert out.normalized <= 1.0


# --- WoE / IV ------------------------------------------------------------------


def test_woe_iv_hand_case(spark):
    # cat A: 30 good / 10 bad; cat B: 10 good / 30 bad; totals 40/40
    rows = (
        [Row(c="A", bad=0)] * 30 + [Row(c="A", bad=1)] * 10
        + [Row(c="B", bad=0)] * 10 + [Row(c="B", bad=1)] * 30
    )
    out = {r.category: r for r in woe_iv(
        spark.createDataFrame(rows), "c", F.col("bad") == 1
    ).collect()}
    woe_a = math.log((30 / 40) / (10 / 40))
    assert out["A"].woe == pytest.approx(round(woe_a, 9))
    assert out["B"].woe == pytest.approx(-round(woe_a, 9))
    iv = 2 * (30 / 40 - 10 / 40) * woe_a
    assert out["(total)"].iv_term == pytest.approx(iv, abs=1e-6)
    assert out["(total)"].n == 80 and out["(total)"].n_bad == 40


def test_woe_iv_uninformative_category_near_zero(spark):
    rows = [Row(c="A", bad=i % 2) for i in range(40)] + [
        Row(c="B", bad=i % 2) for i in range(40)
    ]
    out = {r.category: r for r in woe_iv(
        spark.createDataFrame(rows), "c", F.col("bad") == 1
    ).collect()}
    assert out["(total)"].iv_term == pytest.approx(0.0, abs=1e-9)


def test_woe_iv_empty_cell_epsilon_floored(spark):
    # a category with zero bads must produce a finite WOE, not inf
    rows = [Row(c="A", bad=0)] * 10 + [Row(c="B", bad=1)] * 10
    out = {r.category: r for r in woe_iv(
        spark.createDataFrame(rows), "c", F.col("bad") == 1
    ).collect()}
    assert math.isfinite(out["A"].woe) and math.isfinite(out["B"].woe)


# --- funnel time-to-convert -------------------------------------------------------


def test_funnel_ttc_hand_case(spark):
    # two converting users: view->click 10s/20s, click->purchase 5s/15s
    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 15, "purchase"),
        (2, 0, "view"), (2, 20, "click"), (2, 35, "purchase"),
        (3, 0, "view"),  # never converts past view
    ]
    out = {(r.step_from, r.step_to): r for r in funnel_time_to_convert(
        _events(spark, rows), "user_id", "ts", "event_type",
        steps=("view", "click", "purchase"),
        qs={"p50": 0.5}, bucket_width=5.0,
    ).collect()}
    assert out[("view", "click")].p50 == pytest.approx(15.0)  # median of 10, 20
    assert out[("click", "purchase")].p50 == pytest.approx(10.0)  # of 5, 15
    assert len(out) == 2


def test_funnel_ttc_strict_order(spark):
    # the click BEFORE the view must not count: user converts only via the
    # post-view click at t=30
    rows = [(1, 5, "click"), (1, 10, "view"), (1, 30, "click")]
    out = funnel_time_to_convert(
        _events(spark, rows), "user_id", "ts", "event_type",
        steps=("view", "click"), qs={"p50": 0.5}, bucket_width=5.0,
    ).collect()
    assert len(out) == 1
    assert out[0].p50 == pytest.approx(20.0)
