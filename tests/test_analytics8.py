"""Round-12 depth block: k-core, snapshot diff, CUPED, DiD, calibration,
Nelson-Aalen, compaction plan, Shapley attribution. Hand-computable cases +
invariants; exact end-to-end parity is the DuckDB oracle's job
(tools/oracle_check.py, LOCAL_ORACLE.json)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.analytics import (
    calibration_bins,
    cuped_adjusted,
    diff_in_diff,
    shapley_attribution,
    shapley_coalition_pairs,
)
from lakehouse_architecture_spark.operators.graph import k_core
from lakehouse_architecture_spark.operators.integrity import snapshot_diff_audit
from lakehouse_architecture_spark.operators.partitioning import compaction_plan
from lakehouse_architecture_spark.operators.timeseries import (
    kaplan_meier,
    nelson_aalen,
)


# --- k-core -------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in pairs]
    )


def test_k_core_peels_pendant_chain(spark):
    # triangle 1-2-3 with a pendant chain 3-4-5: the chain peels off in
    # two rounds (5 first, then 4), the triangle survives as the 2-core
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    out = {r.node: r.degree for r in k_core(e, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_k3_empties_triangle_plus_edge(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert k_core(e, k=3).count() == 0


def test_k_core_one_driver_action_per_round(spark, monkeypatch):
    """VERDICT r12 #6 / round 16: each DRIVER round must run exactly ONE
    action (the dropped-count aggregate that also populates the round's
    degree caches and flushes the lazy lineage cut), and round 16's
    two-peels-per-round unroll halves the driver rounds — counted by
    instrumenting DataFrame.collect/count/checkpoint, which is AQE-proof
    where raw job ids are not (AQE splits one action into several jobs)."""
    # pendant 2-chain off a triangle: peels 5, then 4, then confirms ->
    # peel levels (1,2) then (3) -> exactly 2 driver rounds -> exactly 2
    # driver actions inside k_core (was 3 with one peel per round)
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])

    # patch the CONCRETE DataFrame class (Spark 4 classic mode subclasses
    # pyspark.sql.DataFrame and overrides these methods)
    DF = type(e)
    calls = {"n": 0}
    for meth in ("collect", "count"):
        orig = getattr(DF, meth)

        def counting(self, *a, _orig=orig, **kw):
            calls["n"] += 1
            return _orig(self, *a, **kw)

        monkeypatch.setattr(DF, meth, counting)
    # eager checkpoints would be a hidden second action per round
    orig_ckpt = DF.checkpoint
    orig_lckpt = DF.localCheckpoint

    def no_eager(self, eager, _orig):
        assert not eager, "k_core must not eagerly checkpoint per round"
        return _orig(self, eager)

    monkeypatch.setattr(
        DF, "checkpoint",
        lambda self, eager=True: no_eager(self, eager, orig_ckpt),
    )
    monkeypatch.setattr(
        DF, "localCheckpoint",
        lambda self, eager=True: no_eager(self, eager, orig_lckpt),
    )
    core = k_core(e, k=2)
    assert calls["n"] == 2
    assert {r.node for r in core.collect()} == {1, 2, 3}


def test_k_core_exhausted_rounds_raises(spark):
    # a 3-chain needs 2 peel rounds at k=2; max_rounds=1 must raise, never
    # return a partially-peeled "core"
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_core(e, k=2, max_rounds=1)


def test_k_core_edges_unique_and_odd_rounds_parity(spark):
    """Round 16 internals: ``edges_unique=True`` (skips the defensive
    distinct) and the odd-``max_rounds`` single-level remainder path must
    both reproduce the default path's core exactly."""
    # unique canonical pairs (a < b, no duplicates): triangle + 2-chain +
    # a second triangle sharing node 3 — peel depth 2 at k=2
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 6), (3, 7), (6, 7)]
    e = _edges(spark, pairs)
    want = {(r.node, r.degree) for r in k_core(e, k=2).collect()}
    got_unique = {
        (r.node, r.degree)
        for r in k_core(e, k=2, edges_unique=True).collect()
    }
    assert got_unique == want
    # odd max_rounds exercises the single-level remainder round; the
    # fixpoint (and the raise contract, covered above) must not depend on
    # how levels pack into driver rounds
    got_odd = {
        (r.node, r.degree) for r in k_core(e, k=2, max_rounds=3).collect()
    }
    assert got_odd == want


# --- snapshot diff ------------------------------------------------------------


def test_diff_audit_statuses_and_column_drill(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, p=10.0, s="A"),
            Row(k=2, p=20.0, s="B"),
            Row(k=3, p=30.0, s="C"),  # removed
            Row(k=4, p=None, s="D"),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, p=10.0, s="A"),  # unchanged
            Row(k=2, p=25.0, s="B2"),  # both columns changed
            Row(k=4, p=None, s="D"),  # NULL == NULL -> unchanged
            Row(k=5, p=50.0, s="E"),  # added
        ]
    )
    out = {
        (r.kind, r.name): r.n
        for r in snapshot_diff_audit(old, new, ["k"], ["p", "s"]).collect()
    }
    assert out[("status", "added")] == 1
    assert out[("status", "removed")] == 1
    assert out[("status", "changed")] == 1
    assert out[("status", "unchanged")] == 2
    assert out[("column", "p")] == 1
    assert out[("column", "s")] == 1


def test_diff_audit_null_vs_value_is_changed(spark):
    old = spark.createDataFrame([Row(k=1, p=1.0)])
    new = spark.createDataFrame([(1, None)], "k long, p double")
    out = {
        (r.kind, r.name): r.n
        for r in snapshot_diff_audit(old, new, ["k"], ["p"]).collect()
    }
    assert out[("status", "changed")] == 1
    assert out[("column", "p")] == 1


# --- CUPED -------------------------------------------------------------------


def test_cuped_perfect_covariate_kills_variance(spark):
    # y = 3x exactly -> theta = 3, adjusted metric is constant per arm,
    # variance reduction ~1, and the adjusted diff equals the raw diff
    # shifted by theta * (arm covariate imbalance)
    rows = [
        Row(arm=i % 2, y=3.0 * x, x=float(x))
        for i, x in enumerate([1, 2, 3, 4, 5, 6, 7, 8])
    ]
    out = cuped_adjusted(spark.createDataFrame(rows), "arm", "y", "x").collect()[0]
    assert out.theta == pytest.approx(3.0)
    assert out.var_reduction == pytest.approx(1.0, abs=1e-6)
    # mean preservation: weighted adjusted means reproduce the grand mean
    grand = (out.n_a * out.adj_mean_a + out.n_b * out.adj_mean_b) / out.n
    raw = (out.n_a * out.mean_a + out.n_b * out.mean_b) / out.n
    assert grand == pytest.approx(raw, abs=1e-4)


def test_cuped_missing_covariate_units_kept_unadjusted(spark):
    rows = [
        Row(arm=0, y=10.0, x=1.0),
        Row(arm=0, y=12.0, x=None),
        Row(arm=1, y=20.0, x=2.0),
        Row(arm=1, y=22.0, x=None),
    ]
    out = cuped_adjusted(spark.createDataFrame(rows), "arm", "y", "x").collect()[0]
    assert out.n == 4 and out.n_a == 2 and out.n_b == 2
    # theta fit only on the two covariate-present units
    assert out.theta == pytest.approx((20.0 - 10.0) / (2.0 - 1.0))


# --- diff-in-diff ------------------------------------------------------------


def test_diff_in_diff_hand_cells(spark):
    rows = (
        [Row(g=0, p=0, v=10.0)] * 2
        + [Row(g=0, p=1, v=12.0)] * 2  # control drifts +2
        + [Row(g=1, p=0, v=20.0)] * 2
        + [Row(g=1, p=1, v=27.0)] * 2  # treated drifts +7
    )
    out = diff_in_diff(spark.createDataFrame(rows), "g", "p", "v").collect()[0]
    assert out.mean_c_pre == 10.0 and out.mean_t_post == 27.0
    assert out.did == pytest.approx(5.0)


# --- calibration -------------------------------------------------------------


def test_calibration_perfectly_calibrated_has_zero_reliability(spark):
    # bin centers 0.25 and 0.75, outcomes exactly at the bin's mean score
    rows = (
        [Row(s=0.25, y=1)] * 1
        + [Row(s=0.25, y=0)] * 3  # rate 0.25
        + [Row(s=0.75, y=1)] * 3
        + [Row(s=0.75, y=0)] * 1  # rate 0.75
    )
    out = {r.bin: r for r in calibration_bins(
        spark.createDataFrame(rows), "s", "y", n_bins=10
    ).collect()}
    assert out[2].event_rate == pytest.approx(0.25)
    assert out[7].event_rate == pytest.approx(0.75)
    summary = out[-1]
    assert summary.reliability == pytest.approx(0.0, abs=1e-9)
    # Murphy identity holds by construction
    assert summary.brier == pytest.approx(
        summary.reliability - summary.resolution + summary.uncertainty, abs=1e-6
    )
    # informative score: resolution strictly positive
    assert summary.resolution > 0


def test_calibration_overconfident_score_flags_reliability(spark):
    # score says 0.95 but the event rate is 0.5 -> reliability >> 0
    rows = [Row(s=0.95, y=i % 2) for i in range(20)]
    summary = {r.bin: r for r in calibration_bins(
        spark.createDataFrame(rows), "s", "y", n_bins=10
    ).collect()}[-1]
    assert summary.reliability == pytest.approx((0.95 - 0.5) ** 2, abs=1e-6)
    assert summary.resolution == pytest.approx(0.0, abs=1e-9)


# --- Nelson-Aalen ------------------------------------------------------------


def test_nelson_aalen_hand_case(spark):
    # durations: events at t=1 (2 of 4 at risk), t=2 (1 of 2); censored at
    # t=3 -> H(1) = 2/4, H(2) = 2/4 + 1/2 = 1.0
    rows = [
        Row(t=1, e=1),
        Row(t=1, e=1),
        Row(t=2, e=1),
        Row(t=3, e=0),
    ]
    out = {r.t: r for r in nelson_aalen(
        spark.createDataFrame(rows), "t", "e"
    ).collect()}
    assert out[1].n_risk == 4 and out[1].d == 2
    assert out[1].cum_hazard == pytest.approx(0.5)
    assert out[2].cum_hazard == pytest.approx(1.0)
    assert 3 not in out  # censoring-only durations emit no hazard row


def test_nelson_aalen_tracks_km(spark):
    # with large risk sets, exp(-H(t)) ~ KM S(t) (they agree to first
    # order); check the bound S <= exp(-H) which holds exactly because
    # 1 - x <= exp(-x)
    rows = [Row(t=int(i % 17), e=int(i % 3 != 0)) for i in range(200)]
    df = spark.createDataFrame(rows)
    na = {r.t: r.cum_hazard for r in nelson_aalen(df, "t", "e").collect()}
    km = {r.t: r.survival for r in kaplan_meier(df, "t", "e").collect()}
    assert set(na) == set(km)
    for t in na:
        assert km[t] <= math.exp(-na[t]) + 1e-9
    # cumulative hazard is nondecreasing in t
    ts = sorted(na)
    assert all(na[a] <= na[b] for a, b in zip(ts, ts[1:]))


# --- compaction plan ---------------------------------------------------------


def test_compaction_plan_running_sum_bins(spark):
    files = spark.createDataFrame(
        [Row(key=i, size=30) for i in range(1, 6)]  # 5 x 30 bytes
    )
    out = {r.bin: r for r in compaction_plan(
        files, "size", "key", target_bytes=50
    ).collect()}
    # priors 0,30,60,90,120 -> bins 0,0,1,1,2
    assert {b: (r.n_files, r.total_bytes) for b, r in out.items()} == {
        0: (2, 60), 1: (2, 60), 2: (1, 30)
    }
    assert out[0].first_key == 1 and out[0].last_key == 2


def test_compaction_plan_oversized_file_isolated(spark):
    files = spark.createDataFrame(
        [Row(key=1, size=120), Row(key=2, size=10), Row(key=3, size=10)]
    )
    out = {r.bin: r for r in compaction_plan(
        files, "size", "key", target_bytes=50
    ).collect()}
    # the oversized file opens bin 0 alone; the following files land past it
    assert out[0].n_files == 1 and out[0].total_bytes == 120
    assert out[2].n_files == 2 and out[2].total_bytes == 20


# --- Shapley attribution -----------------------------------------------------


def test_shapley_coalition_weights_sum_to_one():
    for k in (1, 2, 3, 4, 5):
        pairs = shapley_coalition_pairs(tuple(f"c{i}" for i in range(k)))
        per_channel = {}
        for c, _, _, w in pairs:
            per_channel[c] = per_channel.get(c, 0.0) + w
        for c, s in per_channel.items():
            assert s == pytest.approx(1.0, abs=1e-9), (c, s)


def test_shapley_hand_case_two_channels(spark):
    # exposure sets: {a}: 2 users 1 conv; {b}: 1 user 0 conv;
    # {a,b}: 1 user 1 conv; {}: 1 user 0 conv
    rows = [
        Row(u=1, et="a", conv=0), Row(u=1, et="purchase", conv=1),
        Row(u=2, et="a", conv=0),
        Row(u=3, et="b", conv=0),
        Row(u=4, et="a", conv=0), Row(u=4, et="b", conv=0),
        Row(u=4, et="purchase", conv=1),
        Row(u=5, et="other", conv=0),  # empty coalition (not a channel)
    ]
    df = spark.createDataFrame(rows)
    out = {r.channel: r.phi for r in shapley_attribution(
        df, "u", "et", (F.col("et") == "purchase"), ("a", "b")
    ).collect()}
    # phi_a = 1/2 [v(a)-v({})] + 1/2 [v(ab)-v(b)] = 0.25 + 0.5
    assert out["a"] == pytest.approx(0.75)
    assert out["b"] == pytest.approx(0.25)
    # efficiency: sum phi = v(full) - v(empty) = 1 - 0
    assert out["a"] + out["b"] == pytest.approx(1.0)


def test_shapley_rejects_oversized_channel_set(spark):
    df = spark.createDataFrame([Row(u=1, et="a")])
    with pytest.raises(ValueError, match="1-12"):
        shapley_attribution(
            df, "u", "et", F.lit(False), tuple(f"c{i}" for i in range(13))
        )
