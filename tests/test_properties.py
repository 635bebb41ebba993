"""Property-based spot checks (SURVEY.md §5.4): cleaning expressions against
a Python reimplementation of the reference UDFs, dedup idempotence, and
merge-upsert algebra, over hypothesis-generated inputs."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.cleaning import (
    normalize_price_expr,
    parse_area_expr,
)
from lakehouse_architecture_spark.operators.dedup import dedup_keep_first
from lakehouse_architecture_spark.operators.upsert import merge_upsert

_NUM = re.compile(r"[\d,\.]+")


def _py_parse_area(s):
    """Reference semantics (app/sliver.py:41-51): first numeric token,
    comma -> decimal point, float(); unparseable -> None."""
    if s is None:
        return None
    m = _NUM.search(s)
    if not m:
        return None
    try:
        return float(m.group(0).replace(",", "."))
    except ValueError:
        return None


def _py_normalize_price(s):
    """Reference semantics (app/sliver.py:63-83)."""
    if s is None:
        return None
    low = s.lower()
    num = _py_parse_area(s)
    if "tỷ" in low:
        return num
    if "triệu" in low:
        return num / 1000.0 if num is not None else None
    digits = re.sub(r"[^\d]", "", s)
    return float(digits) / 1e9 if digits else None


# text strategy biased toward the interesting shapes: numbers, commas,
# Vietnamese units, junk
_price_text = st.one_of(
    st.text(max_size=12),
    st.builds(
        lambda a, b, unit: f"{a},{b} {unit}",
        st.integers(0, 99),
        st.integers(0, 9),
        st.sampled_from(["tỷ", "triệu", "đồng", ""]),
    ),
    st.integers(0, 10**10).map(str),
)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_price_text, min_size=1, max_size=8))
def test_cleaning_matches_reference_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = df.select(
        parse_area_expr(F.col("s")).alias("area"),
        normalize_price_expr(F.col("s")).alias("price"),
    ).collect()
    for v, row in zip(values, got):
        assert row["area"] == _py_parse_area(v), f"area({v!r})"
        assert row["price"] == _py_normalize_price(v), f"price({v!r})"


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 9)),
        min_size=1,
        max_size=20,
    )
)
def test_dedup_keep_first_idempotent(spark, rows):
    df = spark.createDataFrame(
        [(k, o, v) for k, o, v in rows], "k int, ord int, v int"
    )
    once = dedup_keep_first(df, ["k"], "ord")
    twice = dedup_keep_first(once, ["k"], "ord")
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b  # idempotence
    assert len(a) == len({k for k, _, _ in rows})  # one row per key


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.integers(0, 8), st.text(max_size=3)), max_size=10),
    st.lists(st.tuples(st.integers(0, 8), st.text(max_size=3)), max_size=10),
)
def test_merge_upsert_last_writer_wins(spark, base, updates):
    # dedupe inputs per key (merge semantics assume keyed relations)
    base_d = {k: v for k, v in base}
    upd_d = {k: v for k, v in updates}
    target = spark.createDataFrame(
        [(k, v) for k, v in base_d.items()], "k int, v string"
    ) if base_d else spark.createDataFrame([], "k int, v string")
    upd = spark.createDataFrame(
        [(k, v) for k, v in upd_d.items()], "k int, v string"
    ) if upd_d else spark.createDataFrame([], "k int, v string")
    merged = {r["k"]: r["v"] for r in merge_upsert(target, upd, ["k"]).collect()}
    assert merged == {**base_d, **upd_d}  # dict-update algebra


# --- URL canonicalization properties --------------------------------------

_SCHEMES = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
_HOSTS = st.from_regex(r"(www\.)?[A-Za-z][A-Za-z0-9\-]{0,10}(\.[A-Za-z]{2,4}){1,2}", fullmatch=True)
_PORTS = st.sampled_from(["", ":80", ":443", ":8080"])
_PATHS = st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,3}/?", fullmatch=True)
_PARAMS = st.lists(
    st.from_regex(r"(utm_[a-z]{1,6}|gclid|ref|[a-z]{1,5})=[A-Za-z0-9]{0,6}", fullmatch=True),
    max_size=4,
)
_FRAGS = st.sampled_from(["", "#x", "#frag-1"])


@st.composite
def _urls(draw):
    qs = "&".join(draw(_PARAMS))
    return (
        draw(_SCHEMES)
        + "://"
        + draw(_HOSTS)
        + draw(_PORTS)
        + draw(_PATHS)
        + (("?" + qs) if qs else "")
        + draw(_FRAGS)
    )


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_urls(), min_size=1, max_size=20))
def test_canonicalize_url_idempotent(spark, urls):
    """canon(canon(u)) == canon(u), and no canonical form retains a
    fragment, a tracking parameter, or a default port."""
    from lakehouse_architecture_spark.operators.web import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonicalize_url("url").alias("c1"))
    twice = once.select(F.col("c1"), canonicalize_url("c1").alias("c2"))
    for r in twice.collect():
        assert r.c2 == r.c1, (r.c1, r.c2)
        assert "#" not in r.c1
        assert "utm_" not in r.c1 and "gclid" not in r.c1
        assert not re.search(r"^http://[^/?]*:80(/|\?|$)", r.c1)
        assert not re.search(r"^https://[^/?]*:443(/|\?|$)", r.c1)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    """Two-phase sort-scan frontier == the O(n^2) dominance definition."""
    from lakehouse_architecture_spark.operators.relational import pareto_frontier_2d

    rows = [(i, p, s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "price", "size"]).repartition(4)
    got = {
        r["id"]
        for r in pareto_frontier_2d(
            df, minimize="price", maximize="size", tiebreak="id"
        ).collect()
    }

    def dominated(a):
        i, p, s = a
        for j, q, t in rows:
            if j == i:
                continue
            if q <= p and t >= s and (q < p or t > s or j < i):
                # weak dominance incl. exact ties broken by earlier id
                return True
        return False

    expect = {i for i, p, s in rows if not dominated((i, p, s))}
    assert got == expect


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), max_size=12),
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 100), st.booleans()),
        max_size=12,
    ),
)
def test_merge_delete_algebra(spark, target_rows, update_rows):
    """MERGE with a delete condition == the set algebra done in Python:
    dedup update keys last-wins, matched deletes evict, survivors upsert."""
    tgt = {k: v for k, v in target_rows}
    upd = {}
    for k, v, d in update_rows:  # last row per key wins, as dropDuplicates
        upd.setdefault(k, (v, d))
    expect = dict(tgt)
    for k, (v, d) in upd.items():
        if d:
            expect.pop(k, None)  # delete: evict match, never insert
        else:
            expect[k] = v

    target = spark.createDataFrame(
        [(k, v) for k, v in tgt.items()] or [(None, None)], "k int, v int"
    ).filter("k IS NOT NULL")
    updates = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in upd.items()] or [(None, None, None)],
        "k int, v int, del boolean",
    ).filter("k IS NOT NULL")
    merged = merge_upsert(
        target, updates, ["k"], delete_condition="del", evolve_schema=True
    ).select("k", "v")
    assert {(r["k"], r["v"]) for r in merged.collect()} == set(expect.items())


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda v: tuple(v),
    ).filter(lambda vs: all(any(abs(x) > 1e-3 for x in v) for v in vs))
)
def test_semdedup_prune_monotone_in_threshold(spark, vecs):
    """A stricter (higher) cosine threshold can only prune a SUBSET of what
    a looser one prunes — cells are threshold-independent, so the pair set
    shrinks monotonically."""
    from lakehouse_architecture_spark.operators.similarity import semdedup_prune

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    loose = {
        r["vec_id"]
        for r in semdedup_prune(df, n_cells=2, min_cos=0.5).collect()
        if r["pruned"]
    }
    strict = {
        r["vec_id"]
        for r in semdedup_prune(df, n_cells=2, min_cos=0.9).collect()
        if r["pruned"]
    }
    assert strict <= loose


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=10),
    st.lists(st.booleans(), min_size=1, max_size=10),
)
def test_dsir_scores_shift_invariant_to_doc_ids(spark, texts, flags):
    """Scores depend on corpus content, not on row ids/order: permuting
    document ids yields the same (text, target) -> score mapping."""
    from lakehouse_architecture_spark.operators.curation import dsir_scores

    n = len(texts)
    flags = (flags * n)[:n]
    rows = [(i, t, f) for i, (t, f) in enumerate(zip(texts, flags))]
    perm = [((i * 7 + 3) % n, t, f) for i, (t, f) in enumerate(zip(texts, flags))]
    if len({r[0] for r in perm}) != n:
        perm = [(n - 1 - i, t, f) for i, (t, f) in enumerate(zip(texts, flags))]
    df1 = spark.createDataFrame(rows, "doc_id int, text string, tgt boolean")
    df2 = spark.createDataFrame(perm, "doc_id int, text string, tgt boolean")
    s1 = {
        (rows[r["doc_id"]][1], rows[r["doc_id"]][2]): r["dsir_score"]
        for r in dsir_scores(df1, "doc_id", "text", F.col("tgt")).collect()
    }
    by_id2 = {r[0]: (r[1], r[2]) for r in perm}
    s2 = {
        by_id2[r["doc_id"]]: r["dsir_score"]
        for r in dsir_scores(df2, "doc_id", "text", F.col("tgt")).collect()
    }
    assert s1 == s2


# --- exact_quantiles vs Spark percentile (round 10) ------------------------


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(-1000, 1000).map(float),
            st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False),
            st.sampled_from([0.0, -0.0, 1e-6, 123.456]),  # tie fodder
        ),
        min_size=1,
        max_size=60,
    ),
    groups=st.integers(1, 3),
    qs=st.lists(
        st.floats(0.0, 1.0, allow_nan=False), min_size=1, max_size=4
    ),
    bw=st.sampled_from([0.7, 13.0, 250.0, 10_000.0]),
)
def test_exact_quantiles_bitmatch_spark_percentile(spark, vals, groups, qs, bw):
    """Randomized parity for the bounded-state quantile path: the claim is
    BIT-compatibility with Spark's Percentile interpolation at any
    bucket_width — ties, negative values, -0.0, single-element groups,
    q=0/1 endpoints, widths from finer-than-data to one-bucket-holds-all.
    (The plan guard forbids raw-row percentile in production queries;
    this test is the only place the two paths legitimately meet.)"""
    rows = [(i % groups, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, v double")
    names = {f"q{i}": q for i, q in enumerate(qs)}

    from lakehouse_architecture_spark.operators.skew import exact_quantiles

    got = {
        r["g"]: [r[n] for n in names]
        for r in exact_quantiles(df, ["g"], "v", names, bw).collect()
    }
    agg = [
        F.expr(f"percentile(v, {q!r})").alias(n) for n, q in names.items()
    ]
    want = {
        r["g"]: [r[n] for n in names]
        for r in df.groupBy("g").agg(*agg).collect()
    }
    assert set(got) == set(want)
    for g in want:
        for a, b in zip(got[g], want[g]):
            assert a == b or (a is None and b is None), (g, got[g], want[g])


# Round 16 (VERDICT r15 #1): heavy plan-executing / randomized-fuzz
# suite, gated out of the default (driver-budget) run; run with
# pytest -m slow  (or -m 'slow or not slow' for everything).
# See pytest.ini.
import pytest  # noqa: E402  (slow-marker gate)
pytestmark = pytest.mark.slow
