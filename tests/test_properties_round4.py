"""Property-based invariants for the round-4 operators: randomized
parity with naive reference formulations."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([1.0, 3.0, 7.5, 100.0]),
)
def test_two_phase_rank_parity_random(spark, rows, width):
    from lakehouse_architecture_spark.operators.skew import two_phase_rank

    df = spark.createDataFrame(
        [(g, float(v), i) for i, (g, v) in enumerate(rows)],
        "g string, v double, id long",
    )
    fast = two_phase_rank(df, ["g"], "v", ["id"], bucket_width=width)
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
    slow = df.withColumn("i", F.row_number().over(w))
    assert {(r["g"], r["id"], r["i"]) for r in fast.collect()} == {
        (r["g"], r["id"], r["i"]) for r in slow.collect()
    }


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ),
    st.sampled_from([2.0, 5.0, 11.0]),
)
def test_interval_overlap_join_parity_random(spark, ls, rs, width):
    """Bucketed overlap join == naive cross-join filter, exactly once per
    pair, for random inclusive intervals."""
    from lakehouse_architecture_spark.operators.relational import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(i, float(s), float(s + d)) for i, (s, d) in enumerate(ls)],
        "lid int, ls double, le double",
    )
    right = spark.createDataFrame(
        [(i, float(s), float(s + d)) for i, (s, d) in enumerate(rs)],
        "rid int, rs double, re double",
    )
    fast = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_width=width
        ).collect()
    )
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    assert fast == naive


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=200, unique=True))
def test_bloom_never_false_negative(spark, keys):
    """Every present key must be admitted by its file's bloom (false
    positives allowed, false negatives never)."""
    import tempfile

    from lakehouse_architecture_spark.sources.manifest import (
        bloom_pruned_read,
        file_bloom_manifest,
    )

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        spark.createDataFrame([(k,) for k in keys], "k long").repartition(
            4
        ).write.parquet(path)
        bloom = file_bloom_manifest(spark, path, "k").localCheckpoint(
            eager=True
        )
        for k in keys[:5]:  # spot-check a handful per example
            got = bloom_pruned_read(spark, path, bloom, "k", k).collect()
            assert [r["k"] for r in got] == [k]


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("xy"), st.integers(-100, 100)),
        min_size=4,
        max_size=50,
    )
)
def test_standard_scale_moments(spark, rows):
    """Scaled values within a multi-row group have mean ~0 and |z| finite;
    NULL only when the group variance is zero or n == 1. Integer-valued
    inputs: the operator's moments run through DECIMAL(38,6), so variance
    below ~1e-12 legitimately rounds to zero (documented precision floor)
    — the invariant is asserted inside the supported domain."""
    from lakehouse_architecture_spark.operators.features import standard_scale

    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    )
    out = standard_scale(df, "v", ["g"]).collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    for g, rs in by_g.items():
        vals = [r["v"] for r in rs]
        zs = [r["z"] for r in rs]
        if len(vals) > 1 and len(set(vals)) > 1:
            assert all(z is not None for z in zs)
            assert abs(sum(zs) / len(zs)) < 1e-4
        else:
            assert all(z is None for z in zs)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.sampled_from("pq")),
        min_size=1,
        max_size=20,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 40),
            st.sampled_from("pq"),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from(["backward", "forward"]),
    st.sampled_from([None, 5.0]),
)
def test_asof_join_matches_pandas_merge_asof(spark, ls, rs, direction, tol):
    """Randomized parity with pandas.merge_asof — the reference semantics
    the operator documents, including NULL-bearing value columns (the
    round-3 ADVICE fix: matches must stay row-atomic) and tolerance."""
    import pandas as pd

    from lakehouse_architecture_spark.operators.relational import asof_join

    lrows = [(i, k, float(t)) for i, (t, k) in enumerate(ls)]
    rrows = [
        (k, float(t), None if v is None else float(v))
        for t, k, v in rs
    ]
    # merge_asof requires unique-ish sorted keys per frame; drop duplicate
    # (key, time) pairs on the right so "nearest" is unambiguous
    seen = set()
    runiq = []
    for k, t, v in rrows:
        if (k, t) not in seen:
            seen.add((k, t))
            runiq.append((k, t, v))
    left = spark.createDataFrame(lrows, "lid long, k string, lt double")
    right = spark.createDataFrame(runiq, "k string, rt double, v double")
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, "k", "lt", "rt", ["v"],
            direction=direction, tolerance=tol,
        ).collect()
    }

    lp = pd.DataFrame(lrows, columns=["lid", "k", "lt"]).sort_values("lt", kind="stable")
    rp = pd.DataFrame(runiq, columns=["k", "rt", "v"]).sort_values("rt", kind="stable")
    kw = {} if tol is None else {"tolerance": tol}
    m = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k",
        direction=direction, **kw,
    )
    want = {
        int(r.lid): (None if pd.isna(r.v) else float(r.v))
        for r in m.itertuples()
    }
    assert got == want


# --- graph operators vs brute force (round 11) -----------------------------
#
# connected_components was rewritten in round 10 (pointer jumping,
# O(log diameter)); the scenario tests pin a chain and a clique. This
# fuzz drives RANDOM multigraphs (self-loops, duplicate and reversed
# edges included) against a plain Python union-find with min-id
# canonicals, and triangle_stats against an O(n^3) brute force.

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    from lakehouse_architecture_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want, (sorted(got)[:8], sorted(want)[:8])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_triangle_stats_matches_bruteforce(spark, edges):
    from itertools import combinations

    from lakehouse_architecture_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    row = triangle_stats(df).collect()[0]

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {n for e in simple for n in e}
    adj = {n: set() for n in nodes}
    for a, b in simple:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for x, y, z in combinations(sorted(nodes), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    wedges = sum(d * (d - 1) // 2 for d in (len(adj[n]) for n in nodes))
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(simple)
    assert row["n_triangles"] == tri, (row["n_triangles"], tri)
    assert row["n_wedges"] == wedges, (row["n_wedges"], wedges)


# Round 16 (VERDICT r15 #1): heavy plan-executing / randomized-fuzz
# suite, gated out of the default (driver-budget) run; run with
# pytest -m slow  (or -m 'slow or not slow' for everything).
# See pytest.ini.
import pytest  # noqa: E402  (slow-marker gate)
pytestmark = pytest.mark.slow
