"""Unit tests for composite relational + dedup + similarity operators on
tiny literal DataFrames (edge cases the oracle suite can't isolate)."""

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.dedup import (
    dedup_keep_first,
    exact_duplicates,
    ngram_jaccard_pairs,
    word_shingles,
)
from lakehouse_architecture_spark.operators.relational import (
    asof_join,
    range_join_bucketed,
    top_k_per_group,
)
from lakehouse_architecture_spark.operators.similarity import brute_force_knn


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "g string, id int, v double",
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 2)
    got = {(r["g"], r["id"], r["rn"]) for r in out.collect()}
    assert got == {("a", 2, 1), ("a", 3, 2), ("b", 4, 1)}


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")], "k int, t int, name string"
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (1, 20, 300.0), (2, 9, 400.0)],
        "k int, t int, v double",
    )
    out = asof_join(
        left,
        right.withColumnRenamed("t", "rt"),
        on="k",
        left_time="t",
        right_time="rt",
        value_cols=["v"],
    )
    got = {(r["k"], r["t"], r["v"]) for r in out.collect()}
    # t=20 matches the equal-time right row (non-strict); t=5 on k=2 has no
    # earlier right row -> NULL
    assert got == {(1, 10, 100.0), (1, 20, 300.0), (2, 5, None)}


def test_range_join_bucketed_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, float(i * 7 % 50)) for i in range(40)], "pid int, x double"
    )
    intervals = spark.createDataFrame(
        [(j, float(j * 5), float(j * 5 + 8)) for j in range(10)],
        "iid int, lo double, hi double",
    )
    fast = {
        (r["pid"], r["iid"])
        for r in range_join_bucketed(points, intervals, "x", "lo", "hi", 8.0).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .collect()
    }
    assert fast == naive and len(naive) > 0


def test_exact_duplicates_and_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 20), (3, "y", 30)], "id int, key string, ord int"
    )
    dups = exact_duplicates(df, ["key"], "id").collect()
    assert [(r["key"], r["canonical_id"], r["group_size"]) for r in dups] == [("x", 1, 2)]

    kept = dedup_keep_first(df, ["key"], "ord")
    got = {(r["key"], r["id"]) for r in kept.collect()}
    assert got == {("x", 1), ("y", 3)}


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "id int, text string")
    got = {r["shingle"] for r in word_shingles(df, "id", "text", 3).collect()}
    assert got == {"a b c", "b c d"}


def test_word_shingles_short_doc_emits_nothing(spark):
    # a doc with < n tokens must produce NO shingles, not one truncated one
    df = spark.createDataFrame(
        [(1, "a b"), (2, "solo"), (3, "a b c")], "id int, text string"
    )
    got = {(r["id"], r["shingle"]) for r in word_shingles(df, "id", "text", 3).collect()}
    assert got == {(3, "a b c")}


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "completely different text here now")],
        "doc_id int, text string",
    )
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs] == [(1, 2, 1.0)]


def test_connected_components_chain_and_clique(spark):
    from lakehouse_architecture_spark.operators.graph import (
        connected_components,
        dedup_clusters,
    )

    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, isolated pair {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a int, id_b int",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 99]], "doc_id int")
    clusters = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_clusters(docs, edges, "doc_id").collect()
    }
    # docs without edges are their own canonical
    assert clusters == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 99: 99}


def test_brute_force_knn_self_similarity(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),   # near 1
            (3, [0.0, 1.0, 0.0]),   # orthogonal to 1
        ],
        "vec_id int, embedding array<float>",
    )
    out = brute_force_knn(df, df.filter(F.col("vec_id") == 1), k=2).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [2, 3]


def test_funnel_strict_ordering(spark):
    import datetime as dt

    from lakehouse_architecture_spark.operators.timeseries import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    s = lambda m: t0 + dt.timedelta(minutes=m)
    rows = [
        # user 1: full ordered funnel
        (1, s(0), "view"), (1, s(1), "click"), (1, s(2), "purchase"),
        # user 2: clicked BEFORE viewing -> click must not count
        (2, s(0), "click"), (2, s(1), "view"),
        # user 3: view then purchase without click -> purchase must not count
        (3, s(0), "view"), (3, s(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r["n_users"] for r in funnel_counts(
        df, "user_id", "ts", "event_type", ("view", "click", "purchase")).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}

    # the N-pass join fallback must agree exactly on the same edge cases
    joined = {r["step"]: r["n_users"] for r in funnel_counts(
        df, "user_id", "ts", "event_type", ("view", "click", "purchase"),
        mode="joins").collect()}
    assert joined == out


def test_funnel_modes_parity_on_events_fixture(spark):
    """Array and N-pass-join funnels are the same operator at different
    scale points — assert exact parity on the real events table."""
    from lakehouse_architecture_spark.catalog import load_tables
    from lakehouse_architecture_spark.operators.timeseries import funnel_counts

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    steps = ("view", "click", "purchase")
    array_form = {
        (r["step"], r["step_index"], r["n_users"])
        for r in funnel_counts(ev, "user_id", "ts", "event_type", steps).collect()
    }
    join_form = {
        (r["step"], r["step_index"], r["n_users"])
        for r in funnel_counts(
            ev, "user_id", "ts", "event_type", steps, mode="joins"
        ).collect()
    }
    assert array_form == join_form
    assert len(array_form) == 3


def test_funnel_per_user_cap_guard(spark):
    """VERDICT r12 #4: the funnel family's array mode caps per-user state.
    exceed='raise' fails at execution with the offending user; 'truncate'
    keeps the FIRST max events deterministically; a cap larger than any
    user is a no-op; non-step events never count against the cap."""
    import datetime

    import pytest

    from lakehouse_architecture_spark.operators.timeseries import (
        funnel_counts,
        funnel_time_to_convert,
    )

    s = lambda i: datetime.datetime(2024, 1, 1, 0, 0, i)  # noqa: E731
    steps = ("view", "click", "purchase")
    rows = [(1, s(i), "view") for i in range(5)] + [
        (1, s(6), "click"), (1, s(7), "purchase"),
        (2, s(0), "view"), (2, s(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    # raise: user 1 has 7 step events > cap 3
    with pytest.raises(Exception, match="max_events_per_user=3"):
        funnel_counts(
            df, "user_id", "ts", "event_type", steps, max_events_per_user=3
        ).collect()
    with pytest.raises(Exception, match="max_events_per_user=3"):
        funnel_time_to_convert(
            df, "user_id", "ts", "event_type", steps, max_events_per_user=3
        ).collect()

    # truncate: user 1's first 3 events are all views -> no click/purchase
    out = {r["step"]: r["n_users"] for r in funnel_counts(
        df, "user_id", "ts", "event_type", steps,
        max_events_per_user=3, exceed="truncate",
    ).collect()}
    assert out == {"view": 2, "click": 1, "purchase": 0}

    # generous cap: identical to uncapped
    uncapped = {r["step"]: r["n_users"] for r in funnel_counts(
        df, "user_id", "ts", "event_type", steps, max_events_per_user=None
    ).collect()}
    capped = {r["step"]: r["n_users"] for r in funnel_counts(
        df, "user_id", "ts", "event_type", steps, max_events_per_user=100
    ).collect()}
    assert capped == uncapped == {"view": 2, "click": 2, "purchase": 1}

    # non-step events are pre-filtered and never count against the cap
    noisy = df.union(spark.createDataFrame(
        [(2, s(2 + i), "scroll") for i in range(50)],
        "user_id long, ts timestamp, event_type string",
    ))
    out = {r["step"]: r["n_users"] for r in funnel_counts(
        noisy, "user_id", "ts", "event_type", steps, max_events_per_user=7
    ).collect()}
    assert out == {"view": 2, "click": 2, "purchase": 1}

    # bad exceed value is an immediate ValueError
    with pytest.raises(ValueError, match="exceed"):
        funnel_counts(
            df, "user_id", "ts", "event_type", steps, exceed="ignore"
        )


def test_lsh_bucket_cap_degenerate_corpus(spark):
    """max_bucket drops quadratic-blowup buckets: a corpus of identical
    vectors collapses into ONE signature bucket; with the cap set below the
    corpus size that bucket emits no candidate pairs."""
    from lakehouse_architecture_spark.operators.similarity import lsh_bucket_pairs

    vec = [1.0] + [0.0] * 7
    distinct = [0.0] * 7 + [1.0]
    rows = [(i, vec) for i in range(20)] + [(100, distinct), (101, distinct)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    uncapped = lsh_bucket_pairs(df, dim=8, planes=4).collect()
    assert len(uncapped) == 20 * 19 // 2 + 1  # hot bucket all-pairs + tiny pair

    capped = lsh_bucket_pairs(df, dim=8, planes=4, max_bucket=5).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert got == {(100, 101)}  # hot bucket dropped, small bucket intact


def test_quota_cap_deterministic_and_bounded(spark):
    from lakehouse_architecture_spark.operators.curation import quota_cap

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(30)], "id int, g string"
    )
    out = quota_cap(df, "g", "id", cap=4)
    counts = {r["g"]: r["c"] for r in out.groupBy("g").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    assert counts == {"g0": 4, "g1": 4, "g2": 4}
    # selection is a function of the ids, not the physical layout
    again = quota_cap(df.repartition(7), "g", "id", cap=4)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # order_col mode keeps the top-quality rows
    q = df.withColumn("quality", F.col("id").cast("double"))
    best = quota_cap(q, "g", "id", cap=2, order_col="quality")
    ids = sorted(r["id"] for r in best.filter(F.col("g") == "g0").collect())
    assert ids == [24, 27]


def test_drop_duplicate_lines_preserves_order_and_drops_hot(spark):
    from lakehouse_architecture_spark.operators.text import drop_duplicate_lines

    docs = spark.createDataFrame(
        [
            (1, "keep one\ncookie banner\nkeep two"),
            (2, "cookie banner\nunique line"),
            (3, "cookie banner"),
            (4, "fresh\ncontent"),
        ],
        "doc_id int, text string",
    )
    out = {r["id"]: r for r in drop_duplicate_lines(
        docs, "doc_id", "text", max_df=2).collect()}
    # 'cookie banner' appears in 3 docs > max_df=2 -> scrubbed everywhere
    assert out[1]["text"] == "keep one\nkeep two"
    assert out[1]["n_lines_kept"] == 2 and out[1]["n_lines_dropped"] == 1
    assert out[2]["text"] == "unique line"
    # a doc that was ALL boilerplate comes back empty, not missing
    assert out[3]["text"] == "" and out[3]["n_lines_kept"] == 0
    assert out[4]["text"] == "fresh\ncontent" and out[4]["n_lines_dropped"] == 0


def test_redact_progressive_patterns(spark):
    from lakehouse_architecture_spark.operators.text import redact

    df = spark.createDataFrame(
        [(1, "mail bob99@ex.com or call 555 1234"), (2, "no pii here")],
        "id int, s string",
    )
    out = {r["id"]: r for r in redact(df, "s").collect()}
    # the email is ONE <EMAIL>; its digits are not double-counted as numbers
    assert out[1]["redacted"] == "mail <EMAIL> or call <NUM> <NUM>"
    assert out[1]["n_email"] == 1 and out[1]["n_number"] == 2
    assert out[2]["redacted"] == "no pii here"
    assert out[2]["n_email"] == 0 and out[2]["n_number"] == 0


def test_vocab_topk_tiebreak(spark):
    from lakehouse_architecture_spark.operators.text import vocab_topk

    df = spark.createDataFrame(
        [(1, "b a a"), (2, "b c"), (3, "  ")], "doc_id int, text string"
    )
    rows = vocab_topk(df, "doc_id", "text", k=2).collect()
    assert [(r["tok"], r["term_freq"], r["doc_freq"]) for r in rows] == [
        ("a", 2, 1),
        ("b", 2, 2),
    ]


def test_bloom_no_false_negatives(spark):
    from lakehouse_architecture_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([(i,) for i in range(200)], "k int")
    bloom = bloom_build(members, "k", k=4, m_bits=4096)
    probe = spark.createDataFrame([(i,) for i in range(400)], "k int")
    out = {r["k"]: r["maybe_present"] for r in bloom_probe(
        bloom, probe, "k", k=4, m_bits=4096).collect()}
    # every member MUST hit (no false negatives)
    assert all(out[i] for i in range(200))
    # non-members mostly miss (fp rate at n=200,m=4096,k=4 is ~0.2%)
    fps = sum(1 for i in range(200, 400) if out[i])
    assert fps <= 10


def test_weighted_sample_favors_heavy_rows(spark):
    from lakehouse_architecture_spark.operators.curation import (
        weighted_priority_sample,
    )

    rows = [(i, 1000.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id int, w double")
    picked = {r["id"] for r in weighted_priority_sample(df, "id", "w", 60).collect()}
    # the 50 heavy rows (1000x weight) should essentially all be sampled
    assert len(picked & set(range(50))) >= 45
    # deterministic under repartition
    again = {r["id"] for r in weighted_priority_sample(
        df.repartition(13), "id", "w", 60).collect()}
    assert picked == again


def test_scd2_collapses_unchanged_runs(spark):
    from lakehouse_architecture_spark.operators.timeseries import scd2_intervals

    df = spark.createDataFrame(
        [(1, 10, "a", 1), (1, 20, "a", 2), (1, 30, "b", 3), (1, 40, "a", 4),
         (2, 5, "x", 5)],
        "k int, t int, state string, eid int",
    )
    out = [
        (r["t"], r["state"], r["valid_to"], r["is_current"])
        for r in scd2_intervals(df, ["k"], "t", "state", "eid")
        .filter(F.col("k") == 1).orderBy("t").collect()
    ]
    # t=20 (unchanged 'a') collapses into the first interval
    assert out == [(10, "a", 30, False), (30, "b", 40, False), (40, "a", None, True)]


def test_snapshot_diff_statuses(spark):
    from lakehouse_architecture_spark.operators.upsert import snapshot_diff

    before = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id int, s string, v double"
    )
    after = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)], "id int, s string, v double"
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(before, after, ["id"]).collect()}
    assert got == {1: "same", 2: "changed", 3: "removed", 4: "added"}


def test_cosine_neardup_clusters_and_flags(spark):
    """Near-identical directions collapse to the min-id canonical; a far
    vector stays its own canonical (either never shares a bucket or is cut
    by the exact-cosine filter)."""
    from lakehouse_architecture_spark.operators.similarity import cosine_neardup

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.99, 0.14]),
        (3, [0.98, 0.2]),
        (4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = {
        r["vec_id"]: (r["canonical_id"], r["is_canonical"])
        for r in cosine_neardup(df, dim=2, planes=2, min_cos=0.9).collect()
    }
    assert out == {1: (1, True), 2: (1, False), 3: (1, False), 4: (4, True)}


def test_tf_idf_top_terms_hand_computed(spark):
    """Scores match tf·ln((N+1)/(df+1)) computed by hand; ties break on
    term ascending."""
    import math

    from lakehouse_architecture_spark.operators.text import tf_idf_top_terms

    docs = [
        (1, "apple apple banana"),
        (2, "Banana cherry"),
        (3, "cherry durian durian durian"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = tf_idf_top_terms(df, "doc_id", "text", k=2).collect()
    got = {
        (r["id"], r["rank"]): (r["term"], r["tf"], r["df_t"], r["score"])
        for r in out
    }
    ln2 = round(2 * math.log(4 / 2), 6)
    ln3 = round(3 * math.log(4 / 2), 6)
    lnr = round(1 * math.log(4 / 3), 6)
    assert got == {
        (1, 1): ("apple", 2, 1, ln2),
        (1, 2): ("banana", 1, 2, lnr),   # lowercased: doc2's "Banana" counts
        (2, 1): ("banana", 1, 2, lnr),
        (2, 2): ("cherry", 1, 2, lnr),   # tie with banana -> term asc
        (3, 1): ("durian", 3, 1, ln3),
        (3, 2): ("cherry", 1, 2, lnr),
    }


def test_sessionize_gap_boundaries(spark):
    """New session exactly when the gap EXCEEDS gap_seconds; equality stays
    in-session; first event always opens session 1."""
    from datetime import datetime

    from lakehouse_architecture_spark.operators.timeseries import sessionize

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0, 0)),
        (1, 2, datetime(2024, 1, 1, 0, 30, 0)),   # gap == 1800 -> same session
        (1, 3, datetime(2024, 1, 1, 1, 0, 1)),    # gap 1801 -> new session
        (2, 4, t0),                                # other user independent
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df, "user_id", "ts", 1800, tiebreak_col="event_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_rolling_zscore_hand_computed(spark):
    """Constant prefix gives NULL z (std=0); the jump scores against the
    trailing-window mean/std; warm-up rows below min_periods are NULL."""
    from datetime import datetime

    from lakehouse_architecture_spark.operators.timeseries import rolling_zscore

    rows = [
        (1, i, datetime(2024, 1, 1, 0, i, 0), v)
        for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 20.0], start=1)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    out = {
        r["event_id"]: (r["roll_n"], r["zscore"])
        for r in rolling_zscore(
            df, "user_id", "ts", "value", n_rows=4, min_periods=3,
            tiebreak_col="event_id",
        ).collect()
    }
    assert out[1] == (1, None)          # below min_periods
    assert out[2] == (2, None)
    assert out[3] == (3, None)          # std == 0 -> gated
    assert out[4] == (4, None)
    # window rows 2-5: [10,10,10,20]: mean 12.5, var (75)/3=25, std 5 -> z=1.5
    assert out[5] == (4, 1.5)


def test_ewma_hand_computed(spark):
    """alpha=0.5: third value = (x3 + 0.5·x2 + 0.25·x1)/1.75; first value
    is itself (weights renormalized over available history)."""
    from datetime import datetime

    from lakehouse_architecture_spark.operators.timeseries import ewma

    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 1, 0), 4.0),
        (1, 2, datetime(2024, 1, 1, 0, 2, 0), 8.0),
        (1, 3, datetime(2024, 1, 1, 0, 3, 0), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma(df, "user_id", "ts", "value", 0.5, 8, tiebreak_col="event_id").collect()
    }
    assert got[1] == 4.0
    assert got[2] == round((8.0 + 0.5 * 4.0) / 1.5, 6)
    assert got[3] == round((2.0 + 0.5 * 8.0 + 0.25 * 4.0) / 1.75, 6)


def test_bm25_hand_computed(spark):
    """Single query term, two docs: exact BM25 with k1=1.2, b=0.75 against
    the textbook formula; non-matching docs are absent."""
    import math

    from lakehouse_architecture_spark.operators.text import bm25_scores

    docs = [
        (1, "x x y"),          # tf=2, dl=3
        (2, "x z z z"),        # tf=1, dl=4
        (3, "z z z"),          # no hit
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r["id"]: (r["score"], r["n_hit"]) for r in
           bm25_scores(df, "doc_id", "text", ("x",)).collect()}
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    avgdl = (3 + 4 + 3) / 3   # corpus-wide, including the non-matching doc

    def s(tf, dl):
        return round(round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6), 6)

    assert set(out) == {1, 2}
    assert out[1] == (s(2, 3), 1)
    assert out[2] == (s(1, 4), 1)


def test_containment_directional(spark):
    """A 3-shingle doc pasted inside a bigger doc: containment of the small
    side is 1.0 while Jaccard would be far below threshold."""
    from lakehouse_architecture_spark.operators.dedup import containment_pairs

    small = "a b c d e"                      # shingles: abc bcd cde (3)
    big = small + " f g h i j k l m n o p"   # contains all of small's
    df = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id int, text string"
    )
    rows = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["cont_a"]) == (1, 2, 1.0)
    assert r["cont_b"] < 0.9


def test_blocked_fuzzy_pairs_blocks_and_cutoff(spark):
    """Distance computed only within blocks; cross-block near-identical
    names never pair; cutoff excludes distant names in-block."""
    from lakehouse_architecture_spark.operators.dedup import blocked_fuzzy_pairs

    rows = [
        (1, "red widget", "A"),
        (2, "ted widget", "A"),     # dist 1, same block
        (3, "red widget", "B"),     # identical name, other block
        (4, "purple widget", "A"),  # dist 5 from red widget
    ]
    df = spark.createDataFrame(rows, "id int, name string, blk string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in blocked_fuzzy_pairs(df, "id", "name", ["blk"], 3).collect()}
    assert got == {(1, 2): 1}


def test_quantize_embeddings_scale_and_norm(spark):
    """Global scale = max|component|; extreme component maps to ±127;
    qnorm is the integer L2 norm."""
    import math

    from lakehouse_architecture_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [2.0, -4.0]), (2, [1.0, 1.0])], "vec_id int, embedding array<float>"
    )
    out = {r["id"]: (r["qvec"], r["qnorm"]) for r in quantize_embeddings(df).collect()}
    assert out[1][0] == [64, -127]          # 2/4*127 = 63.5 -> round half-up 64
    assert out[2][0] == [32, 32]            # 1/4*127 = 31.75 -> 32
    assert out[1][1] == math.sqrt(64 * 64 + 127 * 127)


def test_quantized_knn_matches_exact_on_clean_gaps(spark):
    """With well-separated directions the int8 ranking equals the exact
    cosine ranking."""
    from lakehouse_architecture_spark.operators.similarity import (
        brute_force_knn,
        quantized_knn,
    )

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [0.1, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.filter(F.col("vec_id") == 1)
    exact = [(r["neighbor_id"], r["rank"]) for r in brute_force_knn(df, q, k=3).collect()]
    quant = [(r["neighbor_id"], r["rank"]) for r in quantized_knn(df, q, k=3).collect()]
    assert quant == exact == [(2, 1), (4, 2), (3, 3)]


def test_ivf_nprobe_monotone_recall(spark):
    """The nprobe knob must trade cost for recall monotonically, and int8
    quantization must track exact ranking closely (SQ8's documented ~1e-3
    cosine error). Measured on the deterministic embeddings fixture."""
    import os

    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.similarity import (
        brute_force_knn,
        ivf_knn,
        quantized_knn,
    )

    emb = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "embeddings.parquet")
    ).cache()
    queries = emb.orderBy(F.col("vec_id").desc()).limit(10).cache()
    k = 5

    def pairs(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    truth = pairs(brute_force_knn(emb, queries, k=k).collect())
    denom = sum(len(v) for v in truth.values())

    def recall(rows):
        got = pairs(rows)
        return sum(len(truth[q] & got.get(q, set())) for q in truth) / denom

    # centroids=None: the seeded quantizer isolates the nprobe mechanics
    # from training (the trained DEFAULT has its own recall-floor test)
    r1 = recall(
        ivf_knn(emb, queries, n_cells=8, k=k, nprobe=1, centroids=None).collect()
    )
    r2 = recall(
        ivf_knn(emb, queries, n_cells=8, k=k, nprobe=2, centroids=None).collect()
    )
    r8 = recall(
        ivf_knn(emb, queries, n_cells=8, k=k, nprobe=8, centroids=None).collect()
    )
    assert r1 <= r2 <= r8, (r1, r2, r8)
    assert r8 == 1.0  # probing every cell IS brute force
    rq = recall(quantized_knn(emb, queries, k=k).collect())
    assert rq >= 0.8, rq


def test_ivf_trained_default_recall_floor(spark):
    """Round 10 (VERDICT r9 #3): the DEFAULT quantizer is now k-means-
    trained — the r9 A/B measured +0.06..+0.08 recall at every nprobe
    over lowest-id seeding, at train-only cost. Pin that on the fixed
    sf0.1 fixture (everything deterministic: lowest-id init, id
    tiebreaks): the trained default must (a) beat the seeded quantizer
    at each probed nprobe and (b) stay above the measured floor
    (trained nprobe=1 recall measured 0.2500, seeded 0.1875; nprobe=4
    trained 0.6125 — floors carry a safety margin only against future
    library-version jitter, not real drift)."""
    import os

    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.similarity import (
        brute_force_knn,
        ivf_knn,
    )

    emb = spark.read.parquet(
        os.path.join("/root/testdata/sf0.1", "embeddings.parquet")
    ).cache()
    queries = emb.orderBy(F.col("vec_id").desc()).limit(32).cache()
    k = 5

    def pairs(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    truth = pairs(brute_force_knn(emb, queries, k=k).collect())
    denom = sum(len(v) for v in truth.values())

    def recall(rows):
        got = pairs(rows)
        return sum(len(truth[q] & got.get(q, set())) for q in truth) / denom

    for nprobe, floor in ((1, 0.22), (4, 0.55)):
        seeded = recall(
            ivf_knn(
                emb, queries, n_cells=16, k=k, nprobe=nprobe, centroids=None
            ).collect()
        )
        trained = recall(
            ivf_knn(emb, queries, n_cells=16, k=k, nprobe=nprobe).collect()
        )
        assert trained >= seeded, (nprobe, trained, seeded)
        assert trained >= floor, (nprobe, trained, floor)


def test_kmeans_centroids_recover_clusters(spark):
    """On well-separated clusters, Lloyd's refinement must move the coarse
    quantizer onto the cluster axes — and IVF with those centroids reaches
    recall 1.0 at nprobe=1 (vs chance with the lowest-id quantizer)."""
    import random

    from lakehouse_architecture_spark.operators.similarity import (
        brute_force_knn,
        ivf_knn,
        kmeans_centroids,
    )

    random.seed(7)
    rows = []
    for i in range(90):
        c = i % 3
        v = [0.0] * 9
        v[c * 3] = 1.0
        v[c * 3 + 1] = random.uniform(0, 0.2)
        rows.append((i, v))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_cells=3, iters=3)
    got = cents.orderBy("cent_id").collect()
    assert len(got) == 3
    # each centroid points along exactly one cluster's primary axis
    axes = sorted(max(range(9), key=lambda i: r.cvec[i]) for r in got)
    assert axes == [0, 3, 6], axes

    q = df.limit(9)
    truth = {(r.query_id, r.neighbor_id) for r in brute_force_knn(df, q, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_knn(df, q, k=5, n_cells=3, centroids=cents).collect()
    }
    assert truth == approx


def test_pareto_frontier_2d_exact(spark):
    from lakehouse_architecture_spark.operators.relational import pareto_frontier_2d

    rows = [
        (1, 10.0, 5),   # frontier (cheapest)
        (2, 12.0, 9),   # frontier (bigger, pricier)
        (3, 12.0, 7),   # dominated by 2 (same price, smaller)
        (4, 15.0, 9),   # dominated by 2 (same size, pricier)
        (5, 20.0, 12),  # frontier
        (6, 11.0, 5),   # dominated by 1
    ]
    df = spark.createDataFrame(rows, ["id", "price", "size"]).repartition(3)
    got = {
        r["id"]
        for r in pareto_frontier_2d(
            df, minimize="price", maximize="size", tiebreak="id"
        ).collect()
    }
    assert got == {1, 2, 5}


def test_pagerank_star_graph_center_wins(spark):
    from lakehouse_architecture_spark.operators.graph import pagerank

    # undirected star 0-1, 0-2, 0-3 plus isolated node 4
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], ["node"])
    r = {row["node"]: row["rank"] for row in pagerank(nodes, edges).collect()}
    assert len(r) == 5
    # hub holds the most mass; leaves tie; the isolated node keeps only
    # teleport mass and ranks strictly below every connected node
    assert r[0] > r[1] == r[2] == r[3] > r[4]
    assert abs(sum(v for k, v in r.items() if k != 4) + r[4] - 1.0) < 0.2


def test_asof_join_forward_and_tolerance(spark):
    from lakehouse_architecture_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, "k", 10.0), (2, "k", 50.0), (3, "k", 100.0)],
        "lid long, k string, lt double",
    )
    right = spark.createDataFrame(
        [(7, "k", 12.0), (8, "k", 60.0)], "rid long, k string, rt double"
    )
    fwd = asof_join(
        left, right, "k", "lt", "rt", ["rid"], direction="forward"
    )
    got = {r["lid"]: r["rid"] for r in fwd.collect()}
    # 10 -> nearest following is 12; 50 -> 60; 100 -> none
    assert got == {1: 7, 2: 8, 3: None}

    tol = asof_join(
        left, right, "k", "lt", "rt", ["rid"],
        direction="forward", tolerance=5.0,
    )
    got_tol = {r["lid"]: r["rid"] for r in tol.collect()}
    # 50 -> 60 is 10 units away, beyond tolerance 5 -> nulled
    assert got_tol == {1: 7, 2: None, 3: None}

    back_tol = asof_join(
        left, right, "k", "lt", "rt", ["rid"], tolerance=5.0
    )
    got_back = {r["lid"]: r["rid"] for r in back_tol.collect()}
    # 50 matches 12 backward but is 38 away -> nulled; 100 vs 60 -> nulled
    assert got_back == {1: None, 2: None, 3: None}

    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, "k", "lt", "rt", ["rid"], direction="nearest")


def test_asof_join_null_value_cols_stay_row_atomic(spark):
    """ADVICE r3: when a right value column contains NULLs, the match must
    still be ONE right row — a NULL in the nearest row must NOT be
    back-filled from a farther row, and tolerance must be judged against
    the row the values came from."""
    from lakehouse_architecture_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100.0)], "lid long, k string, lt double"
    )
    # nearest backward row (t=90) has v=NULL, w=7; farther row (t=10) has
    # v=5. Column-independent fill would wrongly emit (v=5, w=7).
    right = spark.createDataFrame(
        [("k", 10.0, 5.0, 3.0), ("k", 90.0, None, 7.0)],
        "k string, rt double, v double, w double",
    )
    out = asof_join(left, right, "k", "lt", "rt", ["v", "w"]).collect()[0]
    assert out["v"] is None and out["w"] == 7.0

    # tolerance=20: the nearest row (t=90, dist 10) is within tolerance and
    # is the ONLY row whose values may appear — never t=10's v=5.
    tol = asof_join(
        left, right, "k", "lt", "rt", ["v", "w"], tolerance=20.0
    ).collect()[0]
    assert tol["v"] is None and tol["w"] == 7.0

    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, "k", "lt", "rt", ["__rt"])


def test_kmeans_train_cap_deterministic_and_engaged(spark):
    """Round 10: the coarse-quantizer training set is capped by a
    deterministic hash sample (FAISS-style) so Lloyd's iterations never
    re-scan a 100 TB corpus for a 16-vector codebook. Same cap twice →
    identical centroids; capped training still produces n_cells usable
    centroids; cap above the corpus size is a no-op vs uncapped."""
    import random

    from lakehouse_architecture_spark.operators.similarity import (
        kmeans_centroids,
    )

    random.seed(11)
    rows = []
    for i in range(300):
        c = i % 3
        v = [0.0] * 9
        v[c * 3] = 1.0
        v[c * 3 + 1] = random.uniform(0, 0.2)
        rows.append((i, v))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def centmap(cdf):
        return {
            r.cent_id: tuple(round(x, 9) for x in r.cvec)
            for r in cdf.collect()
        }

    a = centmap(kmeans_centroids(df, n_cells=3, iters=2, max_train_rows=64))
    b = centmap(kmeans_centroids(df, n_cells=3, iters=2, max_train_rows=64))
    assert a == b  # deterministic under the cap
    assert len(a) == 3
    # the capped codebook still recovers the three cluster axes
    axes = sorted(max(range(9), key=lambda i: v[i]) for v in a.values())
    assert axes == [0, 3, 6], axes

    full = centmap(kmeans_centroids(df, n_cells=3, iters=2, max_train_rows=None))
    big = centmap(kmeans_centroids(df, n_cells=3, iters=2, max_train_rows=10_000))
    assert big == full  # cap above corpus size = no-op


def test_connected_components_long_chain_converges(spark):
    """Round 10: min-label propagation alone moves ONE hop per round, so a
    chain longer than max_iterations was silently mislabeled (25-hop
    duplicate chains are rare but real). Pointer jumping halves chains
    each round: a 60-node path now converges well inside 8 rounds, and a
    genuinely-too-low budget raises instead of returning a partial
    labeling."""
    import pytest

    from lakehouse_architecture_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a int, id_b int"
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iterations=8).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == 60

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2).collect()


def test_snapshot_diff_separator_injection_reports_changed(spark):
    """Round 11: the row hash frames each value with its length, so value
    content containing the old field separator (or the old NULL marker)
    cannot shift a column boundary — ('a\\x1f', 'b') vs ('a', '\\x1fb')
    hashed IDENTICALLY under the separator-joined form and reported a
    changed row as 'same', silently corrupting CDC/IVM folds built on the
    diff."""
    from lakehouse_architecture_spark.operators.upsert import snapshot_diff

    before = spark.createDataFrame(
        [(1, "a\x1f", "b"), (2, None, "y"), (3, "p", "q")],
        "k int, c1 string, c2 string",
    )
    after = spark.createDataFrame(
        [(1, "a", "\x1fb"), (2, "\x00", "y"), (3, "p", "q")],
        "k int, c1 string, c2 string",
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(before, after, ["k"]).collect()
    }
    # k=1: boundary shift; k=2: NULL vs a literal control char — both are
    # real changes; k=3 is untouched
    assert got == {1: "changed", 2: "changed", 3: "same"}, got
