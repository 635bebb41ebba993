"""Training-data curation operators: deterministic sampling and budgeting.

Two ops every large-scale corpus pipeline needs between "dedup" and
"train":

* :func:`stratified_hash_sample` — per-stratum downsampling (class
  rebalancing) that is a pure narrow map: the keep/drop decision is a
  deterministic function of the row's id hash, so it needs no shuffle, no
  count pre-pass, no RNG state, and re-runs reproduce the same sample on
  any engine or cluster layout (unlike ``df.sample``/``sampleBy``, whose
  output depends on partitioning).
* :func:`pack_token_budget` — select the best documents per group until a
  token budget fills: one window cumsum per group (single shuffle on the
  group key), the distributed form of "sort by quality, take until N
  tokens". Groups are independent, so skew is bounded by the largest
  group; at corpus scale the group key is usually language or domain
  (dozens of values) — if one group dominates, pre-split it with a salt
  on a secondary key and merge budgets.

Both are md5-deterministic (functions/hashing.py) and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.materialize import cache_once

from lakehouse_architecture_spark.functions.hashing import md5_hash64

#: Resolution of the sampling decision: hash mod 1e6 compared to
#: fraction * 1e6 — ~1e-6 granularity, identical in any engine.
_MOD = 1_000_000


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    ``md5_hash64(id) % 1e6 < fraction(stratum) * 1e6``.

    ``fractions`` maps stratum value → keep fraction; strata not listed use
    ``default_fraction``. The decision depends only on the row id, so the
    sample is stable under re-partitioning, retries, and engine changes —
    the property that matters when a 100 TB sampling job restarts.
    """
    frac = None
    for value, f in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        frac = F.when(cond, F.lit(f)) if frac is None else frac.when(cond, F.lit(f))
    frac = (
        frac.otherwise(F.lit(default_fraction))
        if frac is not None
        else F.lit(default_fraction)
    )
    ticket = md5_hash64(F.col(id_col).cast("string")) % _MOD
    # floor, not a bare bigint cast: Spark's non-ANSI double->bigint cast
    # truncates while other engines round, so an explicit floor keeps the
    # threshold identical everywhere (oracles use FLOOR too)
    return df.filter(ticket < F.floor(frac * _MOD))


def pack_token_budget(
    df: DataFrame,
    group_col: str,
    token_col: str,
    quality_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Per-group greedy budget packing: order by quality (best first, id as
    the total-order tiebreak), keep rows while the running token total —
    including the current row — stays within ``budget``.

    One shuffle (window partition on the group). A document larger than
    the remaining budget is skipped only if it is the FIRST overflow; the
    simple prefix rule keeps the op a single window pass, which is the
    standard corpus-curation formulation.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("running_tokens", F.sum(token_col).over(w))
        .filter(F.col("running_tokens") <= budget)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ≥
    ``min_overlap`` distinct word ``n``-grams with ANY benchmark document —
    the standard eval-contamination screen (GPT-3/The Pile style n-gram
    overlap) run before training.

    Scale shape: the benchmark side is tiny relative to the corpus (eval
    sets are thousands of docs; the corpus is billions), so its distinct
    shingle-hash set is **broadcast** and the corpus side never shuffles
    for the probe — one narrow shingle scan + broadcast hash join, then one
    aggregation keyed by doc. Returns (id, n_overlap) for flagged docs;
    anti-join the result against the corpus to drop them.
    """
    from lakehouse_architecture_spark.operators.dedup import word_shingles

    doc_sh = word_shingles(docs, id_col, text_col, n).select(
        "id", md5_hash64(F.col("shingle")).alias("h")
    )
    bench_sh = (
        word_shingles(benchmark, id_col, text_col, n)
        .select(md5_hash64(F.col("shingle")).alias("h"))
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "h")
        # word_shingles is distinct per doc, so count == distinct overlap
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic global shuffle for training export: assign every row a
    shard and a position within it, both pure functions of the row id.

    shard = md5_hash64(id) mod n_shards gives hash-even shard sizes;
    position = rank within the shard ordered by (hash, id) — i.e. a
    reproducible pseudo-random order, the property a training run needs
    from "shuffled shards" (same manifest on every engine, retry, or
    cluster layout). One shuffle (window partition on shard); shards are
    hash-balanced so the window never skews. Writers then
    ``partitionBy(shard)`` + sort by position.
    """
    h = md5_hash64(F.col(id_col).cast("string"))
    out = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w)).drop("__h")


def quota_cap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    order_col: str | None = None,
) -> DataFrame:
    """Per-group document quota: keep at most ``cap`` rows per
    ``group_col`` value (domain / source / license bucket — the standard
    guard against one crawl domain dominating a training mix).

    Selection is deterministic: rows are ranked inside each group by
    ``order_col`` descending when given (a quality score), else by the md5
    hash of the id — an unbiased pseudo-random draw that is stable under
    re-partitioning and retries, unlike ``rand()``-based ranking. One
    shuffle (window partition on the group); at corpus scale the group
    cardinality is large (domains), so the window parallelizes evenly and
    no group outgrows a partition unless the raw crawl itself is skewed —
    exactly the case the cap exists to bound, and the window only needs
    the first ``cap`` ranks, which AQE's skew split handles.
    """
    if order_col is not None:
        order = [F.col(order_col).desc(), F.col(id_col).asc()]
    else:
        order = [
            md5_hash64(F.col(id_col).cast("string")).asc(),
            F.col(id_col).asc(),
        ]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def weighted_priority_sample(
    df: DataFrame, id_col: str, weight_col: str, n: int
) -> DataFrame:
    """Deterministic weighted sample of ``n`` rows without replacement:
    each row gets priority ``hash64(id) / weight`` and the n smallest
    priorities win — heavier rows draw systematically smaller priorities,
    so inclusion probability scales with weight, and the draw is a pure
    function of the ids (stable under re-partitioning, retries, engines;
    the same property as :func:`stratified_hash_sample`, which handles the
    per-stratum-fraction case while this handles per-row weights).

    ``orderBy().limit(n)`` compiles to TakeOrderedAndProject — each
    partition keeps its local top-n and a single reduce merges them; no
    global sort shuffle, so the op scales to any corpus size with bounded
    memory. Division of the 60-bit hash by the weight is IEEE-exact and
    identical across engines (no pow/ln, which are libm-dependent and not
    oracle-safe; and no round(), whose large-magnitude behavior differs
    between engines — the raw quotient is already bit-identical).
    """
    pr = md5_hash64(F.col(id_col).cast("string")) / F.col(weight_col).cast("double")
    return (
        df.withColumn("priority", pr)
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(n)
    )


def mix_rebalance(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_weights: dict[str, float],
) -> DataFrame:
    """Rebalance a corpus to a target domain mix (the LLaMA/Pile-style
    "data mixture" step): keep the LARGEST subset whose per-stratum
    proportions equal ``target_weights``.

    The limiting stratum pins the total: T = min_i(n_i / w_i); every
    stratum then keeps ``w_i · T`` rows via the deterministic hash ticket
    of :func:`stratified_hash_sample` (stable under retries and
    repartitioning). Strata absent from ``target_weights`` are dropped.

    Fully DataFrame-side: counts are one aggregate whose result (one row
    per stratum) broadcasts back — no driver collect, so this composes
    inside a larger lazy pipeline. The final keep-test is a narrow map.
    """
    spark = df.sparkSession
    tw = spark.createDataFrame(
        sorted(target_weights.items()), [strata_col, "__w"]
    )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(F.broadcast(tw), strata_col)
    )
    t = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__t"))
    frac = (
        counts.crossJoin(F.broadcast(t))
        .select(
            strata_col,
            (F.col("__w") * F.col("__t") / F.col("__n")).alias("__keep"),
        )
    )
    ticket = md5_hash64(F.col(id_col).cast("string")) % _MOD
    # explicit floor: see stratified_hash_sample — identical across engines
    return (
        df.join(F.broadcast(frac), strata_col)
        .filter(ticket < F.floor(F.col("__keep") * _MOD))
        .drop("__keep")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split label is a
    pure function of its id (md5 bucket in [0, 1e6) against cumulative
    weight thresholds), so the partition is reproducible across runs,
    engines, and repartitioning, rows never migrate between splits when the
    corpus grows, and no shuffle or RNG is involved — a narrow map, unlike
    randomSplit (whose assignment depends on partition layout).

    ``weights`` maps label -> fraction; fractions must sum to 1. Label
    order follows the dict (insertion) order for threshold stacking.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    from lakehouse_architecture_spark.functions.hashing import md5_hash64

    bucket = F.pmod(
        md5_hash64(F.concat_ws("_", F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        acc += w
        cond = bucket < int(acc * 1_000_000)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_filter,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al., *Data Selection for
    Language Models via Importance Resampling*, arXiv:2302.03169),
    unigram-feature variant: score(doc) = mean over its tokens of
    ``ln p_target(tok) − ln p_raw(tok)`` with add-one smoothing, where the
    target distribution is estimated from the rows matching
    ``target_filter`` (a boolean Column — e.g. the high-quality domain)
    and the raw distribution from the whole input. Downstream selection
    keeps the top-score mass (deterministic resampling via a hash
    tiebreak, as in :func:`weighted_priority_sample`).

    Scale shape: two passes over the token stream — one to build the
    model, one to score. The model build is ONE token aggregate for both
    distributions (the target count is a conditional sum inside the same
    groupBy), and its vocab-sized result is CACHED so the totals fold and
    the weight table derive from it without re-tokenizing the corpus;
    the per-token weight then joins back on the token key and one final
    doc aggregate scores everything. Map-side partials throughout; no
    driver-side scalars. Docs with no tokens are dropped (no score is
    definable for them).

    Output: (id, n_tokens, dsir_score), score derived from decimal sums
    and FLOOR-quantized at 1e-6 for engine-portable determinism (round-
    half-up on a double diverges across engines at half boundaries).
    """
    from lakehouse_architecture_spark.functions.aggregates import davg
    from lakehouse_architecture_spark.operators.partitioning import spread
    from lakehouse_architecture_spark.operators.text import tokens

    # spread before the explode: tokenization fan-out must not inherit a
    # collapsed input partition count (README "Compact inputs" rule)
    df = spread(df)
    tok = df.select(
        F.col(id_col).alias("id"),
        target_filter.alias("__tgt"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    # vocab-sized; cached so totals + weights don't re-run the corpus
    # tokenize (same pattern as the Jaccard inverted index's sh.cache())
    counts = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.col("__tgt").cast("bigint")).alias("ct"),
    )
    counts = cache_once(counts)
    totals = counts.agg(
        F.sum("cr").alias("nr"),
        F.sum("ct").alias("nt"),
        F.count(F.lit(1)).alias("v"),
    )
    w = counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + F.col("v")).cast("double"))
            - F.log((F.col("cr") + 1) / (F.col("nr") + F.col("v")).cast("double"))
        ).alias("w"),
    )
    return (
        tok.join(w, "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # FLOOR-quantized at 1e-6, not ROUND: half-up rounding of a
            # double is boundary-fragile across engines (Spark rounds the
            # double's shortest decimal string via BigDecimal, DuckDB the
            # binary value — a mean landing on the …5e-7 half diverged at
            # sf0.1, doc 4470), while floor of the identical IEEE double
            # is bit-deterministic everywhere. + 0.0 folds the negative
            # zero a tiny-negative mean floors to (sf0.1, doc 4163).
            (F.floor(davg("w") * F.lit(1e6)) / F.lit(1e6) + F.lit(0.0)).alias(
                "dsir_score"
            ),
        )
        .withColumnRenamed("id", id_col)
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    test_frac: float = 0.2,
    embargo_us: int = 0,
) -> DataFrame:
    """Leakage-free time-based train/test split with an embargo gap.

    The cutoff is the exact interpolated ``1 - test_frac`` quantile of the
    timestamp (as epoch micros): rows at or after it are ``test``; rows
    more than ``embargo_us`` BEFORE it are ``train``; rows inside the gap
    are ``embargo`` and should be dropped — the purge window that keeps
    features whose labels look into the test period out of training (the
    purged/embargoed split of de Prado 2018, standard for autocorrelated
    data where a hash split silently leaks).

    The cut comes from :func:`~lakehouse_architecture_spark.operators.skew.
    exact_quantiles` (bounded-state two-phase rank, bit-compatible with
    Spark's ``percentile``) broadcast back over a narrow map — no shuffle
    of the data itself, and the assignment is a pure function of the
    timestamp, so it is stable under repartitioning and engine choice.

    Degenerate input: when EVERY timestamp is NULL, exact_quantiles emits
    no cut row (``percentile`` semantics — no non-null values). The cut
    is attached with a broadcast LEFT join on a constant key, so rows
    survive with a NULL cut and both ``when`` predicates evaluate NULL:
    every row is labeled ``embargo`` (matching the pre-round-6
    NULL-cut-aggregate behavior) instead of silently vanishing in a
    crossJoin against an empty table.
    """
    from lakehouse_architecture_spark.operators.skew import exact_quantiles

    if not 0.0 < test_frac < 1.0:
        raise ValueError(f"test_frac must be in (0,1): {test_frac}")
    # cast: the parquet fixtures load as TIMESTAMP_NTZ and unix_micros
    # takes TIMESTAMP; the session pins UTC so the cast shifts nothing
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cut = exact_quantiles(
        df.select(us.alias("__ts_us")),
        [],
        "__ts_us",
        {"__cut": 1.0 - test_frac},
        bucket_width=3600e6,  # hour-wide epoch-micro buckets
    ).withColumn("__k", F.lit(1))
    return (
        df.withColumn("__k", F.lit(1))
        .join(F.broadcast(cut), "__k", "left")
        .withColumn(
            "split",
            F.when(us >= F.col("__cut"), F.lit("test"))
            .when(us < F.col("__cut") - F.lit(int(embargo_us)), F.lit("train"))
            .otherwise(F.lit("embargo")),
        )
        .drop("__cut", "__k")
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis A-ES): each row draws a reproducible uniform u from its id
    (md5 ticket — stable across partitioning, retries, and engines) and
    scores key = u^(1/w); the global top-k by key is a weighted sample.

    One scan + a TakeOrdered top-k — no per-row RNG state, no sort of the
    full table. Rows with non-positive weight are excluded (their key
    would be 0).
    """
    from lakehouse_architecture_spark.functions.hashing import md5_hash64

    u = (
        (md5_hash64(F.col(id_col).cast("string")) % _MOD).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_MOD))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__aes_key", F.round(key, 12))
        .orderBy(F.col("__aes_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def neyman_allocation(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    n_total: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: stratum h gets
    n_h = round(n_total · N_h·S_h / Σ N_h·S_h) — proportional to size ×
    standard deviation, the allocation that minimizes the variance of the
    stratified mean estimator (Neyman 1934). The planning step in front
    of :func:`stratified_hash_sample`: compute the allocation here, turn
    it into per-stratum fractions, sample deterministically there.

    One hash aggregate onto |strata| rows (decimal-exact Σx/Σx² moments),
    then broadcast-scalar arithmetic — nothing data-sized downstream.
    Rounding is the explicit FLOOR(x + 0.5) so both engines round
    identically (Spark's ROUND and DuckDB's differ in half-case policy on
    doubles). Returns (stratum, n_rows, s_h, weight, alloc).
    """
    d = "decimal(38,6)"
    moms = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).cast(d)).cast("double").alias("__sx"),
        F.sum(
            (
                F.col(value_col).cast("decimal(18,6)")
                * F.col(value_col).cast("decimal(18,6)")
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("__sxx"),
    )
    s_h = F.when(
        F.col("n_rows") > 1,
        F.sqrt(
            (F.col("__sxx") - F.col("__sx") * F.col("__sx") / F.col("n_rows"))
            / (F.col("n_rows") - 1)
        ),
    ).otherwise(F.lit(0.0))
    sized = moms.select("stratum", "n_rows", s_h.alias("s_h")).withColumn(
        "__w", F.col("n_rows") * F.col("s_h")
    )
    tot = sized.agg(
        F.sum(F.col("__w").cast("decimal(38,12)")).cast("double").alias("__tot")
    )
    return (
        sized.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_rows",
            F.round("s_h", 6).alias("s_h"),
            F.round(F.col("__w") / F.col("__tot"), 6).alias("weight"),
            F.floor(F.col("__w") / F.col("__tot") * n_total + 0.5)
            .cast("int")
            .alias("alloc"),
        )
    )
