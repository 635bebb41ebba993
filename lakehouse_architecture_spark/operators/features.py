"""ML feature-engineering operators (training-prep on raw tables).

The reference's ML step (``mlflow_/train_model.py``) consumes hand-built
numeric columns; these operators produce such features from raw
tables at 100 TB scale — each a pure Catalyst plan (no UDFs) following the
determinism rules in queries/base.py, so every transform is reproducible
bit-for-bit across engines and re-runs (a training-data requirement, not a
nicety: silent feature drift between pipeline versions poisons model
comparisons).

* :func:`feature_hashing` — the hashing trick: token -> signed bucket via
  the portable md5 hash; one explode + hash-agg, dimensionality fixed at
  plan time, no vocabulary state to ship (the point of the trick at scale).
* :func:`loo_target_encode` — leave-one-out target encoding of a
  categorical key: (group_sum - own_target) / (group_n - 1). One
  hash-aggregate + a key join (broadcast when the key cardinality is
  small); excluding the row's own label prevents the classic target-leak.
* :func:`mutual_information` — MI (bits) between two categorical columns
  from the joint-count table: three hash-aggs whose outputs are
  cardinality-sized, then arithmetic on the tiny joint table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.materialize import materialize_small

from lakehouse_architecture_spark.functions.aggregates import dsum
from lakehouse_architecture_spark.functions.hashing import md5_hash64
from lakehouse_architecture_spark.operators.text import tokens


def feature_hashing(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = 64,
) -> DataFrame:
    """Hashing-trick bag-of-words: long-form ``(id, bucket, weight)``.

    bucket = md5_64(token) mod n_features; sign = +-1 from the next hash
    bit (the signed variant keeps collision noise zero-mean, Weinberger et
    al. 2009). Weight sums token multiplicity. Long form, not a wide
    vector: downstream Spark ML assemblers or a pivot can widen it, while
    the shuffle stays |docs x distinct buckets| bounded.
    """
    h = md5_hash64(F.col("tok"))
    sign = F.when((h % (2 * n_features)) >= n_features, F.lit(-1)).otherwise(
        F.lit(1)
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
        .select("id", (h % n_features).cast("int").alias("bucket"), sign.alias("s"))
        .groupBy("id", "bucket")
        .agg(F.sum("s").alias("weight"))
    )


def loo_target_encode(
    df: DataFrame,
    key_col: str,
    target_col: str,
    prior_weight: float = 0.0,
) -> DataFrame:
    """Leave-one-out target encoding with optional prior smoothing.

    encode(row) = (sum(target over key) - target(row) + prior_weight * global_mean)
                  / (n(key) - 1 + prior_weight)

    Rows in singleton groups (n == 1, denominator 0 when unsmoothed) get
    the global mean — the only defensible value with no peers. NULL keys
    form their own group (null-safe stats join) rather than silently
    dropping out of the training set. Sums go through decimal
    (functions/aggregates.py) so the encoding is partition-order
    independent.
    """
    stats = df.groupBy(key_col).agg(
        dsum(target_col, "__sum"), F.count(target_col).alias("__n")
    ).withColumnRenamed(key_col, "__key")
    gmean = df.agg(
        (dsum(target_col) / F.count(target_col)).alias("__gmean")
    )
    joined = (
        df.join(stats, F.col(key_col).eqNullSafe(F.col("__key")))
        .drop("__key")
        .crossJoin(F.broadcast(gmean))
    )
    denom = F.col("__n") - 1 + F.lit(float(prior_weight))
    enc = (
        F.col("__sum")
        - F.col(target_col)
        + F.lit(float(prior_weight)) * F.col("__gmean")
    ) / denom
    return joined.select(
        *df.columns,
        F.round(
            F.when(denom > 0, enc).otherwise(F.col("__gmean")), 6
        ).alias("loo_encoding"),
    )


def mutual_information(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Mutual information I(X;Y) in bits between two categorical columns.

    One row out: ``(n, n_x, n_y, mi_bits)``. Joint counts are one
    hash-aggregate; marginals derive from the joint table (cardinality
    |X|x|Y| — small), so raw data is scanned exactly once.
    """
    joint = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # |X|x|Y|-sized, referenced 4x (marginals, total, terms) —
    # materializing makes "scanned exactly once" literally true
    joint = materialize_small(joint)
    mx = joint.groupBy("x").agg(F.sum("c").alias("cx"))
    my = joint.groupBy("y").agg(F.sum("c").alias("cy"))
    tot = joint.agg(F.sum("c").alias("n"))
    terms = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            (
                (F.col("c").cast("double") / F.col("n"))
                * F.log2(
                    (F.col("c").cast("double") * F.col("n"))
                    / (F.col("cx").cast("double") * F.col("cy"))
                )
            ).alias("term"),
            "x",
            "y",
        )
    )
    return terms.groupBy("n").agg(
        F.count_distinct("x").alias("n_x"),
        F.count_distinct("y").alias("n_y"),
        F.round(F.sum(F.col("term").cast("decimal(38,18)")).cast("double"), 6).alias(
            "mi_bits"
        ),
    ).select("n", "n_x", "n_y", "mi_bits")


def standard_scale(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "z",
) -> DataFrame:
    """Z-standardize ``value_col`` (optionally within groups): (x - mean) /
    sample-stddev. Moments come from ONE decimal-exact hash aggregate
    (sum and sum-of-squares through DECIMAL(38,6) — bit-identical across
    engines and partitionings) broadcast back onto the rows; no window
    over the data. Groups with zero variance or a single row get NULL z."""
    x = F.col(value_col).cast("double")
    keys = list(group_cols or [])
    gb = df.groupBy(*keys) if keys else df.groupBy()
    stats = gb.agg(
        F.count(x).alias("__n"),
        dsum(x, "__s"),
        F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("__s2"),
    )
    mean = F.col("__s") / F.col("__n")
    var = (F.col("__s2") - F.col("__s") * F.col("__s") / F.col("__n")) / (
        F.col("__n") - 1
    )
    stats = stats.select(
        *[F.col(c).alias(f"__k_{c}") for c in keys],
        mean.alias("__mean"),
        F.when((F.col("__n") > 1) & (var > 0), F.sqrt(var)).alias("__std"),
    )
    if keys:
        # NULL-SAFE key equality: a NULL group key is a real group with
        # real moments — a plain equi-join would silently drop its rows
        cond = None
        for c in keys:
            piece = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
            cond = piece if cond is None else (cond & piece)
        joined = df.join(F.broadcast(stats), on=cond)
    else:
        joined = df.crossJoin(F.broadcast(stats))
    return joined.withColumn(
        out_col, F.round((x - F.col("__mean")) / F.col("__std"), 6)
    ).drop("__mean", "__std", *[f"__k_{c}" for c in keys])


def chi2_independence(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Pearson chi-squared statistic of independence between two
    categorical columns: sum of (obs - exp)^2 / exp over the contingency
    table, plus degrees of freedom — the classic feature-screening test
    (complement of mutual_information: same joint-table shape, different
    statistic). One hash aggregate builds the joint table; marginals
    derive from it (no second scan). NULL categories are their own level.
    """
    joint = (
        df.select(
            F.coalesce(F.col(x_col).cast("string"), F.lit(" null")).alias("__x"),
            F.coalesce(F.col(y_col).cast("string"), F.lit(" null")).alias("__y"),
        )
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    # contingency-table-sized; the marginal/total subplans below each
    # reference it — materializing makes "no second scan" literally true
    joint = materialize_small(joint)
    mx = joint.groupBy("__x").agg(F.sum("__o").alias("__nx"))
    my = joint.groupBy("__y").agg(F.sum("__o").alias("__ny"))
    tot = joint.agg(F.sum("__o").alias("__n"))
    # the FULL |X| x |Y| grid, not just observed cells: a zero cell still
    # contributes (0 - exp)^2 / exp = exp — summing only the joint table
    # understates dependence (a perfect 2x2 bijection would report n/2,
    # not n). The grid is category-cardinality, broadcastable.
    grid = mx.crossJoin(F.broadcast(my)).crossJoin(F.broadcast(tot))
    cells = grid.join(joint, on=["__x", "__y"], how="left").withColumn(
        "__o", F.coalesce(F.col("__o"), F.lit(0))
    )
    exp = F.col("__nx") * F.col("__ny") / F.col("__n")
    contrib = (F.col("__o") - exp) * (F.col("__o") - exp) / exp
    return cells.agg(
        F.round(
            F.sum(contrib.cast("decimal(38,18)")).cast("double"), 6
        ).alias("chi2"),
        (
            (F.count_distinct("__x") - 1) * (F.count_distinct("__y") - 1)
        ).alias("dof"),
        F.max("__n").alias("n"),
    )


def negative_sample(
    interactions: DataFrame,
    users: DataFrame,
    items: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 5,
    thin_mod: int = 16,
) -> DataFrame:
    """Deterministic negative sampling for recommendation/contrastive
    training: per user, the ``k`` lowest-hash items the user has NOT
    interacted with. No RNG state — the sample is a pure function of
    (user, item), so retries, repartitions, and the SQL oracle all draw
    the same negatives, and a later epoch can re-derive them.

    The candidate space is |users|×|items|, and because the thinning
    hash depends on BOTH keys it cannot shrink the enumeration itself —
    the cross join still streams every pair through the filter (a narrow,
    shuffle-free scan over broadcast items). What ``thin_mod`` cuts by
    its factor is everything AFTER the filter: the interaction anti-join,
    the shuffle, and the per-user window all run on 1/thin_mod of the
    pairs. Each user's candidate pool is ≈ |items|/thin_mod; callers must
    keep k well under that. For item catalogs too large to broadcast,
    enumerate candidates from a hash-bucketed item subset instead (the
    same pure-function property holds per bucket).

    Returns (user, item, rk) with rk = 1..k by (hash, item) order.
    """
    u = users.select(F.col(user_col).alias("user")).distinct()
    i = items.select(F.col(item_col).alias("item")).distinct()
    cand = (
        u.crossJoin(i)
        .withColumn(
            "__h",
            md5_hash64(
                F.concat_ws("_", F.col("user").cast("string"), F.col("item").cast("string"))
            ),
        )
        .filter(F.col("__h") % thin_mod == 0)
    )
    seen = interactions.select(
        F.col(user_col).alias("user"), F.col(item_col).alias("item")
    ).distinct()
    neg = cand.join(seen, ["user", "item"], "left_anti")
    w = Window.partitionBy("user").orderBy("__h", "item")
    return (
        neg.select("user", "item", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_expr,
    eps: float = 1e-4,
) -> DataFrame:
    """Weight of Evidence + Information Value per category level — the
    credit-scoring-standard categorical feature screen (Siddiqi 2006):
    WOE(c) = ln(dist_good(c) / dist_bad(c)), IV = Σ_c (dist_good −
    dist_bad)·WOE, with the usual reading IV < 0.02 useless, > 0.3 strong.
    ``label_expr`` is the BAD indicator (cast to int).

    One hash aggregate onto |categories| rows + a broadcast totals join.
    Distribution shares are epsilon-floored (the psi_drift convention) so
    empty cells never produce ±inf; WOE values are rounded to 9 dp before
    the IV terms, and the IV total decimal-sums the rounded terms — the
    engine-exact float-fold discipline. Output: one row per category
    (category, n, n_bad, dist_good, dist_bad, woe, iv_term) plus a
    category='(total)' row carrying the summed IV in ``iv_term``.
    """
    base = df.select(
        F.col(cat_col).cast("string").alias("category"),
        label_expr.cast("int").alias("__bad"),
    ).filter(F.col("category").isNotNull() & F.col("__bad").isNotNull())
    cells = base.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__bad").alias("n_bad")
    )
    tot = cells.agg(
        F.sum(F.col("n") - F.col("n_bad")).alias("tg"),
        F.sum("n_bad").alias("tb"),
    )
    dg = F.greatest(
        (F.col("n") - F.col("n_bad")).cast("double") / F.col("tg"), F.lit(eps)
    )
    db = F.greatest(F.col("n_bad").cast("double") / F.col("tb"), F.lit(eps))
    woe = F.round(F.log(dg / db), 9)
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "category",
        "n",
        "n_bad",
        F.round(dg, 9).alias("dist_good"),
        F.round(db, 9).alias("dist_bad"),
        woe.alias("woe"),
        F.round((dg - db) * woe, 9).alias("iv_term"),
    )
    from lakehouse_architecture_spark.materialize import materialize_small

    scored = materialize_small(scored)
    total = scored.agg(
        F.sum("n").alias("n"),
        F.sum("n_bad").alias("n_bad"),
        F.round(
            F.sum(F.col("iv_term").cast("decimal(38,9)")).cast("double"), 6
        ).alias("iv_term"),
    ).select(
        F.lit("(total)").alias("category"),
        "n",
        "n_bad",
        F.lit(None).cast("double").alias("dist_good"),
        F.lit(None).cast("double").alias("dist_bad"),
        F.lit(None).cast("double").alias("woe"),
        "iv_term",
    )
    return scored.select(
        "category",
        "n",
        "n_bad",
        "dist_good",
        "dist_bad",
        "woe",
        F.round("iv_term", 6).alias("iv_term"),
    ).unionByName(total).orderBy("category")


def cramers_v(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """χ² test of independence + Cramér's V effect size (Cramér 1946)
    between two categorical columns — the feature-screening companion of
    :func:`woe_iv` (WoE needs a binary target; V compares any two
    categoricals, e.g. language × source leakage checks before a split):
    V = √(χ² / (n·(min(r,c) − 1))), 0 = independent, 1 = determined.

    One hash aggregate to the r×c contingency table; marginals, expected
    counts, and the χ² fold all run on that broadcastable derivative.
    Each (o−e)²/e term is rounded to 9 dp and decimal-summed. Expected
    counts use the observed-cell grid only — a structurally-absent cell
    contributes (0−e)²/e via the dense r×c grid (cross join of the two
    marginals, |r|·|c| rows). Returns one row: (n, r, c, chi2, v).
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = materialize_small(cells)
    mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
    tot = cells.agg(F.sum("c").alias("n"))
    dense = (
        mx.crossJoin(my)
        .join(cells, ["x", "y"], "left")
        .select(
            "x", "y", "cx", "cy", F.coalesce("c", F.lit(0)).alias("o")
        )
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("cx").cast("double") * F.col("cy") / F.col("n")
    term = F.round((F.col("o") - e) * (F.col("o") - e) / e, 9).cast(
        "decimal(38,9)"
    )
    dims = cells.agg(
        F.count_distinct("x").alias("r"), F.count_distinct("y").alias("c2")
    )
    out = dense.groupBy("n").agg(F.sum(term).cast("double").alias("chi2"))
    return (
        out.crossJoin(F.broadcast(dims))
        .select(
            "n",
            F.col("r").cast("long").alias("r"),
            F.col("c2").cast("long").alias("c"),
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.when(
                    (F.least("r", "c2") > 1) & (F.col("n") > 0),
                    F.sqrt(
                        F.col("chi2")
                        / (F.col("n") * (F.least("r", "c2") - 1))
                    ),
                ),
                6,
            ).alias("v"),
        )
    )
