"""Product quantization (PQ) for embedding columns — the memory-bound ANN
rung above IVF/int8 (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Vectors split into ``m`` subvectors; each subspace gets a ``ksub``-entry
codebook; a vector compresses to ``m`` one-byte-ish codes (64-dim float32 →
8 bytes at m=8, a 32× shrink). Search is ADC (asymmetric distance
computation): the query builds an ``m × ksub`` distance table against the
codebooks, and each corpus vector's approximate distance is ``m`` table
lookups — no per-vector float math at all.

Spark mapping, sized for 100 TB:

* codebooks are MODEL STATE (``m × ksub`` rows) — always broadcast;
* encoding is a narrow projection join (subvector rows × broadcast
  codebook) plus one groupBy on the vector id;
* ADC search is a PURE PROJECTION: the query's distance table collapses to
  ``m`` literal arrays baked into the plan, each corpus row does ``m``
  ``element_at`` lookups, and the only "shuffle" is the final TakeOrdered
  top-k. Nothing anywhere scales with more than codes × corpus size.

Determinism: every distance is a SEQUENTIAL left-to-right fold over the
array (fixed IEEE addition order — same device as operators/similarity.dot,
reproduced in the oracle SQL as an explicit left-associative chain),
argmin/top-k tiebreak on code/id, and the ``iters=0`` codebook (subvectors
of the ``ksub`` lowest-id vectors) is pure relational algebra — giving the
whole PQ path an exact DuckDB oracle twin (queries/features.py::q_pq_knn).
``iters>0`` refines with the same Lloyd scheme as
operators/similarity.kmeans_centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.materialize import truncate_lineage

from lakehouse_architecture_spark.operators.partitioning import spread
from lakehouse_architecture_spark.operators.relational import top_k_per_group

def _sqdist(a: Column, b: Column) -> Column:
    """Squared L2 between two double arrays as a SEQUENTIAL left-to-right
    fold — element order is fixed by the array, so the result is
    bit-deterministic and reproducible by any engine that adds the terms
    in the same order (the oracle SQL spells out the left-associative
    chain; same rationale as :func:`similarity.dot`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, dim: int | None = None
) -> DataFrame:
    """(vid, sub, sv): each vector split into m equal consecutive slices.

    With ``dim`` set, only vectors of EXACTLY that length participate —
    a `% m == 0` check alone is not enough: a half-length vector yields
    short subvectors whose zip_with distance against full codewords is
    NULL, and the argmin tiebreak would then silently assign code 0
    everywhere, corrupting ANN results for mixed-dimension corpora."""
    vecs = spread(df).select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if dim is not None:
        vecs = vecs.filter(F.size("v") == dim)
    else:
        vecs = vecs.filter(F.size("v") % m == 0)
    sub = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    return vecs.select("vid", sub, "v").select(
        "vid",
        "sub",
        F.slice(
            "v", (F.col("sub") * (F.size("v") / m).cast("int")) + 1,
            (F.size("v") / m).cast("int"),
        ).alias("sv"),
    )


def pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 0,
    max_train_rows: int | None = 65536,
) -> DataFrame:
    """Per-subspace codebooks ``(sub, code, cvec)``.

    ``iters=0``: codebook = subvectors of the ``ksub`` lowest-id vectors
    (deterministic, relationally expressible — the oracle-checked path).
    ``iters>0``: Lloyd refinement, all ``m`` subspaces trained jointly in
    one DataFrame per iteration (assignment joins the broadcast codebook
    on ``sub``; means aggregate on (sub, code, pos) — key space
    m × ksub × d_sub, tiny at any corpus size). Like
    ``similarity.kmeans_centroids`` (round 10), the refinement trains on
    at most ``max_train_rows`` vectors — the lowest-``xxhash64(id)``
    sample, deterministic with id tiebreaks — so fitting m × ksub
    codewords never re-scans the full corpus per iteration; the seed and
    the ``iters=0`` path always use the full corpus, and corpora under
    the cap are unaffected.

    The trained dimension is pinned to the LOWEST-ID vector's length
    (deterministic); vectors of any other length are excluded from
    training — mixing dimensions would put unequal-length codewords in
    one codebook (see ``_subvectors``).
    """
    head = df.orderBy(F.col(id_col).asc()).select(
        F.size(F.col(vec_col)).alias("d")
    ).first()
    if head is None:
        raise ValueError("empty corpus — no vectors to train codebooks on")
    if int(head["d"]) % m != 0:
        raise ValueError(f"vector dim {head['d']} not divisible by m={m}")
    subs = _subvectors(df, id_col, vec_col, m, dim=int(head["d"]))
    seed_ids = (
        subs.select("vid")
        .distinct()
        .orderBy("vid")
        .limit(ksub)
        .withColumn("code", F.row_number().over(Window.orderBy("vid")) - 1)
    )
    cb = truncate_lineage(
        subs.join(F.broadcast(seed_ids), "vid").select(
            "sub", "code", F.col("sv").alias("cvec")
        ),
        eager=True,
    )
    train = subs
    if iters > 0 and max_train_rows is not None:
        ids = (
            subs.select("vid")
            .distinct()
            .orderBy(F.xxhash64(F.col("vid")).asc(), F.col("vid").asc())
            .limit(max_train_rows)
        )
        train = truncate_lineage(
            subs.join(F.broadcast(ids), "vid", "left_semi"), eager=True
        )
    for _ in range(iters):
        scored = train.join(F.broadcast(cb), "sub").withColumn(
            "d", _sqdist(F.col("sv"), F.col("cvec"))
        )
        assigned = top_k_per_group(
            scored, ["vid", "sub"], [F.col("d").asc(), F.col("code").asc()], 1
        ).select("sub", "code", "sv")
        means = (
            assigned.select("sub", "code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg("val").alias("mv"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                    lambda s: s["mv"],
                ).alias("cvec")
            )
        )
        # codes that captured no vectors keep their previous centroid
        kept = cb.join(means.select("sub", "code"), ["sub", "code"], "left_anti")
        cb = truncate_lineage(means.unionByName(kept), eager=True)
    return cb


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
) -> DataFrame:
    """Compress each vector to ``(id, codes array<int>)`` — argmin code per
    subspace (tiebreak: lowest code). One broadcast join + one groupBy on
    the id; output is corpus-sized but codes-wide only. Vectors whose
    length differs from the codebook's trained dimension are dropped (see
    ``_subvectors`` — they have no well-defined codes)."""
    first = codebooks.select(F.size("cvec").alias("d")).first()
    if first is None:
        raise ValueError("empty codebooks — did every vector fail the dim filter?")
    subs = _subvectors(df, id_col, vec_col, m, dim=int(first["d"]) * m)
    scored = subs.join(F.broadcast(codebooks), "sub").withColumn(
        "d", _sqdist(F.col("sv"), F.col("cvec"))
    )
    best = top_k_per_group(
        scored, ["vid", "sub"], [F.col("d").asc(), F.col("code").asc()], 1
    ).select("vid", "sub", "code")
    return best.groupBy("vid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"].cast("int"),
        ).alias("codes")
    ).select(F.col("vid").alias(id_col), "codes")


def pq_adc_knn(
    codes_df: DataFrame,
    codebooks: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: ``(id, pq_dist)`` — the ``k`` encoded vectors nearest the
    (uncompressed) query, by summed per-subspace table lookups.

    The distance table is computed ON the broadcast codebooks then
    collected (m × ksub scalars — model state), baked into the plan as one
    literal array per subspace; the corpus side is a pure projection with
    ``m`` ``element_at`` lookups and an exact decimal sum, finished by a
    TakeOrdered — no join, no shuffle, nothing data-sized beyond the scan.
    """
    q = [float(x) for x in query_vec]
    spark = codes_df.sparkSession
    max_sub = codebooks.agg(F.max("sub")).first()[0]
    if max_sub is None:
        raise ValueError("empty codebooks — nothing to search against")
    m = max_sub + 1
    if len(q) % m != 0:
        raise ValueError(f"query dim {len(q)} not divisible by m={m}")
    d_sub = len(q) // m
    qsubs = spark.createDataFrame(
        [(j, q[j * d_sub : (j + 1) * d_sub]) for j in range(m)],
        "sub int, qv array<double>",
    )
    table = (
        codebooks.join(F.broadcast(qsubs), "sub")
        .select("sub", "code", _sqdist(F.col("qv"), F.col("cvec")).alias("d"))
        .collect()
    )
    arrs: dict[int, dict[int, float]] = {}
    for r in table:
        arrs.setdefault(r["sub"], {})[r["code"]] = r["d"]
    # The literal tables are indexed POSITIONALLY (lits[j], element_at at
    # code+1), so the codebook must be dense: sub ids exactly 0..m-1 and
    # each sub's codes exactly 0..ksub-1. A hand-built or filtered codebook
    # with gaps would otherwise raise IndexError or silently return wrong
    # distances (ADVICE r3) — validate contiguity up front.
    if sorted(arrs) != list(range(m)):
        raise ValueError(
            f"codebook sub ids must be dense 0..{m - 1}, got {sorted(arrs)}"
        )
    for j in range(m):
        codes_j = sorted(arrs[j])
        if codes_j != list(range(len(codes_j))):
            raise ValueError(
                f"codebook codes for sub {j} must be dense 0..k-1, got {codes_j}"
            )
    lits = [
        F.lit([arrs[j][c] for c in sorted(arrs[j])]) for j in sorted(arrs)
    ]
    dist = F.aggregate(
        F.array(
            *[F.element_at(lits[j], F.col("codes")[j] + 1) for j in range(m)]
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        codes_df.select(F.col(id_col), dist.alias("pq_dist"))
        .orderBy(F.col("pq_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
