"""ANN recall measurement — "measure, don't guess" for the similarity ops.

Computes recall@k of each approximate-nearest-neighbor path against
brute-force cosine ground truth on the embeddings fixture:

* ``ivf_knn`` at nprobe = 1, 2, 4 (the IVF cost/recall knob)
* ``quantized_knn`` (int8 scalar quantization)

Prints one JSON line per configuration. Usage:

    python tools/ann_recall.py [sf_dir] [k]

Interpretation note: the fixture embeddings are ISOTROPIC (measured
same-label vs cross-label mean cosine 0.0016 vs 0.0003 at sf0.01 — no
cluster structure), which is the worst case for any inverted-file index;
IVF recall here is a floor, not a typical value. What the numbers DO
verify: recall rises monotonically with nprobe (the knob works) and int8
quantization holds recall near 1 (sf0.01: nprobe 1/2/4 → 0.20/0.33/0.46;
int8 → 0.95). PQ (8 bytes/vector, scored vs exact-L2 truth) lands ~0.22–0.28
on this isotropic fixture — the expected floor for 64d→8-code compression
with no cluster structure; on real embedding corpora PQ recall tracks the
cluster quality, and the m/ksub knobs trade memory for recall.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.similarity import (
    brute_force_knn,
    ivf_knn,
    quantized_knn,
)
from lakehouse_architecture_spark.session import SessionFactory


def recall_at_k(truth: dict[int, set], approx_rows, k: int) -> float:
    got: dict[int, set] = {}
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return hits / (len(truth) * k)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = SessionFactory(app_name="ann_recall").get_or_create()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    n = emb.count()
    queries = emb.orderBy(F.col("vec_id").desc()).limit(32).cache()

    t0 = time.time()
    truth_rows = brute_force_knn(emb, queries, k=k).collect()
    t_brute = time.time() - t0
    truth: dict[int, set] = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    results = []
    for nprobe in (1, 2, 4):
        t0 = time.time()
        # default quantizer (k-means-trained since round 10) — the
        # seeded-vs-trained A/B lives in the arms section below
        rows = ivf_knn(emb, queries, n_cells=16, k=k, nprobe=nprobe).collect()
        results.append(
            {
                "method": f"ivf-default(cells=16,nprobe={nprobe})",
                "recall_at_k": round(recall_at_k(truth, rows, k), 4),
                "sec": round(time.time() - t0, 2),
            }
        )

    t0 = time.time()
    rows = quantized_knn(emb, queries, k=k).collect()
    results.append(
        {
            "method": "int8-quantized",
            "recall_at_k": round(recall_at_k(truth, rows, k), 4),
            "sec": round(time.time() - t0, 2),
        }
    )

    # PQ is an L2-metric index: score it against exact-L2 ground truth
    # (cosine truth would charge PQ for the metric mismatch, not its
    # quantization error). Driver-side exact L2 is fine at fixture scale.
    import numpy as np

    from lakehouse_architecture_spark.operators.pq import (
        pq_adc_knn,
        pq_codebooks,
        pq_encode,
    )

    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    qids = [r.vec_id for r in queries.limit(8).collect()]
    l2_truth = {}
    for qid in qids:
        d = {vid: float(((v - vecs[qid]) ** 2).sum()) for vid, v in vecs.items()}
        l2_truth[qid] = set(sorted(d, key=lambda x: (d[x], x))[:k])
    for iters, label in ((0, "pq(m=8,ksub=16,seed)"), (2, "pq(m=8,ksub=16,lloyd2)")):
        cb = pq_codebooks(emb, m=8, ksub=16, iters=iters)
        codes = pq_encode(emb, cb).localCheckpoint(eager=True)
        t0 = time.time()
        hits = 0
        for qid in qids:
            top = pq_adc_knn(codes, cb, [float(x) for x in vecs[qid]], k=k).collect()
            hits += len({r.vec_id for r in top} & l2_truth[qid])
        results.append(
            {
                "method": label,
                "recall_at_k": round(hits / (len(qids) * k), 4),
                "sec": round(time.time() - t0, 2),
                "metric": "l2",
            }
        )

    # Whitening A/B (round 9, r7 directive #5): PCA-whiten the corpus and
    # re-run the same IVF configs in whitened space, scored against
    # whitened-space brute-force truth — measures whether decorrelation
    # makes the k-means cells rounder (Jegou et al. 2011 apply whitening
    # before quantization for exactly this reason). Both arms also run
    # with kmeans-trained centroids, since a trained quantizer is where
    # rounder cells would show up.
    from lakehouse_architecture_spark.operators.embedding import pca_whiten
    from lakehouse_architecture_spark.operators.similarity import (
        kmeans_centroids,
    )

    dim = len(emb.select("embedding").first()["embedding"])
    t0 = time.time()
    wh = (
        pca_whiten(emb, "vec_id", "embedding", dim=dim, k=dim)
        .withColumnRenamed("whitened", "embedding")
        .cache()
    )
    wh.count()
    t_whiten = time.time() - t0
    wq = wh.join(queries.select("vec_id"), "vec_id").cache()
    wtruth: dict[int, set] = {}
    for r in brute_force_knn(wh, wq, k=k).collect():
        wtruth.setdefault(r.query_id, set()).add(r.neighbor_id)

    arms = [
        ("raw", emb, queries, truth, None),
        ("whitened", wh, wq, wtruth, None),
        ("raw+kmeans", emb, queries, truth, kmeans_centroids(emb, n_cells=16)),
        (
            "whitened+kmeans",
            wh,
            wq,
            wtruth,
            kmeans_centroids(wh, n_cells=16),
        ),
    ]
    for label, corpus, qs, tr, cents in arms:
        for nprobe in (1, 2, 4):
            t0 = time.time()
            rows = ivf_knn(
                corpus, qs, n_cells=16, k=k, nprobe=nprobe, centroids=cents
            ).collect()
            results.append(
                {
                    "method": f"ivf-{label}(cells=16,nprobe={nprobe})",
                    "recall_at_k": round(recall_at_k(tr, rows, k), 4),
                    "sec": round(time.time() - t0, 2),
                    "whiten_sec": round(t_whiten, 2)
                    if label.startswith("whitened")
                    else 0.0,
                }
            )

    for r in results:
        print(json.dumps({"corpus": n, "k": k, "brute_sec": round(t_brute, 2), **r}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
