"""Experiment: shuffle-free array-based MinHash vs. the wide-agg form.

The incumbent (operators/dedup.py:minhash_signatures) explodes shingles and
min-aggregates num_perm permutations in one groupBy — one shuffle carrying
the entire distinct-shingle corpus. The candidate formulation keeps the
shingle set as a per-row ARRAY and computes all num_perm minima in a single
``aggregate`` higher-order pass — zero shuffles before the band bucket join.
Run: python tools/exp_minhash_array.py [sf_dir]

MEASURED (sf0.1, local[32], best of 3, identical 2126-pair output):
wide_agg 1.25 s vs array_hof 4.95 s — the "shuffle-free" form is ~4x
SLOWER. Higher-order-function lambdas are evaluated interpreted, outside
whole-stage codegen, and the ``aggregate``'s zip_with allocates a fresh
num_perm-element array per shingle; the explode+groupBy form keeps every
permutation update inside codegen'd hash-agg arithmetic with map-side
partial mins, so the shuffle it pays carries only (id, 16 longs) per doc
after partial aggregation — tiny. Kept the wide-agg formulation; this
file stays as the measured record of the road not taken.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from lakehouse_architecture_spark.functions.hashing import (
    MERSENNE_P,
    md5_hash64,
    minhash_perm,
)
from lakehouse_architecture_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_array,
)
from lakehouse_architecture_spark.operators.partitioning import spread_by_id
from lakehouse_architecture_spark.session import SessionFactory


def minhash_lsh_candidates_array(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    r = num_perm // bands
    df = spread_by_id(df, id_col)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    sh = F.filter(
        F.array_distinct(ngram_array(toks, shingle_n)),
        lambda s: F.length(s) > 0,
    )
    harr = F.transform(sh, lambda s: md5_hash64(s))
    sig = (
        df.select(F.col(id_col).alias("id"), harr.alias("__h"))
        .filter(F.size("__h") > 0)
        .select(
            "id",
            F.aggregate(
                F.col("__h"),
                F.array_repeat(F.lit(MERSENNE_P).cast("bigint"), num_perm),
                lambda acc, x: F.zip_with(
                    acc,
                    F.sequence(F.lit(0), F.lit(num_perm - 1)),
                    lambda m, i: F.least(m, minhash_perm(x, i)),
                ),
            ).alias("__mh"),
        )
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col("__mh").getItem(b * r + j).cast("string")
                        for j in range(r)
                    ],
                ).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    band = sig.select("id", F.explode(band_structs).alias("bs")).select(
        "id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    a = band.alias("a")
    b = band.alias("b")
    return (
        a.join(b, on=["band", "sig"])
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = SessionFactory(app_name="exp_minhash").get_or_create()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    variants = {
        "wide_agg": lambda: minhash_lsh_candidates(
            docs, "doc_id", "text", num_perm=16, bands=4, shingle_n=3
        ),
        "array_hof": lambda: minhash_lsh_candidates_array(
            docs, "doc_id", "text", num_perm=16, bands=4, shingle_n=3
        ),
    }
    # correctness cross-check first
    rows = {}
    for name, build in variants.items():
        rows[name] = sorted(
            (r.id_a, r.id_b, r.n_shared_bands) for r in build().collect()
        )
    assert rows["wide_agg"] == rows["array_hof"], (
        len(rows["wide_agg"]),
        len(rows["array_hof"]),
        rows["wide_agg"][:3],
        rows["array_hof"][:3],
    )
    print(f"parity OK: {len(rows['wide_agg'])} pairs")

    for name, build in variants.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
