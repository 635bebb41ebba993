"""Persisted inverted-index search: parity with corpus-scan BM25, and
bucket pruning at query time."""

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.text import (
    bm25_scores,
    build_search_index,
    search_index,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog outpaces a quick fox"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "the dog sleeps all day the dog dreams"),
    (5, "fox fox fox"),
]


def test_search_index_matches_corpus_scan_bm25(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, docstats = build_search_index(df, "doc_id", "text")
    terms = ("quick", "fox")
    via_index = search_index(postings, docstats, terms, k=10).collect()
    via_scan = {
        r["id"]: (r["score"], r["n_hit"])
        for r in bm25_scores(df, "doc_id", "text", terms).collect()
    }
    assert len(via_index) == len(via_scan)
    for r in via_index:
        assert via_scan[r["id"]] == (r["score"], r["n_hit"])
    # ranking is deterministic: score desc, id asc
    scores = [(r["score"], -r["id"]) for r in via_index]
    assert scores == sorted(scores, reverse=True)


def test_bucketed_postings_prune_at_query_time(spark, tmp_path):
    from lakehouse_architecture_spark.catalog import Catalog
    from lakehouse_architecture_spark.plans.inspect import formatted_plan

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, docstats = build_search_index(df, "doc_id", "text")
    cat = Catalog(spark, root=str(tmp_path))
    spark.sql("DROP TABLE IF EXISTS postings_idx")
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        # the auto heuristic drops bucketed scans for filter-only queries
        # (it doesn't credit bucket PRUNING) — pin it for the lookup path
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        cat.save_as_table(postings, "postings_idx", bucket_by=(8, ("term",)))
        stored = spark.table("postings_idx")
        plan = formatted_plan(stored.filter(F.col("term").isin("quick", "fox")))
        # bucket pruning: the scan reads only the query terms' buckets
        assert "SelectedBucketsCount" in plan, plan[:2000]
        got = {
            (r["term"], r["id"]): r["tf"]
            for r in stored.filter(F.col("term").isin("quick", "fox")).collect()
        }
        assert got[("fox", 5)] == 3 and got[("quick", 2)] == 2
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
        spark.sql("DROP TABLE IF EXISTS postings_idx")
