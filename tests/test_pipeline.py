"""Medallion pipeline end-to-end on reference-shaped fixtures (FIXTURES.md A)."""

import json

from pyspark.sql import functions as F

from lakehouse_architecture_spark.pipeline.medallion import (
    bronze_to_silver_dag,
    bronze_to_silver_listings,
    silver_to_gold,
)
from lakehouse_architecture_spark.sources.readers import read_bronze_json


def _write_bronze(tmp_path, rows, name="crawl_20250927_101500.json"):
    p = tmp_path / name
    p.write_text(json.dumps(rows))
    return str(tmp_path)


def test_listing_silver(spark, tmp_path):
    rows = [
        {
            "list_id": "1",
            "title": "Nhà đẹp",
            "price": "5,2 tỷ",
            "address": "Q1, HCM",
            "images": ["u1", "u2"],
            "attrs": {
                "Diện tích đất": "80 m²",
                "Tổng số tầng": "3",
                "Số phòng ngủ": "4",
                "Giấy tờ pháp lý": "Sổ hồng",
            },
        },
        {
            "list_id": "2",
            "title": "Đất nền",
            "price": "800 triệu",
            "address": None,
            "images": [],
            "attrs": {"Diện tích đất": "abc"},
        },
    ]
    path = _write_bronze(tmp_path, rows)
    bronze = read_bronze_json(spark, path)
    silver = bronze_to_silver_listings(bronze)
    got = {r["list_id"]: r.asDict() for r in silver.collect()}

    assert got["1"]["Area"] == 80.0
    assert got["1"]["Floors"] == 3
    assert got["1"]["Bedrooms"] == 4
    assert got["1"]["Price"] == 5.2
    assert got["1"]["Legal Status"] == "Sổ hồng"
    assert str(got["1"]["date"]) == "2025-09-27"  # from the crawl filename
    assert got["2"]["Area"] is None  # unparseable -> NULL, not an error
    assert got["2"]["Price"] == 0.8
    assert got["2"]["Bathrooms"] is None  # missing attr -> NULL (no exception)


def test_corrupt_bronze_quarantined(spark, tmp_path):
    (tmp_path / "crawl_20250927_000000.json").write_text('{"list_id": "ok1"}')
    (tmp_path / "garbage.json").write_text("this is not json {{{")
    bronze = read_bronze_json(spark, str(tmp_path), multi_line=False)
    silver = bronze_to_silver_listings(bronze)
    ids = [r["list_id"] for r in silver.collect()]
    assert ids == ["ok1"]  # corrupt rows dropped, job did not fail


def test_dag_silver_and_gold(spark):
    bronze = spark.createDataFrame(
        [
            ("1", "HCM", "80", "3", "5000000"),
            ("1", "HCM", "80", "3", "5000000"),  # exact duplicate
            ("2", "HN", "abc", "2", "3000000"),  # area cast -> NULL
            ("3", "DN", "50", None, None),  # price null -> dropped
        ],
        "id string, location string, area string, bedrooms string, price string",
    )
    silver = bronze_to_silver_dag(bronze)
    rows = {r["id"]: r.asDict() for r in silver.collect()}
    assert len(rows) == 2  # duplicate removed, null-price row dropped
    assert rows["1"]["area"] == 80.0 and rows["1"]["bedrooms"] == 3
    assert rows["2"]["area"] is None  # 'abc' cast -> NULL (non-ANSI semantics)

    gold = silver_to_gold(silver)
    g = {r["id"]: r.asDict() for r in gold.collect()}
    assert g["1"]["location_encoded"] == 2  # HCM -> 2 (pipeline.py:175-180)
    assert g["2"]["location_encoded"] == 1  # HN -> 1
    assert g["1"]["price_per_m2"] == 5000000.0 / 80.0


def test_gold_division_semantics(spark):
    # Spark (non-ANSI, as in the 3.3 reference) yields NULL for x/0 — the
    # SQL Divide operator, not IEEE Infinity.
    silver = spark.createDataFrame(
        [("1", "HCM", 0.0, 1, 100.0)],
        "id string, location string, area double, bedrooms int, price double",
    )
    g = silver_to_gold(silver).collect()[0]
    assert g["price_per_m2"] is None


def test_corpus_curation_full_chain_with_near_dedup(spark):
    from lakehouse_architecture_spark.pipeline.corpus import (
        CurationConfig,
        curate_corpus,
        curation_report,
    )

    rows = []
    # 6 good English docs in two sources, including an exact dup pair and a
    # near-dup pair (one token differs out of 12)
    base = "the cat sat of the mat and it is a fine day"
    near = "the cat sat of the mat and it is a fine night"
    for i, (src, txt) in enumerate([
        ("s1", base), ("s1", base), ("s1", near),
        ("s2", "the dog ran of the hill and is a good boy"),
        ("s2", "el perro corre y la casa de que y el"),      # spanish
        ("s1", "the of and is a " * 3),
    ]):
        rows.append((i, txt, "en", src, len(txt)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    cfg = CurationConfig(
        languages=("en",), min_quality=0.0, source_cap=5,
        token_budget=100, near_dedup=True, minhash_perms=16, minhash_bands=8,
        min_shared_bands=1,
    )
    out = curate_corpus(docs, cfg)
    kept = {r["doc_id"] for r in out.collect()}
    assert cfg.stages == [
        "language", "quality", "exact_dedup", "near_dedup", "source_cap",
        "token_budget",
    ]
    assert 4 not in kept          # spanish filtered
    assert 1 not in kept          # exact dup loses to doc 0
    assert 2 not in kept          # near dup of doc 0 (J~0.67 -> bands fire)
    assert 0 in kept and 3 in kept
    rep = {r["source"]: (r["docs_in"], r["docs_out"]) for r in curation_report(
        docs, out).collect()}
    assert rep["s1"][0] == 4 and rep["s2"][0] == 2
    assert rep["s1"][1] >= 1 and rep["s2"][1] >= 1


def test_curate_corpus_with_dsir_and_semantic_stages(spark):
    from tests.conftest import SF_SMOKE
    from lakehouse_architecture_spark.pipeline.corpus import (
        CurationConfig,
        curate_corpus,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cfg = CurationConfig(
        languages=(),
        min_quality=-1e9,
        dsir_target_sources=("src0", "src1", "src2"),
        min_dsir=-1e9,            # permissive: stage runs, drops nothing scored
        semantic_dedup=True,
        semantic_cells=4,
        semantic_min_cos=0.3,     # isotropic fixture: prunes a real subset
    )
    out = curate_corpus(docs, cfg, embeddings=emb)
    assert cfg.stages == ["quality", "dsir", "exact_dedup", "semantic_dedup"]
    n_in = docs.count()
    n_out = out.count()
    assert 0 < n_out < n_in  # semantic stage really pruned something
    # no id appears twice after the dedup stages
    assert out.select("doc_id").distinct().count() == n_out

    # semantic off + embeddings absent must not raise
    cfg2 = CurationConfig(languages=(), min_quality=-1e9)
    assert curate_corpus(docs, cfg2).count() >= n_out


def test_curate_corpus_dsir_half_config_raises(spark):
    import pytest

    from tests.conftest import SF_SMOKE
    from lakehouse_architecture_spark.pipeline.corpus import (
        CurationConfig,
        curate_corpus,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    with pytest.raises(ValueError, match="dsir_target_sources"):
        curate_corpus(docs, CurationConfig(languages=(), min_dsir=0.5))
    with pytest.raises(ValueError, match="dsir_target_sources"):
        curate_corpus(
            docs, CurationConfig(languages=(), dsir_target_sources=("src0",))
        )
