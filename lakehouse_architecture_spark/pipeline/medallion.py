"""Medallion pipeline — the reference's bronze→silver→gold, engine-shaped.

Pure DataFrame→DataFrame functions (no Airflow/MinIO coupling) reproducing
both reference silver paths and the gold feature build:

* ``bronze_to_silver_listings`` — the 11-column silver projection of
  ``app/sliver.py:143-155`` with the *intended* cleaning applied (the
  reference registers parse_area/parse_number/normalize_price UDFs at
  ``app/sliver.py:87-89`` but never calls them — SURVEY.md §2.4; we apply
  their semantics as native expressions).
* ``bronze_to_silver_dag`` — the DAG variant's silver
  (``airflow/dags/realestate_pipeline.py:144-154``): dropna on
  price/area → dropDuplicates → casts.
* ``silver_to_gold`` — the gold features
  (``airflow/dags/realestate_pipeline.py:175-183``): location encoding
  (HCM→2, HN→1, else 0) + price_per_m2.

Any scheduler can sequence these; the Structured Streaming ingest in
``streaming/incremental.py`` replaces the reference's ledger/processed-move
bookkeeping with checkpointed exactly-once file discovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.functions.cleaning import (
    normalize_price_expr,
    parse_area_expr,
    parse_number_expr,
)

#: Vietnamese attribute label → silver column (app/sliver.py:143-155).
SILVER_COLUMN_MAP: dict[str, str] = {
    "address": "Address",
    "Diện tích đất": "Area",
    "Chiều ngang": "Frontage",
    "Đặc điểm nhà/đất": "Access Road",
    "Hướng cửa chính": "House Direction",
    "Tổng số tầng": "Floors",
    "Số phòng ngủ": "Bedrooms",
    "Số phòng vệ sinh": "Bathrooms",
    "Giấy tờ pháp lý": "Legal Status",
    "Tình trạng nội thất": "Furniture State",
    "price": "Price",
}

#: Columns cleaned with the U1-U3 expression equivalents.
_AREA_COLS = ("Area", "Frontage")
_INT_COLS = ("Floors", "Bedrooms", "Bathrooms")


def bronze_to_silver_listings(bronze: DataFrame, ingest_date_col: str = "date") -> DataFrame:
    """Listing bronze (LISTING_SCHEMA: fixed cols + attrs map) → typed silver.

    The dynamic Vietnamese keys live in the ``attrs`` map, so a missing
    attribute yields NULL instead of AnalysisException (the reference's
    failure mode on schema drift, SURVEY.md §1.3).
    """
    cols = []
    for src, dst in SILVER_COLUMN_MAP.items():
        base = F.col(src) if src in bronze.columns else F.col("attrs").getItem(src)
        if dst in _AREA_COLS:
            cols.append(parse_area_expr(base).alias(dst))
        elif dst in _INT_COLS:
            cols.append(parse_number_expr(base).alias(dst))
        elif dst == "Price":
            cols.append(normalize_price_expr(base).alias(dst))
        else:
            cols.append(base.cast("string").alias(dst))
    src = (
        bronze.filter(F.col("_corrupt_record").isNull())
        if "_corrupt_record" in bronze.columns
        else bronze
    )
    if ingest_date_col:
        # Partition column from the crawl filename timestamp
        # (crawl_YYYYMMDD_HHMMSS, app/sliver.py:162-167); today's date when
        # the file token is absent.
        file_date = (
            F.to_date(
                F.regexp_extract(F.col("_ingest_file"), r"crawl_(\d{8})_", 1),
                "yyyyMMdd",
            )
            if "_ingest_file" in bronze.columns
            else F.lit(None).cast("date")
        )
        cols.append(F.coalesce(file_date, F.current_date()).alias(ingest_date_col))
    return src.select(F.col("list_id"), *cols)


def bronze_to_silver_dag(bronze: DataFrame) -> DataFrame:
    """DAG-variant silver (realestate_pipeline.py:144-154): dropna on
    price/area, full-row dropDuplicates, typed casts. Column set:
    id, location, area:double, bedrooms:int, price:double."""
    return (
        bronze.select("id", "location", "area", "bedrooms", "price")
        .na.drop(subset=["price", "area"])
        .dropDuplicates()
        .withColumn("area", F.col("area").cast("double"))
        .withColumn("bedrooms", F.col("bedrooms").cast("int"))
        .withColumn("price", F.col("price").cast("double"))
    )


def silver_to_gold(silver: DataFrame) -> DataFrame:
    """Gold features (realestate_pipeline.py:175-183): categorical location
    encoding HCM→2 / HN→1 / else 0 and price_per_m2 = price/area (Spark
    non-ANSI division semantics preserved: x/0 → NULL, as in the 3.3
    reference)."""
    return silver.withColumn(
        "location_encoded",
        F.when(F.col("location") == "HCM", 2)
        .when(F.col("location") == "HN", 1)
        .otherwise(0),
    ).withColumn("price_per_m2", F.col("price") / F.col("area"))
