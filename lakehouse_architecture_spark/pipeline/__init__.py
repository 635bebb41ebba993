from lakehouse_architecture_spark.pipeline.medallion import (
    bronze_to_silver_dag,
    bronze_to_silver_listings,
    silver_to_gold,
)

__all__ = ["bronze_to_silver_listings", "bronze_to_silver_dag", "silver_to_gold"]
