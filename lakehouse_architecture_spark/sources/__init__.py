from lakehouse_architecture_spark.sources.readers import (
    LISTING_SCHEMA,
    read_bronze_csv,
    read_bronze_json,
)
from lakehouse_architecture_spark.sources.writers import write_partitioned

__all__ = [
    "read_bronze_json",
    "read_bronze_csv",
    "write_partitioned",
    "LISTING_SCHEMA",
]
