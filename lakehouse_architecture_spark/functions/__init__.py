from lakehouse_architecture_spark.functions.aggregates import davg, dsum
from lakehouse_architecture_spark.functions.cleaning import (
    normalize_price_expr,
    parse_area_expr,
    parse_number_expr,
)
from lakehouse_architecture_spark.functions.hashing import md5_hash64

__all__ = [
    "dsum",
    "davg",
    "parse_area_expr",
    "parse_number_expr",
    "normalize_price_expr",
    "md5_hash64",
]
