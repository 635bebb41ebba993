from lakehouse_architecture_spark.queries.registry import ALL_QUERIES, oracle_sql, queries

__all__ = ["ALL_QUERIES", "queries", "oracle_sql"]
