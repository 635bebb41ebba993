from lakehouse_architecture_spark.operators.relational import (
    asof_join,
    range_join_bucketed,
    top_k_per_group,
)

__all__ = ["top_k_per_group", "asof_join", "range_join_bucketed"]
