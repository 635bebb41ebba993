from lakehouse_architecture_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    plan_summary,
)

__all__ = [
    "plan_summary",
    "assert_broadcast_join",
    "assert_pushed_filters",
    "assert_no_cartesian",
]
