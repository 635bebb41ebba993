"""Assembles the full query registry consumed by __spark_entry__.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakehouse_architecture_spark.queries.base import QuerySpec
from lakehouse_architecture_spark.queries.events import EVENTS_QUERIES
from lakehouse_architecture_spark.queries.relational import RELATIONAL_QUERIES
from lakehouse_architecture_spark.queries.relational2 import RELATIONAL2_QUERIES
from lakehouse_architecture_spark.queries.relational3 import RELATIONAL3_QUERIES
from lakehouse_architecture_spark.queries.relational4 import RELATIONAL4_QUERIES
from lakehouse_architecture_spark.queries.textops import TEXTOPS_QUERIES
from lakehouse_architecture_spark.queries.timeseries import TIMESERIES_QUERIES

_SPECS: tuple[QuerySpec, ...] = (
    *RELATIONAL_QUERIES,
    *RELATIONAL2_QUERIES,
    *RELATIONAL3_QUERIES,
    *RELATIONAL4_QUERIES,
    *EVENTS_QUERIES,
    *TEXTOPS_QUERIES,
    *TIMESERIES_QUERIES,
)

# The per-round correctness harness checks the FIRST 50 registry entries.
# Round 1 verified these 49 (green rows in CORRECTNESS_r01.json), so they
# rotate to the back and the 41 not-yet-oracle-checked queries (dedup /
# similarity / text / events / timeseries / TPC-H tail + the q_approx_aggs
# fix) surface into the checked window. Rotate again next round so no
# regression hides behind the 50-slot cap.
_VERIFIED_R01: frozenset[str] = frozenset(
    {
        "q01_pricing_summary", "q02_filter_project", "q03_top_revenue_orders",
        "q05_nation_revenue", "q06_filtered_revenue", "q_join_left_anti",
        "q_join_left_semi", "q_join_left_outer", "q_agg_distinct", "q_rollup",
        "q_cube", "q_window_topk", "q_window_running", "q_sort_limit",
        "q_set_ops", "q_distinct", "q_pivot", "q_string_funcs", "q_date_funcs",
        "q04_priority_exists", "q07_trade_matrix", "q10_returned_revenue",
        "q13_order_distribution", "q18_large_orders", "q22_rich_idle",
        "q_correlated_subquery", "q_in_subquery", "q_grouping_sets",
        "q_math_funcs", "q_array_funcs", "q_explode", "q_analytic_windows",
        "q_percentile", "q_conditional_agg", "q_map_funcs", "q_range_frame",
        "q_hash_sample", "q_string_funcs2", "q_unpivot", "q_minmax_by",
        "q_date_arith", "q_null_funcs", "q_bit_ops", "q_collect",
        "q_cross_join", "q_regexp_all", "q08_market_share",
        "q09_product_profit", "q11_important_parts",
    }
)

ALL_QUERIES: dict[str, QuerySpec] = {
    spec.name: spec
    for spec in sorted(
        _SPECS, key=lambda s: (s.name in _VERIFIED_R01, _SPECS.index(s))
    )
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in ALL_QUERIES.items()
        if spec.oracle is not None
    }
