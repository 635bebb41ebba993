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

ALL_QUERIES: dict[str, QuerySpec] = {
    spec.name: spec
    for spec in (
        *RELATIONAL_QUERIES,
        *RELATIONAL2_QUERIES,
        *RELATIONAL3_QUERIES,
        *RELATIONAL4_QUERIES,
        *EVENTS_QUERIES,
        *TEXTOPS_QUERIES,
        *TIMESERIES_QUERIES,
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
