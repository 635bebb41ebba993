"""Grouped-map Pandas operators (applyInPandas) — the per-group escape hatch.

Completes the engine's Python-boundary triad: ``mapInPandas`` (multimodal
batch decode), ``applyInPandasWithState`` (stateful streaming), and this —
``groupBy().applyInPandas`` for per-group algorithms that genuinely need a
whole group materialized (model-per-group fitting, per-group resampling).

The demo operator assigns within-group dense ranks over a total order —
chosen because its output is integer-exact, so it is oracle-checkable
against window SQL (any float-producing pandas op would be, too, modulo
rounding). Each group must fit one executor's memory — that's the
applyInPandas contract; for skewed groups pre-split with salting.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    out_rank: str = "grp_rank",
    out_size: str = "grp_size",
) -> DataFrame:
    """Per-group row_number (1-based, over order_cols total order) + group
    size, computed group-at-a-time in pandas via Arrow."""
    in_cols = df.columns
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in in_cols]
        + [f"{out_rank} int", f"{out_size} int"]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        pdf[out_rank] = range(1, len(pdf) + 1)
        pdf[out_size] = len(pdf)
        return pdf

    return df.groupBy(group_col).applyInPandas(per_group, schema=schema)
