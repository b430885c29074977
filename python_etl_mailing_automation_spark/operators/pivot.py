"""Rank-pivot (long→wide) operator (SURVEY.md §2.4 A6+A7+O2).

Reference: rank invoices per CPF by due date, keep top 3, pivot to
``{value}_{rank}`` wide columns (gerador_robo_mestre.py:43-55).

Scale: ``groupBy().pivot(rank, [1..k])`` with an explicit pivot-value list
avoids the extra distinct-values job and keeps one shuffle; `first()` in
the pivot agg is deterministic here because the input is pre-ranked to a
single row per (key, rank).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ordering import top_k_per_group


def rank_pivot_wide(
    df: DataFrame,
    key: str,
    order_by: Sequence[Column],
    value_cols: Sequence[str],
    k: int = 3,
    *,
    rank_col: str = "__pivot_rank",
) -> DataFrame:
    """Return one row per ``key`` with ``{value}_{i}`` columns for i=1..k,
    taking values from the i-th row under ``order_by``."""
    ranked = top_k_per_group(df, key, order_by, k, rank_col=rank_col)
    wide = (
        ranked.groupBy(key)
        .pivot(rank_col, list(range(1, k + 1)))
        .agg(*[F.first(c).alias(c) for c in value_cols])
    )
    # Spark names pivot columns "<pivotval>_<agg alias>" (single agg:
    # "<pivotval>"); normalize to "<value>_<rank>".
    if len(value_cols) == 1:
        renames = {str(i): f"{value_cols[0]}_{i}" for i in range(1, k + 1)}
    else:
        renames = {
            f"{i}_{c}": f"{c}_{i}" for i in range(1, k + 1) for c in value_cols
        }
    return wide.withColumnsRenamed(renames)
