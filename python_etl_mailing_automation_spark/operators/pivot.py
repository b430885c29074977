"""Rank-pivot (long→wide) operator (SURVEY.md §2.4 A6+A7+O2).

Reference: rank invoices per CPF by due date, keep top 3, pivot to
``{value}_{rank}`` wide columns (gerador_robo_mestre.py:43-55).

Scale: two strategies.

- ``order_keys`` given (preferred when per-key row counts are bounded,
  as in the reference's invoices-per-CPF domain): ONE hash aggregation —
  ``slice(array_sort(collect_list(struct(order…, values…))), 1, k)``,
  struct field order doubling as the sort order. Single shuffle with
  map-side partial aggregation, no per-partition window sort, no pivot
  aggregate. Per-group state is O(group size); don't use it when one key
  can hold millions of rows.
- ``order_keys`` omitted: window ``row_number`` + ``groupBy().pivot(rank,
  [1..k])`` with an explicit pivot-value list (avoids the extra
  distinct-values job); both shuffles key on ``key`` so the exchange is
  reused. ``first()`` in the pivot agg is deterministic because the input
  is pre-ranked to a single row per (key, rank). Safe for unbounded
  groups (no per-group materialization).
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
    order_keys: Sequence[Column] | None = None,
) -> DataFrame:
    """Return one row per ``key`` with ``{value}_{i}`` columns for i=1..k,
    taking values from the i-th row under ``order_by``.

    ``order_keys``: optional value expressions whose ascending
    lexicographic order equals ``order_by`` (negate numerics for desc);
    supplying them switches to the fused single-aggregation strategy.
    Callers must pass non-null order keys (or accept array_sort's
    nulls-last placement, vs the window's nulls-first).
    """
    if order_keys is not None:
        row = F.struct(
            *[c.alias(f"__o{i}") for i, c in enumerate(order_keys)],
            *[F.col(c).alias(c) for c in value_cols],
        )
        agged = df.groupBy(key).agg(
            F.slice(F.array_sort(F.collect_list(row)), 1, k).alias("__rows")
        )
        return agged.select(
            key,
            # F.get (not []) so a <k-row key yields nulls under ANSI.
            *[
                F.get("__rows", i - 1).getField(c).alias(f"{c}_{i}")
                for i in range(1, k + 1)
                for c in value_cols
            ],
        )
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
