"""Key-dedup operators (SURVEY.md §2.5 W1/W2).

Implemented as a single window pass: ``row_number`` over an explicit
preference order, keep rank 1. The pandas reference relied on implicit
global sort order plus ``drop_duplicates`` (processing_pipeline.py:92-109,
compressor.py:37-54); Spark has no cross-operator order guarantee, so the
preference is encoded in the window ``orderBy`` — which also makes the
reference's tie nondeterminism (SURVEY.md §7.3 risk 1) deterministic.

Scale: one shuffle on the dedup key; no global sort. Skewed keys (one CPF
with millions of rows) are handled by AQE skew-join/partition splitting —
and a `row_number` window over a hot key is still a single-partition sort,
so for pathological skew prefer `max_by`-style reduction when the
preference is expressible as a single struct ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_best(
    df: DataFrame,
    key: str | list[str],
    order_by: list[Column],
    *,
    tiebreaker: str | None = None,
) -> DataFrame:
    """W1/W2: keep exactly one row per key, the first under ``order_by``.

    - W1 "smart dedup" (prefer rows with a name): ``order_by=[desc(has_name)]``
      with the flag built as ``col('nomecad').isNotNull()``.
    - W2 "completeness dedup": ``order_by=[desc(completude)]`` — the evident
      intent; the reference's literal ``keep='last'``-after-descending-sort
      keeps the LEAST complete row, an acknowledged reference bug
      (SURVEY.md §7.3 risk 3). This engine implements the intent.

    ``tiebreaker`` (a column name, e.g. a stable id) is appended ascending
    to make results deterministic under ties.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = list(order_by)
    if tiebreaker is not None:
        order.append(F.col(tiebreaker).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    rn = "__dedup_rn"
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1).drop(rn)


def smart_dedup_prefer_named(
    df: DataFrame, key: str, name_col: str, *, tiebreaker: str | None = None
) -> DataFrame:
    """W1 exactly as the reference frames it: among duplicate ``key`` rows,
    prefer ones whose ``name_col`` is non-null
    (processing_pipeline.py:92-109)."""
    has_name = F.col(name_col).isNotNull() & (F.trim(F.col(name_col).cast("string")) != "")
    return dedup_keep_best(df, key, [has_name.desc()], tiebreaker=tiebreaker)
