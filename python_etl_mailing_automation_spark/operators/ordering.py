"""Ordering / ranking / priority operators (SURVEY.md §2.6 + §2.5 W3).

The reference's priority sort is a *global* sort whose only observable
effect is output-file row order plus the head-row pick (A5). At 100 TB a
global sort is the most expensive thing you can ask of a cluster, so the
engine exposes the priority as a *column* (usable in window orderBy / range
partitioning / `sortWithinPartitions`) and keeps per-group ranking as
windows — never a global ordering dependency.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_priority_level(
    df: DataFrame,
    match_cols: Sequence[str],
    priority_order: Sequence[str],
    *,
    out_col: str = "priority_level",
) -> DataFrame:
    """O1: case-mapped priority level with **last-match-wins** semantics.

    Reference (processing_pipeline.py:253-275): for each status in the
    ordered list, rows where ANY of the match columns uppercased equals the
    status get level=i — later list entries overwrite earlier ones; rows
    matching nothing get ``len(priority_order)``.

    Built as a folded ``when`` chain where entry *i* wraps the accumulated
    expression (so the highest matching index wins), exactly reproducing
    the overwrite order (SURVEY.md §7.3 risk 4).
    """
    level: Column = F.lit(len(priority_order))
    for i, status in enumerate(priority_order):
        cond = None
        for mc in match_cols:
            eq = F.upper(F.trim(F.col(mc).cast("string"))) == F.lit(status.upper())
            cond = eq if cond is None else (cond | eq)
        level = F.when(cond, F.lit(i)).otherwise(level)
    return df.withColumn(out_col, level)


def rank_in_group(
    df: DataFrame,
    key: str | Sequence[str],
    order_by: Sequence[Column],
    *,
    out_col: str = "rank_in_group",
) -> DataFrame:
    """A6/W3: 1-based rank within group (pandas ``cumcount()+1`` after a
    sort, gerador_robo_mestre.py:43-44) as a ``row_number`` window."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(out_col, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame,
    key: str | Sequence[str],
    order_by: Sequence[Column],
    k: int,
    *,
    rank_col: str = "rank_in_group",
) -> DataFrame:
    """O2: per-group top-k (rank ≤ k invoices per CPF,
    gerador_robo_mestre.py:46). Single shuffle; no global sort."""
    return rank_in_group(df, key, order_by, out_col=rank_col).filter(F.col(rank_col) <= k)


def head_row_per_group(
    df: DataFrame, key: str | Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """A5/O4: explicit-order head row per group.

    The reference's ``groupby(CPF).first()`` silently consumed the global
    priority sort (gerador_robo_mestre.py:57 after
    processing_pipeline.py:355); here the ordering keys are explicit window
    keys — deterministic on any cluster (SURVEY.md §7.3 risk 1).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    rn = "__head_rn"
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1).drop(rn)


def morton_key(
    x: Column | str,
    y: Column | str,
    *,
    bits: int = 16,
) -> Column:
    """Z-order (Morton) interleaving of two non-negative integer
    dimensions — the multi-dimensional clustering key behind lakehouse
    Z-ORDER data skipping: sorting/range-partitioning files by this key
    (``sources.io.write_globally_sorted``) gives every file a tight
    bounding box in BOTH dimensions, so min/max pruning works for
    predicates on either column, not just the leading sort key.

    Pure bit algebra (2·``bits`` shift/mask terms, codegen'd, no UDF):
    bit i of x lands at position 2i, bit i of y at 2i+1. Inputs are
    masked to ``bits`` (callers quantize/clamp first — rank or bucket
    the raw values when their range exceeds 2^bits). bits <= 31 keeps
    the result in a signed 64-bit long.
    """
    if not 1 <= bits <= 31:
        raise ValueError("morton_key: bits must be in [1, 31]")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + (
            F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key
