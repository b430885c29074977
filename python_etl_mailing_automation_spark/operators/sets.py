"""Set operations (SURVEY.md §2.7)."""

from __future__ import annotations

from collections.abc import Iterable
from functools import reduce

from pyspark.sql import DataFrame


def union_all_by_name(frames: Iterable[DataFrame]) -> DataFrame:
    """U1: UNION ALL of heterogenous frames by column name, missing
    columns null-filled.

    Reference: ``pd.concat(sheet_dict.values(), ignore_index=True)`` over
    workbook sheets (processing_pipeline.py:141). ``unionByName`` with
    ``allowMissingColumns`` is the Spark equivalent — no shuffle, just plan
    concatenation.
    """
    frames = list(frames)
    if not frames:
        raise ValueError("union_all_by_name needs at least one frame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
