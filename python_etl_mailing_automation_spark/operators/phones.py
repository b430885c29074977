"""Phone-spread operator (SURVEY.md §2.9 UD1) as pure array algebra.

The reference's hottest code path is a row-at-a-time Python apply over the
full mailing (``progress_apply(popular_telefones, axis=1)``,
processing_pipeline.py:168-182). No UDF is needed: concat the enriched
best-first list with the cleaned fallback phones, dedupe preserving first
occurrence (`array_distinct` keeps first-seen order), spread the first N
into fixed columns. Whole-stage codegen end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import clean_phone_number


def spread_phone_columns(
    df: DataFrame,
    enriched_list_col: str | None,
    fallback_cols: Sequence[str],
    *,
    n_out: int = 4,
    out_prefix: str = "telefone_",
) -> DataFrame:
    """Produce ``{out_prefix}01..0N`` from the enriched list plus cleaned
    fallback phone columns, first-seen-deduped, best-first.

    ``enriched_list_col`` may be None (enrichment step skipped — the
    reference degrades the same way, processing_pipeline.py:143-144).
    """
    if fallback_cols:
        fallback = F.array_compact(
            F.array(*[clean_phone_number(c) for c in fallback_cols])
        )
    else:
        # No-arg F.array() is VOID-typed, which breaks sinks downstream —
        # pin the empty array to array<string>.
        fallback = F.array().cast("array<string>")
    if enriched_list_col is not None:
        enriched = F.coalesce(F.col(enriched_list_col), F.array().cast("array<string>"))
        merged = F.concat(enriched, fallback)
    else:
        merged = fallback
    merged = F.array_distinct(merged)
    tmp = "__phones_merged"
    out = df.withColumn(tmp, merged)
    for i in range(1, n_out + 1):
        out = out.withColumn(f"{out_prefix}{i:02d}", F.element_at(F.col(tmp), i))
    return out.drop(tmp)
