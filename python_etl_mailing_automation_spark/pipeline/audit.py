"""Output audit — the laudo invariant as a query (SURVEY.md §3.2).

Reference: ``laudo.py:108-127`` re-reads every output CSV and checks that
no blocklisted status value appears in any column. Engine version: the
same invariant as a DataFrame query over the in-memory (or re-read)
outputs — used both as a runtime auditor and as the pytest assertion.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import normalize_key


def audit_no_blocked_status(
    output: DataFrame,
    blocklist: Sequence[str],
    *,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Rows of ``output`` where ANY audited column contains a blocklisted
    value (normalized trim+lower on both sides). Empty result = invariant
    holds. One scan over the output, no joins (config-sized literal list).
    """
    normalized_block = sorted({b.strip().lower() for b in blocklist})
    cols = list(columns) if columns else [
        f.name for f in output.schema.fields if f.dataType.simpleString() == "string"
    ]
    if not cols:
        return output.limit(0)
    cond = None
    for c in cols:
        hit = normalize_key(F.col(c)).isin(normalized_block)
        cond = hit if cond is None else (cond | hit)
    return output.filter(cond)
