"""Output audit — the laudo invariant as a query (SURVEY.md §3.2).

Reference: ``laudo.py:108-127`` re-reads every output CSV and checks that
no blocklisted status value appears in any column. Engine version: the
same invariant as a DataFrame query over the in-memory (or re-read)
outputs — used both as a runtime auditor and as the pytest assertion.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
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


@dataclass
class FileAuditVerdict:
    file: Path
    leaks: int

    @property
    def clean(self) -> bool:
        return self.leaks == 0


def audit_output_dir(
    spark: SparkSession,
    output_dir: str | Path,
    blocklist: Sequence[str],
    *,
    glob: str = "**/*.csv",
    sep: str = ";",
    skip_names: Sequence[str] = ("rejeitados_por_status_de_bloqueio.csv",),
) -> list[FileAuditVerdict]:
    """The full laudo tool (laudo.py:170-186): audit every written output
    CSV for blocklist leaks, skipping the rejects report (which contains
    blocked values by definition, laudo.py:104-106). Returns a per-file
    verdict table; all-clean ⇔ every ``leaks == 0``."""
    from ..sources.io import read_csv_stringly

    verdicts = []
    for path in sorted(Path(output_dir).glob(glob)):
        if path.name in skip_names:
            continue
        file_sep = "|" if path.name.upper().startswith("ROBO") else sep
        df = read_csv_stringly(spark, path, sep=file_sep)
        leaks = audit_no_blocked_status(df, blocklist).count()
        verdicts.append(FileAuditVerdict(file=path, leaks=leaks))
    return verdicts
