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
    robot_markers: Sequence[str] = ("ROBO",),
) -> list[FileAuditVerdict]:
    """The full laudo tool (laudo.py:170-186): audit every written output
    CSV for blocklist leaks, skipping the rejects report (which contains
    blocked values by definition, laudo.py:104-106). Returns a per-file
    verdict table; all-clean ⇔ every ``leaks == 0``.

    ``robot_markers``: filename substrings that identify pipe-separated
    robot outputs (the reference keys on its robot prefix,
    laudo.py:108) — pass the configured robot prefix for external dirs.
    """
    from ..sources.io import read_csv_stringly

    verdicts = []
    for path in sorted(Path(output_dir).glob(glob)):
        if path.name in skip_names:
            continue
        is_robot = any(m.upper() in path.name.upper() for m in robot_markers)
        df = read_csv_stringly(spark, path, sep="|" if is_robot else sep)
        leaks = audit_no_blocked_status(df, blocklist).count()
        verdicts.append(FileAuditVerdict(file=path, leaks=leaks))
    return verdicts


def find_latest_archive(
    output_dir: str | Path, *, prefix: str = "mailing_"
) -> Path | None:
    """Newest ``{prefix}*.zip`` in ``output_dir`` by mtime — the archive
    the standalone laudo audits (laudo.py:72-78)."""
    candidates = sorted(
        Path(output_dir).glob(f"{prefix}*.zip"),
        key=lambda p: p.stat().st_mtime,
        reverse=True,
    )
    return candidates[0] if candidates else None


def audit_archive(
    spark: SparkSession,
    archive: str | Path,
    blocklist: Sequence[str],
    *,
    sep: str = ";",
    skip_names: Sequence[str] = ("rejeitados_por_status_de_bloqueio.csv",),
    robot_markers: Sequence[str] = ("ROBO",),
) -> list[FileAuditVerdict]:
    """Audit an existing run *archive*: extract the zip to a temp dir and
    run the file-level audit over every CSV inside (laudo.py:75-127 —
    the standalone 'audit what actually shipped' tool surface; the
    in-run audit happens pre-archive in the job runner).

    Raises ``zipfile.BadZipFile`` for corrupted archives, like the
    reference surfaces that case explicitly (laudo.py:88-90).
    """
    import tempfile
    import zipfile

    archive = Path(archive)
    with tempfile.TemporaryDirectory(prefix="laudo_") as tmp:
        with zipfile.ZipFile(archive, "r") as zf:
            zf.extractall(tmp)
        verdicts = audit_output_dir(
            spark, tmp, blocklist,
            sep=sep, skip_names=skip_names, robot_markers=robot_markers,
        )
    # Temp paths vanish with the context; report archive-relative names.
    return [
        FileAuditVerdict(file=archive / v.file.name, leaks=v.leaks)
        for v in verdicts
    ]
