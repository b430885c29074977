"""Schema validation (SURVEY.md §1.3).

Parity with the reference's ``schema_validator.py:29-55``: a declared
required-column list is checked against the loaded frame; missing required
columns abort the run, extra columns are tolerated (and reported). Column
names are normalized (lowercased/stripped) before the check, matching the
loader (data_loader.py:34,38).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


class SchemaValidationError(Exception):
    """Raised when a required column is missing from a source frame."""


@dataclass
class SchemaReport:
    missing: list[str]
    extra: list[str]


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P1: lowercase+strip all column names (data_loader.py:34,38)."""
    return df.toDF(*[c.strip().lower() for c in df.columns])


def validate_required_columns(
    df: DataFrame, required: list[str], *, source_name: str = "source"
) -> SchemaReport:
    """Raise :class:`SchemaValidationError` if any required column is
    absent; return the missing/extra report otherwise."""
    have = {c.strip().lower() for c in df.columns}
    want = [c.strip().lower() for c in required]
    missing = [c for c in want if c not in have]
    extra = sorted(have - set(want))
    if missing:
        raise SchemaValidationError(
            f"{source_name}: missing required columns {missing}"
        )
    return SchemaReport(missing=missing, extra=extra)


def ensure_columns(df: DataFrame, columns: list[str], *, fill: str = "") -> DataFrame:
    """P3: add any absent column as a literal (default empty string) and
    put ``columns`` first, keeping the rest after
    (processing_pipeline.py:238-250)."""
    from pyspark.sql import functions as F

    out = df
    for c in columns:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(fill))
    rest = [c for c in out.columns if c not in columns]
    return out.select(*columns, *rest)
