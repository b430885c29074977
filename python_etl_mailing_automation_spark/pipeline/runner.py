"""The ``main.py``-equivalent job runner (SURVEY.md §3.1, stages 1-5).

Reference lifecycle: load → validate → process → export human/robot →
(re-read/rewrite repairs) → zip + state. Engine lifecycle: the repairs are
part of the one lazy plan (pipeline/export.py), so the stages collapse to
load → validate → process → write → archive/state — each sink triggering
exactly one action.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..config import PipelineConfig
from ..schema import normalize_column_names, validate_required_columns
from ..sources.discovery import find_latest_file
from ..sources.io import (
    archive_run,
    read_csv_stringly,
    sanitize_filename,
    write_exact_csv,
    write_partitioned_by_key,
)
from ..sources.state import StateManager, VolumeOutlier, detect_volume_outliers
from .audit import audit_no_blocked_status
from .export import apply_export_layout
from .mailing import process_mailing
from .robot import build_robot_output, route_by_time_slot


@dataclass
class JobResult:
    human_files: list[Path] = field(default_factory=list)
    robot_files: list[Path] = field(default_factory=list)
    rejected_file: Path | None = None
    archive: Path | None = None
    metrics: dict = field(default_factory=dict)
    audit_leaks: int = 0
    volume_outliers: list[VolumeOutlier] = field(default_factory=list)


def _load_input(
    spark: SparkSession, input_dir: str | Path, pattern: str, *, optional: bool = False
) -> DataFrame | None:
    """S1 discovery + format-dispatched load (parquet/CSV native and
    distributed; Excel via the driver shim when available)."""
    path = find_latest_file(input_dir, pattern, optional=optional)
    if path is None:
        return None
    suffix = path.suffix.lower()
    if suffix == ".parquet":
        df = spark.read.parquet(str(path))
    elif suffix in (".csv", ".txt"):
        df = read_csv_stringly(spark, path)
    elif suffix in (".xlsx", ".xls"):
        from ..sources.excel import read_excel

        df = read_excel(spark, path)  # single sheet; multi-sheet callers use read_excel directly
    else:
        raise ValueError(f"unsupported input format: {path}")
    return normalize_column_names(df)


def run_mailing_job(
    spark: SparkSession,
    config: PipelineConfig,
    *,
    input_dir: str | Path,
    output_dir: str | Path,
    mailing_pattern: str = "MAILING_NUCLEO_*",
    enrichment_pattern: str = "Pontua*",
    regras_pattern: str = "Tabula*",
    state_path: str | Path | None = None,
    make_archive: bool = False,
) -> JobResult:
    """End-to-end run: mirrors ``main.py:23-95`` stage for stage."""
    output_dir = Path(output_dir)
    result = JobResult()

    # Stage 1 — load + validate (schema contract aborts the run, like the
    # reference's SchemaValidationError path, main.py:46).
    mailing = _load_input(spark, input_dir, mailing_pattern)
    validate_required_columns(
        mailing, config.required_mailing_columns, source_name="mailing"
    )
    enrichment = _load_input(spark, input_dir, enrichment_pattern, optional=True)
    regras = _load_input(spark, input_dir, regras_pattern, optional=True)
    if regras is not None:
        validate_required_columns(
            regras, config.required_tabulacoes_columns, source_name="tabulacoes"
        )

    # Stage 2 — the composed pipeline (one lazy DAG).
    res = process_mailing(
        mailing,
        config,
        enrichment_sheets=[enrichment] if enrichment is not None else None,
        regras_disposicao=regras,
        dedup_tiebreaker="ucv" if "ucv" in mailing.columns else None,
    )

    # Stage 3+4 — exports with formatting folded pre-write (no re-reads).
    # Row order inside each file = the reference's priority sort (O1):
    # priority level asc, debt desc (only while still numeric), stable key.
    human = res.human
    if config.human_export_columns:
        human = apply_export_layout(human, config.human_export_columns)
    from pyspark.sql import functions as F  # local to keep module header lean

    human_types = dict(human.dtypes)
    order_by = []
    if "priority_level" in human_types:
        order_by.append(F.col("priority_level").asc())
    if human_types.get("valorDivida") == "double":
        order_by.append(F.col("valorDivida").desc())
    if "CPF" in human_types:
        order_by.append(F.col("CPF").asc())
    result.human_files = write_partitioned_by_key(
        human, output_dir / "humano", "PRODUTO",
        filename_template="Mailing_{key}.csv", order_by=order_by or None,
    ) if "PRODUTO" in human.columns else [
        write_exact_csv(
            human, output_dir / "humano" / "Mailing.csv", order_by=order_by or None
        )
    ]

    robot = build_robot_output(res.robot, config) if "dtvenc" in res.robot.columns else res.robot
    if config.robot_export_columns:
        robot = apply_export_layout(robot, config.robot_export_columns, robot_money=True)
    slots = route_by_time_slot(robot, config) if config.robot_time_slot_groups else {"mestre": robot}
    for slot, df in slots.items():
        result.robot_files.append(
            write_exact_csv(
                df, output_dir / "robo" / f"ROBO_{sanitize_filename(slot)}.csv", sep="|"
            )
        )

    # S8 side output.
    result.rejected_file = write_exact_csv(
        res.rejected, output_dir / "rejeitados_por_status_de_bloqueio.csv"
    )

    # Stage 6 (laudo) — the leak invariant as part of the run itself.
    result.audit_leaks = audit_no_blocked_status(human, config.blocklist).count()

    # Epilogue — metrics/state (+ optional zip).
    result.metrics = {
        "human": human.count(),
        "robot": robot.count(),
        "rejected": res.rejected.count(),
        "audit_leaks": result.audit_leaks,
    }
    if state_path is not None:
        sm = StateManager(state_path)
        # Run-over-run outlier diff vs the last successful run
        # (logger_setup.py:47-77) BEFORE overwriting the state.
        result.volume_outliers = detect_volume_outliers(
            result.metrics, sm.last_metrics()
        )
        sm.save_success(result.metrics)
    if make_archive:
        result.archive = archive_run(output_dir)
    return result
