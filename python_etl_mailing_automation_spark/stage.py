"""Per-stage row-count instrumentation (SURVEY.md §3.4).

The reference appends ``{name, initial, removed, final, message}`` per
operator to a process report (processing_pipeline.py:313-347). In Spark,
counting forces materialization, so the wrapper caches the output frame
before counting — the count then feeds the next stage from cache instead
of recomputing the lineage. Reporting is opt-in (``counted=True``): at
100 TB you run with counts off (pure lazy single-action plan) or rely on
accumulators/metrics instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


@dataclass
class StageReport:
    name: str
    initial: int
    final: int
    message: str = ""

    @property
    def removed(self) -> int:
        return self.initial - self.final


@dataclass
class ProcessReport:
    stages: list[StageReport] = field(default_factory=list)

    def add(self, stage: StageReport) -> None:
        self.stages.append(stage)

    def as_rows(self) -> list[dict]:
        return [
            {
                "etapa": s.name,
                "registros_iniciais": s.initial,
                "removidos": s.removed,
                "registros_finais": s.final,
                "mensagem": s.message,
            }
            for s in self.stages
        ]


def run_stage(
    df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    *,
    name: str,
    report: ProcessReport | None = None,
    counted: bool = False,
    message: str = "",
) -> DataFrame:
    """Apply ``transform``; when ``counted`` (and a report is given),
    cache the result and record in/out counts like the reference's
    process report."""
    out = transform(df)
    if counted and report is not None:
        out = out.cache()
        report.add(
            StageReport(name=name, initial=df.count(), final=out.count(), message=message)
        )
    return out
