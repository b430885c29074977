"""Run-report rendering (SURVEY.md §3.4).

Mirrors the reference's ``ExecutionReporter.generate_final_report``
(logger_setup.py:27-77): a fixed-width stage table (initial row, then
removed/remaining per stage), attention points, and the run-over-run
human/robot volume comparison. The engine renders from
:class:`~..stage.ProcessReport` + the metrics dicts the job runner
already produces; emitting to a logger is the caller's choice.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from ..stage import ProcessReport

#: Stage name the reference treats as the initial-count row
#: (logger_setup.py:41).
LOAD_STAGE = "Carregamento de Dados"


def _volume_line(label: str, current: Any, previous: Any) -> str:
    """One outlier-analysis line (logger_setup.py:52-73)."""
    prev = previous or 0
    cur = current or 0
    if prev <= 0:
        return f"- Arquivos {label}: Não há dados da última execução para comparar."
    pct = (cur - prev) / prev * 100.0
    direction = "a mais" if pct >= 0 else "a menos"
    return (
        f"- Arquivos {label}: Gerado {abs(pct):.2f}% {direction} de registros "
        f"que na última execução ({cur:,} vs {prev:,})."
    )


def render_run_report(
    report: ProcessReport,
    *,
    current_metrics: dict[str, Any] | None = None,
    last_metrics: dict[str, Any] | None = None,
    attention_points: Sequence[str] = (),
) -> str:
    """Render the reference's final execution report as one string.

    Layout parity with logger_setup.py:29-45: header rule, optional
    attention block, the results table (40/12/12-wide columns, thousands
    separators), and the outlier analysis comparing human/robot volumes
    against the previous successful run.
    """
    lines: list[str] = ["", "_" * 80, "RELATÓRIO DE EXECUÇÃO DA AUTOMAÇÃO"]

    if attention_points:
        lines.append("=" * 25 + " PONTOS DE ATENÇÃO " + "=" * 25)
        lines.extend(f"- {p}" for p in attention_points)

    lines.append("=" * 25 + " TABELA DE RESULTADOS " + "=" * 25)
    lines.append(
        f"| {'ETAPA DE PROCESSAMENTO':<40} | {'REMOVIDOS':>12} | {'RESTANTES':>12} |"
    )
    lines.append(f"| {'-' * 40} | {'-' * 12} | {'-' * 12} |")

    stages = report.stages
    initial = next((s for s in stages if s.name == LOAD_STAGE), None)
    if initial is not None:
        lines.append(
            f"| {'Registros Iniciais':<40} | {'-':>12} | {initial.initial:>12,} |"
        )
    for s in stages:
        if s is initial:
            continue
        lines.append(f"| {s.name:<40} | {s.removed:>12,} | {s.final:>12,} |")

    lines.append("=" * 25 + " ANÁLISE DE OUTLIERS " + "=" * 25)
    if not last_metrics:
        lines.append(
            "- Esta é a primeira execução com métricas, não há dados para comparação."
        )
    else:
        current_metrics = current_metrics or {}
        lines.append(
            _volume_line("HUMANOS", current_metrics.get("human"), last_metrics.get("human"))
        )
        lines.append(
            _volume_line("ROBÔ", current_metrics.get("robot"), last_metrics.get("robot"))
        )
    return "\n".join(lines)
