"""JSON run-state store (SURVEY.md §2.1 S10).

Parity with the reference's ``StateManager`` (state_manager.py:9-63):
persists ``{last_successful_run, status, last_metrics}`` so each run can
diff its output volumes against the previous one (the reference's
run-over-run outlier detection, logger_setup.py:47-77).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path
from typing import Any


@dataclass
class VolumeOutlier:
    metric: str
    previous: float
    current: float
    pct_change: float


def detect_volume_outliers(
    current: dict[str, Any],
    previous: dict[str, Any],
    *,
    threshold_pct: float = 30.0,
) -> list[VolumeOutlier]:
    """Run-over-run outlier detection (logger_setup.py:47-77): flag any
    shared numeric metric whose volume changed more than ``threshold_pct``
    vs the last successful run — the reference's operational guard against
    silently-broken feeds."""
    outliers = []
    for key, prev in previous.items():
        if key not in current:
            continue
        cur = current[key]
        if not isinstance(prev, (int, float)) or not isinstance(cur, (int, float)):
            continue
        if prev == 0:
            pct = 0.0 if cur == 0 else float("inf")
        else:
            pct = (cur - prev) / prev * 100.0
        if abs(pct) > threshold_pct:
            outliers.append(
                VolumeOutlier(
                    metric=key, previous=float(prev), current=float(cur),
                    pct_change=round(pct, 2),
                )
            )
    return outliers


class StateManager:
    def __init__(self, path: str | Path) -> None:
        self.path = Path(path)

    def load(self) -> dict[str, Any]:
        if not self.path.exists():
            return {}
        try:
            return json.loads(self.path.read_text(encoding="utf-8"))
        except (OSError, json.JSONDecodeError):
            return {}

    def last_metrics(self) -> dict[str, Any]:
        return self.load().get("last_metrics", {})

    def save_success(self, metrics: dict[str, Any]) -> None:
        self._save("success", metrics)

    def save_failure(self, metrics: dict[str, Any] | None = None) -> None:
        self._save("failure", metrics or {})

    def _save(self, status: str, metrics: dict[str, Any]) -> None:
        state = {
            "last_successful_run" if status == "success" else "last_run": (
                datetime.now(timezone.utc).isoformat()
            ),
            "status": status,
            "last_metrics": metrics,
        }
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(
            json.dumps(state, indent=2, ensure_ascii=False), encoding="utf-8"
        )
