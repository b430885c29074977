"""JSON run-state store (SURVEY.md §2.1 S10).

Parity with the reference's ``StateManager`` (state_manager.py:9-63):
persists ``{last_successful_run, status, last_metrics}`` so each run can
diff its output volumes against the previous one (the reference's
run-over-run outlier detection, logger_setup.py:47-77).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path
from typing import Any


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
