"""Glob-latest file discovery (SURVEY.md §2.1 S1).

Parity with ``_find_latest_file`` (data_loader.py:11-24): glob a pattern in
an input dir, pick the newest by mtime; required vs optional modes. This is
driver-side path resolution that runs *before* ``spark.read`` — the chosen
path is then handed to a distributed scan.
"""

from __future__ import annotations

import glob as _glob
import os
from pathlib import Path


class InputFileNotFoundError(FileNotFoundError):
    pass


def find_latest_file(
    directory: str | Path, pattern: str, *, optional: bool = False
) -> Path | None:
    """Newest (by mtime) file matching ``pattern`` under ``directory``.

    Raises :class:`InputFileNotFoundError` when required and absent;
    returns None when ``optional``.
    """
    matches = _glob.glob(str(Path(directory) / pattern))
    if not matches:
        if optional:
            return None
        raise InputFileNotFoundError(f"no file matching {pattern!r} in {directory}")
    return Path(max(matches, key=os.path.getmtime))
