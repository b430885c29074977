"""Sources and sinks (SURVEY.md §2.1)."""

from .discovery import find_latest_file  # noqa: F401
from .io import nanos_to_timestamp, read_table, write_exact_csv  # noqa: F401
from .state import StateManager  # noqa: F401
