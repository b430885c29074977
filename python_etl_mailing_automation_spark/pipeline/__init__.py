"""End-to-end composed pipelines (SURVEY.md §3)."""

from .audit import audit_no_blocked_status  # noqa: F401
from .mailing import MailingResult, process_mailing  # noqa: F401
from .robot import build_robot_output  # noqa: F401
from .runner import JobResult, run_mailing_job  # noqa: F401
