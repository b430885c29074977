"""Export layouts: the reference's stage-3/4 output formatting folded into
the pre-write plan (SURVEY.md §2.2 P4/P5 + §2.8 F5/F8/F9).

Reference behavior: select config-listed columns ∩ present
(data_exporter.py:46-54), format money per-row in Python
(data_exporter.py:40), format dates (``:43``) — then stages 4-5 re-read
the written CSVs to repair formatting again. Here the formatting is part
of the single lazy plan; nothing is ever re-read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

from ..functions.dates import format_date_br
from ..functions.money import format_money_br, format_money_robot

DEFAULT_MONEY_COLUMNS = ("valorDivida", "liquido", "total_toi", "valor")


def apply_export_layout(
    df: DataFrame,
    export_columns: Sequence[str],
    *,
    money_columns: Sequence[str] = DEFAULT_MONEY_COLUMNS,
    robot_money: bool = False,
    carry_columns: Sequence[str] = (),
) -> DataFrame:
    """P4/P5 + F5 + F8/F9: format then project to the configured layout.

    - every Date/Timestamp column renders as ``dd/MM/yyyy``;
    - listed money columns render BR-style (2-decimal comma for the human
      layout, integral-collapse for the robot layout);
    - the projection keeps the configured order, skipping absent columns
      (the reference tolerates drift the same way);
    - ``carry_columns`` pass through UNformatted after the layout — used
      for sort-only carriers (numeric debt, priority level) that the
      writer drops post-sort; never part of the rendered file.

    An empty ``export_columns`` formats but keeps all columns, like the
    reference's except-path (data_exporter.py:52-54).
    """
    fmt_money = format_money_robot if robot_money else format_money_br
    updates = {}
    for f in df.schema.fields:
        if f.name in carry_columns:
            continue
        if isinstance(f.dataType, (DateType, TimestampType, TimestampNTZType)):
            updates[f.name] = format_date_br(F.col(f.name))
    for c in money_columns:
        if c in df.columns and c not in carry_columns:
            updates[c] = fmt_money(F.col(c))
    out = df.withColumns(updates) if updates else df
    keep = [c for c in export_columns if c in out.columns]
    if not keep:
        return out
    carry = [c for c in carry_columns if c in out.columns and c not in keep]
    return out.select(*keep, *carry)
