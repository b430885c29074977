"""BR money formatting expressions (SURVEY.md §2.8 F8/F9).

The reference formats with per-row Python ``Series.apply``
(data_exporter.py:10-16, gerador_robo_mestre.py:10-19); these are the
vectorized JVM equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_money_br(col: Column | str) -> Column:
    """F8 (human layout): 2-decimal comma format, ``1234.5`` → ``'1234,50'``.

    Null stays null (the sink renders null as ``''``, matching the
    reference's ``na_rep=''`` at data_exporter.py:68).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    return F.when(c.isNotNull(), F.replace(F.format_string("%.2f", c), F.lit("."), F.lit(",")))


def format_money_robot(col: Column | str) -> Column:
    """F9 (robot layout): integral values render with no decimals.

    ``150.0`` → ``'150'``; ``150.5`` → ``'150,50'``
    (gerador_robo_mestre.py:10-19).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    return F.when(c.isNull(), F.lit(None).cast("string")).when(
        c == F.floor(c), c.cast("long").cast("string")
    ).otherwise(F.replace(F.format_string("%.2f", c), F.lit("."), F.lit(",")))
