"""Date parsing/formatting expressions (SURVEY.md §2.8 F4/F5).

The reference parses with pandas ``to_datetime(errors='coerce',
dayfirst=True)`` (processing_pipeline.py:44-49) and formats with
``strftime('%d/%m/%Y')`` (data_exporter.py:43). Spark equivalent: a
``coalesce`` of ``try_to_timestamp`` over the day-first formats the inputs
actually use, null on junk (non-ANSI semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Day-first patterns in observed input order; extend via config if a new
# feed appears. Mirrors pandas' permissive dayfirst parser closely enough
# for the reference's feeds (dd/mm/yyyy with optional time, dashed, ISO).
_BR_DATE_FORMATS = (
    "d/M/yyyy H:m:s",
    "d/M/yyyy",
    "d-M-yyyy",
    "yyyy-M-d H:m:s",
    "yyyy-M-d",
)


def parse_date_br(col: Column | str) -> Column:
    """F4: day-first permissive parse; unparseable → null (never raises)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c.cast("string"))
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in _BR_DATE_FORMATS])


def format_date_br(col: Column | str) -> Column:
    """F5: render as ``dd/MM/yyyy`` (BR layout)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "dd/MM/yyyy")


def import_date_stamp() -> Column:
    """``Data_de_Importacao`` run stamp (processing_pipeline.py:349)."""
    return F.date_format(F.current_date(), "dd/MM/yyyy")


def epoch_micros(col: str, dtype: str) -> Column:
    """Exact epoch microseconds for a timestamp column of either flavor.

    ``unix_micros`` only accepts TIMESTAMP (with local time zone); parquet
    written with ``isAdjustedToUTC=false`` reads back as TIMESTAMP_NTZ
    under Spark's default NTZ inference, where ``unix_micros`` raises
    DATATYPE_MISMATCH. An NTZ column is first cast to TIMESTAMP — i.e. its
    wall clock is interpreted in the SESSION timezone, exactly how Spark
    itself coerces NTZ when the two flavors meet — so frames mixing both
    flavors (e.g. one side from parquet, one built in-session) bin onto
    the same integer grid under any session timezone, not only UTC.
    Pass the column's dtype string from ``dict(df.dtypes)[col]``.

    Session-timezone caveat for NTZ inputs: the NTZ→TIMESTAMP cast makes
    the integers session-timezone DEPENDENT (a non-UTC session shifts
    every value by its offset, and in DST zones ambiguous wall clocks
    map non-injectively). :func:`~python_etl_mailing_automation_spark
    .session.build_spark` pins ``spark.sql.session.timeZone=UTC``, which
    keeps library results equal to the DuckDB oracle; consumers building
    their own session should pin UTC too, or accept locally-shifted bins.
    """
    c = F.col(col)
    if dtype == "timestamp_ntz":
        c = c.cast("timestamp")
    return F.unix_micros(c)
