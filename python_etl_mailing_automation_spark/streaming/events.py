"""Tumbling-window event aggregation — one definition, two execution
modes.

The same transformation runs as a batch query (oracle-checkable) and as a
Structured Streaming query with a watermark (late data beyond the
watermark is dropped; state is bounded). At scale the streaming variant is
the hot path: per-window partial aggregates are maintained in the state
store, sized by watermark horizon × key cardinality — not by stream
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg(windowed: DataFrame) -> DataFrame:
    return windowed.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def tumbling_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
) -> DataFrame:
    """Batch form: counts + min/max value per (tumbling window, key)."""
    grouped = events.groupBy(
        F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col)
    )
    return _agg(grouped).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col(key_col),
        "n_events",
        "min_value",
        "max_value",
    )


def sliding_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    slide_duration: str = "30 minutes",
) -> DataFrame:
    """Batch form of sliding (hopping) windows: each event contributes to
    ``duration/slide`` overlapping windows. Same definition runs under
    ``readStream`` by adding a watermark (as in the tumbling variant)."""
    grouped = events.groupBy(
        F.window(F.col(ts_col), window_duration, slide_duration).alias("w"),
        F.col(key_col),
    )
    return _agg(grouped).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col(key_col),
        "n_events",
        "min_value",
        "max_value",
    )


def tumbling_event_counts_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form: identical aggregation with a watermark bound.

    ``events`` must be a streaming DataFrame (``spark.readStream``). Use
    ``.writeStream.outputMode("append")`` — windows finalize once the
    watermark passes their end, which is what makes downstream sinks
    exactly-once-complete per window.
    """
    grouped = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
    )
    return _agg(grouped).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col(key_col),
        "n_events",
        "min_value",
        "max_value",
    )


def windowed_loghist(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_expr: str = "CAST(floor(value) AS BIGINT)",
    window_duration: str = "1 hour",
) -> DataFrame:
    """Batch form: the :mod:`..datapipe.sketches` log-histogram sketch
    per tumbling window — ``(window_start, bucket, cnt)``. The sketch
    is a pure keyed COUNT over (window, bit-length bucket), so the
    identical definition runs under ``readStream`` with a watermark
    (see :func:`windowed_loghist_stream`): per-window sketch state is
    ≤ 64 rows however many events arrive, the property that makes a
    quantile profile affordable as a live stream metric. Negative and
    NULL values are dropped (the sketch's domain contract). The default
    value_expr floors explicitly: a bare double->BIGINT cast TRUNCATES
    on Spark but ROUNDS on DuckDB."""
    v = F.expr(value_expr)
    bucket = F.when(v == 0, F.lit(0)).otherwise(
        F.length(F.bin(v)).cast("int")
    )
    return (
        events.filter(v.isNotNull() & (v >= 0))
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            bucket.alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "bucket",
            "cnt",
        )
    )


def windowed_loghist_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_expr: str = "CAST(floor(value) AS BIGINT)",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of :func:`windowed_loghist`: add the watermark,
    keep the definition."""
    return windowed_loghist(
        events.withWatermark(ts_col, watermark),
        ts_col=ts_col,
        value_expr=value_expr,
        window_duration=window_duration,
    )
