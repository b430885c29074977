"""Time-series regularization — resampling onto a fixed grid with
gap filling — the hypertable/rollup primitive metric and sensor
pipelines need before any window arithmetic is meaningful (a rolling
mean over irregular samples is not a rolling mean).

Scale shape: one keyed aggregate collapses raw events to at most one
row per (key, bucket); the dense grid comes from a per-key
``sequence()`` explode bounded by span/step rows per key (never a
cross join against a global calendar — a key live for one day costs
one day of buckets, not the corpus's full history); the forward fill
is a single per-key window. Every exchange hashes on (key[, bucket])
— no global sort, no cross join, and skew is bounded by span/step
rows per key.

Determinism: buckets are ``floor(epoch_seconds / step) * step`` — the
same IEEE double ops on every engine; the per-bucket representative
row is picked by an explicit (ts, value) descending order, never
"whatever max_by saw last".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    step_seconds: int = 86400,
    out_bucket: str = "bucket_ts",
    out_value: str = "value_filled",
    out_observed: str = "observed",
) -> DataFrame:
    """Regularize ``(key, ts, value)`` observations onto a
    ``step_seconds`` grid: per key, every bucket from the key's first
    to last observation exists in the output; buckets with
    observations carry the LAST observation in the bucket (ties on ts
    broken by larger value); empty buckets carry the previous bucket's
    value forward (``observed`` = false). Leading buckets are never
    synthesized before a key's first observation, and NULL-value
    observations are ignored.

    Returns ``(key_col, out_bucket timestamp, out_value,
    out_observed)``.
    """
    if step_seconds < 1:
        raise ValueError("resample_fill: step_seconds must be >= 1")
    obs = (
        df.select(
            F.col(key_col),
            F.col(ts_col).cast("timestamp").alias("__ts"),
            F.col(value_col).alias("__v"),
        )
        .filter(F.col("__ts").isNotNull() & F.col("__v").isNotNull())
        .withColumn(
            "__b",
            (
                F.floor(F.col("__ts").cast("double") / F.lit(float(step_seconds)))
                * F.lit(step_seconds)
            ).cast("long"),
        )
    )
    w_pick = Window.partitionBy(key_col, "__b").orderBy(
        F.col("__ts").desc(), F.col("__v").desc()
    )
    per_bucket = (
        obs.withColumn("__r", F.row_number().over(w_pick))
        .filter(F.col("__r") == 1)
        .select(key_col, "__b", "__v")
    )
    grid = (
        per_bucket.groupBy(key_col)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_seconds))
            ).alias("__b"),
        )
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, on=[key_col, "__b"], how="left")
        .select(
            key_col,
            F.timestamp_seconds(F.col("__b")).alias(out_bucket),
            F.last("__v", ignorenulls=True).over(w_fill).alias(out_value),
            F.col("__v").isNotNull().alias(out_observed),
        )
    )
