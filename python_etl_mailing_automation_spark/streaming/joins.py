"""Stream-stream attribution join — one definition, two execution modes.

The classic ad-attribution shape: every *click* is credited to the same
user's *views* in the preceding ``horizon_s`` seconds. As a batch query
it is an equi-join on the user key with a time-range post-filter (one
shuffle, per-user match work). As a Structured Streaming query the SAME
join condition runs over two ``readStream`` sources: Spark keeps both
sides' recent rows in keyed state, and the watermark plus the time-range
bound is exactly what lets it evict state — without the range condition
a stream-stream join would have to buffer the full streams forever.

Scale posture: state size is bounded by (watermark + horizon) × per-user
event rate, independent of stream length; inner-join matches emit as
soon as both sides arrive (no watermark latency on output, only on
state cleanup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    *,
    user_col: str = "user_id",
    view_ts_col: str = "view_ts",
    click_ts_col: str = "click_ts",
    horizon_s: int = 7200,
    watermark: str | None = None,
) -> DataFrame:
    """All (view, click) pairs of the same user with
    ``view_ts <= click_ts <= view_ts + horizon_s``. Column names other
    than ``user_col`` must be disjoint between the two frames; the
    output carries every column of both sides, user key once.

    Pass ``watermark`` (e.g. ``"2 hours"``) when both inputs are
    streaming frames: it is applied to both event-time columns and,
    combined with the range bound, lets Spark expire join state. Batch
    callers leave it None — the identical condition then compiles to a
    shuffled equi-join on the user key with the range as a post-filter
    (never a nested-loop over time).
    """
    dup = (set(views.columns) & set(clicks.columns)) - {user_col}
    if dup:
        raise ValueError(f"attribution_join: ambiguous columns {sorted(dup)}")
    if watermark is not None:
        views = views.withWatermark(view_ts_col, watermark)
        clicks = clicks.withWatermark(click_ts_col, watermark)
    v, c = views.alias("v"), clicks.alias("c")
    cond = (
        (F.col(f"v.{user_col}") == F.col(f"c.{user_col}"))
        & (F.col(click_ts_col) >= F.col(view_ts_col))
        & (
            F.col(click_ts_col)
            <= F.col(view_ts_col) + F.expr(f"INTERVAL {int(horizon_s)} SECOND")
        )
    )
    return v.join(c, on=cond).drop(F.col(f"c.{user_col}"))
