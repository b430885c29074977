"""Ordered-funnel analysis — "view → click → purchase" conversion.

The classic product-analytics question: for each user, did the stages
happen IN ORDER (a click before any view doesn't count), and when. The
naive form is k-1 self-joins of the event stream; this form is pure
window algebra: stage i's timestamp is the MIN event time of stage i's
type at-or-after stage i-1's timestamp — k nested conditional window
minima over ONE user partitioning. Spark plans all of them over a single
hash exchange (the window specs share the partition key), so the whole
funnel costs one shuffle of the events regardless of k.

Skew note: a bot user with millions of events serializes one partition's
window sort, as with any per-entity window; the session factory's AQE
skew handling and an upstream per-user event cap are the levers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_s: int | None = None,
) -> DataFrame:
    """One row per user: ``stage<i>_ts`` = when the user completed stage
    i of the ordered funnel (NULL from the first missed stage on), plus
    ``stages_reached``. Stage 0 is the user's earliest ``stages[0]``
    event; stage i is the earliest ``stages[i]`` event at-or-after stage
    i-1 (and within ``horizon_s`` of it, when given).

    Equal timestamps count as in-order (at-or-after, not strictly
    after): simultaneous view+click converts — the standard inclusive
    funnel convention.
    """
    if len(stages) < 2:
        raise ValueError("funnel_stages: need at least two stages")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev: Column | None = None
    out_cols: list[str] = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) >= prev)
            if horizon_s is not None:
                cond = cond & (
                    F.col(ts_col)
                    <= prev + F.expr(f"INTERVAL {int(horizon_s)} SECOND")
                )
        name = f"stage{i}_ts"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(name)
        out_cols.append(name)
    return (
        df.groupBy(user_col)
        .agg(*[F.min(c).alias(c) for c in out_cols])
        .withColumn(
            "stages_reached",
            sum(
                (
                    F.when(F.col(c).isNotNull(), 1).otherwise(0)
                    for c in out_cols
                ),
                F.lit(0),
            ).cast("int"),
        )
    )
