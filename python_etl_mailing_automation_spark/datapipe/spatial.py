"""Spatial/grid proximity — radius joins via cell bucketing.

The quadratic formulation ("every point against every point, keep pairs
within r") is the canonical accidental-cross-join; the relational-engine
shape is CELL BUCKETING: quantize each point to a grid cell of side r,
explode one side to its 3×3 cell neighborhood, equi-join on the cell
key, then verify the exact distance on the surviving candidates only —
every true pair shares adjacent cells by the triangle inequality, and
each pair is produced exactly once because the probe side explodes while
the build side keeps its single home cell.

Coordinates are INTEGER units end to end (callers pick the resolution —
milli-units, micro-degrees, whatever): the squared-distance verify is
exact BIGINT algebra, so no haversine/trig (libm results differ across
engines) and no float comparison at the radius boundary ever appears.
For geographic data quantize lon·cos(lat band) upstream or accept the
per-band cell stretch; this module is the bucketing engine, not a
geodesy library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def proximity_join_grid(
    a: DataFrame,
    b: DataFrame,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: int,
) -> DataFrame:
    """All (a, b) pairs with squared Euclidean distance <= radius² in
    integer coordinate units. Returns ``(id_a, id_b, dist2)`` —
    ``dist2`` the exact BIGINT squared distance (callers sqrt for
    display; the join itself never needs the irrational).

    Self-join use: pass the same frame twice and filter
    ``id_a < id_b`` downstream (kept out of this operator so R-S
    linkage — stores vs couriers, cells vs towers — stays the primary
    shape).

    Scale shape: one 9× explode of A (bounded, literal offsets), one
    equi-join on the composite cell key, exact verify on candidates.
    Cell side = radius bounds candidates to the 9-cell neighborhood's
    occupancy — the output-bound argument: a uniform distribution puts
    O(density·r²) candidates per probe; pathological hot cells are the
    usual skew levers (AQE, salting the probe explode). Never n².
    """
    if radius < 1:
        raise ValueError("proximity_join_grid: radius must be >= 1")
    r = F.lit(int(radius)).cast("long")

    def cells(df: DataFrame, side: str, explode_nbrs: bool) -> DataFrame:
        x = F.col(x_col).cast("long")
        y = F.col(y_col).cast("long")
        base = df.filter(x.isNotNull() & y.isNotNull()).select(
            F.col(id_col).alias(f"id_{side}"),
            x.alias(f"__x{side}"),
            y.alias(f"__y{side}"),
            F.floor(x / r).cast("long").alias("__cx"),
            F.floor(y / r).cast("long").alias("__cy"),
        )
        if not explode_nbrs:
            return base
        off = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dx).cast("long").alias("dx"),
                        F.lit(dy).cast("long").alias("dy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("__o")
        return base.select(
            f"id_{side}",
            f"__x{side}",
            f"__y{side}",
            "__cx",
            "__cy",
            off,
        ).select(
            f"id_{side}",
            f"__x{side}",
            f"__y{side}",
            (F.col("__cx") + F.col("__o.dx")).alias("__cx"),
            (F.col("__cy") + F.col("__o.dy")).alias("__cy"),
        )

    pa = cells(a, "a", True)
    pb = cells(b, "b", False)
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    return (
        pa.join(pb, ["__cx", "__cy"])
        .select(
            "id_a",
            "id_b",
            (dx * dx + dy * dy).cast("long").alias("dist2"),
        )
        .filter(F.col("dist2") <= r * r)
    )
