"""Pareto-frontier (skyline) extraction — "show me the offers no other
offer beats on BOTH price and quality" — the multi-criteria shortlist
primitive of catalog analytics and data curation (keep the documents on
the quality/length frontier instead of a single weighted score).

Beyond-reference operator (the reference's single-criterion ordering is
`definir_prioridade`, processador_de_dados.py:329-352; the skyline is
its two-criteria generalization where no weight vector exists).

Scale shape: the naive skyline is a quadratic NOT EXISTS self-join (the
DuckDB oracle runs exactly that, which is what makes it a strong
independent check). This implementation is the O(n log n) sweep:
collapse to distinct (key, x, y) points first (bounded by point
cardinality, not row count — the only state the window ever sorts), then
ONE per-key window ordered (x asc, y desc) keeps a point iff its y
strictly exceeds the running max over all predecessors. A predecessor in
that order has x' <= x, so `y <= running_max` certifies a dominating
point exists; `y > running_max` certifies none does (any dominator would
have sorted earlier and raised the max). No self-join, no cartesian —
two hash exchanges total (the distinct-point agg, then the per-key
window) regardless of row count.

Determinism: pure comparisons — no arithmetic on the criteria columns,
so doubles compare bit-identically cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    *,
    key_col: str | None = None,
) -> DataFrame:
    """Per-``key_col`` Pareto frontier: rows for which no other row in
    the same group is <= on ``min_col`` AND >= on ``max_col`` with at
    least one strict inequality.

    Returns one row per surviving distinct point:
    ``(key_col?, min_col, max_col, n_rows)`` where ``n_rows`` is the
    point's multiplicity in the input (duplicate points tie — neither
    strictly dominates the other — so the whole tie survives together).

    Rows with a NULL criterion are dropped (a NULL price can neither
    dominate nor be dominated under 3VL; callers who want them must
    impute first — same contract as stats.zscore_normalize).

    Without ``key_col`` the window is a single-partition sort over the
    DISTINCT POINTS — fine whenever point cardinality is bounded
    (prices × sizes), the same small-data caveat as
    ssjoin.sorted_neighborhood_pairs' unblocked mode; pass a key to
    parallelize.
    """
    keys = [key_col] if key_col else []
    pts = (
        df.filter(F.col(min_col).isNotNull() & F.col(max_col).isNotNull())
        .groupBy(*keys, min_col, max_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(min_col).asc(), F.col(max_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(max_col).over(w)
    return (
        pts.withColumn("__prev", prev_max)
        .filter(F.col("__prev").isNull() | (F.col(max_col) > F.col("__prev")))
        .drop("__prev")
    )
