"""Market-basket association rules — the co-occurrence mining pass on
top of pair candidate generation (Agrawal & Srikant, VLDB 1994's
support/confidence framing plus the lift measure): given baskets of
items, emit directed rules ``antecedent → consequent`` with exact
integer supports and the derived confidence / lift scores.

Scale shape: items are first collapsed to DISTINCT (basket, item) —
multiplicity inside a basket is presence, not weight — so the pair
self-join on the basket key fans out quadratically in BASKET size only
(bounded: carts, orders, sessions), linear in the number of baskets;
both the pair aggregate and the item-support aggregate are map-side
combinable groupBys. Supports stay BIGINT end to end; the
confidence threshold is applied as an exact integer cross-multiply
(``sup_ab·den ≥ sup_a·num``), and confidence/lift are emitted as one
fixed sequence of IEEE double ops over exact integers — engine-portable
to the bit. The global basket count rides a one-row cross join
(broadcast-back house style), never a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 3,
    min_confidence: tuple[int, int] = (1, 5),
) -> DataFrame:
    """Directed association rules over (basket, item) rows.

    ``min_confidence`` is an exact rational ``(num, den)`` — the filter
    is ``sup_ab · den ≥ sup_antecedent · num``, so thresholding never
    touches floats. Returns one row per surviving directed rule:
    ``antecedent, consequent, sup_pair, sup_ante, sup_cons, n_baskets,
    confidence, lift`` where ``confidence = sup_pair / sup_ante`` and
    ``lift = (sup_pair · n_baskets) / (sup_ante · sup_cons)`` (> 1 ⇒
    positively associated beyond chance).
    """
    num, den = min_confidence
    if min_support < 1 or num < 0 or den < 1:
        raise ValueError("association_rules: bad thresholds")
    items = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .filter(F.col("__b").isNotNull() & F.col("__i").isNotNull())
        .distinct()
    )
    n_baskets = items.agg(
        F.countDistinct("__b").cast("long").alias("n_baskets")
    )
    sup = items.groupBy("__i").agg(
        F.count(F.lit(1)).cast("long").alias("__sup")
    )
    a = items.select(F.col("__b"), F.col("__i").alias("__ia"))
    b = items.select(F.col("__b").alias("__b2"), F.col("__i").alias("__ib"))
    pair_sup = (
        a.join(
            b,
            on=[F.col("__b") == F.col("__b2"), F.col("__ia") < F.col("__ib")],
        )
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).cast("long").alias("sup_pair"))
        .filter(F.col("sup_pair") >= min_support)
    )
    directed = pair_sup.select(
        F.col("__ia").alias("antecedent"),
        F.col("__ib").alias("consequent"),
        "sup_pair",
    ).unionByName(
        pair_sup.select(
            F.col("__ib").alias("antecedent"),
            F.col("__ia").alias("consequent"),
            "sup_pair",
        )
    )
    with_sup = (
        directed.join(
            sup.select(
                F.col("__i").alias("antecedent"),
                F.col("__sup").alias("sup_ante"),
            ),
            on="antecedent",
        )
        .join(
            sup.select(
                F.col("__i").alias("consequent"),
                F.col("__sup").alias("sup_cons"),
            ),
            on="consequent",
        )
        .filter(
            F.col("sup_pair") * F.lit(int(den))
            >= F.col("sup_ante") * F.lit(int(num))
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return with_sup.select(
        "antecedent",
        "consequent",
        "sup_pair",
        "sup_ante",
        "sup_cons",
        "n_baskets",
        (
            F.col("sup_pair").cast("double")
            / F.col("sup_ante").cast("double")
        ).alias("confidence"),
        (
            (F.col("sup_pair").cast("double") * F.col("n_baskets").cast("double"))
            / (
                F.col("sup_ante").cast("double")
                * F.col("sup_cons").cast("double")
            )
        ).alias("lift"),
    )
