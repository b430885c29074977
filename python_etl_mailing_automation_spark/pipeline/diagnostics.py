"""Input forensics — the reference's standalone tools as library queries
(SURVEY.md §3.3).

- ``profile_unique_values`` ≈ ``diagnostico.py:29-57`` (unique values of
  selected columns, with counts — distributed, not a driver loop).
- ``schema_drift`` ≈ ``schema.py:24-42`` (added/removed/reordered columns
  between two input generations — driver-side on ``df.columns``; schema
  metadata is not data-sized).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_unique_values(df: DataFrame, columns: list[str]) -> DataFrame:
    """Long-format profile: ``(column, value, n_rows)`` for each distinct
    value of each requested column. One shuffle; columns profiled in a
    single pass via melt-style stacking."""
    present = [c for c in columns if c in df.columns]
    if not present:
        raise ValueError(f"none of {columns} present in frame")
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in present
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    return stacked.groupBy("column", "value").agg(F.count(F.lit(1)).alias("n_rows"))


def profile_cardinality(
    df: DataFrame, columns: list[str], *, rsd: float = 0.05
) -> DataFrame:
    """Cardinality profile via HyperLogLog sketches: one row per column
    with ``approx_distinct`` (+ exact for comparison on small data).

    At 100 TB, exact COUNT(DISTINCT) per column is a full shuffle per
    column; ``approx_count_distinct`` is a single pass with constant
    memory per sketch and mergeable partial state — the right default for
    profiling wide tables. ``rsd`` is the target relative standard error.
    """
    present = [c for c in columns if c in df.columns]
    if not present:
        raise ValueError(f"none of {columns} present in frame")
    aggs = []
    for c in present:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"__a_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__e_{c}"))
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(c, int(row[f"__a_{c}"]), int(row[f"__e_{c}"])) for c in present],
        "column string, approx_distinct long, exact_distinct long",
    )


@dataclass
class SchemaDrift:
    added: list[str]
    removed: list[str]
    reordered: bool

    @property
    def has_drift(self) -> bool:
        return bool(self.added or self.removed or self.reordered)


def schema_drift(base: DataFrame, new: DataFrame) -> SchemaDrift:
    """Column drift between two generations of the same feed."""
    b, n = list(base.columns), list(new.columns)
    added = [c for c in n if c not in b]
    removed = [c for c in b if c not in n]
    common_b = [c for c in b if c in n]
    common_n = [c for c in n if c in b]
    return SchemaDrift(added=added, removed=removed, reordered=common_b != common_n)


def fk_orphan_stats(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each ``(name, child, child_key,
    parent, parent_key)`` relation, count the child rows (non-null key)
    and how many of them reference a missing parent — the pre-load FK
    check every warehouse ETL runs, as one lazy unioned frame (one row
    per relation: ``relation, n_rows, n_orphans``).

    Shape per relation: distinct parent keys (keys only — never parent
    payloads), left join the child's key column, conditional count. AQE
    broadcasts the key set when dimension-sized; fact-to-fact relations
    shuffle on the key. The audit frame is O(#relations) rows.
    """
    if not relations:
        raise ValueError("fk_orphan_stats: relations list is empty")
    outs = []
    for name, child, child_key, parent, parent_key in relations:
        pk = parent.select(F.col(parent_key).alias("__pk")).distinct()
        stats = (
            child.select(F.col(child_key).alias("__ck"))
            .filter(F.col("__ck").isNotNull())
            .join(pk, on=F.col("__ck") == F.col("__pk"), how="left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                # coalesce: sum over ZERO rows (all-NULL FKs filtered
                # out) is NULL, which would dodge n_orphans == 0 gates
                F.coalesce(
                    F.sum(
                        F.when(F.col("__pk").isNull(), 1).otherwise(0)
                    ),
                    F.lit(0),
                ).cast("long").alias("n_orphans"),
            )
            .select(F.lit(name).alias("relation"), "n_rows", "n_orphans")
        )
        outs.append(stats)
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
