"""Declarative data-contract validation — the expectation suite a
pipeline runs before trusting an input batch (the "great
expectations" shape, relationally): each constraint compiles to plain
Spark aggregates and the result is ONE small report frame
``(constraint, column, violations, n_rows)`` that is diffable across
runs and engines.

Scale shape: all row-local constraints (not_null, range, regex,
accepted values) fold into a SINGLE pass over the data — one
aggregate, zero shuffles beyond it; `unique` adds one keyed aggregate;
`fk` adds one anti-join against the dimension (broadcast when the dim
is small). Nothing collects row-level violations — at 100 TB you count
first and sample offenders separately (filter by the violated
predicate) only for the constraints that failed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    constraints: list[tuple],
    *,
    fk_tables: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate ``constraints`` against ``df``. Each constraint is a
    tuple:

    - ``("not_null", col)`` — NULL values violate
    - ``("range", col, lo, hi)`` — values outside [lo, hi] violate
      (NULLs are not range violations; pair with not_null)
    - ``("accepted", col, [v1, v2, ...])`` — values outside the set
      violate (NULLs pass)
    - ``("regexp", col, pattern)`` — non-matching non-NULL values
      violate
    - ``("unique", col)`` — rows beyond the first per value violate
      (count = n_rows - n_distinct, NULLs excluded)
    - ``("fk", col, ref_name)`` — non-NULL values absent from
      ``fk_tables[ref_name]`` violate

    Returns one row per constraint: ``(constraint, column, violations,
    n_rows)``. Deterministic output order is the caller's sort.
    """
    if not constraints:
        raise ValueError("constraint_report: constraints must be non-empty")
    fk_tables = fk_tables or {}
    row_aggs: list = []
    row_names: list[tuple[str, str]] = []
    extras: list[DataFrame] = []
    n_total = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))

    for c in constraints:
        kind, col = c[0], c[1]
        if kind == "not_null":
            expr = F.col(col).isNull()
        elif kind == "range":
            _, _, lo, hi = c
            expr = F.col(col).isNotNull() & (
                (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))
            )
        elif kind == "accepted":
            _, _, vals = c
            expr = F.col(col).isNotNull() & ~F.col(col).isin(list(vals))
        elif kind == "regexp":
            _, _, pat = c
            expr = F.col(col).isNotNull() & ~F.col(col).rlike(pat)
        elif kind == "unique":
            dup = (
                df.filter(F.col(col).isNotNull())
                .groupBy(col)
                .agg(F.count(F.lit(1)).alias("__c"))
                .agg(
                    F.coalesce(
                        F.sum(F.col("__c") - F.lit(1)), F.lit(0)
                    )
                    .cast("long")
                    .alias("violations")
                )
                .select(
                    F.lit("unique").alias("constraint"),
                    F.lit(col).alias("column"),
                    "violations",
                )
            )
            extras.append(dup)
            continue
        elif kind == "fk":
            _, _, ref = c
            ref_df, ref_col = fk_tables[ref]
            orphan = (
                df.filter(F.col(col).isNotNull())
                .join(
                    F.broadcast(ref_df.select(F.col(ref_col).alias(col)).distinct()),
                    on=col,
                    how="left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(
                    F.lit("fk").alias("constraint"),
                    F.lit(col).alias("column"),
                    "violations",
                )
            )
            extras.append(orphan)
            continue
        else:
            raise ValueError(f"constraint_report: unknown constraint {kind!r}")
        alias = f"__v{len(row_names)}"
        # coalesce: F.sum over ZERO rows is NULL, and an empty batch's
        # report must read "0 violations" (clean), not unknown — a
        # downstream `violations == 0` gate would otherwise never fire.
        row_aggs.append(
            F.coalesce(F.sum(F.when(expr, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(alias)
        )
        row_names.append((kind, col))

    parts: list[DataFrame] = []
    if row_names:
        # ONE aggregate scan for every row-local constraint, exploded
        # to long format (separate union branches would re-plan — and
        # re-scan — the aggregate once per constraint)
        one = df.agg(*row_aggs)
        structs = [
            F.struct(
                F.lit(kind).alias("constraint"),
                F.lit(col).alias("column"),
                F.col(f"__v{i}").alias("violations"),
            )
            for i, (kind, col) in enumerate(row_names)
        ]
        parts.append(
            one.select(F.explode(F.array(*structs)).alias("__r")).select(
                "__r.constraint", "__r.column", "__r.violations"
            )
        )
    parts.extend(extras)
    report = reduce(lambda a, b: a.unionByName(b), parts)
    return report.crossJoin(F.broadcast(n_total)).select(
        "constraint", "column", "violations", F.col("__n").alias("n_rows")
    )


def contract_gate(
    df: DataFrame,
    constraints: list[tuple],
    *,
    out_col: str = "violated",
) -> DataFrame:
    """Row-level contract gate: append ``out_col`` — the LIST of
    constraint labels this row violates (empty = clean). Only
    row-local constraint kinds are accepted (``not_null``, ``range``,
    ``accepted``, ``regexp``): the gate is a pure projection, so the
    SAME call works on a batch frame and on a streaming frame (no
    aggregation state, no watermark needed) — quarantine is then a
    ``size(violated) > 0`` filter into a side sink, the streaming
    sibling of :func:`constraint_report`'s counting view.
    """
    if not constraints:
        raise ValueError("contract_gate: constraints must be non-empty")
    flags = []
    for c in constraints:
        kind, col = c[0], c[1]
        if kind == "not_null":
            expr = F.col(col).isNull()
        elif kind == "range":
            _, _, lo, hi = c
            expr = F.col(col).isNotNull() & (
                (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))
            )
        elif kind == "accepted":
            _, _, vals = c
            expr = F.col(col).isNotNull() & ~F.col(col).isin(list(vals))
        elif kind == "regexp":
            _, _, pat = c
            expr = F.col(col).isNotNull() & ~F.col(col).rlike(pat)
        else:
            raise ValueError(
                f"contract_gate: constraint {kind!r} is not row-local "
                "(unique/fk need cross-row state — use constraint_report)"
            )
        flags.append(F.when(expr, F.lit(f"{kind}:{col}")))
    return df.withColumn(
        out_col,
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
    )
