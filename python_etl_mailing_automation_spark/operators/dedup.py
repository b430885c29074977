"""Key-dedup operators (SURVEY.md §2.5 W1/W2).

Implemented as a single window pass: ``row_number`` over an explicit
preference order, keep rank 1. The pandas reference relied on implicit
global sort order plus ``drop_duplicates`` (processing_pipeline.py:92-109,
compressor.py:37-54); Spark has no cross-operator order guarantee, so the
preference is encoded in the window ``orderBy`` — which also makes the
reference's tie nondeterminism (SURVEY.md §7.3 risk 1) deterministic.

Scale: one shuffle on the dedup key; no global sort. Skewed keys (one CPF
with millions of rows) are handled by AQE skew-join/partition splitting —
and a `row_number` window over a hot key is still a single-partition sort,
so for pathological skew prefer `max_by`-style reduction when the
preference is expressible as a single struct ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_best(
    df: DataFrame,
    key: str | list[str],
    order_by: list[Column],
    *,
    tiebreaker: str | None = None,
) -> DataFrame:
    """W1/W2: keep exactly one row per key, the first under ``order_by``.

    - W1 "smart dedup" (prefer rows with a name): ``order_by=[desc(has_name)]``
      with the flag built as ``col('nomecad').isNotNull()``.
    - W2 "completeness dedup": ``order_by=[desc(completude)]`` — the evident
      intent; the reference's literal ``keep='last'``-after-descending-sort
      keeps the LEAST complete row, an acknowledged reference bug
      (SURVEY.md §7.3 risk 3). This engine implements the intent.

    ``tiebreaker`` (a column name, e.g. a stable id) is appended ascending
    to make results deterministic under ties.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = list(order_by)
    if tiebreaker is not None:
        order.append(F.col(tiebreaker).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    rn = "__dedup_rn"
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1).drop(rn)


def smart_dedup_prefer_named(
    df: DataFrame, key: str, name_col: str, *, tiebreaker: str | None = None
) -> DataFrame:
    """W1 exactly as the reference frames it: among duplicate ``key`` rows,
    prefer ones whose ``name_col`` is non-null
    (processing_pipeline.py:92-109)."""
    has_name = F.col(name_col).isNotNull() & (F.trim(F.col(name_col).cast("string")) != "")
    return dedup_keep_best(df, key, [has_name.desc()], tiebreaker=tiebreaker)


def dedup_keep_best_maxby(
    df: DataFrame,
    key: str | list[str],
    sort_keys: list[Column],
    *,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Window-free W1/W2: keep the row whose ``sort_keys`` tuple is
    lexicographically SMALLEST per key — same semantics as
    :func:`dedup_keep_best` with an ascending ``orderBy`` on the same
    keys (express "prefer X" as a key that is smaller when X holds, e.g.
    ``F.when(cond, 0).otherwise(1)``; "larger value wins" as the negated
    value).

    Why it exists (skew hardening): a ``row_number`` window sorts each
    key's rows inside ONE partition — a hot key (millions of rows on one
    CPF) serializes into a single task. ``min_by`` is a declarative
    aggregate: Spark computes per-partition partial minima map-side and
    merges them, so a hot key costs each input partition O(1) state
    instead of a single-partition sort. One shuffle either way; the
    reduction is the difference at 100 TB.

    Sort keys should be made non-null (coalesce first): struct comparison
    against null fields yields null and ``min_by`` would skip such rows.
    ``payload_cols`` defaults to every non-key column.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = payload_cols or [c for c in df.columns if c not in keys]
    best = F.min_by(
        F.struct(*[F.col(c) for c in payload]), F.struct(*sort_keys)
    ).alias("__best")
    out = df.groupBy(*keys).agg(best)
    return out.select(*keys, *[F.col(f"__best.{c}").alias(c) for c in payload])


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    *,
    key: str | list[str],
    version_col: str,
) -> DataFrame:
    """SCD-type-1 snapshot merge ("MERGE INTO ... WHEN MATCHED UPDATE"):
    the next snapshot keeps, per key, the row with the highest
    ``version_col`` across base ∪ updates — an update beats the base row
    on a version tie (the update is the newer fact under equal
    timestamps, the standard last-writer-wins CDC convention).

    Same skew-hardened shape as :func:`dedup_keep_best_maxby`: one
    ``max_by`` reduction after unionByName — one shuffle on the key,
    per-partition partial maxima (no window sort), so a hot key costs
    each partition O(1) state even when one entity receives millions of
    updates. This is the batch-merge pattern lakehouse MERGE executes
    under the hood; expressing it as the engine's own dedup keeps the
    deterministic tie rules oracle-checkable.

    Rows whose ``version_col`` is NULL sort as oldest (kept only if a
    key has no versioned row at all).
    """
    keys = [key] if isinstance(key, str) else list(key)
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    # Ranking in the version's OWN dtype (a double cast would collapse
    # 64-bit versions above 2^53 into ties and let an older update win).
    # min_by needs the smallest tuple to win, so invert each component:
    # null-ness first (non-null beats null), then the version under a
    # descending rank via max_by-style negated flags — expressed as
    # min_by over (has_no_version, <version descending>, -src). Struct
    # comparison handles any orderable dtype; the NULL version is
    # coalesced inside its group so no struct field is ever NULL.
    ver_dtype = dict(tagged.dtypes)[version_col]
    zero = F.lit(0).cast(ver_dtype)
    best = F.max_by(
        F.struct(
            *[F.col(c) for c in tagged.columns if c not in keys]
        ),
        F.struct(
            F.col(version_col).isNotNull().cast("int").alias("has_v"),
            F.coalesce(F.col(version_col), zero).alias("v"),
            F.col("__src").alias("src"),
        ),
    ).alias("__best")
    payload = [c for c in tagged.columns if c not in keys]
    merged = tagged.groupBy(*keys).agg(best)
    return merged.select(
        *keys, *[F.col(f"__best.{c}").alias(c) for c in payload]
    ).drop("__src")


def cdc_apply(
    base: DataFrame,
    changelog: DataFrame,
    *,
    key: str | list[str],
    ts_col: str,
    op_col: str = "op",
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Apply an ordered insert/update/delete changelog to a base
    snapshot — the full MERGE INTO (matched UPDATE / matched DELETE /
    not-matched INSERT) that :func:`upsert_latest` covers only the
    upsert half of. Per key, the LAST fact wins: base rows rank before
    every log row; log rows order by ``(ts_col, *tiebreak)``. If the
    winning fact's ``op_col`` is ``'D'`` the key vanishes from the
    result; any other op (or the base row) contributes its payload.
    Returns the next snapshot with ``base``'s columns.

    ``changelog`` must carry the key, every base payload column, the
    op, the timestamp, and the optional ``tiebreak`` column(s) —
    required for determinism when one key can log twice at the same
    timestamp (same contract as scd2_intervals; pass enough columns to
    make the order total, or accept an arbitrary-but-single winner
    among exact ties). ``base`` must be unique per key (a snapshot).

    Scale shape: the :func:`upsert_latest` skew-hardened reduction —
    unionByName + one ``max_by`` per key (partial maxima, no window
    sort, hot entities cost O(1) state per partition), then a
    scan-side op filter. Late-arriving deletes replay correctly: the
    log is ordered by event time, not arrival order.
    """
    keys = [key] if isinstance(key, str) else list(key)
    tbs = (
        []
        if tiebreak is None
        else [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)
    )
    payload = [c for c in base.columns if c not in keys]
    log_types = dict(changelog.dtypes)
    b = base.select(
        *keys,
        *payload,
        F.lit(None).cast(log_types[ts_col]).alias("__ts"),
        F.lit("U").alias("__op"),
        F.lit(0).alias("__src"),
        *[
            F.lit(None).cast(log_types[c]).alias(f"__tb{i}")
            for i, c in enumerate(tbs)
        ],
    )
    lg = changelog.select(
        *keys,
        *payload,
        F.col(ts_col).alias("__ts"),
        F.col(op_col).alias("__op"),
        F.lit(1).alias("__src"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tbs)],
    )
    u = b.unionByName(lg)
    # base (__src 0) loses to every log row, so its NULL ts/tiebreak
    # fields never decide a comparison (base is unique per key); among
    # log rows (ts, *tiebreaks) ascending. The ts is coalesced to an
    # epoch floor anyway so no struct field is NULL on the log side.
    zero_ts = F.lit("1970-01-01").cast(log_types[ts_col])
    latest = u.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in [*payload, "__op"]]),
            F.struct(
                F.col("__src").alias("src"),
                F.coalesce(F.col("__ts"), zero_ts).alias("ts"),
                *[F.col(f"__tb{i}") for i in range(len(tbs))],
            ),
        ).alias("__last")
    )
    return latest.filter(F.col("__last.__op") != "D").select(
        *keys, *[F.col(f"__last.{c}").alias(c) for c in payload]
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data capture between two snapshots: full outer join on the
    key, rows classified ``insert`` (key only in new), ``delete`` (only
    in old), ``update`` (present in both with any compared column
    differing — NULL-safe comparison, so NULL→value and value→NULL both
    count as changes). Unchanged rows are dropped. Output: key columns,
    ``op``, and ``changed`` (sorted comma-joined names of differing
    columns; empty for insert/delete).

    The "what changed since yesterday's load" primitive every warehouse
    reconciliation runs; emitting it as a frame makes the diff joinable
    and auditable. One shuffle on the key (or broadcast under AQE when
    a side is small); the column comparison is per-row algebra.
    ``compare_cols`` defaults to all shared non-key columns.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = compare_cols or [
        c for c in old.columns if c in set(new.columns) and c not in keys
    ]
    # Presence markers instead of key-nullability probes, and null-safe
    # key equality: a NULL key is a legal (if unusual) entity id — with
    # plain == it would never match its counterpart and both presence
    # probes would read false, misclassifying the row.
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in cols],
        F.lit(1).alias("__o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in cols],
        F.lit(1).alias("__n_present"),
    )
    cond = [
        F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}")) for k in keys
    ]
    j = o.join(n, on=cond, how="full_outer")
    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                        F.lit(c),
                    )
                    for c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    op = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(~in_old & in_new, F.lit("insert"))
        .when(F.size(diffs) > 0, F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
        for k in keys
    ]
    return (
        j.select(
            *out_keys,
            op.alias("op"),
            F.when(
                in_old & in_new, F.array_join(diffs, ",")
            ).otherwise(F.lit("")).alias("changed"),
        )
        .filter(F.col("op").isNotNull())
    )


def scd2_intervals(
    changes: DataFrame,
    *,
    key: str | list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Change log → SCD-type-2 dimension history: per key, each change
    row becomes a validity interval — ``valid_from`` = its timestamp,
    ``valid_to`` = the NEXT change's timestamp (exclusive; NULL on the
    latest row), plus ``version`` (1-based change order) and
    ``is_current``. The as-of lookup against this history is then a
    plain ``valid_from <= t < valid_to`` filter (or the engine's
    :mod:`..operators.asof` union-merge join).

    One window over (key, ts[, tiebreak]) — a single shuffle on the
    key; ``tiebreak`` makes same-timestamp change order deterministic
    (required whenever the log can carry ties, e.g. a sequence or
    arrival id). NULL timestamps are rejected upstream concerns and
    dropped here.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        changes.filter(F.col(ts_col).isNotNull())
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
