"""Join operators (SURVEY.md §2.3).

Scale notes: the enrichment side of J1 is pre-aggregated to one row per
key *before* the join (shrinks the shuffle; also what Catalyst cannot
invent on its own — SURVEY.md §4) and broadcast when small. The anti-join
J3 replaces the reference's driver-side `isin(set)` with a distributed
`left_anti`, which AQE turns into a broadcast anti-join when the key set
is small — same plan, but it still works when the key set has 10^9 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_with_ordered_list(
    fact: DataFrame,
    enrichment: DataFrame,
    *,
    fact_key: str,
    enrich_key: str,
    value_col: str,
    score_col: str,
    out_col: str,
    broadcast_enrichment: bool | None = None,
) -> DataFrame:
    """J1a+J1: best-first list aggregation then left equi-join.

    Reference: sort enrichment ``(key asc, pontuacao desc)``, group-collect
    phone lists, ``merge(how='left')`` (processing_pipeline.py:146-161).

    Spark shape: ``collect_list(struct(-score, value))`` + ``array_sort`` +
    ``transform`` gives the best-first list without any global sort; the
    pre-aggregated side is one row per key. ``broadcast_enrichment``:

    - ``True`` — force a broadcast hint. Only for enrichment known to be
      dimension-sized (the reference's phone workbook); forcing it on a
      fact-sized side collects the whole aggregate to the driver — a
      scale-killer at 100 TB.
    - ``None`` (default) — no hint; Catalyst/AQE broadcasts iff the
      aggregated side's runtime size is under
      ``spark.sql.autoBroadcastJoinThreshold``, else shuffles both sides
      on the join key (the correct plan when enrichment ~ fact size).
    - ``False`` — forbid broadcast even if small.
    """
    struct_col = F.struct(
        (-F.col(score_col).cast("double")).alias("neg_score"),
        F.col(value_col).cast("string").alias("val"),
    )
    agg = (
        enrichment.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(enrich_key).alias("__join_key"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(struct_col)), lambda s: s["val"]
            ).alias(out_col)
        )
    )
    if broadcast_enrichment is True:
        agg = F.broadcast(agg)
    elif broadcast_enrichment is False:
        agg = agg.hint("shuffle_merge")
    joined = fact.join(agg, on=fact[fact_key] == agg["__join_key"], how="left")
    return joined.drop("__join_key")


def anti_join_on_keys(
    df: DataFrame,
    keys_df: DataFrame,
    *,
    df_key: Column | str,
    keys_key: Column | str,
) -> DataFrame:
    """J3: remove rows whose key appears in ``keys_df`` (left_anti).

    Reference built a Python set and used ``~isin`` on normalized CPFs
    (processing_pipeline.py:84-88); ``left_anti`` is the distributed
    equivalent and AQE broadcasts the key side when small.
    """
    left = F.col(df_key) if isinstance(df_key, str) else df_key
    right = F.col(keys_key) if isinstance(keys_key, str) else keys_key
    return df.join(keys_df, on=left == right, how="left_anti")


def anti_join_not_in(
    df: DataFrame,
    keys_df: DataFrame,
    *,
    df_key: str,
    keys_key: str,
) -> DataFrame:
    """SQL ``NOT IN (subquery)`` with its full three-valued-logic
    semantics, distributed. ``left_anti`` (:func:`anti_join_on_keys`) is
    the right operator for business blocklists, but it is NOT what SQL
    ``NOT IN`` means: under 3VL a NULL probe row never qualifies, and a
    single NULL in the subquery makes ``NOT IN`` unsatisfiable for
    EVERY row (x <> NULL is unknown). Engines implement this with a
    null-aware anti join; this is that plan expressed in DataFrame
    algebra, so migrated SQL keeps its exact semantics:

    - subquery empty → every row kept (NULL probes included);
    - subquery contains a NULL → nothing kept;
    - otherwise → non-NULL probes without a match kept.

    Scale shape: the subquery reduces to a broadcast 1-row (count,
    has-null) summary plus its distinct non-null key set for the anti
    join — the key set shuffles/broadcasts exactly as the plain anti
    join does; the summary adds one tiny aggregate and enters the plan
    as a 1-ROW broadcast cross join (constant build side — harmless at
    any scale). The key-vs-key comparison itself stays a HASH anti
    join: the per-row nested-loop scan of Spark's own null-aware-anti-
    join fallback over the whole key set never appears (plan-asserted).
    """
    stats = keys_df.agg(
        F.count(F.lit(1)).alias("__n_keys"),
        F.max(
            F.when(F.col(keys_key).isNull(), 1).otherwise(0)
        ).alias("__has_null"),
    )
    gated = (
        df.crossJoin(F.broadcast(stats))
        .filter(
            (F.col("__n_keys") == 0)
            | (
                (F.col("__has_null") == 0)
                & F.col(df_key).isNotNull()
            )
        )
        .drop("__n_keys", "__has_null")
    )
    nonnull_keys = keys_df.filter(F.col(keys_key).isNotNull())
    return gated.join(
        nonnull_keys, on=F.col(df_key) == F.col(keys_key), how="left_anti"
    )


def join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    *,
    on: str | list[str],
) -> DataFrame:
    """Incremental view maintenance for an equi-join with INSERT-only
    deltas: the new rows of ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` beyond ``A ⋈ B``
    are exactly

        Δ(A ⋈ B) = ΔA ⋈ B  ∪all  A ⋈ ΔB  ∪all  ΔA ⋈ ΔB

    (exact under BAG semantics — duplicates included with correct
    multiplicity). At 100 TB this is why a maintained join view costs
    |Δ|-proportional work per batch instead of re-joining the full
    inputs: the two big-base terms each join a DELTA side, which is
    small, so both plan as broadcast joins; only ΔA ⋈ ΔB is
    delta × delta. Updates/deletes are NOT handled here — route them
    through :func:`~..dedup.cdc_apply` into snapshot form first, or
    maintain a retraction stream alongside.

    Column contract: ``delta_a`` shares ``base_a``'s schema, ditto B;
    output columns follow Spark's equi-join layout (join keys once,
    then A-side, then B-side payload).
    """
    keys = [on] if isinstance(on, str) else list(on)
    return (
        delta_a.join(base_b, on=keys)
        .unionByName(base_a.join(delta_b, on=keys))
        .unionByName(delta_a.join(delta_b, on=keys))
    )


def band_join_self(
    df: DataFrame,
    id_col: str,
    value_col: str,
    *,
    delta: int,
    key_col: str | None = None,
) -> DataFrame:
    """Proximity self-join: all pairs (within ``key_col`` when given)
    whose integer ``value_col`` values differ by at most ``delta`` —
    the band-join primitive behind "events within 5 minutes of each
    other", sensor co-occurrence, and near-duplicate numeric readings.
    The naive form is a quadratic theta-join; no reference operator
    covers it (the reference's joins are all equi — SURVEY §2 J1-J4),
    and Spark would plan a raw ``abs(a-b) <= δ`` condition as
    BroadcastNestedLoopJoin.

    Blocking: bucket ``b = value div delta`` (floor division toward
    -inf for negatives, mirrored by SQL ``//``). Two values within
    ``delta`` land in the same or adjacent buckets, so the probe side
    explodes to buckets {b-1, b, b+1} and the join is a pure equi-join
    on (key?, bucket) — 3 probe rows per input row, candidates bounded
    by 3·(bucket population)², never |n|². The exact ``|a-b| <= delta``
    test then filters candidates; each qualifying pair survives in
    exactly ONE bucket (the index side's own bucket), so no distinct
    pass is needed. Pairs are oriented ``id_a < id_b``; NULL
    ids/values (and NULL keys when keyed) are dropped.

    Returns ``(key_col?, id_a, id_b, gap)`` with ``gap = |a - b|``.

    Scale/skew: bucket population is the operator's honest bound — a
    timestamp hot-spot (every event in one delta-window) IS a dense
    band whose output itself is quadratic; like jaccard_join_exact,
    candidate generation is output-bound, not corpus-bound.
    """
    if delta < 1:
        raise ValueError("band_join_self: delta must be >= 1")
    keys = [key_col] if key_col else []
    cond = F.col(id_col).isNotNull() & F.col(value_col).isNotNull()
    if key_col:
        cond = cond & F.col(key_col).isNotNull()
    base = df.filter(cond).select(
        *keys,
        F.col(id_col).alias("__id"),
        F.col(value_col).cast("long").alias("__v"),
    )
    bucket = F.expr(f"__v div {int(delta)}")
    index = base.select(
        *keys,
        F.col("__id").alias("id_i"),
        F.col("__v").alias("v_i"),
        bucket.alias("__b"),
    )
    probe = base.select(
        *keys,
        F.col("__id").alias("id_p"),
        F.col("__v").alias("v_p"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("__b"),
    )
    pairs = index.join(probe, on=[*keys, "__b"]).filter(
        (F.col("id_i") < F.col("id_p"))
        & (F.abs(F.col("v_i") - F.col("v_p")) <= delta)
        # each pair once: only the probe row visiting the INDEX row's
        # home bucket survives
    )
    return pairs.select(
        *keys,
        F.col("id_i").alias("id_a"),
        F.col("id_p").alias("id_b"),
        F.abs(F.col("v_i") - F.col("v_p")).cast("long").alias("gap"),
    )
