"""Physical-plan regression guards: the scale posture (SCALING.md) is
enforced, not just documented — if a change reintroduces a sort-merge
join where a broadcast belongs, or an extra shuffle, these fail."""

from __future__ import annotations

import pytest


def _explain(df, mode: str = "simple") -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    import __spark_entry__ as e

    def plan_of(name: str) -> str:
        return _explain(e.queries()[name](spark, sf_dir))

    return plan_of


@pytest.fixture(scope="module")
def battery(spark, sf_dir):
    """ONE planning pass over every registered query, shared by the
    battery-wide lints below. Each of the three whole-battery tests
    used to rebuild and re-plan all 258 queries itself (~220 s each,
    ~11 min of the suite — the round-10 driver pytest run timed out at
    77% partly on this); the QueryExecution caches its analyzed/
    physical plans, so schema + both explain renderings cost one
    planning pass per query total."""
    import __spark_entry__ as e

    out = {}
    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        qe = df._jdf.queryExecution()

        def _render(mode: str, qe=qe):
            return qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
            )

        out[name] = (df.schema, _render("formatted"), _render("simple"))
    return out


def test_windowed_sum_single_shuffle(plans):
    p = plans("per_key_windowed_sum")
    assert p.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in p


def test_blocklist_filter_no_shuffle(plans):
    # kept/rejected split is two scan-side filters + a union: no shuffle.
    p = plans("blocklist_split")
    assert "Exchange" not in p


def test_enrichment_join_broadcasts_preaggregated_side(plans):
    p = plans("enrichment_phones")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # pre-aggregation happens before the broadcast: partial+final agg pair
    assert p.count("ObjectHashAggregate") >= 2


def test_asof_join_is_single_window_shuffle(plans):
    p = plans("asof_join")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p  # union-merge: no join operator at all


def test_e2e_pipeline_all_joins_broadcast(plans):
    p = plans("mailing_pipeline_e2e")
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2  # anti-join + enrichment


def test_robot_pipeline_is_single_shuffle_no_window(plans):
    """The fused agg strategy is one hash aggregation on cpf: exactly one
    exchange, no window sort, no join (pipeline/robot.py strategy='agg')."""
    p = plans("robot_pipeline_e2e")
    assert p.count("Exchange hashpartitioning") <= 1
    assert "SortMergeJoin" not in p
    assert "Window" not in p


def test_maxby_dedup_is_partial_aggregation_no_window(spark, sf_dir):
    """Skew-hardened dedup: a min_by reduction must plan as two-phase
    hash aggregation (map-side partial minima), never as a window sort —
    that is its entire reason to exist (operators/dedup.py). Planned from
    the operator directly: the battery entry unions it with the window
    variant, which would mask the no-Window assertion."""
    from pyspark.sql import functions as F

    from python_etl_mailing_automation_spark.operators.dedup import (
        dedup_keep_best_maxby,
    )
    from python_etl_mailing_automation_spark.sources import read_table

    orders = read_table(spark, sf_dir, "orders")
    p = _explain(
        dedup_keep_best_maxby(
            orders,
            "o_custkey",
            [
                F.when(F.col("o_orderstatus") == "O", 0).otherwise(1),
                -F.col("o_totalprice"),
                F.col("o_orderkey"),
            ],
        )
    )
    assert "Window" not in p
    assert p.count("Exchange hashpartitioning") == 1
    # two-phase: map-side partial minima below the exchange (struct-typed
    # min_by plans as SortAggregate; the partial phase is what matters).
    assert "partial_min_by" in p


def test_scans_are_column_pruned(plans):
    p = plans("per_key_windowed_sum")
    # only the three projected columns reach the scan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m is not None
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert sorted(cols) == ["o_custkey", "o_orderkey", "o_totalprice"]


# Queries whose Arrow-batched pandas stage is the point (payload decode
# over opaque binary columns). NOTHING else may carry a pandas stage —
# the round-9 heavy_hitters_mg FlatMapGroupsInPandas slipped past the
# old MapInPandas-only check, hence the family list.
_PANDAS_EVAL_WHITELIST = ("multimodal_pipeline", "multimodal_frames")


def _python_eval_nodes(plan: str, *, allow_map_in_pandas: bool = False):
    """Every Python-side evaluation family a physical plan can carry.
    Returns the offending node names (empty = fully JVM-side). Shared
    by the battery-wide lint and the broken-fixture self-test so the
    detector itself is what's tested."""
    families = [
        "BatchEvalPython",          # row-wise Python UDF
        "ArrowEvalPython",          # scalar pandas UDF
        "FlatMapGroupsInPandas",    # applyInPandas (+WithState)
        "AggregateInPandas",        # pandas_udf group agg
        "WindowInPandas",           # pandas_udf window
    ]
    if not allow_map_in_pandas:
        families.append("MapInPandas")
    return [f for f in families if f in plan]


def test_no_python_evaluation_in_any_query_plan(battery):
    """The engine's promise: everything stays JVM-side. No row-wise,
    Arrow, or grouped-pandas Python evaluation in any entry query plan —
    the sole exceptions are the multimodal queries, whose mapInPandas
    decode stage is the point. (Formatted mode — simple omits codegen
    span markers.)"""
    for name, (_schema, formatted, _simple) in battery.items():
        bad = _python_eval_nodes(
            formatted, allow_map_in_pandas=name in _PANDAS_EVAL_WHITELIST
        )
        assert not bad, f"{name} has Python eval stages: {bad}"
        # (Codegen spans only render on executed/final AQE plans, so
        # their presence isn't asserted here; Python-free plans + built-in
        # expressions imply codegen eligibility.)


def test_python_eval_detector_catches_grouped_pandas(spark):
    """Self-test of the lint above: a deliberately-broken plan built
    with applyInPandas (the exact shape the round-9 audit missed) and
    one with a scalar pandas UDF must both be flagged."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    df = spark.createDataFrame([("k", 1), ("k", 2)], "key string, v long")

    def _ident(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    def _plan(frame):
        return frame._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    grouped = df.groupBy("key").applyInPandas(
        _ident, schema="key string, v long"
    )
    assert "FlatMapGroupsInPandas" in _python_eval_nodes(_plan(grouped))

    _plus_one = pandas_udf(lambda s: s + 1, "long")
    scalar = df.select(_plus_one("v").alias("v1"))
    assert "ArrowEvalPython" in _python_eval_nodes(_plan(scalar))
    # and the whitelist path still permits MapInPandas only
    mapped = df.mapInPandas(lambda it: it, schema="key string, v long")
    assert _python_eval_nodes(_plan(mapped), allow_map_in_pandas=True) == []
    assert "MapInPandas" in _python_eval_nodes(_plan(mapped))


def test_no_complex_output_columns_in_any_query(battery):
    """Driver-canonicalizer output contract: the driver sorts the raw
    pandas result frame before stringifying, so an ARRAY/MAP/STRUCT
    output column crashes it with ``unhashable type: 'list'`` (the
    round-7 ``contract_gate`` red row). Every battery query must emit
    only atomic columns — flatten arrays with array_join/array_sort
    before returning."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, (schema, _formatted, _simple) in battery.items():
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, f"complex output columns would crash the driver: {offenders}"


def test_budget_select_broadcasts_bucket_boundaries(plans):
    """The two-pass budget selection must broadcast the tiny bucket frame
    back (never sort-merge), and the only window sits on the boundary
    bucket branch."""
    p = plans("budget_select")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_winnow_pairs_no_cartesian_and_hot_cut_broadcast(plans):
    """Fingerprint self-join is an equi-join; the stop-gram cut is a
    broadcast anti-join of the HOT set (the small side by construction)."""
    p = plans("winnow_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "LeftAnti" in p


def test_kmeans_assignment_is_shuffle_free_scan(spark, sf_dir):
    """Assignment against literal centroids: no join anywhere in the
    final-assignment plan; the only exchange is AQE's output coalesce.
    Planned from the operator directly: the battery entry joins the
    SemDeDup kept-flag on top, which would mask the no-Join assertion."""
    from python_etl_mailing_automation_spark.datapipe.clustering import (
        kmeans_fit_assign,
    )
    from python_etl_mailing_automation_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit_assign(emb, k=8, n_iter=2)
    p = _explain(assigned)
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 0


def test_interval_join_plans_as_equi_join(plans):
    """The time-bin rewrite must never degrade to a nested-loop range
    join."""
    p = plans("interval_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or (
        "ShuffledHashJoin" in p
    )


def test_doc_chunks_single_rebalance_no_join(plans):
    """Chunking is scan → spread rebalance → generate/slice: exactly the
    one repartition exchange, no join, no window, pruned scan."""
    p = plans("doc_chunks")
    assert p.count("Exchange") == 1
    assert "Join" not in p and "Window" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_tfidf_broadcasts_vocabulary_and_pushes_topk(plans):
    """tf and df join on the term key as a broadcast (vocabulary side is
    the small build side), the (doc, term) aggregate is map-side combined,
    and the per-doc top-k runs under WindowGroupLimit — per-partition
    k-row heaps before the sort, never a full window sort."""
    p = plans("tfidf_topk")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "partial_count" in p
    assert "WindowGroupLimit" in p


def test_shard_assign_is_single_shard_shuffle(plans):
    """The corpus-wide shuffle is ONE hash exchange on the shard key plus
    a per-shard sort — no join, no global (single-partition) sort."""
    p = plans("shard_assign")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    # the sort is the window's per-partition sort, not a global order-by
    assert "rangepartitioning" not in p.lower()


def test_dedup_fingerprints_is_fused_single_scan(plans):
    """MinHash + SimHash fingerprints come from ONE fused scan: the only
    exchange is the spread rebalance — no join to attach the SimHash
    (with_simhash16 is the per-row fold form)."""
    p = plans("dedup_fingerprints")
    assert "Join" not in p
    assert p.count("Exchange") == 1


def test_ngram_shingle_explode_stays_above_spread_exchange(plans):
    """The blocked n-gram Jaccard path depends on the shingle
    generate/explode running ABOVE the spread rebalance exchange: with
    the distinct-shingle expression materialized as a column,
    InferFiltersFromGenerate derives a size() filter and pushdown pulls
    the whole shingle pipeline below the exchange — onto the unspread
    scan's few cores (measured 35× slower on a one-split table). A Spark
    upgrade could re-derive that plan silently; this pins the shape: no
    Generate may sit between a REPARTITION_BY_NUM exchange and its scan."""
    lines = plans("dedup_pairs").splitlines()
    assert any("Generate explode(array_distinct" in ln for ln in lines)
    below_exchange = False
    for ln in lines:
        if "REPARTITION_BY_NUM" in ln:
            below_exchange = True
        elif "FileScan" in ln or "InMemoryTableScan" in ln:
            below_exchange = False
        elif below_exchange and "Generate" in ln:
            raise AssertionError(
                f"shingle Generate pushed below the spread exchange: {ln.strip()}"
            )


def test_simhash_pairs_band_join_no_cartesian(plans):
    """SimHash near-dup candidates come from the (band_idx, band_value)
    self-equi-join — never an all-pairs product: no cartesian / nested-
    loop join anywhere, and the fingerprint scan is column-pruned."""
    p = plans("dedup_simhash_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_fuzzy_join_is_bucketed_equi_join_no_cartesian(plans):
    """Deletion-neighborhood linkage: candidates come from an equi join
    on variant md5 buckets — an all-pairs levenshtein would show up as a
    nested-loop/cartesian here."""
    p = plans("fuzzy_join_edit1")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_lm_score_partial_aggregation_no_cartesian(plans):
    """Bigram LM: model training and doc scoring are hash aggregations
    with map-side partials; every join is keyed (bg / w1 / doc_id)."""
    p = plans("lm_score")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p


def test_dup_spans_window_hash_join_no_cartesian(plans):
    """Exact-substring coverage: window explode (Generate) feeds keyed
    aggregations/joins on md5 — never an all-pairs or a global sort."""
    p = plans("dup_spans")
    assert "Generate" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "GlobalSort" not in p and ", true, 0" not in p  # no Sort global


def test_attribution_join_is_keyed_equi_join(plans):
    """The time-range bound must compile as a post-filter of the user
    equi join, not a nested-loop range join."""
    p = plans("attribution_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p) or (
        "ShuffledHashJoin" in p
    )


def test_funnel_single_user_exchange(plans):
    """All k stage windows share one user partitioning: Spark reuses a
    single hash exchange for the whole funnel (plus the final group-agg
    which AQE may satisfy from the same partitioning)."""
    p = plans("funnel")
    assert "SortMergeJoin" not in p and "Join" not in p
    assert p.count("Exchange hashpartitioning") <= 2


def test_temperature_mixture_broadcasts_rates(plans):
    """The #domains-sized rate table broadcasts back; the corpus side is
    filtered at the scan — no corpus-sized shuffle, no sort."""
    p = plans("temperature_mixture")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_quantile_buckets_broadcast_no_sort(plans):
    p = plans("quantile_buckets")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_mad_outliers_broadcasts_both_medians(plans):
    """Two broadcast-back joins (median, then MAD); corpus never
    shuffles, no windows."""
    p = plans("mad_outliers")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    assert "Window" not in p


def test_scd_upsert_is_partial_aggregation_no_window(plans):
    """The merge is the min_by reduction: map-side partial + final hash
    aggregate, never a row_number window."""
    p = plans("scd_upsert")
    assert "Window" not in p
    assert "SortMergeJoin" not in p


def test_entity_resolution_no_cartesian(plans):
    """Linkage pairs + closure: candidates stay bucketed equi joins all
    the way through the iterative component labels."""
    p = plans("entity_resolution")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_not_in_key_join_is_hash_anti(plans):
    """The 3VL key-set comparison compiles to a HASH anti join. The
    only nested-loop allowed is the 1-ROW summary broadcast (a constant
    build side — the gate predicate), never a key-vs-key product."""
    p = plans("not_in_semantics")
    assert "LeftAnti" in p and "CartesianProduct" not in p
    # every BNLJ in this plan is the Cross against the 1-row summary
    import re

    for line in p.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line and "__n_keys" in line


def test_histogram_broadcast_no_sort(plans):
    p = plans("histogram")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_snowflake_chain_all_dims_broadcast(plans):
    """The 4 dimension joins all broadcast (no sort-merge); the only
    hash exchange is the final group-by."""
    p = plans("snowflake_join")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p


def test_upsert_latest_stays_partial_aggregation(spark):
    """The 64-bit-safe version ranking must keep the max_by reduction
    shape: map-side partial + final hash aggregate, never a window sort
    (the skew-hardening the operator promises)."""
    from pyspark.sql import functions as F

    from python_etl_mailing_automation_spark.operators.dedup import (
        upsert_latest,
    )

    base = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit("b").alias("p"),
        F.col("id").alias("version"),
    )
    upd = base.withColumn("p", F.lit("u")).withColumn(
        "version", F.col("version") + 1
    )
    out = upsert_latest(base, upd, key="k", version_col="version")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "max_by" in plan or "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_gopher_quality_is_shuffle_free_scan(plans):
    """Gopher rules are one whole-stage-codegen scan: no exchange, no
    join, no aggregate — the rule measures are per-row column algebra."""
    p = plans("gopher_quality")
    assert "Exchange" not in p
    assert "Join" not in p
    assert "HashAggregate" not in p


def test_dataset_split_and_sft_format_shuffle_free(plans):
    """Split assignment and chat formatting are pure per-row algebra —
    zero shuffles at any scale."""
    for name in ("dataset_split", "sft_format"):
        p = plans(name)
        assert "Exchange" not in p, f"{name} shuffles"
        assert "Join" not in p, f"{name} joins"


def test_url_dedup_single_key_shuffle(plans):
    """URL dedup is one hashpartitioning shuffle on the canonical URL
    (agg-to-min + keep filter), no window sort, no cartesian."""
    p = plans("url_dedup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p


def test_cross_decontamination_band_equi_join_no_cartesian(plans):
    """Cross-corpus LSH: the only pair source is the (band_idx,
    band_val) equi-join between the two sides — never an all-pairs
    product over either corpus."""
    p = plans("cross_decontamination")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_posting_lists_frequency_cut_before_collect(plans):
    """The inverted index must CUT hot terms before building posting
    arrays: the collect_list aggregate's input side joins against the
    already-filtered frequency frame, so no cartesian and the only
    collect_list sits above a keyed join."""
    p = plans("posting_lists")
    assert "CartesianProduct" not in p
    assert "collect_list" in p
    # the df-range filter exists as a real predicate (pre-cut, not post)
    assert "df#" in p or "Filter" in p


def test_pagerank_iterations_join_edges_no_cartesian(plans):
    """Each PageRank iteration is an equi-join of the narrow rank
    frame to the edge list plus one keyed aggregate: no cartesian /
    nested-loop anywhere, no window, and at least one aggregation per
    iteration survives in the plan."""
    p = plans("pagerank")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p


def test_bloom_probe_broadcasts_sketch_side(plans):
    """The Bloom words frame (<= m_bits/62 rows) must reach the probe
    side as a broadcast — the whole point of the sketch is that the
    membership set travels to the data, never the reverse."""
    p = plans("bloom_blocklist")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_cms_probe_broadcasts_sketch_side(plans):
    """Count-Min estimate: the width x depth cell frame broadcasts to
    the per-distinct-value probe; no sort-merge join, no cartesian."""
    p = plans("cms_freq")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_kmv_single_distinct_then_bounded_topk(plans):
    """KMV: one distinct over (group, hash) then the per-group top-k
    window over fixed-width hash rows — no join at all in the plan."""
    p = plans("kmv_distinct")
    assert "Join" not in p
    assert "CartesianProduct" not in p


def test_resample_fill_key_exchanges_only(plans):
    """Gap fill: every exchange hashes on (key[, bucket]) — no global
    sort-for-join, no cartesian; the grid explode (Generate) sits above
    a keyed aggregate, bounded by span/step rows per key."""
    p = plans("resample_fill")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate explode" in p


def test_zone_maps_single_aggregate(plans):
    """Zone maps are ONE map-side-combined aggregation on the shard
    key: a single exchange, no join, no window."""
    p = plans("zone_maps")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    assert "Window" not in p


def test_group_ols_single_aggregate_no_join(plans):
    """OLS from moments is one keyed aggregation — a single exchange,
    no join, no window, all arithmetic in the projection."""
    p = plans("group_ols")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    assert "Window" not in p


def test_jaccard_join_exact_equi_joins_only(plans):
    """The exact similarity join's pair source is the prefix-token
    equi-join and its verify is a token equi-join — no cartesian or
    nested-loop product anywhere despite being an all-pairs-complete
    operator."""
    p = plans("jaccard_join_exact")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_scd2_intervals_single_key_exchange(plans):
    """SCD-2 history: LEAD + ROW_NUMBER share one window frame — a
    single hashpartitioning exchange on the key, no join."""
    p = plans("scd2_intervals")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p


def test_dq_report_rowlocal_constraints_one_pass(plans):
    """The four row-local constraints share ONE aggregate scan (their
    sums appear in a single HashAggregate), the fk check is a broadcast
    anti-join, and the only nested-loop is the 1-row n_rows attach."""
    p = plans("dq_report")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    # scans: row-local one-pass agg + unique + fk (orders & customer)
    # + n_rows = 5 — NOT one scan per constraint
    assert p.count("FileScan") <= 6


def test_seasonal_anomalies_broadcasts_baseline(plans):
    """The keys x 24 baseline frame broadcasts back to the events scan;
    no sort-merge join, no window."""
    p = plans("seasonal_anomalies")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Window" not in p


def test_rendezvous_shard_is_pure_projection(plans):
    """HRW assignment must stay a scan-side projection: no exchange,
    no join, no window — the operational basis of the no-shuffle
    claim."""
    p = plans("rendezvous_shard")
    assert "Exchange" not in p
    assert "Join" not in p
    assert "Window" not in p


def test_contract_gate_is_pure_projection(plans):
    """The row-local gate compiles to a single scan projection —
    which is exactly why the same call runs under readStream."""
    p = plans("contract_gate")
    assert "Exchange" not in p
    assert "Join" not in p
    assert "HashAggregate" not in p


def test_cube_single_expand_exchange(plans):
    """CUBE plans as one Expand + one hashpartitioning exchange —
    grouping sets never multiply shuffles."""
    p = plans("cube_stats")
    assert "Expand" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p


def test_impute_winsorize_boundaries_broadcast(plans):
    """Median fill and clip boundaries both return as broadcasts; the
    corpus is never sort-merge joined."""
    p = plans("impute_winsorize")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_containment_dedup_survivors_via_anti_join(plans):
    """The dedup action keeps survivors through a LeftAnti against the
    dropped-ids frame — payloads never enter the pair machinery — and
    no cartesian exists anywhere."""
    p = plans("containment_dedup")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_weighted_sample_scan_filter_plus_topk_window(plans):
    """Priority sampling is a scan-side filter + projection feeding one
    per-group top-k window: exactly one shuffle, no join, and the k-cut
    runs as WindowGroupLimit (per-partition state capped at k before
    the sort)."""
    p = plans("weighted_sample")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    assert "WindowGroupLimit" in p


def test_hll_sketch_aggregate_only(plans):
    """HLL is projections + hash aggregates; the register/estimate path
    has no window and no sort-merge join (the tiny estimate singletons
    combine via broadcast nested-loop cross joins, which is fine at one
    row each)."""
    p = plans("hll_distinct")
    assert "Window" not in p
    assert "SortMergeJoin" not in p


def test_cms_join_size_constant_frames_no_bigside_shuffle(plans):
    """The join-size estimate joins two <= width*depth cell frames —
    hash aggregates over the scans, then sketch-sized joins; nothing
    resembling an all-pairs of the inputs."""
    p = plans("cms_join_size")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_cdc_apply_partial_aggregation_no_window(plans):
    """The MERGE reduction is union + one max_by aggregation per key
    with map-side partial maxima (SortAggregate here — the ordering
    struct carries a string field): no window, exactly one exchange."""
    p = plans("cdc_apply")
    assert "Window" not in p
    assert "partial_max_by" in p
    assert p.count("Exchange hashpartitioning") == 1


def test_max_concurrency_single_key_shuffle(plans):
    """Sweep line: explode + one (key) window + one keyed aggregate —
    all exchanges hash on the key, no join in the operator itself (the
    query's output join against the peak frame broadcasts)."""
    p = plans("max_concurrency")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_label_propagation_no_cartesian_checkpointed(plans):
    """Label propagation materializes via localCheckpoint (the cache
    release contract), so its plan is a scan of the checkpointed
    result — the iteration plan was already executed without cartesian
    joins (covered by the unit test); here we assert the handed-back
    frame is checkpoint-backed, not a live n_iter-deep join tree."""
    p = plans("label_propagation")
    assert "Scan ExistingRDD" in p or "LogicalRDD" in p


def test_containment_dedup_fix_anti_join_ledger(plans):
    """The fixpoint variant filters survivors through the accumulated
    id ledger anti-join against the ORIGINAL frame; no cartesian."""
    p = plans("containment_dedup_fix")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_rolling_spend_binned_windows_partition_by_bin(plans):
    """Every window in the binned decomposition partitions by (user,
    bin) — a window partitioned by the bare user key would
    reintroduce the hot-key serial scan."""
    import re

    p = plans("rolling_spend_binned")
    specs = re.findall(r"windowspecdefinition\(user_id#\d+L?, (\w+)#", p)
    assert specs and all(col == "__bin" for col in specs)


def test_bfs_hops_checkpointed_iterations(plans):
    """BFS materializes via localCheckpoint (cache-release contract);
    the handed-back frame is checkpoint-backed, the bounded join+min
    rounds having already run without cartesians (unit-tested)."""
    p = plans("bfs_hops")
    assert "Scan ExistingRDD" in p or "LogicalRDD" in p


def test_hits_scores_checkpointed_iterations(plans):
    """Same contract as bfs_hops: HITS hands back a checkpointed
    frame, not a live 2-iteration join tree."""
    p = plans("hits_scores")
    assert "Scan ExistingRDD" in p or "LogicalRDD" in p


def test_assoc_rules_equi_joins_plus_onerow_broadcast(plans):
    """The pair generation and support joins are HASH equi-joins; the
    only nested-loop is the 1-row n_baskets broadcast-back, never an
    item-vs-item product."""
    p = plans("assoc_rules")
    assert "CartesianProduct" not in p
    for line in p.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line
    assert "n_baskets" in p


def test_dedup_lines_scoped_broadcasts_frequent_set(plans):
    """The scoped frequent-line set stays tiny (bounded by
    lines/min_docs) and must broadcast so the corpus-sized line
    relation is filtered map-side without a join shuffle."""
    p = plans("dedup_lines_scoped")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_agg_delta_apply_union_fold_no_join(plans):
    """Delta maintenance is union + re-aggregate: the changelog
    collapses to per-key partials and merges with the base state
    through a groupBy — no join anywhere in the plan."""
    p = plans("agg_delta_apply")
    assert "Join" not in p
    assert "HashAggregate" in p


def test_twap_events_single_key_exchange(plans):
    """The lead-gap window and the final aggregate share one
    hash-partitioning on the user key: one exchange end to end, no
    joins, no global sort."""
    p = plans("twap_events")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p and "Exchange rangepartitioning" not in p


def test_kcore_checkpointed_iterations(plans):
    """k-core peeling hands back a checkpointed frame (cache-release
    contract); the bounded degree+semi-join rounds already ran."""
    p = plans("kcore")
    assert "Scan ExistingRDD" in p or "LogicalRDD" in p


def test_sssp_weighted_checkpointed_iterations(plans):
    """Bounded Bellman-Ford hands back a checkpointed frame, not a
    live relaxation join tree."""
    p = plans("sssp_weighted")
    assert "Scan ExistingRDD" in p or "LogicalRDD" in p


def test_keyword_search_take_ordered_no_global_sort(plans):
    """Conjunctive retrieval's top-k must plan as TakeOrdered
    (per-partition heaps + k-row merge) — a rangepartitioning
    exchange would be a full corpus sort for 20 rows."""
    p = plans("keyword_search")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p
    assert "Join" not in p


def test_stratified_exact_broadcasts_quota_frame(plans):
    """The per-group quota frame (group-cardinality rows) broadcasts
    back to the ranked corpus — the corpus pays one hash exchange for
    its in-group rank, never a shuffle join against the quotas."""
    p = plans("stratified_exact")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_compaction_plan_metadata_window_only(plans):
    """The packing is one per-scope running-sum window over the
    metadata-sized manifest — no joins, no range partitioning."""
    p = plans("compaction_plan")
    assert "Join" not in p
    assert "Exchange rangepartitioning" not in p


def test_interpolate_linear_single_key_exchange(plans):
    """Both IGNORE-NULLS neighbor scans ride one hash exchange on the
    user key (same partitioning, same sort) — no joins, no grid
    explode, no global sort."""
    p = plans("interpolate_linear")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p and "Exchange rangepartitioning" not in p


def test_skyline_is_windowed_sweep_not_self_join(plans):
    # O(n log n) frontier: distinct-point agg + one window; the
    # quadratic NOT EXISTS dominance join must never appear.
    p = plans("skyline_parts")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") <= 2


def test_cdf_normalize_single_exchange_no_join(plans):
    p = plans("cdf_normalize")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_cohort_retention_broadcasts_cohort_sizes(plans):
    p = plans("cohort_retention")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # cohort-size frame, one row per week


def test_collocations_no_cartesian_beyond_one_row_totals(plans):
    # the two corpus totals ride one-row broadcasts; the word joins are
    # hash equi-joins — never a cartesian over the vocabulary.
    p = plans("collocations")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 2  # n_tok / n_big one-row frames


def test_phrase_search_positional_equi_joins(plans):
    p = plans("phrase_search")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_edit_join_segment_blocking_no_cartesian(plans):
    # PassJoin: candidates come from the (segment#, length, text)
    # equi-join; the quadratic verify of the oracle must never appear.
    p = plans("edit_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_fd_violations_two_stacked_aggregates_no_join(plans):
    p = plans("fd_violations")
    assert "Join" not in p


def test_k_anonymity_single_shuffle_pair(plans):
    # (QI, sensitive) pre-agg + QI agg — no count-distinct expand, no join
    p = plans("k_anonymity")
    assert "Join" not in p
    assert "Expand" not in p


def test_ewma_contribution_explode_not_array_rescan(plans):
    # bounded explode + (key, pos) aggregate + one equi-join back to the
    # anchor rows; never a cartesian or per-row array state
    p = plans("ewma_events")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_sorted_neighborhood_single_exchange_no_self_join(plans):
    # pairs come from the lead-array explode, not the oracle's rank
    # self-join
    p = plans("sorted_neighborhood")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_linkage_e2e_no_cartesian(plans):
    p = plans("linkage_clusters_e2e")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_band_join_is_bucket_equi_join_not_nested_loop(plans):
    # a raw abs(a-b) <= delta theta-join would plan BroadcastNestedLoop;
    # the bucket-neighbor blocking keeps it a hash equi-join
    p = plans("band_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_domain_quality_broadcasts_source_frame(plans):
    p = plans("domain_quality_e2e")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_event_transitions_windows_only_no_join(plans):
    p = plans("event_transitions")
    assert "Join" not in p


def test_table_profile_single_pass_expand(plans):
    # one scan + one Expand for all four exact NDVs — never four scans
    p = plans("table_profile")
    assert p.count("Scan parquet") == 1
    assert "Expand" in p
    assert "Join" not in p


def test_running_distinct_one_exchange_join_free(plans):
    p = plans("running_distinct")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_islands_one_exchange_join_free(plans):
    p = plans("islands")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_lsh_recall_no_cartesian_beyond_one_row_totals(plans):
    p = plans("lsh_recall")
    assert "CartesianProduct" not in p
    # the single-row candidate-count frame rides one nested-loop
    # broadcast; everything else is hash equi-joins
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_grouping_sets_single_expand_pass(plans):
    p = plans("grouping_sets")
    assert "Expand" in p
    assert p.count("Scan parquet") == 1
    assert "Join" not in p


def test_lang_consistency_no_join_two_aggs(plans):
    # chunk explode + per-(doc, lang) agg + per-doc agg: no join at all
    p = plans("lang_consistency")
    assert "Join" not in p


def test_edit_join_two_no_cartesian(plans):
    p = plans("edit_join_two")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_quantized_topk_takes_k_not_global_sort(plans):
    # brute pairing is the documented oracle-reference shape (same as
    # cosine_topk); what must hold is the per-query group limit, never
    # a global sort of all pairs
    p = plans("quantized_topk")
    assert "WindowGroupLimit" in p or "TakeOrdered" in p


def test_negative_samples_one_exchange_no_join(plans):
    p = plans("negative_samples")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_cusum_one_exchange_windows_only(plans):
    # both stacked windows (running sum, running min over it) share the
    # (user_id, ts, event_id) sort: one hash exchange, no join
    p = plans("cusum")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_hilbert_key_pure_map_no_exchange(plans):
    # 16 chained level projections stay a narrow map — no exchange, no
    # join, one scan
    p = plans("hilbert_key")
    assert "Exchange" not in p
    assert "Join" not in p
    assert p.count("Scan parquet") == 1


def test_sequence_pattern_one_exchange_no_join(plans):
    p = plans("sequence_pattern")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_interval_union_one_exchange(plans):
    p = plans("interval_union")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_merkle_diff_joins_only_bucket_cardinality(plans):
    # two table scans aggregate independently; the only joins run on
    # bucket-cardinality frames (compare + parent) — never row-level
    # A-to-B. 4 scans (2 sides x 2 in the self-referencing parent join).
    p = plans("merkle_diff")
    assert p.count("Scan parquet") <= 4


def test_proximity_join_no_cartesian(plans):
    p = plans("proximity_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _unpartitioned_window_violations(plan: str) -> list[str]:
    """Return the unpartitioned-Window lines of a 'simple' physical plan
    whose subtree contains NO cardinality bound (no aggregate and no
    limit) — i.e. global windows sitting directly on data-sized frames.

    A Window with both specs prints ``Window [exprs], [partition],
    [order]`` (two ``], [`` separators); with only one spec it prints a
    single trailing group, which is the ORDER spec (⇒ unpartitioned)
    exactly when it carries an ASC/DESC direction, and the partition
    spec (fine: no global sort) otherwise. The subtree of a node is the
    run of following lines with strictly greater tree depth. An
    unpartitioned window is sanctioned only when that subtree is
    bounded by construction: an Aggregate (per-bucket/per-group frames)
    or a limit (TakeOrdered top-k sketches) stands between it and every
    scan.
    """
    import re

    lines = plan.splitlines()

    def depth_and_body(line: str) -> tuple[int, str]:
        i = 0
        while i < len(line) and line[i] in " :+-":
            i += 1
        return i, re.sub(r"^\*\(\d+\) ", "", line[i:])

    bad = []
    for idx, line in enumerate(lines):
        d, body = depth_and_body(line)
        if not body.startswith("Window ") or body.count("], [") >= 2:
            continue
        m = re.search(r"\], \[([^\[\]]*)\]\s*$", body)
        last_group = m.group(1) if m else ""
        if " ASC" not in last_group and " DESC" not in last_group:
            continue  # partition-only window: no global sort
        bounded = False
        for sub in lines[idx + 1:]:
            sd, sbody = depth_and_body(sub)
            if sd <= d:
                break
            if (
                "Aggregate" in sbody
                or sbody.startswith("TakeOrderedAndProject")
                or "Limit" in sbody
            ):
                bounded = True
                break
        if not bounded:
            bad.append(body[:160])
    return bad


def test_no_raw_table_global_window_in_any_query(battery):
    """Battery-wide scale lint: an unpartitioned Window (single-task
    global sort — the WindowExec warning in bench tails) is allowed ONLY
    on frames bounded by construction (aggregate- or limit-derived,
    e.g. KMV's 2k-row sketch merge). A global window over a raw table is
    the one plan shape that cannot survive 100×, so it fails here."""
    offenders = {}
    for name, (_schema, _formatted, simple) in battery.items():
        bad = _unpartitioned_window_violations(simple)
        if bad:
            offenders[name] = bad
    assert not offenders, f"raw-table global windows: {offenders}"


def test_global_window_lint_catches_broken_fixture(spark, sf_dir):
    """The lint itself must fire on a deliberately-broken plan (a raw
    parquet scan under an unpartitioned window) and stay quiet on the
    partitioned and aggregate-bounded variants."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.read.parquet(f"{sf_dir}/orders.parquet")
    broken = raw.withColumn(
        "r", F.row_number().over(Window.orderBy("o_orderkey"))
    )
    plan = broken._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert _unpartitioned_window_violations(plan)

    ok_part = raw.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
        ),
    )
    plan = ok_part._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert not _unpartitioned_window_violations(plan)

    agged = raw.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    ok_agg = agged.withColumn(
        "c", F.sum("n").over(Window.orderBy("o_orderpriority"))
    )
    plan = ok_agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert not _unpartitioned_window_violations(plan)


def test_oracle_float_literals_use_e_notation():
    """Every high-precision float constant baked into an oracle must be
    an e-notation DOUBLE literal. DuckDB types a bare ``0.386…``
    literal DECIMAL(p,s), and its decimal→double cast can land 1 ulp
    off the IEEE value the Spark plan embeds (measured on 1/log2(6) —
    the round-9 ndcg parity incident). ≤15 significant digits always
    survives the cast exactly-roundtripped; beyond that, only the
    strtod path (e-notation or string cast) is correctly rounded, so
    the lint draws the line there. `_dlit` in __spark_entry__ is the
    sanctioned formatter."""
    import re

    import __spark_entry__ as e

    pat = re.compile(r"(?<![\w.])\d+\.\d*(?![eE\d])")
    offenders = []
    for name, sql in e.oracle_sql().items():
        for match in pat.finditer(sql):
            lit = match.group(0)
            digits = lit.replace(".", "").lstrip("0")
            if len(digits) < 16:
                continue
            # Integer-valued literals that are binary-exact (e.g. the
            # 2^50 / 2^60 hash-grid constants) survive ANY cast path.
            ipart, frac = lit.split(".")
            if frac.strip("0") == "" and float(int(ipart)) == int(ipart):
                continue
            offenders.append((name, lit))
    assert not offenders, (
        "bare high-precision decimal literals in oracles (use _dlit / "
        f"e-notation): {sorted(set(offenders))}"
    )


def test_oracle_float_lint_catches_fixture():
    """The lint regex itself must flag a deliberately-bare literal."""
    import re

    pat = re.compile(r"(?<![\w.])\d+\.\d*(?![eE\d])")
    bad = "SELECT 0.38685280723454163 AS v"
    hits = [m.group(0) for m in pat.finditer(bad)]
    assert hits == ["0.38685280723454163"]
    ok = "SELECT 0.38685280723454163e0 AS v, arr[1.5] AS w"
    digits_hits = [
        m.group(0)
        for m in pat.finditer(ok)
        if len(m.group(0).replace(".", "").lstrip("0")) >= 16
    ]
    assert digits_hits == []
