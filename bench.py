#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
I/O, no Catalyst count-style pruning shortcuts). One warm-up pass of the
flagship query absorbs JVM/codegen warm-up so timings reflect steady
state.

Round-over-round comparability: the headline list grows most rounds
(r3 28 → r4 43 → r5 83 → r6 129 → r7 173 entries), so compare ``sec_per_query`` and
per-query values, not the raw total. Individual sub-second queries
swing 2–3× between runs under background load (measured r5) — single-
query deltas are noise unless they reproduce on an idle machine; r4's
flagged robot_pipeline_e2e "regression" recovered with zero code change.
The deep tier is pinned by the MANIFEST content hash reported in the
``deep`` block: timings are only comparable between rounds with equal
``dir_hash``.

Known r4→r5 per-query deltas that are semantics upgrades, not
regressions: ``similarity_topk`` ~1.8→~3.5 s because the IVF path now
TRAINS its codebook (kmeans_fit_assign, the production index-build)
instead of sampling fixed centroids; ``dedup_clusters_star`` is the
deliberately-included alternating large-star/small-star algorithm —
per-round fixed overhead dominates at sf0.1 (the delta-frontier
``dedup_clusters`` is the fast path at this scale; star exists for the
high-diameter-graph regime where propagation iterations explode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: every major shuffle shape the engine supports — windowed
# agg, group-agg segmentation, window top-k + pivot, pre-agg broadcast
# join, array algebra, LSH dedup (signatures + bucket join + verify),
# simhash explode-agg, brute + bucketed cosine top-k, text scoring,
# tumbling windows.
BENCH_QUERIES = [
    "mailing_pipeline_e2e",
    "robot_pipeline_e2e",
    "per_key_windowed_sum",
    "segmentation",
    "smart_dedup",
    "topk_per_group",
    "rank_pivot",
    "rank_in_group",
    "enrichment_phones",
    "priority_case_sort",
    "scalar_functions",
    "union_sheets",
    "window_counts",
    "sessionization",
    "asof_join",
    "export_human_layout",
    "text_metrics",
    "text_transforms",
    "dedup_exact",
    "dedup_fingerprints",
    "dedup_pairs",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "dedup_clusters_star",
    "decontamination",
    "similarity_topk",
    "similarity_ann_buckets",
    "embedding_near_dup",
    "corpus_curation_e2e",
    "pii_redact",
    "sequence_pack",
    "sampling_suite",
    "dedup_lines",
    "corpus_stats",
    "corpus_quantiles",
    "text_clusters",
    "budget_select",
    "winnow_pairs",
    "kmeans_semantic",
    "top_ngrams",
    "dedup_incremental",
    "stream_curation_batch",
    "interval_join",
    "multimodal_pipeline",
    "doc_chunks",
    "tfidf_topk",
    "shard_assign",
    "fuzzy_join_edit1",
    "lm_score",
    "dup_spans",
    "attribution_join",
    "temperature_mixture",
    "quantile_buckets",
    "funnel",
    "mad_outliers",
    "scd_upsert",
    "debounce",
    "rolling_spend",
    "fk_orphans",
    "source_divergence",
    "not_in_semantics",
    "entity_resolution",
    "histogram",
    "retrieval_e2e",
    "rollup_stats",
    "period_over_period",
    "copurchase_pairs",
    "pseudonymize",
    "zscore",
    "exact_corr",
    "skew_kurt",
    "snapshot_diff",
    "hierarchy_depth",
    "snowflake_join",
    "session_funnel",
    "zorder_key",
    "json_props",
    "unpivot_melt",
    "dup_spans_excise",
    "triangles",
    "window_functions",
    "semantic_curation_e2e",
    # Round-6 additions: every oracled query now has a timing (previously
    # these 9 were green in CORRECTNESS but absent from the headline set).
    "distinct_list_per_key",
    "group_count_having",
    "threshold_anti_join",
    "completeness_dedup",
    "head_row_per_group",
    "blocklist_split",
    "skew_salted_join",
    "value_profile",
    "audit_blocklist_clean",
    "dedup_ledger_merge",
    "shard_manifest",
    "gopher_quality",
    "url_dedup",
    "cross_decontamination",
    "posting_lists",
    "dataset_split",
    "sft_format",
    "dsir_select",
    "kmv_distinct",
    "pagerank",
    "bloom_blocklist",
    "bloom_fpr",
    "cms_error",
    "cms_freq",
    "resample_fill",
    "zone_maps",
    "group_ols",
    "bpe_train",
    "loghist_quantiles",
    "jaccard_join_exact",
    "containment_join",
    "stream_loghist_batch",
    "seasonal_anomalies",
    "agg_state_merge",
    "contract_gate",
    "kmv_jaccard",
    "impute_winsorize",
    "cube_stats",
    "personalized_pagerank",
    "rendezvous_shard",
    "bpe_tokenize_pack",
    "embedding_covariance",
    "pca_pc1",
    "containment_dedup",
    "scd2_intervals",
    "dq_report",
    # Round-7 additions.
    "containment_dedup_fix",
    "bpe_segment_holdout",
    "rolling_spend_binned",
    "hll_distinct",
    "cms_join_size",
    "cdc_apply",
    "hll_group_distinct",
    "max_concurrency",
    "weighted_sample",
    "label_propagation",
    "constraint_offenders",
    "join_delta",
    "dataset_fingerprint",
    "bfs_hops",
    "hits_scores",
    "assoc_rules",
    "dedup_lines_scoped",
    "agg_delta_apply",
    "twap_events",
    "kcore",
    "sssp_weighted",
    "keyword_search",
    "stratified_exact",
    "compaction_plan",
    "interpolate_linear",
    "skyline_parts",
    "cdf_normalize",
    "cohort_retention",
    "collocations",
    "phrase_search",
    "edit_join",
    "fd_violations",
    "k_anonymity",
    "ewma_events",
    "sorted_neighborhood",
    "linkage_clusters_e2e",
    "band_join",
    "domain_quality_e2e",
    "event_transitions",
    "table_profile",
    "running_distinct",
    "islands",
    "lsh_recall",
    "grouping_sets",
    "lang_consistency",
    "edit_join_two",
    "quantized_topk",
    "negative_samples",
    # Round-8 additions.
    "dedup_band_ledger",
    "band_ledger_update",
    "pq_topk",
    "scc",
    "cusum",
    "hilbert_key",
    "sequence_pattern",
    "vocab_growth",
    "benford",
    "interval_union",
    "merkle_diff",
    "weighted_quantiles",
    "proximity_join",
    "subtree_rollup",
    "density_clusters",
    "random_walks",
    "ktruss",
    "dictionary_phrases",
    "set_cover",
    "mmr_rerank",
    "gini",
    "topk_others",
    "suffix_ranks",
    "exact_substr_spans",
    "longest_dup_run",
    "perceptron_train",
    "ols_multi2",
    "chi_square",
    "anova_f",
    "heavy_hitters_mg",
    "ks_two_sample",
    "mann_whitney",
    "theil_sen",
    "bootstrap_ci",
    "cross_corpus_substr",
    "rrf_fuse",
    "spearman_rho",
    "roc_auc",
    "acf_lags",
    "bm25_topk",
    "ndcg",
    "confusion_metrics",
    "wasserstein",
    "simpson_diversity",
    "retrieval_metrics",
    "harmonic_centrality",
    "vocab_overlap",
    "target_encode",
    "welch_t",
    "link_prediction",
    "diff_in_diff",
    "encoding_advisor",
    "quantile_match",
    "token_waterfill",
    "multimodal_frames",
    "cohens_kappa",
    "mcnemar",
    "brier_score",
    "calibration_bins",
    "pass_at_k",
    "conformal_threshold",
    "rouge_n",
    "ngram_novelty",
    "distinct_ngram_ratio",
    "majority_vote",
    "winrate_wilson",
    "pr_curve",
    "readability",
    "seasonal_profile",
    "tv_distance",
    "domain_filter",
    "judge_agreement_e2e",
    "krippendorff_alpha",
    "label_noise",
    "leakage_split",
    "seq_mining",
    "rbo_rankings",
    "kfold",
    "cluster_provenance",
    # Round-10 additions.
    "quantile_sketch",
    "dedup_audit_e2e",
    "quantile_sketch_merged",
]

# Queries deliberately not benched (must be EXPLICIT — see the reverse
# assertion in main()). Empty today: every registered query is timed.
BENCH_SKIP: list[str] = []


# Deep tier: the 5 most expensive relational queries re-run at a 10×
# scale ("sf1.0") synthesized from sf0.1 by key-shifted replication
# (tools/make_sf.py), so round-over-round comparisons have a data-bound
# datapoint instead of only Spark-fixed-overhead-bound ones. Disable
# with SPARK_GRAFT_DEEP=0.
DEEP_QUERIES = [
    "mailing_pipeline_e2e",
    "robot_pipeline_e2e",
    "enrichment_phones",
    "topk_per_group",
    "rank_pivot",
    # Datapipe tier at 10×: make_sf keeps documents' block sizes constant
    # (per-copy source suffix) so these scale linearly by design — a
    # quadratic regression (like round 4's per-pair array-scan jaccard)
    # shows up here as a 100× deep number, not as a silent sf0.1 blip.
    "corpus_curation_e2e",
    "dedup_pairs",
    # Full near-dup path at 10×: candidate pairs → connected-component
    # closure → representative keep. Catches label-propagation
    # convergence blowups (iteration count scales with duplicate-cluster
    # DIAMETER, not data size — make_sf's per-copy near-dup groups keep
    # it shallow by construction, so a jump here means a real regression).
    "dedup_clusters",
    "dedup_fingerprints",
    "dedup_simhash_pairs",
    "dedup_clusters_star",
    "tfidf_topk",
    "doc_chunks",
    "top_ngrams",
    "sessionization",
    "stream_curation_batch",
    "text_clusters",
    # Window-hash/bigram-explode operators: both amplify rows ~n_tokens×
    # before keyed aggregation, so the deep datapoint catches any
    # superlinear blowup in the explode→agg→mark-back chain.
    "dup_spans",
    "lm_score",
    # Event-window operators at 10× event volume: per-user RANGE frames
    # and the attribution equi+range join must stay linear in events.
    "rolling_spend",
    # The binned decomposition's uniform-data overhead (~3 shuffles vs
    # 1) is part of the record: its win is the skew tier below.
    "rolling_spend_binned",
    "attribution_join",
    # Deletion-variant linkage at 10× customers: candidate buckets stay
    # md5-uniform, so time must track the variant explode linearly.
    "fuzzy_join_edit1",
    # The fact-to-dim broadcast chain at 10× fact volume: dims stay
    # broadcast, so deep time should track the lineitem scan linearly.
    "snowflake_join",
    # Uniform twin for the skew tier's keep-best entry (the skew block
    # below compares each of its queries against these deep numbers).
    "smart_dedup",
    # The two SemDeDup compositions: codebook size scales with the
    # corpus (k ∝ N) so the within-cluster pair join stays linear — the
    # deep datapoint guards that k-scaling rule.
    "kmeans_semantic",
    "semantic_curation_e2e",
    # Round-6 iterative/sketch operators at 10×: PageRank's per-
    # iteration join must track the edge count linearly; BPE rounds are
    # vocabulary-bounded so 10× corpus should cost ~1× extra per round
    # after the one corpus scan; the gap-fill grid is span-bounded per
    # key, so 10× events must NOT mean 10× grid.
    "pagerank",
    "bpe_train",
    "resample_fill",
    # Exact prefix-filter similarity join. NOTE the deep number is
    # OUTPUT-bound, not candidate-waste: make_sf's 10-copy replication
    # puts every doc in a 10-clone group, so the TRUE pair count grows
    # ~45x per doc (sf1.0 emits ~249k pairs vs sf0.1's ~2.5k) — wall
    # time growing ~14x is sublinear in the answer size, which is the
    # prefix-selectivity claim holding, not failing.
    "jaccard_join_exact",
    # Round-7 graph/rule-mining family at 10× lineitem: the co-purchase
    # edge build dominates all three (one lineitem self-join on the
    # orderkey); past it, BFS rounds are frontier-bounded, the k-core
    # peel shrinks its edge set monotonically, and the rule join is
    # per-basket quadratic only — each must track the edge count
    # linearly, never re-scan lineitem per round.
    "bfs_hops",
    "kcore",
    "assoc_rules",
    # Round-7 batch 4-7 data-bound linear ops at 10x: corpus-window
    # Markov transitions, the bounded contribution-explode EWMA, and a
    # per-group rank sort over 1.5M orders. edit_join is deliberately
    # NOT deep-tiered: on the serial-ID names its true-pair output is
    # itself ~50x per row (measured 205 s at sf1.0, output-bound like
    # jaccard_join_exact) — a timing of pair volume, not plan quality.
    "event_transitions",
    "ewma_events",
    "cdf_normalize",
    # Round-9 continuation: the pair-explode bootstrap must track rows
    # linearly (the aggregate state is replica-bounded, not data-
    # bounded); the Wasserstein prefix runs on the DISTINCT cent grid,
    # which the value range bounds — 10× events must mean ~1× prefix
    # work after the value aggregate, so deep time should be scan-
    # dominated, near-flat past it.
    "bootstrap_ci",
    "wasserstein",
    # Round-9 generation-eval: rouge_n's single-explode union-merge
    # amplifies rows ~2×n_tokens before the (pair, gram) aggregate —
    # 10× pairs must mean ~10× wall (the zero-join claim); ngram
    # novelty's corpus gram SET is shared across make_sf's 10 copies,
    # so past the scans the anti-join frame stays near-1× — deep time
    # should be scan-dominated, a jump means the distinct collapsed
    # late (post-shuffle) instead of map-side.
    "rouge_n",
    "ngram_novelty",
    # Round-9 annotation/sequence batch at 10×:
    # - suffix_ranks: prefix-doubling is O(log n) ROUNDS of sorts — 10×
    #   corpus must cost ~10× per round with the SAME round count (+1
    #   for the longer doc stream at most); superlinear deep time means
    #   a round went quadratic.
    # - seq_mining: the alphabet-bounded claim — per-key fan-out is
    #   |event types|, so 10× events must mean ~10× wall, never
    #   pairs-of-positions.
    # - label_noise: the per-example work is one broadcast meet with
    #   the alphabet-sized class frame — scan-dominated, linear.
    # - leakage_split: one equi-join + per-row hash algebra — the
    #   cluster-map join must stay AQE-broadcast at 10× docs.
    "suffix_ranks",
    "seq_mining",
    "label_noise",
    "leakage_split",
]


def _busy_process(args: str) -> bool:
    """Classify one ``ps`` args line as bench-contending work.

    Round-10 hardening: classification looks ONLY at the command
    position — the executable basename, plus the script/module slot for
    python interpreters — never at free argv text. The old substring
    rules both false-positived (any process whose PROMPT/argument text
    mentioned "pytest" or "bench.py") and needed a build-environment
    process-name exemption to compensate; a prompt-text exemption would
    equally have false-negatived a genuinely busy process carrying that
    text. Executable identity can't be spoofed by argument text in
    either direction.
    """
    toks = args.split()
    if not toks:
        return False
    head = os.path.basename(toks[0])
    if head.startswith("java") or head in (
        "spark-submit",
        "spark-class",
        "pytest",
    ):
        return True
    if head.startswith("python"):
        # Skip interpreter flags to the command slot: -m <module> or
        # the script path. (-c one-liners and bare REPLs are idle.)
        # CPython flags that consume a SEPARATE argument must skip
        # their value too, else `python -W ignore bench.py` classifies
        # its value as the script slot and a busy runner reads idle.
        value_flags = ("-W", "-X", "--check-hash-based-pycs")
        i = 1
        while i < len(toks) and toks[i].startswith("-") and toks[i] != "-m":
            if toks[i] == "-c":
                return False
            i += 2 if toks[i] in value_flags else 1
        if i < len(toks) - 1 and toks[i] == "-m":
            return toks[i + 1] == "pytest"
        if i < len(toks):
            script = os.path.basename(toks[i])
            return script in (
                "pytest",
                "bench.py",
                "check_parity.py",
                "plan_audit.py",
                "oracle_budget.py",
                "ann_recall.py",
                "make_sf.py",
                "bench_deep_variance.py",
                "bench_pagerank_variants.py",
            )
    return False


def _scan_other_procs() -> list[str]:
    """One ps pass: argv strings of foreign BUSY processes (runner
    scripts, pytest, other Spark JVMs) — our own pid ancestry and
    children exempted. Cheap (~10 ms), so it can run between queries."""
    import subprocess

    hits: list[str] = []
    me = os.getpid()
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid=,ppid=,args="],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout
        rows = []
        parent_of: dict[int, int] = {}
        for line in out.splitlines():
            parts = line.split(None, 2)
            if len(parts) < 3:
                continue
            pid, ppid, args = int(parts[0]), int(parts[1]), parts[2]
            parent_of[pid] = ppid
            rows.append((pid, ppid, args))
        # Our own ANCESTRY is part of this measurement, not contention:
        # the shell that launched `python bench.py | tail` carries
        # "bench.py" in its args and was the round-9 second false
        # positive. Walk the ppid chain and exempt it.
        ancestors = set()
        cur = me
        for _ in range(64):
            ancestors.add(cur)
            nxt = parent_of.get(cur)
            if nxt is None or nxt in ancestors:
                break
            cur = nxt
        for pid, ppid, args in rows:
            if pid in ancestors or ppid == me:
                continue
            if _busy_process(args):
                hits.append(args[:120])
    except Exception:  # noqa: BLE001 - the probe must never kill the bench
        pass
    return hits


class _IdleSentinel:
    """Background foreign-process watch covering the WHOLE sweep.

    The start-only probe misses work launched mid-run, and a
    between-queries spot check misses anything that starts and exits
    INSIDE one timed run. Both blind spots are measured, not
    hypothetical: this build environment runs a periodic ~15-minute
    housekeeping job that spawns its own Spark JVM for tens of seconds
    — on an hour-long sweep that is ~4 guaranteed contention windows,
    which showed up as contiguous 4-8× stretches in otherwise-clean
    runs (battery positions 228-237 in one, the whole deep flagship
    triple in another, each aligned to the 15-minute tick). A daemon
    thread scans every ``interval_s`` and keeps (timestamp, argv) hits
    so the timing loops can ask "was anything foreign alive during THIS
    run?" and re-measure instead of keeping a polluted number.
    """

    def __init__(self, interval_s: float = 5.0) -> None:
        import threading

        self.interval_s = interval_s
        self.hits: list[tuple[float, list[str]]] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self) -> "_IdleSentinel":
        self._thread.start()
        return self

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            procs = _scan_other_procs()
            if procs:
                self.hits.append((time.time(), procs))

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=10)

    def procs_since(self, t0: float) -> list[str]:
        return sorted({p for t, ps in self.hits if t >= t0 for p in ps})

    def wait_idle(self, max_wait_s: float = 180.0) -> bool:
        """Block until a scan comes back clean (or give up)."""
        deadline = time.time() + max_wait_s
        while True:
            if not _scan_other_procs():
                return True
            if time.time() >= deadline:
                return False
            time.sleep(self.interval_s)


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat cpu line.

    Steal time is the round-11 contention signal the process sentinel is
    structurally blind to: the round-10 driver run carried 3-10x spikes
    on individual queries (lsh_recall 54.5 s vs 8.8 s on identical code)
    with ZERO foreign processes visible — hypervisor steal (10-12%
    observed in top during those windows) runs outside the sandbox's
    process table. /proc/stat's per-boot counters make it measurable
    per run: field 8 of the cpu line is cumulative steal ticks.
    """
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(x) for x in parts[1:]]
        return vals[7], sum(vals)
    except Exception:  # noqa: BLE001 - the probe must never kill the bench
        return None


# Re-measure when the hypervisor stole more than this fraction of the
# machine during a run (idle boots measure <1-2%; contended windows
# 10-12%). Budgeted globally so a chronically-stolen boot degrades to
# stamped-but-recorded numbers instead of tripling the sweep.
_STEAL_FRAC_LIMIT = 0.05
_STEAL_RETRY_BUDGET = 60


def _measure_with_retry(
    name: str,
    run_fn,
    sentinel: "_IdleSentinel",
    release_fn,
    contended: dict,
    retry_counts: dict,
    max_attempts: int = 3,
    steal_state: dict | None = None,
) -> float:
    """One timed execution, re-measured (bounded) under contention.

    If a foreign busy process was alive at any point during the run —
    from the sentinel's hit log, plus one synchronous edge scan for
    runs shorter than two scan intervals — the number measured OUR JVM
    COMPETING FOR CORES, not the query: release state, wait for the
    machine to go idle again, and re-run. Round 11 adds the same
    treatment for hypervisor steal (``_cpu_ticks``): a run during which
    >5% of the machine was stolen measured the HYPERVISOR, not the
    query. Give up after ``max_attempts`` and record the query in
    ``contended`` (which stamps the artifact) so a reviewer can
    discount exactly those entries. A retry that then measured clean
    does NOT stamp — that is the point of retrying.
    """
    procs: list[str] = []
    steal_frac = 0.0
    dt = 0.0
    for _ in range(max_attempts):
        c0 = _cpu_ticks()
        t0 = time.time()
        dt = run_fn()
        c1 = _cpu_ticks()
        # -1s margin: the scan thread may log a hit a moment before
        # run_fn's own clock started while the proc was already alive.
        procs = sentinel.procs_since(t0 - 1.0)
        if not procs and dt < 2 * sentinel.interval_s:
            procs = _scan_other_procs()
        steal_frac = 0.0
        if c0 is not None and c1 is not None and c1[1] - c0[1] > 200:
            steal_frac = (c1[0] - c0[0]) / max(c1[1] - c0[1], 1)
        steal_hit = steal_frac > _STEAL_FRAC_LIMIT and (
            steal_state is not None
            and steal_state.get("budget", 0) > 0
        )
        if not procs and not steal_hit:
            return dt
        retry_counts[name] = retry_counts.get(name, 0) + 1
        if not procs and steal_hit:
            steal_state["budget"] -= 1
            steal_state.setdefault("retries", {})
            steal_state["retries"][name] = (
                steal_state["retries"].get(name, 0) + 1
            )
        release_fn()
        sentinel.wait_idle()
    if procs:
        contended[name] = procs[:2]
    elif steal_frac > _STEAL_FRAC_LIMIT:
        contended[name] = [f"steal:{steal_frac:.3f}"]
    return dt


def environment_probe() -> dict:
    """Idle-machine check, taken BEFORE the bench JVM starts.

    The round-8 incident: a full bench ran concurrently with pytest and
    parity sessions, every per-query number inflated 2-3×, and the
    polluted BENCH_LOCAL.json was committed by a blanket ``git add -A``.
    A 32-thread local Spark contends with ANY other JVM for the same
    cores, so a bench taken on a busy machine is not a measurement.
    The probe records the 1-minute load average and any other java /
    pytest / spark processes visible at start; the artifact is stamped
    ``"contaminated": true`` when either signal fires (stamp, never
    refuse — the per-round driver environment owns its own contention
    and must still get a datapoint).

    A start-only probe is blind to work launched MID-run (measured
    round 10: the environment's periodic housekeeping job spawns a
    Spark JVM every ~15 minutes, inflating contiguous stretches 4-8×
    while the start probe read clean), so ``main`` also runs an
    ``_IdleSentinel`` watcher thread for the whole sweep and re-measures
    contended runs (``_measure_with_retry``); only queries still
    contended after bounded retries stamp the artifact
    (``environment.mid_run_procs``). Load average is a start-only
    signal — mid-run it measures our own 32-thread JVM.
    """
    probe: dict = {"other_procs": _scan_other_procs()}
    try:
        probe["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        probe["loadavg_1m"] = None
    load = probe["loadavg_1m"]
    probe["contaminated"] = bool(probe["other_procs"]) or (
        load is not None and load > max(4.0, 0.25 * (os.cpu_count() or 32))
    )
    return probe


def _summary_line(summary: dict, timings: dict, cap: int = 1800) -> str:
    """Render the one stdout JSON line under the driver's tail budget.

    The driver captures a hard ~2000-byte stdout TAIL and parses the
    last JSON line in it (BENCH_r05/r06 recorded ``parsed: null`` when
    a 3.5 KB line overflowed it), so the full 258-entry map can never
    ride the line — it lives in BENCH_LOCAL.json. Two guarantees here:
    (1) never print an unparseable line — optional blocks drop
    largest-first if the base overflows; (2) fill the remaining budget
    with per-query timings DESCENDING BY COST (round 11: PERF_r10's
    comparator got zero per-query data from the line; the expensive
    queries are where regressions and low-core scaling ratios live, and
    cost-descending order makes the 8- and 32-core lines share their
    top entries).
    """
    line = json.dumps(summary)
    for drop in ("skew", "error_queries", "deep"):
        if len(line) <= cap:
            break
        summary.pop(drop, None)
        line = json.dumps(summary)
    qmap: dict[str, float] = {}
    summary["queries"] = qmap
    for qname, qsec in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        qmap[qname] = qsec
        candidate = json.dumps(summary)
        if len(candidate) > cap:
            del qmap[qname]
            break
        line = candidate
    if not qmap:
        summary.pop("queries", None)
        line = json.dumps(summary)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    probe = environment_probe()
    if probe["contaminated"]:
        print(
            f"bench: WARNING machine not idle at start ({probe}); "
            "artifact will be stamped contaminated",
            file=sys.stderr,
        )

    import __spark_entry__ as entry_mod
    from python_etl_mailing_automation_spark.session import build_spark

    spark = build_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # The driver captures a bounded tail of stdout; Spark's console
        # progress bars interleave with (and in round 5 truncated) the
        # single JSON payload line. Silence them for bench runs.
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry_mod.queries()

    # Renames in the query battery must fail loudly, not silently shrink
    # the headline metric (round-3 lesson: 17 entries KeyError'd away).
    unknown = [n for n in (*BENCH_QUERIES, *DEEP_QUERIES) if n not in qs]
    if unknown:
        raise SystemExit(f"bench list references unknown queries: {unknown}")
    # ...and the reverse: a newly registered query must either be benched
    # or land on the explicit BENCH_SKIP allowlist — no silent gaps.
    unbenched = [n for n in qs if n not in BENCH_QUERIES and n not in BENCH_SKIP]
    if unbenched:
        raise SystemExit(f"registered queries missing from bench list: {unbenched}")

    def run(name: str, at: str) -> float:
        t0 = time.time()
        qs[name](spark, at).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("per_key_windowed_sum", sf_dir)  # warm-up (JVM + codegen), not recorded

    # Between-RUN state release (round-9 lesson, extended round 10): a
    # 251-query sweep in one 16 GiB JVM accumulates every query's
    # cache_once frames and localCheckpoint blocks; by ~position 25 the
    # whole sweep was degrading (median 1.5×, worst 7-14× on sub-second
    # queries — lm_score 1.1→16.1 s) from storage/GC pressure, while a
    # fresh JVM re-measured the same queries at their committed costs.
    # Round 9 released state between QUERIES only; round 10's controlled
    # re-measurement (tools/bench_deep_variance.py) showed the same
    # accumulation WITHIN one query's repeat runs at sf1.0 — the
    # flagship's [9.5, 11.0, 59.5] signed spread: leaked localCheckpoint
    # blocks grow ~3 cached RDDs per semantic_curation_e2e run, the
    # slow runs carry 16-38× the GC time (18.9 s of an 119.7 s outlier
    # run), and releasing between a query's OWN runs collapsed the
    # spread to <=1.7× while LOWERING the minimum (mailing e2e 11.2 ->
    # 5.7 s). clearCache + gc.collect between every run means each run
    # starts from the same storage state — colder but honest and
    # reproducible; codegen/JIT warm-up still amortizes (the compiled-
    # class cache is not storage and survives clearCache).
    import gc as _gc

    def release_state() -> None:
        spark.catalog.clearCache()
        _gc.collect()
        # ContextCleaner frees localCheckpoint/RDD blocks via JVM weak
        # references, which only get processed on a JVM GC — and Spark's
        # own safety-net GC (spark.cleaner.periodicGC.interval) fires
        # every 30 MINUTES by default. Measured round 10: without this,
        # semantic_curation_e2e's checkpoint blocks survived clearCache
        # + Python gc and climbed 12 -> 22 cached RDDs across runs.
        spark.sparkContext._jvm.System.gc()

    # Mid-run idle sentinel + contention-aware re-measurement: see
    # _IdleSentinel / _measure_with_retry. Every timed run below goes
    # through timed_run so a number polluted by the environment's
    # periodic foreign JVM is re-measured, not kept.
    sentinel = _IdleSentinel().start()
    contended: dict[str, list[str]] = {}
    retry_counts: dict[str, int] = {}
    steal_state: dict = {"budget": _STEAL_RETRY_BUDGET, "retries": {}}

    def timed_run(name: str, at: str) -> float:
        return _measure_with_retry(
            name,
            lambda: run(name, at),
            sentinel,
            release_state,
            contended,
            retry_counts,
            steal_state=steal_state,
        )

    # Two passes per query, best kept: the first execution of each query
    # SHAPE pays whole-stage-codegen compilation + JIT (3-4× at sf0.1,
    # measured), which a steady-state engine comparison should exclude.
    # When the two passes disagree by >1.5× the measurement caught a GC /
    # background-load hiccup (sub-second queries swing 2-3× run-over-run,
    # measured round 5), so one extra pass is taken — bounded cost, paid
    # only by the noisy entries. A query that raises is recorded in
    # `errors` and skipped — one broken query must not zero out the whole
    # round's bench datapoint.
    def best_of(name: str, at: str) -> float:
        a = timed_run(name, at)
        release_state()
        b = timed_run(name, at)
        if max(a, b) > 1.5 * min(a, b):
            release_state()
            return min(a, b, timed_run(name, at))
        return min(a, b)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        try:
            timings[name] = round(best_of(name, sf_dir), 3)
        except Exception as exc:  # noqa: BLE001 - survey harness, keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:400]
        finally:
            release_state()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sec_per_query": round(total / max(len(timings), 1), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if probe["contaminated"]:
        payload["contaminated"] = True
    payload["environment"] = probe
    if errors:
        payload["errors"] = errors

    # Round 11: the deep/skew tiers only run at >= SPARK_GRAFT_DEEP_MIN_CPUS
    # (default 16). The low-core sweep exists to measure how each BATTERY
    # query scales with cores; the deep tier at sf1.0 is a 32-core
    # data-bound regression guard, and re-running its 45x3 + skew runs at
    # 8 cores quadrupled the sweep past the driver's timeout (round 10's
    # 8-core run died rc=124 mid-battery with zero scaling data as the
    # result). Battery queries are never gated.
    deep_min_cpus = int(os.environ.get("SPARK_GRAFT_DEEP_MIN_CPUS", "16"))
    if (
        os.environ.get("SPARK_GRAFT_DEEP", "1") != "0"
        and sf == "0.1"
        and int(cpus) >= deep_min_cpus
    ):
        deep_dir = os.environ.get("SPARK_GRAFT_DEEP_DIR", "/tmp/spark_graft_sf1.0")
        # Regenerate only when the MANIFEST stamp is missing or was built
        # from a different base/copies config — a regeneration changes
        # file layout and statistics, so it must be deliberate and
        # visible (the manifest hash is recorded in the deep block below
        # for round-over-round comparability), never an incidental
        # side effect of a partial directory.
        manifest_path = os.path.join(deep_dir, "MANIFEST.json")
        manifest = None
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                manifest = json.load(fh)
            if (
                manifest.get("base") != os.path.abspath(sf_dir)
                or manifest.get("copies") != 10
                # hash_version 2 = regeneration-stable fingerprint
                # (rows + sorted part sizes, no UUID-bearing filenames);
                # force one deliberate regeneration off older manifests
                # so cross-round hashes compare apples to apples.
                or manifest.get("hash_version") != 2
            ):
                manifest = None
        if manifest is None:
            from tools.make_sf import make_scaled_sf

            make_scaled_sf(sf_dir, deep_dir, copies=10, spark=spark)
            with open(manifest_path) as fh:
                manifest = json.load(fh)
            # Regeneration writes ~10x data through this same JVM right
            # before the first deep-tier timing; release its state and
            # let the machine settle so deep query #1 measures the
            # query, not the generator's residue (round-11 attribution
            # of the flagship's fresh-boot-only deep inflation).
            release_state()
            sentinel.wait_idle()
        # Best-of-3 with the FULL [min, med, max] spread recorded
        # (round-7 lesson: the committed robot_pipeline_e2e deep number
        # was 2× its own controlled re-measurement — when the signed
        # artifact can swing 2×, regression review degrades to
        # guesswork). `queries` keeps the min for round-over-round
        # comparability; `spread` makes the noise band part of the
        # signed record, so a future delta inside the band is
        # dismissible on paper.
        def _jvm_gc_ms() -> int:
            beans = (
                spark._jvm.java.lang.management.ManagementFactory
                .getGarbageCollectorMXBeans()
            )
            total, it = 0, beans.iterator()
            while it.hasNext():
                total += it.next().getCollectionTime()
            return int(total)

        deep_timings = {}
        deep_spread = {}
        # Round-11 attribution instrumentation: the deep flagships ran
        # 5-8x their isolated-fresh-JVM cost in BOTH final r10 runs
        # (mailing_pipeline_e2e 32.7/33.0 s in-bench vs 7.0 s isolated,
        # identical code+data) — positional decay after the 516-run
        # battery that release_state does not clear. Record per-run GC
        # time and live storage-RDD count so the artifact itself says
        # whether a slow deep run was GC debt or leaked blocks.
        deep_diag: dict[str, list[list[float]]] = {}
        for name in DEEP_QUERIES:
            try:
                # release_state between the deep runs too (round-10
                # variance attribution): without it the spread measures
                # leaked-block GC pressure, not the query.
                ts = []
                diag = deep_diag.setdefault(name, [])
                for _ in range(3):
                    g0 = _jvm_gc_ms()
                    n_rdds = len(
                        spark.sparkContext._jsc.sc().getRDDStorageInfo()
                    )
                    ts.append(timed_run(name, deep_dir))
                    diag.append(
                        [round(_jvm_gc_ms() - g0, 1), float(n_rdds)]
                    )
                    release_state()
                ts = sorted(ts)
                deep_timings[name] = round(ts[0], 3)
                deep_spread[name] = [round(t, 3) for t in ts]
            except Exception as exc:  # noqa: BLE001
                errors[f"deep:{name}"] = f"{type(exc).__name__}: {exc}"[:400]
                payload["errors"] = errors
            finally:
                release_state()
        payload["deep"] = {
            "sf": 1.0,
            "queries": deep_timings,
            "spread": deep_spread,
            # per run: [gc_ms_delta, live_storage_rdds_at_start] —
            # attribution data for positional decay (round 11)
            "diag": deep_diag,
            "total_sec": round(sum(deep_timings.values()), 3),
            "dir_hash": manifest["content_hash"],
        }

        # Skew tier: the same deep data with one key deliberately holding
        # ~10% of orders/events rows (tools/make_sf.make_skewed_sf) —
        # measures the keep-best, sessionization, and rolling-window
        # operators against the hot-key shape SCALING.md argues against.
        # Compare each entry with its uniform deep twin above.
        skew_dir = os.environ.get(
            "SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_sf1.0_skew"
        )
        from tools.make_sf import SKEW_VERSION

        skew_manifest_path = os.path.join(skew_dir, "MANIFEST.json")
        skew_manifest = None
        if os.path.exists(skew_manifest_path):
            with open(skew_manifest_path) as fh:
                skew_manifest = json.load(fh)
            # Both the base PATH and the base GENERATION must match — a
            # regenerated deep dir (new content_hash) invalidates any
            # skew variant derived from the old data.
            if (
                skew_manifest.get("base") != os.path.abspath(deep_dir)
                or skew_manifest.get("base_hash") != manifest["content_hash"]
                or skew_manifest.get("version") != SKEW_VERSION
            ):
                skew_manifest = None
        if skew_manifest is None:
            from tools.make_sf import make_skewed_sf

            make_skewed_sf(
                deep_dir, skew_dir, spark=spark,
                base_hash=manifest["content_hash"],
            )
            release_state()  # same post-regeneration hygiene as the deep dir
            sentinel.wait_idle()
        skew_timings = {}
        # jaccard_join_exact runs against the hot-DOCUMENT variant
        # (~1% of docs pairwise identical): its output is quadratic in
        # the clone-group size by definition, so the datapoint checks
        # candidate generation stays output-bound, not worse.
        # band_join and event_transitions join the skew tier in round 7:
        # both window/bucket on the hot user key — band_join's candidate
        # buckets grow quadratically WITH its output (output-bound, the
        # jaccard_join_exact argument), event_transitions' hot key is a
        # serial per-key window scan (the rolling_spend bound).
        for name in (
            "smart_dedup", "sessionization", "rolling_spend",
            "rolling_spend_binned", "jaccard_join_exact",
            "band_join", "event_transitions",
        ):
            try:
                skew_timings[name] = round(best_of(name, skew_dir), 3)
            except Exception as exc:  # noqa: BLE001
                errors[f"skew:{name}"] = f"{type(exc).__name__}: {exc}"[:400]
                payload["errors"] = errors
            finally:
                release_state()
        payload["deep"]["skew"] = {
            # hot_frac labels the orders/events hot KEY; the document
            # clone rate behind jaccard_join_exact is 1/(hot_mod*10)
            "hot_frac": 0.1,
            "doc_clone_frac": 0.01,
            "queries": skew_timings,
            # Self-contained comparison: the same queries on the uniform
            # deep data (from the tier above). Expect ~1× for the
            # aggregation-shaped entries (keep-best min_by); the per-key
            # window entries (sessionization, rolling_spend) are bounded
            # below by one task scanning the hot key's rows — see
            # SCALING.md "skew tier".
            "uniform_twin": {
                n: deep_timings.get(n)
                for n in (
                    "smart_dedup", "sessionization", "rolling_spend",
                    "rolling_spend_binned", "jaccard_join_exact",
                )
            },
        }

    # The driver captures only a ~2 KB stdout TAIL and parses the last
    # JSON line it finds — a 129-entry per-query map (~3.5 KB) overflows
    # it, which is why BENCH_r05/r06 recorded `parsed: null`. So the
    # FULL payload goes to the committed BENCH_LOCAL.json (the judge
    # reads per-query timings there), and stdout gets ONE compact
    # summary line (few hundred bytes) that always fits the tail.
    sentinel.stop()
    if contended:
        payload["contaminated"] = True
        probe["mid_run_procs"] = dict(list(contended.items())[:16])
    if retry_counts:
        # Not contamination — these numbers were RE-measured clean; the
        # count records how often the environment's periodic job was
        # dodged (and roughly how much wall the dodging cost).
        probe["contention_retries"] = dict(sorted(retry_counts.items())[:32])
    if steal_state["retries"]:
        # Subset of contention_retries triggered by the hypervisor-steal
        # probe rather than a visible process (round-11 addition).
        probe["steal_retries"] = dict(sorted(steal_state["retries"].items())[:32])

    local_copy = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    with open(local_copy, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    summary = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "n_queries": payload["n_queries"],
        "sec_per_query": payload["sec_per_query"],
        "sf": payload["sf"],
        "queries_detail": "BENCH_LOCAL.json",
    }
    if payload.get("contaminated"):
        summary["contaminated"] = True
    if errors:
        summary["n_errors"] = len(errors)
        summary["error_queries"] = sorted(errors)[:8]
    if "deep" in payload:
        deep = payload["deep"]
        summary["deep"] = {
            "sf": deep["sf"],
            "n_queries": len(deep["queries"]),
            "total_sec": deep["total_sec"],
            "dir_hash": deep["dir_hash"],
        }
        if "skew" in deep:
            summary["skew"] = {
                "queries": deep["skew"]["queries"],
                "uniform_twin": deep["skew"]["uniform_twin"],
            }
    # Round 11: put as much of the per-query map as fits into the line
    # itself — PERF_r10's comparator extracted ZERO per-query data
    # because timings lived only in BENCH_LOCAL.json. The driver's
    # stdout tail is a hard ~2000 bytes (BENCH_r05/r06 recorded
    # parsed:null when a 3.5 KB line overflowed it), so all 258 entries
    # can never fit; fill DESCENDING BY COST — the expensive queries
    # are where regressions live and where low/high-core scaling
    # ratios mean something — and leave the full map in
    # BENCH_LOCAL.json as before. Additive: no existing field is
    # removed, and the fill respects the same 1800-byte line cap.
    print(_summary_line(summary, timings))


if __name__ == "__main__":
    main()
