"""Exact set-similarity self-join via prefix filtering (the
AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al. 2008): every
document pair with token-set Jaccard >= t, with NO false negatives —
the exact complement to the LSH candidate paths in :mod:`.dedup`
(which trade recall for fewer candidates) when the dedup policy must
be provably complete.

Prefix principle: order every document's tokens by one global total
order (frequency ascending, token ascending — rarest first, so
prefixes carry the most selective tokens); with prefix length
``p = |x| - ceil(t·|x|) + 1``, any two sets with Jaccard >= t share at
least one token in BOTH prefixes (the minimum-ranked shared token
cannot sit in either suffix: a suffix holds only ceil(t·|x|) - 1
tokens, fewer than the required overlap). So the candidate space is
the prefix-token equi-join — selective because frequent tokens rarely
reach a prefix — and every candidate is then verified exactly.

Exactness discipline: the threshold is a RATIONAL ``(num, den)``; the
prefix length, the symmetric size filter ``t·|a| <= |b| <= |a|/t``,
and the final Jaccard acceptance ``inter·den >= num·(|a|+|b|-inter)``
are all integer arithmetic — no float enters any decision, so the
pair set is bit-reproducible on any engine.

Scale shape: one token-frequency aggregate, one per-doc window over
(freq, token) to rank prefixes, an equi-join on prefix tokens (each
token's candidate fan-out bounded by its prefix frequency — the cut
frequent tokens never reach), and a verify join on the candidate
pairs' token sets. No cartesian anywhere; skew lives only in prefix
tokens shared by many docs, which the frequency-ascending order
minimizes by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..detach import detach


def _tokens_and_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num: int,
    den: int,
    shingle: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared tokenization + prefix machinery: distinct token frame
    ``(__id, tok, sz)`` with the per-doc distinct count carried on
    every row, and the ``sz - ceil(t·sz) + 1`` rarest-first prefix
    ``(__id, tok, sz)``.

    Round 10: the distinct token SET and the per-doc size are computed
    IN-ROW — ``array_distinct`` over the shingle array before the
    explode, ``size`` of the same array carried on each exploded row —
    instead of the previous explode → global ``(id, tok)`` DISTINCT
    shuffle → per-id count aggregate → join-back. Same rows by
    construction (a document's distinct shingles and their count are
    row-local facts), two exchanges fewer, and no consumer needs a
    separate ``sizes`` join any more. ``toks`` is handed back behind a
    lazy ``localCheckpoint``: the old distinct's exchange doubled as
    the ReusedExchange point for the 2–4 subplans every caller builds
    over the token frame, and without a materialization in its place
    each consumer re-runs the tokenize chain (measured: lsh_recall
    14.4 → 4.9 s, jaccard_join_exact 3.5 → 2.9 s min-of-3 once the
    checkpoint landed). Executor-local storage of the token table —
    the same footprint class as the shuffle files it replaces. The
    generator stays the INLINE
    expression (never a named column: exploding an attribute makes
    InferFiltersFromGenerate + pushdown re-run the whole shingle chain
    per row in an interpreted Filter — see dedup.exploded_shingles),
    over the ``__ws`` word-array attribute materialized once in the
    projection below (lambda bodies re-evaluate free expressions per
    element, so ``__ws`` must be an attribute, not the split)."""
    if shingle < 1:
        raise ValueError("similarity join: shingle must be >= 1")
    from .text import spread_for_explode

    # Rebalance the RAW rows first: without the old distinct's exchange
    # the token frame is consumed by several subplans (freq, ranked,
    # ta, tb, ball) with no shuffle in between, so each re-runs the
    # tokenize chain at the SCAN's parallelism — one split locally, the
    # catastrophic serial case spread_for_explode exists for. A wide
    # production scan no-ops here.
    words = spread_for_explode(df.select(id_col, text_col)).select(
        F.col(id_col).alias("__id"),
        F.expr(
            f"filter(split({text_col}, '\\\\s+'), x -> x != '')"
        ).alias("__ws"),
    )
    if shingle == 1:
        arr_sql = "array_distinct(__ws)"
    else:
        parts = ", ".join(
            f"element_at(__ws, i + {j})" for j in range(shingle)
        )
        # sequence(1, 0) DESCENDS in Spark, so guard short docs with an
        # explicit empty array
        arr_sql = (
            f"array_distinct(CASE WHEN size(__ws) >= {shingle} THEN"
            f" transform(sequence(1, size(__ws) - {shingle - 1}),"
            f" i -> concat_ws(' ', {parts}))"
            " ELSE cast(array() as array<string>) END)"
        )
    toks = words.select(
        "__id",
        F.expr(f"size({arr_sql})").cast("long").alias("sz"),
        F.explode(F.expr(arr_sql)).alias("tok"),
    ).select("__id", "tok", "sz")
    toks = detach(toks, eager=False)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    ranked = toks.join(freq, on="tok").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("__id").orderBy(
                F.col("tf").asc(), F.col("tok").asc()
            )
        ),
    )
    # prefix length p = sz - ceil(num*sz/den) + 1, all integer; SQL
    # `div` is exact integer division at any magnitude (double-divide
    # + cast would misfloor past 2^53, and DuckDB's cast-from-double
    # ROUNDS while Spark's truncates — the oracle uses `//`)
    ceil_t_sz = F.expr(f"(sz * {num} + {den - 1}) div {den}")
    prefix = ranked.filter(F.col("pos") <= F.col("sz") - ceil_t_sz + 1).select(
        "__id", "tok", "sz"
    )
    return toks, prefix


def jaccard_join_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: tuple[int, int] = (1, 2),
    shingle: int = 1,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` whose token SETS have Jaccard >=
    num/den. ``shingle=1`` compares whitespace-word sets; ``shingle=k``
    compares k-word shingle sets (far more selective prefixes on
    small-vocabulary corpora — a document with fewer than k words has
    no tokens and joins nothing). Returns ``(id_a, id_b, inter,
    size_a, size_b, jaccard)`` — jaccard is the only float, computed
    after the exact integer acceptance test.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(f"jaccard_join_exact: bad threshold {num}/{den}")
    toks, prefix = _tokens_and_prefix(
        df, id_col, text_col, num=num, den=den, shingle=shingle
    )
    a = prefix.select(
        F.col("__id").alias("id_a"),
        F.col("tok").alias("tok_a"),
        F.col("sz").alias("size_a"),
    )
    b = prefix.select(
        F.col("__id").alias("id_b"),
        F.col("tok").alias("tok_b"),
        F.col("sz").alias("size_b"),
    )
    cands = (
        a.join(
            b,
            on=[
                F.col("tok_a") == F.col("tok_b"),
                F.col("id_a") < F.col("id_b"),
                # symmetric size filter: num*size_a <= den*size_b and
                # num*size_b <= den*size_a  (t·|a| <= |b| <= |a|/t)
                F.col("size_b") * den >= F.col("size_a") * num,
                F.col("size_a") * den >= F.col("size_b") * num,
            ],
        )
        .select("id_a", "id_b", "size_a", "size_b")
        .distinct()
    )
    ta = toks.select(F.col("__id").alias("id_a"), F.col("tok").alias("ta"))
    tb = toks.select(F.col("__id").alias("__idb"), F.col("tok").alias("tb"))
    inter = (
        cands.join(ta, on="id_a")
        .join(
            tb,
            on=[F.col("id_b") == F.col("__idb"), F.col("ta") == F.col("tb")],
        )
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    keep = inter.filter(
        F.col("inter") * den
        >= F.lit(num) * (F.col("size_a") + F.col("size_b") - F.col("inter"))
    )
    return keep.select(
        "id_a",
        "id_b",
        "inter",
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
        (
            F.col("inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double")
        ).alias("jaccard"),
    )


def _containment_pairs_from(
    toks: DataFrame,
    prefix: DataFrame,
    *,
    num: int,
    den: int,
) -> DataFrame:
    """Candidate + verify machinery shared by :func:`containment_join_
    exact` (fresh per-corpus frames) and the fixpoint dedup (globally
    tokenized frames filtered to survivors): prefix-side equi-join
    against the FULL token index, exact intersection count, integer
    acceptance. Correct for ANY prefix choice of the contained side —
    the indexed side holds all tokens, so completeness never depends
    on the frequency order that picked the prefix."""
    a = prefix.select(
        F.col("__id").alias("id_a"),
        F.col("tok").alias("tok_a"),
        F.col("sz").alias("size_a"),
    )
    ball = toks.select(
        F.col("__id").alias("id_b"),
        F.col("tok").alias("tok_b"),
        F.col("sz").alias("size_b"),
    )
    cands = (
        a.join(
            ball,
            on=[F.col("tok_a") == F.col("tok_b"), F.col("id_a") != F.col("id_b")],
        )
        .select("id_a", "id_b", "size_a", "size_b")
        .distinct()
    )
    ta = toks.select(F.col("__id").alias("id_a"), F.col("tok").alias("ta"))
    tb = toks.select(F.col("__id").alias("__idb"), F.col("tok").alias("tb"))
    inter = (
        cands.join(ta, on="id_a")
        .join(
            tb,
            on=[F.col("id_b") == F.col("__idb"), F.col("ta") == F.col("tb")],
        )
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return inter.filter(F.col("inter") * den >= F.lit(num) * F.col("size_a"))


def containment_join_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: tuple[int, int] = (9, 10),
    shingle: int = 1,
) -> DataFrame:
    """Exact ASYMMETRIC containment self-join: ordered pairs
    ``(id_a, id_b)``, ``a != b``, with ``|A∩B| / |A| >= num/den`` — the
    doc-subset detector (quotes, mirrors, page-in-site, prompt-in-
    transcript) that symmetric Jaccard misses when |B| >> |A|.

    Prefix principle, one-sided: only the CONTAINED side prunes — A
    emits its ``|A| - ceil(t·|A|) + 1`` rarest-first prefix tokens
    (an overlap of ceil(t·|A|) tokens cannot hide in the
    ceil(t·|A|) - 1 token suffix), while B indexes ALL tokens (no size
    bound exists on the containing side). Candidate fan-out is the
    FULL document frequency of A's prefix tokens — still rare by the
    rarest-first order. Acceptance is pure integer arithmetic.

    Returns ``(id_a, id_b, inter, size_a, size_b, containment)``.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(f"containment_join_exact: bad threshold {num}/{den}")
    toks, prefix = _tokens_and_prefix(
        df, id_col, text_col, num=num, den=den, shingle=shingle
    )
    keep = _containment_pairs_from(toks, prefix, num=num, den=den)
    return keep.select(
        "id_a",
        "id_b",
        "inter",
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
        (F.col("inter").cast("double") / F.col("size_a").cast("double")).alias(
            "containment"
        ),
    )


def containment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: tuple[int, int] = (9, 10),
    shingle: int = 1,
    to_fixpoint: bool = False,
    max_rounds: int = 4,
) -> DataFrame:
    """The curation ACTION on top of :func:`containment_join_exact`
    (the detect/act split of dup_spans vs remove_dup_spans): drop every
    document whose token set is >= num/den contained in a LARGER
    document — subsumed quotes, page-in-site mirrors, prompt-in-
    transcript — keeping the container. Mutual containment (identical
    sets) keeps the smaller id, so exactly one survivor per clique and
    the operation is idempotent. Returns the surviving rows of ``df``.

    ONE-PASS policy caveat (``to_fixpoint=False``): containment at
    t < 1 is not transitive — a dropped doc's container may itself have
    been dropped by a larger one, and the chain can lose up to (1-t) of
    content per hop, so a dropped doc is not guaranteed t-covered by a
    SURVIVOR. Use t = 1/1 for lossless exact-subset pruning, or
    ``to_fixpoint=True`` when coverage by survivors is contractual.

    ``to_fixpoint=True`` is the coverage-preserving variant: each round
    drops a document only when some containing larger document is SAFE
    — itself not contained in anything larger this round — and rounds
    repeat on the survivors until nothing drops (or ``max_rounds``).
    Safe containers can never be dropped later (maximality is monotone
    as the corpus shrinks), so EVERY dropped doc is t-covered by a
    final survivor. Convergence: the oriented pair relation is a
    finite DAG (size strictly decreasing, id-ordered at ties), so a
    round with any pair always has a maximal (safe) container and
    drops at least one doc — rounds are bounded by the containment
    chain DEPTH, and at the fixpoint the survivor set is pair-free,
    hence idempotent. If ``max_rounds`` cuts the loop early the result
    is still coverage-safe, just possibly under-deduplicated.

    Scale shape: one-pass is the pair join's cost (see
    containment_join_exact) plus one distinct-ids frame and one
    left-anti join back — survivors keep their full payload without
    ever being shuffled into the pair machinery. Fixpoint runs the
    token-join pair machinery ONCE (pair acceptance depends only on the
    two documents' token sets, so the survivor-restricted pair set of
    any round is the full oriented set anti-joined to the drop ledger)
    and iterates the safe-container/drop waves on the materialized
    id-pair frame alone; per round the driver sync is one count of a
    tiny checkpointed id frame (chain-depth-bounded, the clustering/
    pagerank iterative discipline), drops accumulate in an id ledger
    anti-joined against the ORIGINAL frame, and the token caches are
    released in a ``finally`` (the no-cache-leak contract).
    """
    if not to_fixpoint:
        pairs = containment_join_exact(
            df, id_col, text_col, threshold=threshold, shingle=shingle
        )
        dropped = (
            pairs.filter(
                (F.col("size_a") < F.col("size_b"))
                | (
                    (F.col("size_a") == F.col("size_b"))
                    & (F.col("id_a") > F.col("id_b"))
                )
            )
            .select(F.col("id_a").alias(id_col))
            .distinct()
        )
        return df.join(dropped, on=id_col, how="left_anti")

    if max_rounds < 1:
        raise ValueError("containment_dedup: max_rounds must be >= 1")
    num, den = threshold
    # tokenize and rank ONCE: the global rarest-first prefix stays a
    # complete candidate generator on every survivor subset (the
    # indexed side holds ALL tokens — see _containment_pairs_from), so
    # rounds only FILTER the cached frames instead of re-tokenizing
    # and re-ranking the shrinking corpus (round 7: 161 s -> ~1/3 at
    # sf0.1 for 3 rounds).
    toks, prefix = _tokens_and_prefix(
        df, id_col, text_col, num=num, den=den, shingle=shingle
    )
    toks = toks.cache()
    prefix = prefix.cache()
    # Round 10: the heavy token-join pair machinery runs ONCE, not once
    # per round. Pair acceptance (|A∩B| >= t·|A|, size/id orientation)
    # depends only on the two documents' token sets — never on who else
    # survives — and the global prefix is complete on every survivor
    # subset, so round k's oriented pair set over survivors is EXACTLY
    # the full oriented pair set restricted to survivor×survivor. The
    # fixpoint therefore iterates on the materialized id-pair frame
    # alone (chain-depth-bounded rounds over a pairs-sized frame),
    # instead of re-running the prefix join + intersection count on
    # anti-join-filtered token caches every round.
    try:
        oriented_all = (
            _containment_pairs_from(toks, prefix, num=num, den=den)
            .filter(
                (F.col("size_a") < F.col("size_b"))
                | (
                    (F.col("size_a") == F.col("size_b"))
                    & (F.col("id_a") > F.col("id_b"))
                )
            )
            .select("id_a", "id_b")
            .transform(lambda d: detach(d, eager=True))
        )
    finally:
        toks.unpersist()
        prefix.unpersist()
    ledger: DataFrame | None = None
    pairs_r = oriented_all
    for _ in range(max_rounds):
        # a container is SAFE iff it is not itself a contained side
        # this round; only drops with a safe container are applied
        contained = pairs_r.select(F.col("id_a").alias("id_b")).distinct()
        # lazy checkpoints: the count (and next round's first job)
        # materialize them — no separate eager-materialization jobs
        drops = (
            pairs_r.join(contained, on="id_b", how="left_anti")
            .select(F.col("id_a").alias(id_col))
            .distinct()
            .transform(lambda d: detach(d, eager=False))
        )
        if drops.count() == 0:
            break
        ledger = drops if ledger is None else ledger.unionByName(drops)
        pairs_r = (
            pairs_r.join(
                drops.select(F.col(id_col).alias("id_a")), on="id_a", how="left_anti"
            )
            .join(
                drops.select(F.col(id_col).alias("id_b")), on="id_b", how="left_anti"
            )
            .transform(lambda d: detach(d, eager=False))
        )
    if ledger is None:
        return df
    return df.join(ledger, on=id_col, how="left_anti")


def _even_segment_bounds(l: int, k: int) -> list[tuple[int, int]]:
    """(start, length) of k contiguous segments evenly splitting l chars:
    first k - l%k segments of length l div k, then l%k of length
    l div k + 1 — the plain PassJoin scheme."""
    base, rem = divmod(l, k)
    out, pos = [], 0
    for j in range(k):
        ln = base + (1 if j >= k - rem else 0)
        out.append((pos, ln))
        pos += ln
    return out


def _entropy_segment_bounds(
    l: int, k: int, weights: list[float]
) -> list[tuple[int, int]]:
    """(start, length) of k contiguous segments balancing cumulative
    per-position entropy ``weights`` instead of character count: cut
    after the position where the running entropy passes j·total/k,
    reserving one character for every remaining segment. Falls back to
    the even split when the length class carries no entropy signal."""
    total = sum(weights)
    if l < k or total <= 0:
        return _even_segment_bounds(l, k)
    out, pos, cum = [], 0, 0.0
    for j in range(k):
        if j == k - 1:
            out.append((pos, l - pos))
            break
        target = total * (j + 1) / k
        end = pos + 1
        cum += weights[pos]
        while end < l - (k - j - 1) and cum < target - 1e-12:
            cum += weights[end]
            end += 1
        out.append((pos, end - pos))
        pos = end
    return out


def _segment_bounds(
    index_base: DataFrame,
    k: int,
    segmenter: str,
    stats_mod: int | None,
) -> DataFrame:
    """Per-length segment boundaries for the PassJoin family, computed
    from the INDEX side and returned as a broadcastable
    ``(seg_l, seg_j, __start, __slen)`` frame. The entropy stats are
    exact distinct-char counts per (length, pos) — deterministic, so
    every run (and every partitioning) derives the same splits;
    ``stats_mod=k`` measures them on the deterministic 1/k md5-hash row
    sample (boundaries steer SELECTIVITY only, never membership, so a
    sample cannot change any result set). EVERY observed length gets a
    scheme — zero-length strings included (their k empty segments are
    how "a" finds "") — falling back to the even split for lengths the
    stats pass cannot weigh."""
    lengths: list[int] | None = None
    if segmenter == "entropy":
        stats_base = index_base
        if stats_mod is not None and stats_mod > 1:
            stats_base = index_base.filter(
                F.expr(
                    f"cast(conv(substring(md5(cast(__id as string)), 1, 8),"
                    f" 16, 10) as bigint) % {int(stats_mod)} = 0"
                )
            )
        # Position 0 is a marker row (NULL char, ignored by the distinct
        # count) so every observed length — zero included — shows up in
        # the one aggregate; without sampling that makes the separate
        # distinct-lengths scan below redundant (one driver job, not
        # two).
        stats = (
            stats_base.select(
                "__len",
                F.explode(F.sequence(F.lit(0), F.col("__len"))).alias("__p"),
                "__s",
            )
            .select(
                "__len",
                "__p",
                F.when(
                    F.col("__p") > 0,
                    F.col("__s").substr(F.col("__p"), F.lit(1)),
                ).alias("__c"),
            )
            .groupBy("__len", "__p")
            .agg(F.count_distinct("__c").alias("__nd"))
            .collect()
        )
        by_len: dict[int, list[float]] = {}
        for row in stats:
            if row["__len"] > 0:
                by_len.setdefault(row["__len"], [0.0] * row["__len"])
        for row in stats:
            if row["__p"] > 0:
                by_len[row["__len"]][row["__p"] - 1] = math.log2(
                    max(row["__nd"], 1)
                )
        if stats_mod is None or stats_mod <= 1:
            lengths = sorted({r["__len"] for r in stats})
    else:
        by_len = {}
    if lengths is None:
        # sampled stats (or the even segmenter) can miss lengths, and a
        # length without a scheme would silently drop its rows from the
        # index side — membership requires the full-scan length set
        lengths = sorted(
            r["__len"] for r in index_base.select("__len").distinct().collect()
        )
    bounds_rows = [
        (l, j, st, ln)
        for l in lengths
        for j, (st, ln) in enumerate(
            _entropy_segment_bounds(l, k, by_len[l])
            if l in by_len
            else _even_segment_bounds(l, k)
        )
    ]
    if not bounds_rows:  # empty input frame
        bounds_rows = [(0, 0, 0, 0)]
    return index_base.sparkSession.createDataFrame(
        bounds_rows, "seg_l int, seg_j int, __start int, __slen int"
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    *,
    max_edits: int = 1,
    reverse_strings: bool = False,
    segmenter: str = "entropy",
    stats_mod: int | None = None,
) -> DataFrame:
    """Exact string-similarity self-join: every pair with Levenshtein
    distance <= ``max_edits``, via PassJoin segment blocking (Li, Deng,
    Wang & Feng, VLDB 2011) — the scalable generalization of the
    deletion-neighborhood edit-1 linkage in operators/linkage (that
    materializes O(len) variants per row and is pinned to distance 1;
    this indexes d+1 segments per row and works for any small d).

    Blocking principle: partition each string into ``d+1`` contiguous
    segments (pigeonhole: d edits can corrupt at most d segments, so
    two strings within distance d share at least one segment VERBATIM,
    at an alignment shifted by at most d). The index side emits its
    d+1 segments keyed by (segment#, source length, text); the probe
    side emits, for each candidate partner length l in [len-d, len],
    every substring of itself that could align with segment j of an
    l-length partner under the multi-match-aware shift window (at most
    j edits fall left of segment j and d-j right of it, so the shift
    lies in [max(-j, Δ-(d-j)), min(j, Δ+(d-j))] — for d=1 exactly ONE
    substring per (partner length, segment)) — at most
    (d+1)·Σ_j(min(j,Δ+d-j)-max(-j,Δ-d+j)+1) ≤ (d+1)²·(2d+1) probe keys
    per row, constant in corpus size.
    Candidates are the equi-join on those keys; every candidate is
    then verified with the exact Levenshtein metric, so the result has
    no false positives and (by the pigeonhole bound) no false
    negatives.

    Segment placement is where selectivity lives — and correctness
    does NOT depend on it: ANY deterministic per-length contiguous
    partition satisfies the pigeonhole, so the splits are a free
    tuning surface. The default ``segmenter="entropy"`` measures
    per-position character entropy for each length class (one cheap
    aggregate, collected driver-side — length·alphabet rows, the same
    bounded-collect precedent as kmeans/bpe_train) and places the d
    cut points to balance cumulative entropy, so a serial-code corpus
    with a long constant region ("Customer#000…") never donates that
    region as a whole — structurally unselective — segment. Measured
    at sf0.1 (15k such names, d=1): even splits candidate-explode to
    hundreds of millions of pairs (the constant half IS one bucket);
    entropy splits confine candidates near the true-pair count.
    ``segmenter="even"`` keeps the textbook scheme (no stats pass).
    ``stats_mod=k`` computes the entropy stats on the deterministic
    1/k md5-hash row sample instead of the full corpus — the boundary
    choice steers selectivity only, never membership, so the pair set
    is unchanged (unit-tested); at 100 TB the stats pass should never
    be a full scan.
    ``reverse_strings=True`` additionally blocks on reversed strings
    (Levenshtein is reversal-invariant; an optimal alignment reverses
    too) for corpora whose entropy sits at the tail — composable with
    either segmenter, same exact pair set either way (unit-tested).

    Scale shape: one stats aggregate (entropy mode), two bounded
    explodes + one equi-join on (segment#, length, text) + a distinct
    + a verify join on ids. No cartesian: a probe row meets only index
    rows sharing a literal segment at a compatible (position, length).

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``; length-equal
    pairs are generated once (id order), cross-length pairs once (the
    longer string probes). NULL ids/strings are dropped.
    """
    d = int(max_edits)
    if d < 1:
        raise ValueError("edit_distance_join: max_edits must be >= 1")
    if segmenter not in ("entropy", "even"):
        raise ValueError(f"edit_distance_join: unknown segmenter {segmenter!r}")
    k = d + 1
    blocked = F.reverse(F.col(str_col)) if reverse_strings else F.col(str_col)
    base = (
        df.filter(F.col(id_col).isNotNull() & F.col(str_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            blocked.alias("__s"),
            F.length(str_col).cast("int").alias("__len"),
        )
    )
    bounds = _segment_bounds(base, k, segmenter, stats_mod)

    index_entries = base.join(
        F.broadcast(bounds), base["__len"] == bounds["seg_l"]
    ).select(
        F.col("__id").alias("id_s"),
        F.col("__s").alias("s_s"),
        F.col("__len").alias("len_s"),
        "seg_j",
        "seg_l",
        F.col("__s").substr(F.col("__start") + 1, F.col("__slen")).alias("seg_text"),
    )

    # Probe: for each partner length l = len - dl (dl in 0..d) and each
    # segment j of THAT length's scheme, every own-substring within
    # +/-d of the segment start (clamped) — the pigeonhole window.
    pbase = base.select(
        "__id",
        "__s",
        "__len",
        F.explode(F.array(*[F.lit(i) for i in range(d + 1)])).alias("__dl"),
    )
    pj = pbase.join(
        F.broadcast(bounds), bounds["seg_l"] == pbase["__len"] - pbase["__dl"]
    ).select(
        "__id",
        "__s",
        "__len",
        "__dl",
        "seg_j",
        "seg_l",
        "__start",
        "__slen",
        F.explode(F.array(*[F.lit(s) for s in range(-d, d + 1)])).alias("__sh"),
    )
    p = F.col("__start") + F.col("__sh")
    # Multi-match-aware substring selection (Li et al., VLDB 2011,
    # Lemma: for segment j — 0-indexed — of an ls-length partner and a
    # length gap Δ = lr - ls, a matching alignment can only shift the
    # segment start by sh ∈ [max(-j, Δ-(d-j)), min(j, Δ+(d-j))]: at most
    # j edits can fall left of segment j and at most d-j right of it).
    # Strictly tightens the loose ±d pigeonhole window — for d=1 it
    # pins ONE probe substring per (row, partner length, segment), a 3×
    # candidate cut — and every dropped candidate is a provable
    # non-match, so the verified pair set is unchanged.
    mm_lo = F.greatest(-F.col("seg_j"), F.col("__dl") - (F.lit(d) - F.col("seg_j")))
    mm_hi = F.least(F.col("seg_j"), F.col("__dl") + (F.lit(d) - F.col("seg_j")))
    probe_entries = (
        pj.filter(
            (F.col("__sh") >= mm_lo)
            & (F.col("__sh") <= mm_hi)
            & (p >= 0)
            & (p + F.col("__slen") <= F.col("__len"))
        )
        .select(
            F.col("__id").alias("id_r"),
            F.col("__s").alias("s_r"),
            F.col("__len").alias("len_r"),
            "seg_j",
            "seg_l",
            F.col("__s").substr(p + 1, F.col("__slen")).alias("seg_text"),
        )
        .distinct()
    )

    cands = (
        index_entries.join(probe_entries, on=["seg_j", "seg_l", "seg_text"])
        .filter(
            (F.col("len_s") < F.col("len_r"))
            | ((F.col("len_s") == F.col("len_r")) & (F.col("id_s") < F.col("id_r")))
        )
        .select(
            F.least("id_s", "id_r").alias("id_a"),
            F.greatest("id_s", "id_r").alias("id_b"),
            "s_s",
            "s_r",
        )
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("s_s", "s_r").cast("long"))
        .filter(F.col("dist") <= d)
        .select("id_a", "id_b", "dist")
    )

def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_col: str,
    *,
    window: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995):
    order records by a sort key and emit every pair within ``window``
    positions — the classic entity-resolution candidate generator when
    no equality-based blocking key exists (near-identical names sort
    adjacent even when no field matches exactly). Complements
    :func:`edit_distance_join`: SNM bounds candidates at (window-1)·n
    by CONSTRUCTION (recall depends on the sort key), while PassJoin
    guarantees recall (candidates depend on the data).

    Returns ``(id_a, id_b, key_a, key_b)`` — verification (edit
    distance, field compare) is the caller's next stage, kept separate
    so one pair list feeds many match rules.

    Scale shape: rank + lead windows per ``block_col`` — ONE hash
    exchange, pairs via a bounded lead-array explode (≤ window-1 rows
    per record), never a rank self-join (the oracle does exactly that
    rank self-join). Pass ``block_col`` in production: it is the
    multi-pass SNM key that (a) parallelizes the sort across blocks
    and (b) is how SNM is actually deployed; the unblocked variant
    plans a single-partition window — correct, and documented here as
    the small-data mode only. Sort ties break on id, so the pair set
    is deterministic under any partitioning.
    """
    if window < 2:
        raise ValueError("sorted_neighborhood_pairs: window must be >= 2")
    keys = [block_col] if block_col else []
    base = df.filter(
        F.col(id_col).isNotNull() & F.col(sort_col).isNotNull()
    ).select(*keys, F.col(id_col).alias("__id"), F.col(sort_col).alias("__key"))
    w = Window.partitionBy(*keys).orderBy(F.col("__key").asc(), F.col("__id").asc())
    withnext = base.select(
        *keys,
        "__id",
        "__key",
        F.array(
            *[
                F.struct(
                    F.lead("__id", i).over(w).alias("nid"),
                    F.lead("__key", i).over(w).alias("nkey"),
                )
                for i in range(1, window)
            ]
        ).alias("__next"),
    )
    pairs = withnext.select(
        *keys,
        F.col("__id").alias("id_a"),
        F.col("__key").alias("key_a"),
        F.explode(F.filter(F.col("__next"), lambda x: x["nid"].isNotNull())).alias("__n"),
    )
    return pairs.select(
        *keys,
        "id_a",
        F.col("__n.nid").alias("id_b"),
        "key_a",
        F.col("__n.nkey").alias("key_b"),
    )


def edit_distance_join_two(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    str_col: str,
    *,
    max_edits: int = 1,
    segmenter: str = "entropy",
    stats_mod: int | None = None,
) -> DataFrame:
    """Cross-corpus edit-distance join — the classic record-linkage
    task (match list A against list B within ``max_edits``): pairs
    ``(id_a from A, id_b from B, dist)``, ids rendered as strings.

    Dedicated R-S PassJoin (not a union self-join): list B is the
    INDEX side (d+1 segments per row, entropy-placed boundaries per
    B length class); list A is the PROBE side, emitting for every
    partner length l in [len-d, len+d] — both directions, since there
    is no self-join symmetry to exploit — each aligned substring
    within the pigeonhole shift window. Candidates are the
    (segment#, length, text) equi-join; the exact Levenshtein verify
    runs only on cross pairs, so NO within-A or within-B work exists
    anywhere (the earlier tagged-union composition measured ~3× slower
    on within-dense data for exactly that reason — SCALING.md).

    Same exactness argument as :func:`edit_distance_join`; same
    ``segmenter`` / ``stats_mod`` levers (stats measured on the index
    side). NULL ids/strings dropped; duplicate ids within one list are
    fine.
    """
    d = int(max_edits)
    if d < 1:
        raise ValueError("edit_distance_join_two: max_edits must be >= 1")
    if segmenter not in ("entropy", "even"):
        raise ValueError(
            f"edit_distance_join_two: unknown segmenter {segmenter!r}"
        )
    k = d + 1

    def clean(df: DataFrame) -> DataFrame:
        return df.filter(
            F.col(id_col).isNotNull() & F.col(str_col).isNotNull()
        ).select(
            F.col(id_col).cast("string").alias("__id"),
            F.col(str_col).alias("__s"),
            F.length(str_col).cast("int").alias("__len"),
        )

    base_a, base_b = clean(df_a), clean(df_b)
    bounds = _segment_bounds(base_b, k, segmenter, stats_mod)

    index_entries = base_b.join(
        F.broadcast(bounds), base_b["__len"] == bounds["seg_l"]
    ).select(
        F.col("__id").alias("id_b"),
        F.col("__s").alias("s_b"),
        "seg_j",
        "seg_l",
        F.col("__s").substr(F.col("__start") + 1, F.col("__slen")).alias("seg_text"),
    )

    pbase = base_a.select(
        "__id",
        "__s",
        "__len",
        F.explode(
            F.array(*[F.lit(i) for i in range(-d, d + 1)])
        ).alias("__dl"),
    )
    pj = pbase.join(
        F.broadcast(bounds), bounds["seg_l"] == pbase["__len"] - pbase["__dl"]
    ).select(
        "__id",
        "__s",
        "__len",
        "__dl",
        "seg_j",
        "seg_l",
        "__start",
        "__slen",
        F.explode(F.array(*[F.lit(s) for s in range(-d, d + 1)])).alias("__sh"),
    )
    p = F.col("__start") + F.col("__sh")
    # multi-match-aware shift window — same lemma as in
    # edit_distance_join; here Δ = __dl may be negative (probe shorter
    # than index partner), which the bound handles symmetrically
    mm_lo = F.greatest(-F.col("seg_j"), F.col("__dl") - (F.lit(d) - F.col("seg_j")))
    mm_hi = F.least(F.col("seg_j"), F.col("__dl") + (F.lit(d) - F.col("seg_j")))
    probe_entries = (
        pj.filter(
            (F.col("__sh") >= mm_lo)
            & (F.col("__sh") <= mm_hi)
            & (p >= 0)
            & (p + F.col("__slen") <= F.col("__len"))
        )
        .select(
            F.col("__id").alias("id_a"),
            F.col("__s").alias("s_a"),
            "seg_j",
            "seg_l",
            F.col("__s").substr(p + 1, F.col("__slen")).alias("seg_text"),
        )
        .distinct()
    )

    cands = (
        index_entries.join(probe_entries, on=["seg_j", "seg_l", "seg_text"])
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("s_a", "s_b").cast("long"))
        .filter(F.col("dist") <= d)
        .select("id_a", "id_b", "dist")
    )
