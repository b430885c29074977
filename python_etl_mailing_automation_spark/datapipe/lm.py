"""Statistical language-model quality scoring (CCNet-style).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model — low-probability word sequences indicate boilerplate,
gibberish, or OCR noise. This module is that signal as pure DataFrame
algebra: a bigram model trained ON the corpus itself (one groupBy), then
each document scored by the average conditional probability of its
bigrams. The score is ln-free by design (an average of probabilities,
not of log-probabilities): it is rank-usable for quality gates while
staying bit-exact across engines — ``ln`` is libm-dependent, the one
function family this engine's oracle discipline forbids (see
datapipe/text.py tf-idf for the same decision).

Cross-engine exactness: p = c2/c1 is one IEEE double division of two
exactly-representable integers (identical everywhere); per-doc sums use
the engine's scaled-integer pattern — ``floor(p * 2^40)`` summed as
BIGINT — so the aggregate is partition-order-independent, and the final
average divides in a fixed order.

Scale shape:
- bigram explode is ~n_tokens× row amplification → ``spread_for_explode``
  rebalances tiny scans first (no-op on many-split production tables);
- model training is two hash aggregations (bigram counts, then context
  counts derived from the bigram table — never a second corpus pass);
- scoring joins the corpus bigrams to the model on the bigram key —
  broadcast when the vocabulary is dimension-sized
  (``broadcast_probs=True``), else a shuffle join where AQE's skew
  handling splits the hot-stopword-bigram buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import spread_for_explode, tokens_of

# 2^40: the probability grid. p in (0, 1], so per-bigram scaled values
# fit 2^40 and a BIGINT sum is safe to 2^23 bigrams per document.
_SCALE = 2.0**40


def doc_bigrams(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per bigram OCCURRENCE: (id_col, bg) with ``bg`` the
    space-joined token pair (tokens are whitespace-split, so the single
    space is an unambiguous separator). Documents with fewer than two
    tokens emit nothing."""
    t = F.col("__toks")
    grams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.lit([]).cast("array<string>"))
    return (
        spread_for_explode(df.select(id_col, text_col))
        .select(id_col, tokens_of(text_col).alias("__toks"))
        .select(id_col, F.explode(grams).alias("bg"))
    )


def bigram_probs(bigrams: DataFrame) -> DataFrame:
    """Train the model from a (any-id, bg) occurrence frame: returns
    (bg, p) where p = count(bg) / count(first-token context). The
    context counts are derived from the bigram-count table itself (one
    tiny re-aggregation), not from a second corpus scan."""
    c2 = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = (
        c2.withColumn("__w1", F.substring_index(F.col("bg"), " ", 1))
        .groupBy("__w1")
        .agg(F.sum("__c2").alias("__c1"))
    )
    return (
        c2.withColumn("__w1", F.substring_index(F.col("bg"), " ", 1))
        .join(c1, on="__w1")
        .select(
            "bg",
            (
                F.col("__c2").cast("double") / F.col("__c1").cast("double")
            ).alias("p"),
        )
    )


def lm_quality_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    probs: DataFrame | None = None,
    broadcast_probs: bool | None = None,
) -> DataFrame:
    """Score every document by the average bigram conditional
    probability under ``probs`` (default: a model trained on ``df``
    itself — the CCNet self-referential setup). Output:
    (id_col, n_bigrams, avg_p); documents with < 2 tokens keep
    n_bigrams = 0 and a NULL score.

    Inner-join semantics on the model: when ``probs`` is externally
    trained, out-of-vocabulary bigrams are simply absent from the
    average (n_bigrams counts only scored occurrences) — callers
    needing OOV smoothing pre-union a floor probability into ``probs``.
    """
    bg = doc_bigrams(df, id_col=id_col, text_col=text_col)
    if probs is None:
        probs = bigram_probs(bg)
    if broadcast_probs:
        probs = F.broadcast(probs)
    scored = (
        bg.join(probs, on="bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.floor(F.col("p") * F.lit(_SCALE)).cast("long")).alias(
                "__s"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            (
                F.col("__s").cast("double")
                / F.col("__n").cast("double")
                / F.lit(_SCALE)
            ).alias("avg_p"),
        )
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_rate: float = 0.25,
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023),
    in this engine's ln-free exact form: score every raw document under
    a TARGET-domain bigram model and under the RAW-corpus model, take
    the ratio as the importance weight, and keep each document with
    probability ``min(1, weight * base_rate)`` via the deterministic
    md5 16-bit grid (the house sampling idiom — reproducible, id-stable,
    engine-portable; no RNG). The default ``salt`` ("dsir") is distinct
    from hash_sample's and dataset_split's so composed selections draw
    independent grids instead of the same bucket against different
    thresholds.

    The published method resamples by exp(log-likelihood ratio) of two
    hashed n-gram models; here the ratio of the two average bigram
    conditional probabilities (:func:`lm_quality_score`) plays the same
    role with the same monotonicity, while staying bit-exact across
    engines (no ln/exp — the oracle discipline of this module).
    Documents the target model cannot score at all (zero in-vocabulary
    bigrams) get weight 0 and are never kept.

    Output: ``(id_col, weight, kept)`` for every raw document.

    Scale shape: two model trainings (keyed aggregations over bigram
    explodes, map-side combined) + two scoring joins on the bigram key
    — exactly 2× the lm_quality_score cost; the keep rule is per-row
    algebra. The target side is usually small (a curated domain
    sample), so its model frame broadcasts in the scoring join.
    """
    t_probs = bigram_probs(doc_bigrams(target, id_col=id_col, text_col=text_col))
    s_t = lm_quality_score(
        df, id_col=id_col, text_col=text_col, probs=t_probs, broadcast_probs=True
    ).select(F.col(id_col), F.col("avg_p").alias("__pt"))
    s_s = lm_quality_score(df, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.col("avg_p").alias("__ps")
    )
    joined = s_s.join(s_t, on=id_col, how="left")
    weight = F.when(
        F.col("__pt").isNotNull() & F.col("__ps").isNotNull() & (F.col("__ps") > 0),
        F.col("__pt") / F.col("__ps"),
    ).otherwise(F.lit(0.0))
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}"))), 1, 4
        ),
        16,
        10,
    ).cast("int")
    threshold = F.floor(
        F.least(weight * F.lit(base_rate), F.lit(1.0)) * F.lit(65536.0)
    ).cast("int")
    return joined.select(
        F.col(id_col),
        weight.alias("weight"),
        (bucket < threshold).cast("int").alias("kept"),
    )
