"""Distributed classifier training with exact integer arithmetic.

A training-data pipeline trains lightweight quality/language classifiers
over the corpus it is curating (the fastText-style filters of the LLM
data literature). The iterative trainer here is the **batch perceptron**:
per round, sum the gradient ``y_i * x_i`` over currently-misclassified
rows and add it to the weights. Chosen over logistic regression
deliberately — the batch-perceptron update is pure INTEGER arithmetic
(features and labels integer, sums exact, no transcendental functions),
so the trained weights are bit-identical across engines, partitionings,
and summation orders — the same determinism discipline as
:func:`~.stats.group_ols` (exact DECIMAL moments, floats only at a fixed
final step; here not even that).

Scale shape: each round is ONE map-side-combinable aggregate over the
feature frame (cached once across rounds); driver traffic per round is
the weight vector (features + 2 numbers). Rounds are sequential by
algorithmic contract — exactly like the k-means / greedy-set-cover
pattern elsewhere in the package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def perceptron_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    n_iter: int = 3,
) -> DataFrame:
    """Train a batch perceptron; return the per-round trace.

    ``feature_cols`` must be integer-valued (they are cast to
    DECIMAL(38,0) — fractional inputs would be silently rounded, so
    pre-scale to an integer grid as with :func:`~.stats.exact_corr`);
    ``label_col`` must be +1 / -1. Round t computes the margin
    ``y * (w_{t-1} . x + b_{t-1})`` per row, counts the misclassified
    (margin <= 0 — ties count as wrong, the classic convention), and
    applies the summed update ``w_t = w_{t-1} + sum(y x)``,
    ``b_t = b_{t-1} + sum(y)`` over exactly those rows.

    Output: one row per round —
    ``(iter, n_misclassified, w_<feature>..., bias)`` where
    ``n_misclassified`` is measured UNDER THE INCOMING weights (so
    round 1 reports the zero-weight error, i.e. the full row count) and
    the weights are the post-update values. All longs.

    Overflow envelope: weights are bounded by ``n_iter * sum|x|``;
    margins by ``max|x| * that`` — the same 10^38 DECIMAL envelope as
    ``exact_corr``; pre-scale features (counts, not epoch-micros) to
    stay inside it.

    Scale shape: the feature frame is projected once and cached;
    each round is one aggregate with map-side partial sums (integer
    adds — associative, so the result is partition-invariant by
    construction, not by luck); the per-round collect is the weight
    vector only. No shuffle of the data itself, ever — the only data
    movement is the aggregate's partial-sum tree.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    d = F.lit(0).cast("decimal(38,0)")
    feats = df.select(
        *[F.col(c).cast("decimal(38,0)").alias(f"__x{j}")
          for j, c in enumerate(feature_cols)],
        F.col(label_col).cast("decimal(38,0)").alias("__y"),
    ).cache()
    try:
        k = len(feature_cols)
        w = [0] * k
        b = 0
        trace = []
        for t in range(1, n_iter + 1):
            margin = F.lit(int(b)).cast("decimal(38,0)")
            for j in range(k):
                margin = margin + F.lit(int(w[j])).cast(
                    "decimal(38,0)"
                ) * F.col(f"__x{j}")
            mis = (F.col("__y") * margin) <= 0
            row = feats.agg(
                F.count(F.when(mis, 1)).alias("__nm"),
                *[
                    F.coalesce(
                        F.sum(F.when(mis, F.col("__y") * F.col(f"__x{j}"))),
                        d,
                    ).alias(f"__d{j}")
                    for j in range(k)
                ],
                F.coalesce(F.sum(F.when(mis, F.col("__y"))), d).alias("__db"),
            ).collect()[0]
            n_mis = int(row["__nm"])
            w = [w[j] + int(row[f"__d{j}"]) for j in range(k)]
            b = b + int(row["__db"])
            trace.append((t, n_mis, *w, b))
    finally:
        feats.unpersist()
    schema = (
        "iter long, n_misclassified long, "
        + ", ".join(f"w_{c} long" for c in feature_cols)
        + ", bias long"
    )
    return df.sparkSession.createDataFrame(trace, schema)


def confusion_metrics(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class confusion-matrix evaluation of a classifier's
    predictions against gold labels — the evaluation half the
    :func:`perceptron_train` trainer needs (train exactly, then score
    exactly):

        tp(c) = |label = c ∧ pred = c|      precision = tp/(tp+fp)
        fp(c) = |label ≠ c ∧ pred = c|      recall    = tp/(tp+fn)
        fn(c) = |label = c ∧ pred ≠ c|      f1 = 2·p·r/(p+r)

    All counts are exact BIGINTs off ONE (label, pred) cross-tab
    aggregate; precision/recall are single IEEE divisions and f1 one
    fixed written-order expression, so every value is bit-identical
    across engines and partitionings. A class is emitted if it appears
    as a label OR as a prediction; zero-denominator metrics are NULL.

    Output: one row per class — ``(class, tp, fp, fn, precision,
    recall, f1)``.

    Scale shape: one map-side-combinable groupBy(label, pred) collapses
    the data to a classes² frame; everything after (two re-keyed
    aggregates + one outer join) runs on that bounded cross-tab. Rows
    with NULL label or prediction are excluded (scored elsewhere — a
    NULL prediction is an abstention, not a class).
    """
    base = df.filter(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(F.col(label_col).alias("__l"), F.col(pred_col).alias("__p"))
    xt = base.groupBy("__l", "__p").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    hit = F.when(F.col("__l") == F.col("__p"), F.col("__n")).otherwise(
        F.lit(0).cast("long")
    )
    by_label = xt.groupBy(F.col("__l").alias("class")).agg(
        F.sum(hit).alias("__tp_l"),
        F.sum(F.col("__n") - hit).alias("fn"),
    )
    by_pred = xt.groupBy(F.col("__p").alias("class")).agg(
        F.sum(hit).alias("__tp_p"),
        F.sum(F.col("__n") - hit).alias("fp"),
    )
    both = by_label.join(by_pred, "class", "full_outer").select(
        "class",
        F.coalesce(F.col("__tp_l"), F.col("__tp_p"), F.lit(0)).cast(
            "long"
        ).alias("tp"),
        F.coalesce(F.col("fp"), F.lit(0)).cast("long").alias("fp"),
        F.coalesce(F.col("fn"), F.lit(0)).cast("long").alias("fn"),
    )
    tp, fp, fn = (F.col(c).cast("double") for c in ("tp", "fp", "fn"))
    prec = F.when(F.col("tp") + F.col("fp") > 0, tp / (tp + fp))
    rec = F.when(F.col("tp") + F.col("fn") > 0, tp / (tp + fn))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2.0 * prec * rec / (prec + rec),
    )
    return both.select(
        "class", "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    smoothing: int = 10,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical column against
    an INTEGER-valued target — the classic high-cardinality feature
    transform (a category's raw mean overfits when its count is small;
    shrink it toward the global prior):

        enc(c) = (Σy_c + m·ȳ) / (n_c + m),   ȳ = ΣY / N,  m = smoothing

    Clearing the rational prior gives the exact integer form

        enc(c) = (N·Σy_c + m·ΣY) / (N·(n_c + m))

    — numerator and denominator are DECIMAL(38,0)-exact, the single
    division is the only float, so encodings are bit-identical across
    engines and partitionings (a float-accumulated category mean would
    flap under re-partitioning — disqualifying for a feature that must
    reproduce between training and serving). NULL categories are a
    legitimate level and are encoded too; NULL targets are excluded
    from sums and counts.

    Output: one row per category — ``(cat_col, n, sum_y, encoding)``.

    Scale shape: one map-side-combinable groupBy on the category plus
    the sanctioned one-row global-totals cross join. No window, no
    data-sized join.
    """
    if smoothing < 0:
        raise ValueError("target_encode: smoothing must be >= 0")
    y = F.col(target_col).cast("decimal(38,0)")
    base = df.select(F.col(cat_col), y.alias("__y")).filter(
        F.col("__y").isNotNull()
    )
    per_cat = base.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum("__y").alias("__sy"),
    )
    tot = base.agg(
        F.sum(F.lit(1).cast("decimal(38,0)")).alias("__tn"),
        F.sum("__y").alias("__tsy"),
    )
    m = F.lit(int(smoothing)).cast("decimal(38,0)")
    out = per_cat.crossJoin(F.broadcast(tot))
    num = F.col("__tn") * F.col("__sy") + m * F.col("__tsy")
    den = F.col("__tn") * (F.col("__n") + m)
    return out.select(
        cat_col,
        F.col("__n").cast("long").alias("n"),
        F.col("__sy").cast("long").alias("sum_y"),
        F.when(den > 0, num.cast("double") / den.cast("double")).alias(
            "encoding"
        ),
    )
