"""Corpus composition statistics — the "what is in this training mix"
report a curation pipeline emits before and after every filtering stage.

Scale shape: one groupBy on the domain column with map-side partial
aggregation; all accumulators are exact integers (bigint sums), so the
result is independent of partitioning and execution order — ratios are
derived by integer-over-integer division at the end, never by summing
doubles (float accumulation order would make the report flap between
runs; see the engine's decimal-sum rule in operators/aggregates.py).
The corpus-level totals come from a window over the *aggregated* frame
(one row per domain — a few dozen rows), so the single-partition window
touches O(domains) rows, not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_of


def corpus_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain composition: document count, exact token and char
    sums, mean document length (exact sum / count), and each domain's
    share of corpus documents and tokens.

    Output columns: ``group_col``, ``n_docs``, ``n_tokens``,
    ``n_chars``, ``avg_tokens``, ``share_docs``, ``share_tokens``.
    """
    per_doc = df.select(
        F.col(group_col),
        F.size(tokens_of(text_col)).cast("long").alias("__tok"),
        F.length(text_col).cast("long").alias("__chr"),
    )
    agged = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.sum("__chr").alias("n_chars"),
    )
    everything = Window.partitionBy()
    return agged.select(
        group_col,
        "n_docs",
        "n_tokens",
        "n_chars",
        (F.col("n_tokens") / F.col("n_docs")).alias("avg_tokens"),
        (F.col("n_docs") / F.sum("n_docs").over(everything)).alias("share_docs"),
        (F.col("n_tokens") / F.sum("n_tokens").over(everything)).alias(
            "share_tokens"
        ),
    )
