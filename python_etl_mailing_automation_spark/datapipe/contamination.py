"""Benchmark decontamination: flag training documents that share n-gram
shingles with an evaluation/benchmark set.

The standard pre-training hygiene step: any document overlapping an eval
set's shingles is flagged (and usually dropped) so benchmark numbers
measure generalization, not memorization.

Scale shape: both sides explode to (shingle, id) pairs; the join is keyed
on the shingle string. The benchmark side is eval-set-sized (thousands of
documents), so its distinct shingle list broadcasts — the training side
then never shuffles: a broadcast-hash semi-join at scan speed over 100 TB.
Counting distinct shared shingles per doc is one aggregation keyed on
doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_shingles, with_tokens


def _shingle_entries(
    docs: DataFrame, *, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(id, shingle) pairs, one row per DISTINCT shingle per doc."""
    base = with_shingles(with_tokens(docs, text_col), n=shingle_n)
    return base.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.col("shingles"))).alias("shingle"),
    )


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Per-document contamination report against ``benchmark``:
    ``(doc_id, n_shared_shingles, is_contaminated)`` for every doc in
    ``docs`` (0 / not-contaminated when nothing overlaps).

    ``n_shared_shingles`` counts the doc's DISTINCT word-``shingle_n``
    -grams that appear anywhere in the benchmark set;
    ``is_contaminated`` flags counts ≥ ``min_overlap``. Documents shorter
    than ``shingle_n`` tokens have no shingles and are never flagged.
    """
    doc_shingles = _shingle_entries(
        docs, id_col=id_col, text_col=text_col, shingle_n=shingle_n
    )
    bench_shingles = F.broadcast(
        _shingle_entries(
            benchmark, id_col=id_col, text_col=text_col, shingle_n=shingle_n
        )
        .select("shingle")
        .distinct()
    )
    shared = (
        doc_shingles.join(bench_shingles, on="shingle", how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_shingles"))
    )
    return (
        docs.select(id_col)
        .join(shared, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shared_shingles"), F.lit(0).cast("long")).alias(
                "n_shared_shingles"
            ),
            (
                F.coalesce(F.col("n_shared_shingles"), F.lit(0)) >= min_overlap
            ).cast("int").alias("is_contaminated"),
        )
    )
