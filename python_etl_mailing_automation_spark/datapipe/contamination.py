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

from .dedup import band_entries, minhash_signatures, with_shingles, with_tokens


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


def cross_corpus_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 6,
    band_size: int = 2,
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """NEAR-duplicate decontamination between two corpora: MinHash+LSH
    candidate pairs restricted to train×benchmark, verified with exact
    distinct-token Jaccard — the scale path when the benchmark side is
    too large to broadcast as a shingle set (cross-crawl dedup, train
    split vs held-out split) or when paraphrased/near-verbatim leakage
    must be caught, not just exact shingle hits
    (:func:`flag_contaminated` is the broadcast-semi-join exact
    complement).

    Returns ``(train_id, bench_id, jaccard)`` for every cross pair with
    Jaccard ≥ ``min_jaccard``. Ids need not be disjoint across the two
    frames — sides are tracked structurally, never by id arithmetic.

    Scale shape: both sides shuffle ONCE keyed on (band_idx, band_val)
    — uniform md5 space, no skew — and only cross-side bucket
    collisions survive; the verify join then touches candidate pairs
    only. No broadcast of either corpus, no all-pairs product anywhere.
    """
    t_sig = minhash_signatures(
        train,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        band_size=band_size,
        shingle_n=shingle_n,
    )
    b_sig = minhash_signatures(
        benchmark,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        band_size=band_size,
        shingle_n=shingle_n,
    )
    t_entries = band_entries(t_sig, id_col).withColumnRenamed(
        id_col, "train_id"
    )
    b_entries = band_entries(b_sig, id_col).withColumnRenamed(
        id_col, "bench_id"
    )
    cand = (
        t_entries.join(b_entries, on=["band_idx", "band_val"])
        .select("train_id", "bench_id")
        .distinct()
    )
    from .dedup import jaccard_on_pairs

    verified = jaccard_on_pairs(
        cand,
        train,
        id_col=id_col,
        text_col=text_col,
        right_docs=benchmark,
        left_col="train_id",
        right_col="bench_id",
    )
    return verified.filter(F.col("jaccard") >= min_jaccard)
