"""Corpus curation pipeline — the datapipe flagship composition.

The training-data analog of the mailing pipeline: quality-gate documents,
drop exact duplicates (keep the min-id representative), drop near
duplicates found by MinHash+LSH (keep the smaller id of each verified
pair), and emit the surviving corpus with its quality metrics and
fingerprint. This is the standard curation recipe (quality → exact dedup
→ fuzzy dedup) expressed as one lazy plan.

Scale: quality scoring and fingerprints are scan-speed column algebra;
exact dedup shuffles on a 32-byte digest; the near-dup stage shuffles on
uniform LSH band keys and verifies only candidates (datapipe/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import jaccard_on_pairs, lsh_candidate_pairs, minhash_signatures
from .text import doc_fingerprint, quality_score


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_stop_ratio: float = 0.5,
    near_dup_jaccard: float = 0.8,
) -> DataFrame:
    """Return the curated corpus:
    ``(doc_id, n_tokens, stop_ratio, fingerprint)``.

    Stages: quality gate → exact dedup (min-id representative per md5) →
    near-dup removal (MinHash+LSH candidates, exact-Jaccard verified at
    ``near_dup_jaccard``; the larger id of each pair drops).
    """
    scored = quality_score(
        docs, text_col, max_stop_ratio=max_stop_ratio, min_tokens=min_tokens
    )
    quality = scored.filter(F.col("is_quality") == 1)

    # Exact dedup: keep the min id per content digest.
    reps = quality.groupBy(F.md5(F.col(text_col)).alias("__h")).agg(
        F.min(id_col).alias("__keep")
    )
    exact = quality.join(
        reps,
        on=[
            F.md5(F.col(text_col)) == F.col("__h"),
            F.col(id_col) == F.col("__keep"),
        ],
    ).drop("__h", "__keep")

    # Near-dup removal among the survivors.
    sig = minhash_signatures(exact, id_col=id_col, text_col=text_col)
    verified = jaccard_on_pairs(
        lsh_candidate_pairs(sig, id_col=id_col), exact, id_col=id_col, text_col=text_col
    ).filter(F.col("jaccard") >= near_dup_jaccard)
    drop_ids = verified.select(F.col("doc_id_b").alias("__drop")).distinct()
    survivors = exact.join(
        drop_ids, on=F.col(id_col) == F.col("__drop"), how="left_anti"
    )

    return doc_fingerprint(survivors, text_col).select(
        id_col, "n_tokens", "stop_ratio", "fingerprint"
    )
