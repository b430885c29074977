#!/usr/bin/env python
"""Synthesize a larger scale factor from an existing one by key-shifted
replication, e.g. sf0.1 ×10 → a /tmp "sf1.0" for the deep bench tier.

Each copy shifts every ``*key`` column by ``copy_index * offset`` so the
replicated rows form NEW entities (10× groups of the same size, 10× join
fan-in) rather than 10× duplicates of the same keys — the structural
shape a genuinely larger dataset has for the relational pipelines. The
testdata directory is read-only; output goes wherever ``--out`` points
(default under /tmp).

Usage:
    python tools/make_sf.py [--base /root/testdata/sf0.1] \
        [--out /tmp/spark_graft_sf1.0] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

KEY_OFFSET = 100_000_000  # far above any key at sf≤1


def make_scaled_sf(base: str, out: str, copies: int, spark=None) -> str:
    """Key-shift-replicate the relational tables AND the datapipe tables.

    - Relational: every ``*key`` column shifts by copy·offset — new
      entities, same group sizes, ``copies``× join fan-in.
    - ``documents``: ``doc_id`` shifts; each copy's text gets a distinct
      leading marker token (so copies are NEAR-duplicates — the shape a
      real crawl has — not byte-identical rows that would collapse under
      exact dedup); ``source`` gets a per-copy suffix so BLOCK sizes stay
      constant and blocked-quadratic operators scale linearly, exactly
      the "caller keeps blocks small" contract.
    - ``embeddings``: ``vec_id`` shifts, vectors unchanged.
    - ``events``: ``event_id``/``user_id`` shift — new users, same
      per-user timelines, so sessionization/interval queries scale
      linearly.
    """
    from pyspark.sql import functions as F

    from python_etl_mailing_automation_spark.session import build_spark
    from python_etl_mailing_automation_spark.sources.io import read_table

    own_session = spark is None
    if own_session:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = build_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    def replicate(df, mutate):
        parts = [mutate(df, i) for i in range(copies)]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        return scaled

    for name in TABLES:
        df = read_table(spark, base, name)
        key_cols = [
            f.name
            for f in df.schema.fields
            if f.name.endswith("key") and f.dataType.simpleString() in ("bigint", "int")
        ]
        replicate(
            df,
            lambda d, i, kc=key_cols: d.withColumns(
                {c: F.col(c) + F.lit(i * KEY_OFFSET) for c in kc}
            ),
        ).write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    docs = read_table(spark, base, "documents")
    replicate(
        docs,
        lambda d, i: d.withColumns(
            {
                "doc_id": F.col("doc_id") + F.lit(i * KEY_OFFSET),
                "text": F.concat(F.lit(f"copy{i} "), F.col("text")),
                "source": F.concat(F.col("source"), F.lit(f"_{i}")),
            }
        ),
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = read_table(spark, base, "embeddings")
    replicate(
        emb,
        lambda d, i: d.withColumn("vec_id", F.col("vec_id") + F.lit(i * KEY_OFFSET)),
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    events = read_table(spark, base, "events")
    replicate(
        events,
        lambda d, i: d.withColumns(
            {
                "event_id": F.col("event_id") + F.lit(i * KEY_OFFSET),
                "user_id": F.col("user_id") + F.lit(i * KEY_OFFSET),
            }
        ),
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    # Content/config stamp: bench.py records this hash per round so a
    # regenerated dir (different file layout/statistics → different
    # timings) is visible in round-over-round comparisons instead of
    # silently invalidating them. The hash must be REGENERATION-STABLE:
    # Spark part filenames embed a per-write UUID, so hashing names (the
    # pre-round-9 bug) gave an identical regenerated dir a new
    # fingerprint and broke deep-tier comparability. Hash only
    # (table → row_count, sorted part sizes) — a pure function of the
    # deterministic generator's output, not of the write's identity.
    import hashlib
    import json

    import pyarrow.parquet as pq

    sizes = {}
    for name in (*TABLES, "documents", "embeddings", "events"):
        d = f"{out}/{name}.parquet"
        parts = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        sizes[name] = {
            "rows": sum(pq.ParquetFile(p).metadata.num_rows for p in parts),
            "part_sizes": sorted(os.path.getsize(p) for p in parts),
        }
    manifest = {
        "base": os.path.abspath(base),
        "copies": copies,
        "hash_version": 2,
        "content_hash": hashlib.md5(
            json.dumps(sizes, sort_keys=True).encode()
        ).hexdigest(),
    }
    with open(f"{out}/MANIFEST.json", "w") as fh:
        json.dump(manifest, fh)

    if own_session:
        spark.stop()
    return out


HOT_KEY = 424_242  # the deliberately hot entity in the skewed variant
#: bump when the skew variant gains tables/shape; bench.py imports this
#: so the writer and the validity check can never drift apart
SKEW_VERSION = 3


def make_skewed_sf(
    base: str, out: str, spark=None, hot_mod: int = 10, base_hash: str | None = None
) -> str:
    """Deliberately SKEWED variant of a scale dir: every ``hot_mod``-th
    row of ``orders``/``events`` is reassigned to one hot key
    (``HOT_KEY`` holds ~1/hot_mod of all rows), all other columns
    untouched. This is the scale-killer shape SCALING.md argues against
    (hot CPF / hot session user); the skew bench tier measures the
    keep-best, sessionization, and rolling-window operators against it
    so "skew-hardened" is a recorded number, not a claim.

    Only the two tables the skew-tier queries read are written — the
    variant is a measurement fixture, not a full dataset.
    """
    from pyspark.sql import functions as F

    from python_etl_mailing_automation_spark.session import build_spark
    from python_etl_mailing_automation_spark.sources.io import read_table

    own_session = spark is None
    if own_session:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = build_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    orders = read_table(spark, base, "orders")
    orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % hot_mod == 0, F.lit(HOT_KEY)).otherwise(
            F.col("o_custkey")
        ),
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    events = read_table(spark, base, "events")
    events.withColumn(
        "user_id",
        F.when(F.col("event_id") % hot_mod == 0, F.lit(HOT_KEY)).otherwise(
            F.col("user_id")
        ),
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    # Hot-DOCUMENT skew for the similarity-join tier: every
    # doc_hot_mod-th document's text is replaced by one fixed clone
    # text — the worst shape for an exact similarity join (its OUTPUT
    # is quadratic in the clone-group size; candidate generation must
    # not be worse than the output). 1% keeps the quadratic output
    # (~125k clone pairs at sf1.0) benchable under min-of-2; 10% would
    # be 12.5M pairs and ~2 min per run (measured — runtime stayed
    # output-sublinear even there: 51x output for 2.3x time).
    doc_hot_mod = hot_mod * 10
    docs = read_table(spark, base, "documents")
    first = docs.orderBy("doc_id").limit(1).collect()
    if first:
        docs = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % doc_hot_mod == 0, F.lit(first[0]["text"])
            ).otherwise(F.col("text")),
        )
    # empty base: write the (empty) table unchanged so the skew dir is
    # always complete for its readers
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    import json

    # base_hash pins WHICH generation of the base data this skew variant
    # derives from: a regenerated deep dir (new content_hash) must force
    # a skew rebuild, or the skew-vs-uniform comparison silently mixes
    # two different datasets.
    with open(f"{out}/MANIFEST.json", "w") as fh:
        json.dump(
            {
                "base": os.path.abspath(base),
                "base_hash": base_hash,
                "hot_mod": hot_mod,
                "skew": True,
                "version": SKEW_VERSION,
            },
            fh,
        )

    if own_session:
        spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    make_scaled_sf(args.base, args.out, args.copies)
    print(args.out)


if __name__ == "__main__":
    main()
