#!/usr/bin/env python
"""Controlled attribution of the r6->r7 pagerank bench regression.

Variants, each run twice in the same session (run1 = cold, run2 shows
any cross-call cache reuse):

  A  r7 package code as-is: eager localCheckpoint + finally unpersist,
     input edge plan NOT cached (recomputed for nodes and for both
     branches of ed = e.join(deg)).
  B  A + cache the distinct edge frame `e` itself, so the expensive
     upstream edge-building plan (the lineitem self-join) computes ONCE.
  C  B but lazy localCheckpoint + count() materializer before unpersist
     (the judge's option b).
  D  B with NO checkpoint and NO unpersist (the r6 leaking behavior) —
     reference only: shows what the r6 warm number was actually
     measuring.

Usage: python tools/bench_pagerank_variants.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_GRID = 2.0**40


def _variant(edges, *, cache_e: bool, checkpoint: str, n_iter=3, damping=0.85):
    e = edges.select("src", "dst").distinct()
    if cache_e:
        e = e.cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("__seed", F.lit(True))
        .cache()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ed = e.join(deg, on="src").cache()
    try:
        n = nodes.count()
        denom = float(n)
        base = F.when(F.col("__seed"), F.lit((1.0 - damping) / denom)).otherwise(F.lit(0.0))
        init = F.when(F.col("__seed"), F.lit(1.0 / denom)).otherwise(F.lit(0.0))
        pr = nodes.withColumn("pr", init)
        for _ in range(n_iter):
            contrib = (
                ed.join(pr, on=F.col("src") == F.col("node"))
                .select(
                    "dst",
                    F.floor(F.col("pr") / F.col("deg").cast("double") * F.lit(_GRID))
                    .cast("long")
                    .alias("__c"),
                )
                .groupBy("dst")
                .agg(F.sum("__c").alias("__s"))
            )
            pr = nodes.join(contrib, on=F.col("node") == F.col("dst"), how="left").select(
                "node",
                "__seed",
                (
                    base
                    + F.lit(damping)
                    * (F.coalesce(F.col("__s"), F.lit(0).cast("long")).cast("double") / F.lit(_GRID))
                ).alias("pr"),
            )
        out = pr.select("node", "pr")
        if checkpoint == "eager":
            return out.localCheckpoint(eager=True)
        if checkpoint == "lazy_count":
            out = out.localCheckpoint(eager=False)
            out.count()
            return out
        return out  # "none": leaks (reference only)
    finally:
        if checkpoint != "none":
            if cache_e:
                e.unpersist()
            nodes.unpersist()
            ed.unpersist()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entry
    from python_etl_mailing_automation_spark.datapipe.graph import pagerank
    from python_etl_mailing_automation_spark.session import build_spark

    spark = build_spark(master="local[32]", shuffle_partitions=32)
    edges = lambda: entry._copurchase_edges(spark, sf)  # noqa: E731

    # warm the page cache / JIT once with an unrelated scan
    for t in ("lineitem", "orders"):
        spark.read.parquet(f"{sf}/{t}.parquet").count()

    def run(label, fn):
        times = []
        for _ in range(2):
            t0 = time.time()
            n = fn().count()
            times.append(time.time() - t0)
        pinned = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        print(f"{label:34s} run1={times[0]:6.2f}s run2={times[1]:6.2f}s rows={n} pinned_rdds={pinned}")

    run("A r7-package (eager, no e-cache)", lambda: pagerank(edges(), n_iter=3))
    run("B e-cached + eager ckpt", lambda: _variant(edges(), cache_e=True, checkpoint="eager"))
    run("C e-cached + lazy ckpt + count", lambda: _variant(edges(), cache_e=True, checkpoint="lazy_count"))
    run("D e-cached, NO ckpt/unpersist", lambda: _variant(edges(), cache_e=True, checkpoint="none"))
    spark.stop()


if __name__ == "__main__":
    main()
