#!/usr/bin/env python
"""Controlled attribution of the deep-tier flagship variance.

Round-9 signed spreads at sf1.0 showed a 6x max/min swing WITHIN one
boot for the two e2e flagships (mailing_pipeline_e2e [9.5, 11.0, 59.5],
semantic_curation_e2e [34.0, 59.7, 63.6]) while single-shape queries
stayed tight. Both flagships cache/persist intermediates and unpersist
in a finally block — and ``unpersist()`` is ASYNC: the blocks are
reclaimed by ContextCleaner on the driver's cadence, not at call
return. The hypothesis set, each isolated below:

  gc        driver/executor GC pauses (one JVM in local mode): read the
            cumulative collector time around every run — a slow run
            whose extra wall matches its extra GC time is attributed.
  blocks    leftover cached/checkpointed blocks from the PREVIOUS runs
            (async unpersist; localCheckpoint blocks are only freed by
            a driver gc cycle): count cached RDDs before each run.
  release   bench.release_state() (clearCache + gc.collect) between a
            query's own runs — the per-query protocol deliberately does
            NOT do this; if the spread collapses under it, the swing is
            cross-RUN state, not inherent plan variance.
  aqe       AQE replanning: re-run with adaptive execution off; AQE is
            deterministic for fixed inputs, so variance surviving the
            off switch is not AQE's.

Usage:
    python tools/bench_deep_variance.py [deep_dir] [n_runs]

Prints one JSON line per (query, variant, run) with wall seconds,
gc_delta_ms, and cached-RDD count at run start, then a summary block.
The machine must be idle (same rule as bench.py).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["mailing_pipeline_e2e", "semantic_curation_e2e"]


def _gc_ms(spark) -> int:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    total = 0
    it = beans.iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return int(total)


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def main() -> None:
    deep_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1.0"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    import __spark_entry__ as entry_mod
    from python_etl_mailing_automation_spark.session import build_spark

    qs = entry_mod.queries()
    results = []

    def run_variant(spark, name: str, variant: str, release: bool) -> list:
        rows = []
        for i in range(n_runs):
            if release:
                spark.catalog.clearCache()
                gc.collect()
                # JVM gc: ContextCleaner's weak refs only process on a
                # collection; without it checkpoint blocks survive the
                # Python-side release (measured: 12 -> 22 cached RDDs).
                spark.sparkContext._jvm.System.gc()
            blocks = _n_cached(spark)
            g0 = _gc_ms(spark)
            t0 = time.time()
            qs[name](spark, deep_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            row = {
                "query": name,
                "variant": variant,
                "run": i,
                "wall_s": round(wall, 2),
                "gc_delta_ms": _gc_ms(spark) - g0,
                "cached_rdds_at_start": blocks,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        return rows

    spark = build_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    # warm-up: JVM + codegen, not recorded
    qs["per_key_windowed_sum"](spark, deep_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in QUERIES:
        results += run_variant(spark, name, "plain", release=False)
        spark.catalog.clearCache()
        gc.collect()
        results += run_variant(spark, name, "release_between", release=True)
        spark.catalog.clearCache()
        gc.collect()
    spark.stop()

    # AQE-off pass in a fresh session (config is session-constructed).
    spark = build_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs2 = entry_mod.queries()
    qs2["per_key_windowed_sum"](spark, deep_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in QUERIES:
        for i in range(n_runs):
            g0 = _gc_ms(spark)
            t0 = time.time()
            qs2[name](spark, deep_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            row = {
                "query": name,
                "variant": "aqe_off",
                "run": i,
                "wall_s": round(time.time() - t0, 2),
                "gc_delta_ms": _gc_ms(spark) - g0,
                "cached_rdds_at_start": _n_cached(spark),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    spark.stop()

    summary = {}
    for name in QUERIES:
        summary[name] = {}
        for variant in ("plain", "release_between", "aqe_off"):
            walls = sorted(
                r["wall_s"]
                for r in results
                if r["query"] == name and r["variant"] == variant
            )
            gcs = [
                r["gc_delta_ms"]
                for r in results
                if r["query"] == name and r["variant"] == variant
            ]
            if walls:
                summary[name][variant] = {
                    "min": walls[0],
                    "med": walls[len(walls) // 2],
                    "max": walls[-1],
                    "spread_ratio": round(walls[-1] / walls[0], 2),
                    "gc_ms_min": min(gcs),
                    "gc_ms_max": max(gcs),
                }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
