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

# Relational tables only: the deep tier runs the mailing/robot pipelines
# and the big windowed/join queries. The LSH/ANN tables (documents,
# embeddings, events) are intentionally not replicated — their cost is
# governed by query parameters (band/bucket counts) that a fixed-param
# bench must not silently re-scale.
TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

KEY_OFFSET = 100_000_000  # far above any key at sf≤1


def make_scaled_sf(base: str, out: str, copies: int, spark=None) -> str:
    from pyspark.sql import functions as F

    from python_etl_mailing_automation_spark.session import build_spark
    from python_etl_mailing_automation_spark.sources.io import read_table

    own_session = spark is None
    if own_session:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = build_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    for name in TABLES:
        df = read_table(spark, base, name)
        key_cols = [
            f.name
            for f in df.schema.fields
            if f.name.endswith("key") and f.dataType.simpleString() in ("bigint", "int")
        ]
        parts = [
            df.withColumns(
                {c: F.col(c) + F.lit(i * KEY_OFFSET) for c in key_cols}
            )
            for i in range(copies)
        ]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
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
