"""Bucketing: with broadcast off (forcing the shuffle-join path a large
fact-to-fact join takes at scale), a join of two tables bucketed on the
join key must plan with ZERO shuffle exchanges — the physical proof that
co-location removes the shuffle."""

from __future__ import annotations

import pytest

from python_etl_mailing_automation_spark.sources import read_table
from python_etl_mailing_automation_spark.sources.io import write_bucketed_table


def _plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, no_broadcast):
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    write_bucketed_table(
        orders, "orders_bkt", bucket_col="o_custkey", num_buckets=8,
        sort_col="o_custkey",
    )
    write_bucketed_table(
        customer, "customer_bkt", bucket_col="c_custkey", num_buckets=8,
        sort_col="c_custkey",
    )
    a = spark.table("orders_bkt")
    b = spark.table("customer_bkt")
    joined = a.join(b, a["o_custkey"] == b["c_custkey"]).select(
        "o_orderkey", "c_name"
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan          # co-located: no shuffle either side
    assert "Bucketed: true" in plan        # scan actually uses the buckets
    assert joined.count() == orders.count()

    # The unbucketed baseline DOES shuffle — proving the delta is bucketing.
    base = orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
    assert "Exchange hashpartitioning" in _plan(base)

    # Aggregation on the bucket key is also exchange-free.
    assert "Exchange" not in _plan(a.groupBy("o_custkey").count())


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """Hive-style partition columns prune at planning time: the scan's
    PartitionFilters carry the predicate and only the matching
    directory is read — the other 100 TB of partitions never open."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "parted")
    (
        spark.range(0, 1000)
        .withColumn("part", (F.col("id") % 10).cast("int"))
        .write.partitionBy("part")
        .parquet(out)
    )
    scan = spark.read.parquet(out).filter(F.col("part") == 3)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part" in plan
    # only the one directory's rows flow
    assert scan.count() == 100
    # predicate on a DATA column reaches the reader as PushedFilters
    scan2 = spark.read.parquet(out).filter(F.col("id") < 5)
    plan2 = scan2._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), LessThan(id,5)]" in plan2


def test_dynamic_partition_pruning_through_join(spark, tmp_path):
    """DPP: a filter on the DIM side prunes the fact scan's partitions
    at RUNTIME through the join — the plan's PartitionFilters carry a
    dynamicpruning subquery, so a 100 TB fact table opens only the
    partitions the filtered dim actually joins."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "fact")
    (
        spark.range(0, 1000)
        .withColumn("part", (F.col("id") % 10).cast("int"))
        .write.partitionBy("part")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    dim = spark.range(0, 10).select(
        F.col("id").cast("int").alias("part"),
        (F.col("id") % 3).alias("grp"),
    )
    joined = fact.join(dim.filter(F.col("grp") == 0), on="part")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # grp==0 keeps dim parts {0,3,6,9} -> 4 of 10 partitions x 100 rows
    assert joined.count() == 400
