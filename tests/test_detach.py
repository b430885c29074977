"""Detach-mode parameterization (round 11): all modes produce identical
results; the knob only selects the lineage/fault-tolerance posture."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from python_etl_mailing_automation_spark.detach import (
    DETACH_MODE_CONF,
    detach,
    detach_mode,
)


@pytest.fixture()
def _mode_reset(spark):
    yield
    spark.conf.unset(DETACH_MODE_CONF)


def _frame(spark):
    return spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )


def test_default_mode_is_local(spark):
    assert detach_mode(_frame(spark)) == "local"


def test_modes_produce_identical_results(spark, _mode_reset):
    expected = sorted(
        _frame(spark).groupBy("k").count().collect()
    )
    spark.sparkContext.setCheckpointDir(
        tempfile.mkdtemp(prefix="detach_reliable_")
    )
    for mode in ("local", "reliable", "persist"):
        spark.conf.set(DETACH_MODE_CONF, mode)
        out = detach(_frame(spark), eager=False)
        got = sorted(out.groupBy("k").count().collect())
        assert got == expected, mode
        if mode == "persist":
            out.unpersist()


def test_unknown_mode_raises(spark, _mode_reset):
    spark.conf.set(DETACH_MODE_CONF, "bogus")
    with pytest.raises(ValueError, match="bogus"):
        detach(_frame(spark))


def test_iterative_operator_under_each_mode(spark, _mode_reset):
    """A real loop operator (star closure) is mode-invariant."""
    from python_etl_mailing_automation_spark.datapipe.dedup import (
        dedup_clusters_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11), (20, 20)], "a long, b long"
    )
    ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12, 20, 99)], "id long"
    )
    spark.sparkContext.setCheckpointDir(
        tempfile.mkdtemp(prefix="detach_star_")
    )
    outs = {}
    for mode in ("local", "reliable", "persist"):
        spark.conf.set(DETACH_MODE_CONF, mode)
        outs[mode] = sorted(
            dedup_clusters_star(
                ids, pairs, id_col="id", id_a="a", id_b="b"
            ).collect()
        )
    assert outs["local"] == outs["reliable"] == outs["persist"]
