"""Structured Streaming: the tumbling-window aggregation must produce the
same result as its batch twin when fed the same data through readStream."""

from __future__ import annotations

import shutil
import tempfile

from python_etl_mailing_automation_spark.sources import read_table
from python_etl_mailing_automation_spark.streaming import (
    tumbling_event_counts,
    tumbling_event_counts_stream,
)


def test_stream_matches_batch(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["min_value"], r["max_value"])
        for r in tumbling_event_counts(events).collect()
    }

    stage_dir = tempfile.mkdtemp(prefix="stream_in_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        events.write.mode("overwrite").parquet(stage_dir)
        stream_in = spark.readStream.schema(events.schema).parquet(stage_dir)
        assert stream_in.isStreaming
        agg = tumbling_event_counts_stream(stream_in, watermark="2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("tumbling_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            streamed = {
                (r["window_start"], r["event_type"]): (
                    r["n_events"], r["min_value"], r["max_value"]
                )
                for r in spark.sql("select * from tumbling_test").collect()
            }
        finally:
            q.stop()
        assert streamed == batch
        assert len(streamed) > 0
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
