"""Structured Streaming: the tumbling-window aggregation must produce the
same result as its batch twin when fed the same data through readStream."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

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


def test_streaming_first_seen_dedup(spark):
    """applyInPandasWithState: only the first occurrence of each key is
    emitted, matching the batch dedup twin."""
    import tempfile
    from datetime import datetime

    from python_etl_mailing_automation_spark.streaming.stateful import (
        streaming_first_seen_dedup,
    )

    rows = [
        ("k1", datetime(2024, 1, 1, 0, 0, 0), "a"),
        ("k1", datetime(2024, 1, 1, 0, 5, 0), "b"),
        ("k2", datetime(2024, 1, 1, 0, 1, 0), "c"),
        ("k2", datetime(2024, 1, 1, 0, 0, 30), "d"),  # earlier -> the winner
        ("k3", datetime(2024, 1, 1, 1, 0, 0), "e"),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, payload string")
    stage = tempfile.mkdtemp(prefix="dedup_in_")
    ckpt = tempfile.mkdtemp(prefix="dedup_ck_")
    try:
        df.write.mode("overwrite").parquet(stage)
        stream = spark.readStream.schema(df.schema).parquet(stage)
        q = (
            streaming_first_seen_dedup(stream)
            .writeStream.format("memory").queryName("first_seen")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        try:
            # NB: processAllAvailable() never returns under
            # ProcessingTimeTimeout (timeout checks schedule batches
            # forever) — poll the sink instead.
            import time

            deadline = time.time() + 90
            got: dict = {}
            while time.time() < deadline and len(got) < 3:
                got = {
                    r["key"]: r["payload"]
                    for r in spark.sql("select * from first_seen").collect()
                }
                time.sleep(2)
        finally:
            q.stop()
        assert got == {"k1": "a", "k2": "d", "k3": "e"}
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_static_dedup_against_store(spark):
    from python_etl_mailing_automation_spark.datapipe.text import normalize_text
    from python_etl_mailing_automation_spark.streaming.stateful import (
        dedup_stream_against_store,
    )

    stage_dir = tempfile.mkdtemp(prefix="ss_dedup_in_")
    try:
        batch = spark.createDataFrame(
            [
                (1, "fresh document"),
                (2, "Already Ingested!"),
                (3, "another new one"),
            ],
            ["doc_id", "text"],
        )
        batch.write.mode("overwrite").parquet(stage_dir)
        store = normalize_text(
            spark.createDataFrame([(9, "already ingested")], ["doc_id", "text"])
        )
        stream_in = spark.readStream.schema(batch.schema).parquet(stage_dir)
        assert stream_in.isStreaming
        out = dedup_stream_against_store(stream_in, store)
        q = (
            out.select("doc_id")
            .writeStream.format("memory")
            .queryName("ss_dedup")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept = {r.doc_id for r in spark.sql("SELECT doc_id FROM ss_dedup").collect()}
        assert kept == {1, 3}
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


def test_streaming_curation_matches_batch_prefix(spark):
    """curate_document_stream (quality gate -> canonicalize -> exact
    dedup -> ledger anti-join) over a document stream yields exactly the
    digest set its batch twin computes."""
    import tempfile

    from python_etl_mailing_automation_spark.datapipe.text import (
        normalize_text,
        quality_score,
    )
    from python_etl_mailing_automation_spark.streaming.stateful import (
        curate_document_stream,
        curate_documents_batch,
    )

    filler = "many plain filler words without stops " * 3
    rows = [
        (1, filler + "alpha beta"),
        (2, filler + "alpha beta"),          # exact dup of 1 (post-canon)
        (3, filler + "Alpha,  beta!"),       # canonicalizes to doc 1's digest
        (4, filler + "gamma delta"),
        (5, "too short"),                    # fails the length gate
        (6, filler + "known ledger doc"),    # already in the store
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    store = normalize_text(
        spark.createDataFrame([(0, filler + "known ledger doc")], "doc_id long, text string")
    ).select("norm_digest")

    batch_expect = {
        r["norm_digest"]
        for r in normalize_text(
            quality_score(df, min_tokens=10, max_stop_ratio=0.5).filter(
                F.col("is_quality") == 1
            )
        )
        .join(store, "norm_digest", "left_anti")
        .select("norm_digest")
        .distinct()
        .collect()
    }
    assert len(batch_expect) == 2  # {alpha-beta, gamma-delta}

    # The library batch twin (deterministic min-id representative) must
    # agree with the stream on the digest set AND pick the lowest doc id
    # of each duplicate group.
    twin = curate_documents_batch(df, store, min_tokens=10, max_stop_ratio=0.5)
    twin_rows = {r["doc_id"]: r["norm_digest"] for r in twin.collect()}
    assert set(twin_rows.values()) == batch_expect
    assert set(twin_rows) == {1, 4}  # min ids of the two surviving groups

    stage = tempfile.mkdtemp(prefix="cur_in_")
    ckpt = tempfile.mkdtemp(prefix="cur_ck_")
    try:
        df.write.mode("overwrite").parquet(stage)
        stream = spark.readStream.schema(df.schema).parquet(stage)
        q = (
            curate_document_stream(stream, store, min_tokens=10, max_stop_ratio=0.5)
            .select("norm_digest")
            .writeStream.format("memory").queryName("curated_stream")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
            got = {
                r["norm_digest"]
                for r in spark.sql("select * from curated_stream").collect()
            }
        finally:
            q.stop()
        assert got == batch_expect
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_band_ledger_matches_batch(spark, sf_dir):
    """dedup_stream_against_band_ledger (per-band stream-static anti-
    joins) admits exactly the documents the batch gate accepts at
    intra_batch=False — the stream-vs-batch equivalence the MinHash
    band ledger's streaming twin is specified by. Runs on the real
    documents table so the planted near-dup groups give all three
    verdict classes a non-trivial population."""
    from python_etl_mailing_automation_spark.datapipe.dedup import (
        band_entries,
        dedup_against_band_ledger,
        minhash_signatures,
    )
    from python_etl_mailing_automation_spark.streaming.stateful import (
        dedup_stream_against_band_ledger,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prior = docs.filter(F.col("doc_id") % 5 == 0)
    new = docs.filter(F.col("doc_id") % 5 != 0)
    ledger = (
        band_entries(minhash_signatures(prior))
        .select("band_idx", "band_val")
        .distinct()
    )

    gated = dedup_against_band_ledger(new, ledger, intra_batch=False)
    batch_accept = {
        r.doc_id for r in gated.filter(F.col("verdict") == "accepted").collect()
    }
    n_ledger_dup = gated.filter(F.col("verdict") == "ledger_dup").count()
    assert n_ledger_dup > 0          # the planted near-dups cross the split
    assert 0 < len(batch_accept) < new.count()

    stage = tempfile.mkdtemp(prefix="bl_in_")
    ckpt = tempfile.mkdtemp(prefix="bl_ck_")
    try:
        new.write.mode("overwrite").parquet(stage)
        stream = spark.readStream.schema(new.schema).parquet(stage)
        q = (
            dedup_stream_against_band_ledger(stream, ledger)
            .select("doc_id")
            .writeStream.format("memory").queryName("bl_stream")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
            got = {
                r.doc_id
                for r in spark.sql("select doc_id from bl_stream").collect()
            }
        finally:
            q.stop()
        assert got == batch_accept
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_stream_attribution_matches_batch(spark, sf_dir):
    """The watermarked stream-stream attribution join emits exactly the
    batch twin's pairs when both sides arrive via readStream."""
    import shutil
    import tempfile

    from python_etl_mailing_automation_spark.streaming.joins import (
        attribution_join,
    )

    events = read_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    batch = {
        (r["user_id"], r["view_id"], r["click_id"])
        for r in attribution_join(views, clicks, horizon_s=7200).collect()
    }
    assert batch  # non-degenerate fixture

    v_dir = tempfile.mkdtemp(prefix="attr_v_")
    c_dir = tempfile.mkdtemp(prefix="attr_c_")
    ckpt = tempfile.mkdtemp(prefix="attr_ckpt_")
    try:
        views.write.mode("overwrite").parquet(v_dir)
        clicks.write.mode("overwrite").parquet(c_dir)
        sv = spark.readStream.schema(views.schema).parquet(v_dir)
        sc = spark.readStream.schema(clicks.schema).parquet(c_dir)
        joined = attribution_join(
            sv, sc, horizon_s=7200, watermark="2 hours"
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("attr_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            streamed = {
                (r["user_id"], r["view_id"], r["click_id"])
                for r in spark.sql("select * from attr_test").collect()
            }
        finally:
            q.stop()
        assert streamed == batch
    finally:
        shutil.rmtree(v_dir, ignore_errors=True)
        shutil.rmtree(c_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_idempotent_sink_replay_overwrites_not_duplicates(spark, sf_dir):
    """Replaying a batch id (Spark's at-least-once restart behavior)
    overwrites that batch's directory instead of appending duplicates."""
    import shutil
    import tempfile

    from python_etl_mailing_automation_spark.streaming.sinks import (
        idempotent_parquet_sink,
    )

    out = tempfile.mkdtemp(prefix="idem_sink_")
    try:
        sink = idempotent_parquet_sink(out)
        b0 = spark.range(0, 10).select(F.col("id"))
        b1 = spark.range(100, 105).select(F.col("id"))
        sink(b0, 0)
        sink(b1, 1)
        sink(b0, 0)  # replay of batch 0 after a simulated restart
        got = spark.read.parquet(out)
        assert got.count() == 15  # 10 + 5, no duplicates from the replay
        per_batch = {
            r.batch_id: r.n
            for r in got.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
        }
        assert per_batch == {0: 10, 1: 5}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_idempotent_sink_under_real_stream(spark):
    """The sink wired into an actual writeStream.foreachBatch run."""
    import shutil
    import tempfile

    from python_etl_mailing_automation_spark.streaming.sinks import (
        idempotent_parquet_sink,
    )

    src = tempfile.mkdtemp(prefix="idem_src_")
    out = tempfile.mkdtemp(prefix="idem_out_")
    ckpt = tempfile.mkdtemp(prefix="idem_ckpt_")
    try:
        spark.range(0, 50).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("id long").parquet(src)
        q = (
            stream.writeStream.foreachBatch(idempotent_parquet_sink(out))
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert spark.read.parquet(out).select("id").distinct().count() == 50
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_sliding_stream_matches_batch(spark, sf_dir):
    """Sliding (hopping) windows: streaming with watermark produces the
    batch twin's rows — each event lands in duration/slide windows."""
    from python_etl_mailing_automation_spark.streaming.events import (
        sliding_event_counts,
    )

    events = read_table(spark, sf_dir, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["min_value"], r["max_value"])
        for r in sliding_event_counts(events).collect()
    }
    assert batch

    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="slide_in_")
    ckpt = tempfile.mkdtemp(prefix="slide_ckpt_")
    try:
        events.write.mode("overwrite").parquet(stage)
        stream_in = spark.readStream.schema(events.schema).parquet(stage)
        agg = (
            stream_in.withWatermark("ts", "2 hours")
            .groupBy(
                F.window(F.col("ts"), "1 hour", "30 minutes").alias("w"),
                F.col("event_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
                "min_value",
                "max_value",
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("sliding_test")
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
                for r in spark.sql("select * from sliding_test").collect()
            }
        finally:
            q.stop()
        assert streamed == batch
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_drop_duplicates_within_watermark(spark):
    """Spark 3.5+ dropDuplicatesWithinWatermark: duplicates arriving
    within the watermark horizon are suppressed even when their event
    times differ (plain dropDuplicates would keep both); state is
    bounded by the watermark instead of growing forever."""
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="ddww_src_")
    ckpt = tempfile.mkdtemp(prefix="ddww_ckpt_")
    try:
        rows = [
            (1, "k1", "2024-01-01 10:00:00"),
            (2, "k1", "2024-01-01 10:05:00"),  # same key, later ts -> dup
            (3, "k2", "2024-01-01 10:01:00"),
            (4, "k2", "2024-01-01 10:02:00"),  # dup
            (5, "k3", "2024-01-01 10:03:00"),
        ]
        df = spark.createDataFrame(rows, ["event_id", "k", "ts_s"]).select(
            "event_id", "k", F.to_timestamp("ts_s").alias("ts")
        )
        df.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        dedup = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["k"])
        q = (
            dedup.writeStream.format("memory")
            .queryName("ddww_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            kept = {
                r["k"] for r in spark.sql("select * from ddww_test").collect()
            }
            n = spark.sql("select count(*) n from ddww_test").collect()[0]["n"]
        finally:
            q.stop()
        assert kept == {"k1", "k2", "k3"} and n == 3
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_curation_into_idempotent_sink(spark, sf_dir):
    """Full streaming ingest pipeline: quality gate + exact dedup
    (curate_document_stream) feeding the batch-id-keyed exactly-once
    parquet sink; the landed table equals the batch twin's output."""
    import shutil
    import tempfile

    from python_etl_mailing_automation_spark.streaming.sinks import (
        idempotent_parquet_sink,
    )
    from python_etl_mailing_automation_spark.streaming.stateful import (
        curate_document_stream,
        curate_documents_batch,
    )

    docs = read_table(spark, sf_dir, "documents")
    batch_ids = {
        r["doc_id"] for r in curate_documents_batch(docs).select("doc_id").collect()
    }
    assert batch_ids

    src = tempfile.mkdtemp(prefix="scur_src_")
    out = tempfile.mkdtemp(prefix="scur_out_")
    ckpt = tempfile.mkdtemp(prefix="scur_ckpt_")
    try:
        docs.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        curated = curate_document_stream(stream)
        q = (
            curated.writeStream.foreachBatch(idempotent_parquet_sink(out))
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        landed = {
            r["doc_id"]
            for r in spark.read.parquet(out).select("doc_id").collect()
        }
        assert landed == batch_ids
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_loghist_matches_batch(spark, sf_dir):
    """The mergeable quantile sketch as a live stream metric: the
    streamed per-window log histogram equals the batch twin exactly
    (counts are associative, so state-store merge order is
    invisible)."""
    from python_etl_mailing_automation_spark.streaming.events import (
        windowed_loghist,
        windowed_loghist_stream,
    )

    events = read_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.bucket): r.cnt
        for r in windowed_loghist(events).collect()
    }

    stage_dir = tempfile.mkdtemp(prefix="lh_in_")
    ckpt = tempfile.mkdtemp(prefix="lh_ckpt_")
    try:
        events.write.mode("overwrite").parquet(stage_dir)
        stream_in = spark.readStream.schema(events.schema).parquet(stage_dir)
        agg = windowed_loghist_stream(stream_in)
        q = (
            agg.writeStream.format("memory")
            .queryName("loghist_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            streamed = {
                (r.window_start, r.bucket): r.cnt
                for r in spark.sql("select * from loghist_test").collect()
            }
        finally:
            q.stop()
        assert streamed == batch and len(streamed) > 0
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_contract_gate_stream_matches_batch(spark, sf_dir):
    """The row-local contract gate is a pure projection, so the same
    call under readStream tags exactly the rows the batch form tags;
    quarantine (size > 0) splits identically."""
    from pyspark.sql import functions as F

    from python_etl_mailing_automation_spark.datapipe.quality import (
        contract_gate,
    )

    events = read_table(spark, sf_dir, "events")
    constraints = [
        ("not_null", "user_id"),
        ("range", "value", 0.0, 50.0),
        ("accepted", "event_type", ["click", "view", "purchase"]),
    ]
    batch = {
        r.event_id: tuple(r.violated)
        for r in contract_gate(events, constraints)
        .select("event_id", "violated")
        .collect()
    }

    stage_dir = tempfile.mkdtemp(prefix="gate_in_")
    ckpt = tempfile.mkdtemp(prefix="gate_ckpt_")
    try:
        events.write.mode("overwrite").parquet(stage_dir)
        stream_in = spark.readStream.schema(events.schema).parquet(stage_dir)
        gated = contract_gate(stream_in, constraints).select(
            "event_id", "violated"
        )
        q = (
            gated.writeStream.format("memory")
            .queryName("gate_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            streamed = {
                r.event_id: tuple(r.violated)
                for r in spark.sql("select * from gate_test").collect()
            }
        finally:
            q.stop()
        assert streamed == batch and len(streamed) > 0
        assert any(v for v in streamed.values())  # some rows violate
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_contract_gate_rejects_stateful_kinds(spark):
    """unique/fk need cross-row state and must be refused by the
    row-local gate."""
    import pytest as _pytest

    from python_etl_mailing_automation_spark.datapipe.quality import (
        contract_gate,
    )

    df = spark.createDataFrame([(1,)], "k int")
    with _pytest.raises(ValueError):
        contract_gate(df, [("unique", "k")])
    with _pytest.raises(ValueError):
        contract_gate(df, [])


def test_streaming_distinct_count_matches_batch_final(spark):
    """Streaming twin of operators.aggregates.running_distinct's FINAL
    state: dropDuplicates on (key, value) feeding an update-mode count
    per key converges to the batch distinct count — the
    vocabulary-growth monitor as a live stream."""
    import tempfile
    import time
    from datetime import datetime

    from pyspark.sql import functions as SF

    rows = [
        ("u1", datetime(2024, 1, 1, 0, 0), "view"),
        ("u1", datetime(2024, 1, 1, 0, 1), "cart"),
        ("u1", datetime(2024, 1, 1, 0, 2), "view"),   # dup type
        ("u2", datetime(2024, 1, 1, 0, 0), "view"),
        ("u2", datetime(2024, 1, 1, 0, 3), "buy"),
        ("u2", datetime(2024, 1, 1, 0, 4), "cart"),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, et string")
    stage = tempfile.mkdtemp(prefix="rdist_in_")
    ckpt = tempfile.mkdtemp(prefix="rdist_ck_")
    try:
        df.write.mode("overwrite").parquet(stage)
        stream = spark.readStream.schema(df.schema).parquet(stage)
        counts = (
            stream.dropDuplicates(["u", "et"])
            .groupBy("u")
            .agg(SF.count(SF.lit(1)).alias("n_distinct"))
        )
        q = (
            counts.writeStream.format("memory").queryName("rdist")
            .outputMode("complete").option("checkpointLocation", ckpt).start()
        )
        try:
            deadline = time.time() + 90
            got: dict = {}
            while time.time() < deadline and got != {"u1": 2, "u2": 3}:
                got = {
                    r["u"]: r["n_distinct"]
                    for r in spark.sql("select * from rdist").collect()
                }
                time.sleep(2)
        finally:
            q.stop()
        batch = {
            r["u"]: r["n"]
            for r in df.select("u", "et").distinct()
            .groupBy("u").agg(SF.count(SF.lit(1)).alias("n")).collect()
        }
        assert got == batch == {"u1": 2, "u2": 3}
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_cusum_matches_batch_across_microbatches(spark):
    """streaming_cusum over TWO forced micro-batches (maxFilesPerTrigger=1,
    second file strictly later) equals the batch closed form over the
    same rows — the two-long state genuinely carries the recurrence
    across the batch boundary."""
    import os
    import time
    from datetime import datetime, timedelta

    from python_etl_mailing_automation_spark.datapipe.timeseries import (
        cusum_changepoints,
    )
    from python_etl_mailing_automation_spark.streaming.stateful import (
        streaming_cusum,
    )

    t0 = datetime(2024, 1, 1)
    mk = lambda i, k, v: (k, t0 + timedelta(minutes=i), i, v)  # noqa: E731
    early = [mk(i, k, 30.0 + 10 * k + i) for i in range(6) for k in (1, 2)]
    late = [mk(10 + i, k, 80.0 - 5 * i) for i in range(4) for k in (1, 2)]
    schema = "user_id long, ts timestamp, event_id long, value double"
    batch_df = spark.createDataFrame(early + late, schema)
    expected = {
        (int(r.user_id), r.event_id): (r.cusum_hi, r.cusum_lo, r.alarm)
        for r in cusum_changepoints(
            batch_df, "user_id", "ts", "value",
            target=50.0, slack=2.0, threshold=40.0, order_cols=["event_id"],
        ).collect()
    }
    stage = tempfile.mkdtemp(prefix="cusum_in_")
    ckpt = tempfile.mkdtemp(prefix="cusum_ck_")
    try:
        spark.createDataFrame(early, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stage, "b0"))
        time.sleep(1.1)  # distinct mod-times: b0 is picked up first
        spark.createDataFrame(late, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stage, "b1"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage + "/*")
        )
        q = (
            streaming_cusum(
                stream, target=50.0, slack=2.0, threshold=40.0
            )
            .writeStream.format("memory").queryName("cusum_stream")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        got = {
            (int(r.key), r.event_id): (r.cusum_hi, r.cusum_lo, r.alarm)
            for r in spark.sql("select * from cusum_stream").collect()
        }
        assert got == expected
        assert any(a for (_, _, a) in got.values())  # the drift alarms
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_heavy_hitters_mg_closed_form_and_guarantee(spark):
    """Batch MG summary equals the closed-form one-shot merge
    (exact count minus the (capacity+1)-th largest count, positive
    residuals only), caps the counter table at ``capacity``, and
    honors the classic guarantee: any item with true count
    > n/(capacity+1) survives, each reported count within
    [true - n/(cap+1), true]. Multi-key: each key's summary is
    independent."""
    from collections import Counter

    from python_etl_mailing_automation_spark.datapipe.sketches import (
        heavy_hitters_mg,
    )

    per_key = {
        "k1": ["a"] * 30 + ["b"] * 20 + ["c"] * 5
        + [f"x{i}" for i in range(25)],
        # all-ties key: 6 items x 4 each, capacity 4 -> ck1 = 4,
        # every residual 0, empty summary (bound still holds: no
        # item exceeds 24/5).
        "k2": [f"t{i}" for i in range(6)] * 4,
    }
    rows = [(k, it) for k, items in per_key.items() for it in items]
    # NULL keys drop by contract (same as the streaming twin) and must
    # not perturb any real key's summary
    rows += [(None, "a")] * 7
    df = spark.createDataFrame(rows, "key string, item string")
    cap = 4
    got: dict[str, dict[str, tuple[int, int]]] = {}
    for r in heavy_hitters_mg(df, "key", "item", capacity=cap).collect():
        got.setdefault(r["key"], {})[r["item"]] = (
            r["mg_count"], r["n_events"],
        )
    for k, items in per_key.items():
        true = Counter(items)
        n = len(items)
        ck1 = sorted(true.values(), reverse=True)[cap] if (
            len(true) > cap
        ) else 0
        expected = {
            it: (c - ck1, n) for it, c in true.items() if c - ck1 > 0
        }
        assert got.get(k, {}) == expected, k
        assert len(got.get(k, {})) <= cap
        bound = n / (cap + 1)
        for it, c in true.items():
            if c > bound:
                assert it in got[k], f"guaranteed heavy hitter {it} missing"
        for it, (mg, _) in got.get(k, {}).items():
            assert true[it] - bound <= mg <= true[it]
    assert "k2" not in got  # the all-ties key collapses to empty
    assert None not in got  # NULL keys dropped, not silently lost mid-plan


def test_heavy_hitters_mg_plan_has_no_python_eval(spark):
    """The round-10 rework's contract: the batch operator is pure
    DataFrame ops — no FlatMapGroupsInPandas / Batch/ArrowEvalPython
    stage — and the top-(capacity+1) rank filter is rewritten as a
    WindowGroupLimit so each map task keeps only capacity+1 rows per
    key before the exchange."""
    from python_etl_mailing_automation_spark.datapipe.sketches import (
        heavy_hitters_mg,
    )

    df = spark.createDataFrame(
        [("k", f"i{n % 7}") for n in range(50)], "key string, item string"
    )
    plan = heavy_hitters_mg(df, "key", "item", capacity=3)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    for bad in ("FlatMapGroupsInPandas", "BatchEvalPython",
                "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, bad
    assert "WindowGroupLimit" in plan


def test_streaming_heavy_hitters_matches_batch_across_microbatches(spark):
    """Two forced micro-batches; final streaming snapshot (max
    n_events per key) equals the sequential Python fold replay in
    (ts, event_id) order — the streaming state machine's bit-level
    pin — and BOTH the streaming summary and the batch twin's
    closed-form merge honor the MG guarantee against exact counts
    (the round-10 contract: batch is the deterministic mergeable
    formulation, streaming keeps the order-dependent fold, equality
    is at the guarantee level, not bit level)."""
    import os
    import time
    from collections import Counter
    from datetime import datetime, timedelta

    from python_etl_mailing_automation_spark.datapipe.sketches import (
        _mg_fold,
        heavy_hitters_mg,
    )
    from python_etl_mailing_automation_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    t0 = datetime(2024, 1, 1)
    early = [(f"k{j}", f"i{(i * (j + 2)) % 6}", t0 + timedelta(minutes=i), i)
             for i in range(40) for j in (1, 2)]
    late = [(f"k{j}", f"i{(i * (j + 1)) % 9}",
             t0 + timedelta(minutes=100 + i), 100 + i)
            for i in range(30) for j in (1, 2)]
    schema = "key string, item string, ts timestamp, event_id long"
    batch_df = spark.createDataFrame(early + late, schema)
    cap = 3
    all_rows = sorted(early + late, key=lambda r: (r[2], r[3]))
    true = {}
    for k, it, _, _ in all_rows:
        true.setdefault(k, Counter())[it] += 1
    expected = {}
    for k in true:
        replay = _mg_fold(
            [it for kk, it, _, _ in all_rows if kk == k], {}, cap
        )
        n = sum(true[k].values())
        for it, c in replay.items():
            expected[(k, it)] = (c, n)

    def _assert_mg_guarantee(summary, label):
        for k, cnt in true.items():
            n = sum(cnt.values())
            bound = n / (cap + 1)
            for it, c in cnt.items():
                if c > bound:
                    assert (k, it) in summary, f"{label}: {k}/{it} missing"
            for (kk, it), (mg, ne) in summary.items():
                assert ne == sum(true[kk].values()), label
                assert true[kk][it] - sum(true[kk].values()) / (cap + 1) \
                    <= mg <= true[kk][it], label

    batch = {
        (r["key"], r["item"]): (r["mg_count"], r["n_events"])
        for r in heavy_hitters_mg(
            batch_df, "key", "item", capacity=cap
        ).collect()
    }
    _assert_mg_guarantee(batch, "batch closed-form")
    stage = tempfile.mkdtemp(prefix="mg_in_")
    ckpt = tempfile.mkdtemp(prefix="mg_ck_")
    try:
        spark.createDataFrame(early, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stage, "b0"))
        time.sleep(1.1)
        spark.createDataFrame(late, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stage, "b1"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage + "/*")
        )
        q = (
            streaming_heavy_hitters(stream, capacity=cap)
            .writeStream.format("memory").queryName("mg_stream")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        snaps = spark.sql("select * from mg_stream").collect()
        last_n = {}
        for r in snaps:
            last_n[r["key"]] = max(last_n.get(r["key"], 0), r["n_events"])
        got = {
            (r["key"], r["item"]): (r["mg_count"], r["n_events"])
            for r in snaps if r["n_events"] == last_n[r["key"]]
        }
        assert got == expected  # bit-level pin on the sequential fold
        _assert_mg_guarantee(got, "streaming fold")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_quantile_sketch_rank_budget_across_microbatches(spark):
    """Two forced micro-batches; the final streaming sketch snapshot
    (max n_rows per key) stays bounded at n_bands rows, counts every
    event, and answers every probe within the SUMMED merge budget
    (k micro-batches -> k * n/n_bands) against exact ranks — the
    mergeable-summaries composition law, pinned end to end. The batch
    twin's one-shot sketch is checked on the same data for the single-
    pass budget."""
    import os
    import time

    from python_etl_mailing_automation_spark.datapipe.sketches import (
        quantile_sketch,
    )
    from python_etl_mailing_automation_spark.streaming.stateful import (
        streaming_quantile_sketch,
    )

    bands = 16
    early = [("k1", float(i * 37 % 500)) for i in range(400)]
    early += [("k2", float(i % 50)) for i in range(300)]
    late = [("k1", float(i * 11 % 900)) for i in range(350)]
    late += [("k2", 25.0)] * 200  # heavy value arriving late
    schema = "key string, value double"
    stage = tempfile.mkdtemp(prefix="qsk_in_")
    ckpt = tempfile.mkdtemp(prefix="qsk_ck_")
    try:
        spark.createDataFrame(early, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stage, "b0"))
        time.sleep(1.1)
        spark.createDataFrame(late, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stage, "b1"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage + "/*")
        )
        q = (
            streaming_quantile_sketch(stream, n_bands=bands)
            .writeStream.format("memory").queryName("qsk_stream")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        snaps = spark.sql("select * from qsk_stream").collect()
        last_n = {}
        for r in snaps:
            last_n[r["key"]] = max(last_n.get(r["key"], 0), r["n_rows"])
        final = {}
        for r in snaps:
            if r["n_rows"] == last_n[r["key"]]:
                final.setdefault(r["key"], []).append(r)
        vals = {}
        for k, v in early + late:
            vals.setdefault(k, []).append(v)
        k_batches = 2
        for k, rows in final.items():
            n = len(vals[k])
            assert last_n[k] == n, k  # every event counted
            assert len(rows) <= bands, k
            budget = k_batches * n / bands
            ordered = sorted(vals[k])
            for p in (0.1, 0.5, 0.9):
                target = -(-p * n // 1)
                covering = [r for r in rows if r["cum_cnt"] >= target]
                assert covering, (k, p)
                est = min(covering, key=lambda r: r["cum_cnt"])["value"]
                lo = sum(1 for x in ordered if x < est)
                hi = sum(1 for x in ordered if x <= est)
                assert hi > target - budget, (k, p)
                assert lo < target + budget, (k, p)
        # batch twin on the same data honors the one-shot budget
        batch_df = spark.createDataFrame(early + late, schema)
        bsk = {}
        for r in quantile_sketch(
            batch_df, "value", key_cols=["key"], n_bands=bands
        ).collect():
            bsk.setdefault(r["key"], []).append(r)
        for k, rows in bsk.items():
            n = len(vals[k])
            ordered = sorted(vals[k])
            for p in (0.1, 0.5, 0.9):
                target = -(-p * n // 1)
                covering = [r for r in rows if r["cum_cnt"] >= target]
                est = min(covering, key=lambda r: r["cum_cnt"])["value"]
                lo = sum(1 for x in ordered if x < est)
                hi = sum(1 for x in ordered if x <= est)
                assert hi >= target and lo < target + n / bands, (k, p)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
