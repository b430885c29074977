"""Table readers and exact-filename CSV sinks (SURVEY.md §2.1).

- ``read_table`` — parquet scan with nanosecond-timestamp normalization
  (Spark cannot read parquet TIMESTAMP(NANOS); with
  ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as a long
  which this reader converts back to a timestamp).
- ``write_exact_csv`` — the reference's sinks name each output file
  exactly (one CSV per product / time-slot group, data_exporter.py:58-68,
  gerador_robo_mestre.py:120-138). Spark writes directories of parts, so
  the exact-name contract is: coalesce(1) → write dir → rename the single
  part. Only for dimension-sized outputs; large outputs keep native
  partitioned writes (``df.write.partitionBy``).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


def nanos_to_timestamp(col: str) -> Column:
    """Convert an epoch-nanos long column to a timestamp (µs precision).

    Uses integer division (`div`) — a float division would lose precision
    for nanosecond epochs, which exceed 2^53.
    """
    return F.expr(f"timestamp_micros({col} div 1000)")


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    nanos_ts_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet``; convert known nanos-long
    timestamp columns back to timestamps.

    Defensively pins the two runtime confs correctness depends on, so
    results are identical under ANY caller-provided session (the driver
    harness builds its own): nanos parquet timestamps must arrive as
    longs (Spark cannot read TIMESTAMP(NANOS) natively), and timestamp
    rendering must be UTC-stable.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Engine semantics are coerce-to-null (the reference's
        # errors='coerce'); Spark 4 defaults ANSI on, which turns junk
        # casts into exceptions.
        spark.conf.set("spark.sql.ansi.enabled", "false")
    except Exception:
        pass  # conf locked down — proceed with whatever the session has
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nanos_ts_cols:
        field = next((f for f in df.schema.fields if f.name == c), None)
        if field is not None and isinstance(field.dataType, LongType):
            df = df.withColumn(c, nanos_to_timestamp(c))
    # Canonicalize TIMESTAMP_NTZ → TIMESTAMP: parquet written with
    # isAdjustedToUTC=false reads back NTZ under Spark's default NTZ
    # inference, and half the timestamp builtins (unix_micros, ...) only
    # accept TIMESTAMP. Session TZ is pinned UTC above, so the cast is an
    # exact identity on the underlying microseconds.
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, TimestampNTZType):
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    return df


def read_csv_stringly(
    spark: SparkSession,
    path: str | Path,
    *,
    sep: str = ";",
    encoding: str = "UTF-8",
) -> DataFrame:
    """S4: all-string CSV scan (legacy stage-4/5 inputs).

    Parity with the reference's ``read_csv(dtype=str, encoding='utf-8-sig')``
    re-reads (formatador_dados.py:49, compressor.py:30). The engine never
    re-reads its own outputs (repairs are pre-write), but external stringly
    CSV feeds enter here; typed coercion (F3/F4) runs as column expressions
    afterwards.
    """
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("inferSchema", False)
        .csv(str(path))
    )


def peek_columns(spark: SparkSession, path: str | Path, **reader_options: str) -> list[str]:
    """S5: header-only schema peek (schema.py:11-22) — parquet footers /
    CSV headers only, no data read."""
    p = str(path)
    if p.endswith(".parquet"):
        return spark.read.parquet(p).schema.names
    reader = spark.read.option("header", True)
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    return reader.csv(p).schema.names


def sanitize_filename(name: str) -> str:
    """F14: keep alphanumerics/space/underscore/dash for output filenames
    (data_loader.py:86)."""
    return "".join(c for c in str(name) if c.isalnum() or c in " _-").strip()


def archive_run(
    output_dir: str | Path, *, extra_files: list[str | Path] | None = None,
    remove_dir: bool = False,
) -> Path:
    """S9: zip the run's output folder (plus e.g. the run log), optionally
    delete the work dir (compressor.py:87-118). Driver-side epilogue, not
    a Spark concern."""
    output_dir = Path(output_dir)
    for f in extra_files or []:
        shutil.copy2(f, output_dir / Path(f).name)
    # S11: drop any artifact whose *filename* carries a BOM (compressor.py:12-23);
    # unnecessary when writes are clean UTF-8, kept for legacy dirs.
    for p in output_dir.iterdir():
        if "﻿" in p.name or "ï»¿" in p.name:
            p.unlink()
    archive = Path(shutil.make_archive(str(output_dir), "zip", str(output_dir)))
    if remove_dir:
        shutil.rmtree(output_dir, ignore_errors=True)
    return archive


def register_views(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ),
) -> None:
    """Expose the dataset catalog as temp views so users can work in pure
    ``spark.sql`` — the engine is DataFrame-first, but every operator's
    output is a view-compatible frame and the SQL surface is first-class.
    """
    for name in tables:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table.

    Bucketing is the pre-shuffle lever for repeated joins/aggregations on
    the same key at scale: two tables bucketed by the join key into the
    same bucket count join with NO exchange on either side (verified by
    ``tests/test_bucketing.py`` at the plan level). At 100 TB this turns
    every recurring fact-to-fact join on the entity key from a full
    shuffle into a local merge.
    """
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_exact_csv(
    df: DataFrame,
    out_path: str | Path,
    *,
    sep: str = ";",
    encoding: str = "UTF-8",
    header: bool = True,
    order_by: list | None = None,
    drop_after_sort: list[str] | None = None,
) -> Path:
    """Write a small DataFrame to exactly ``out_path`` as one CSV file.

    Nulls render as '' (reference ``na_rep=''``, data_exporter.py:68).
    ``order_by`` (list of Columns) fixes the row order inside the file —
    the reference's priority sort exists precisely for this
    (processing_pipeline.py:253-275): agents work the file top-down.
    Sorting happens via ``sortWithinPartitions`` on the single coalesced
    partition — ordered output without a cluster-wide global sort.
    ``drop_after_sort`` names sort-only carrier columns (e.g. the numeric
    debt kept alongside its string-formatted render) projected away after
    the sort, mirroring the reference's sort-then-drop
    (processing_pipeline.py:274-275); a projection preserves
    partition-local row order.
    """
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="csv_sink_", dir=str(out_path.parent))
    single = df.coalesce(1)
    if order_by:
        single = single.sortWithinPartitions(*order_by)
    if drop_after_sort:
        single = single.drop(*drop_after_sort)
    try:
        (
            single
            .write.mode("overwrite")
            .option("sep", sep)
            .option("encoding", encoding)
            .option("header", str(header).lower())
            .option("nullValue", "")
            .option("emptyValue", "")
            .csv(str(Path(tmp) / "d"))
        )
        part = glob.glob(str(Path(tmp) / "d" / "part-*.csv"))[0]
        shutil.move(part, out_path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out_path


def write_partitioned_by_key(
    df: DataFrame,
    out_dir: str | Path,
    key_col: str,
    *,
    filename_template: str = "{key}.csv",
    sep: str = ";",
    order_by: list | None = None,
    drop_after_sort: list[str] | None = None,
) -> list[Path]:
    """S6/S7: one exactly-named CSV per distinct key value.

    The reference loops over distinct products (data_exporter.py:58-68);
    here the distinct key list is the only driver-side materialization and
    each per-key write is a pushed-down filter. Blank/null keys are
    skipped (P8 guard, data_exporter.py:61).

    Callers with a non-trivial upstream plan should pass a persisted
    ``df`` — each per-key write re-evaluates the frame, so an unpersisted
    pipeline would re-run once per key (SURVEY.md §3.4).
    """
    out_dir = Path(out_dir)
    keys = [
        r[0]
        for r in df.select(key_col).distinct().collect()
        if r[0] is not None and str(r[0]).strip() != ""
    ]
    written = []
    for k in sorted(keys):
        path = out_dir / filename_template.format(key=k)
        write_exact_csv(
            df.filter(F.col(key_col) == k), path, sep=sep, order_by=order_by,
            drop_after_sort=drop_after_sort,
        )
        written.append(path)
    return written


def write_sharded_parquet(
    df: DataFrame,
    out_dir: str | Path,
    *,
    rows_per_shard: int = 1_000_000,
    shard_key: str | None = None,
) -> int:
    """Write ``df`` as parquet in roughly ``rows_per_shard``-sized shards
    and return the shard count — the "emit a training corpus as uniform
    shards" sink (downstream loaders want bounded, evenly-sized files,
    not one file per upstream task).

    One ``count()`` sizes the output (the single driver-side scalar a
    sharded sink fundamentally needs); the data is then hash-distributed
    over ``ceil(n/rows_per_shard)`` partitions — ``repartition`` on the
    key (deterministic placement) or round-robin when no key is given —
    and written partition-per-file. Callers with an expensive upstream
    should pass a persisted frame: the count and the write each evaluate
    it.
    """
    n = df.count()
    shards = max(1, -(-n // rows_per_shard))
    out = (
        df.repartition(shards, F.col(shard_key))
        if shard_key
        else df.repartition(shards)
    )
    out.write.mode("overwrite").parquet(str(out_dir))
    return shards


def write_sized_parquet(
    df: DataFrame,
    out_dir: str | Path,
    *,
    max_records_per_file: int = 1_000_000,
    partition_by: str | list[str] | None = None,
    sort_within: str | list[str] | None = None,
) -> None:
    """Size-governed parquet sink without a counting pass: Spark's
    ``maxRecordsPerFile`` writer option rolls a new file whenever a task
    exceeds the cap, so file sizes are bounded WITHOUT the extra
    ``count()`` + repartition that :func:`write_sharded_parquet` pays
    for exactly-N uniform shards — the right default for the "just don't
    emit 20 GB files" case at 100 TB, where the input's own task
    parallelism is already fine.

    ``partition_by`` adds hive-style directory partitioning (partition
    pruning for downstream readers); ``sort_within`` sorts rows inside
    each task before writing, which clusters values so parquet row-group
    min/max statistics actually prune (an unsorted scatter makes every
    row group span the full value range and defeats predicate pushdown
    at the storage layer).
    """
    cols = lambda c: [c] if isinstance(c, str) else list(c)  # noqa: E731
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*cols(sort_within))
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*cols(partition_by))
    writer.parquet(str(out_dir))


def write_jsonl_shards(
    df,
    out_dir: str | Path,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    salt: str = "",
) -> int:
    """Training-export sink: deterministic corpus shuffle → one JSONL
    directory per shard (``shard=N/``), rows inside each shard laid out
    in the shard's permutation order.

    Composes :func:`~python_etl_mailing_automation_spark.datapipe
    .sampling.shard_assign` (md5 shard + within-shard position — never a
    global sort) with a ``partitionBy("shard")`` JSON writer; rows are
    sorted by ``pos`` within each shard partition, so reading a shard's
    files in order replays one fixed global permutation — the layout a
    training loader consumes directly. Returns ``n_shards``.

    Scale: one shuffle on the shard key plus per-shard sorts of that
    shard's rows; shard count is the parallelism/file-size lever
    (thousands at 100 TB). Because each shard is exactly one file, ONE
    task sorts and writes a whole shard: size ``n_shards`` so a single
    shard fits one task's sort/spill budget. md5 sharding makes shards
    uniform in expectation only, so a caller-derived rows-per-shard
    target (e.g. ``run_curation_job``'s) is approximate, not a cap.
    JSONL because it is the interchange format LLM-data tooling expects;
    use :func:`write_sharded_parquet` when the consumer is Spark again.
    """
    from ..datapipe.sampling import shard_assign

    sharded = shard_assign(df, n_shards, id_col=id_col, salt=salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(str(out_dir))
    )
    return n_shards


def write_globally_sorted(
    df: DataFrame,
    out_dir: str | Path,
    *,
    sort_cols: list[str],
    n_ranges: int = 32,
) -> None:
    """Byte-order-deliverable export: the output parquet files, read in
    file order, replay one global ``sort_cols`` order — WITHOUT a global
    sort. ``repartitionByRange`` samples range boundaries (Spark's
    distributed range partitioner), each task sorts only its range, and
    zero-padded ``range=NNNNN`` directory names make the file order the
    range order for any lexicographic lister.

    This is the documented alternative in SCALING.md's "no global
    sorts" rule: when a consumer genuinely requires totally-ordered
    files (the reference's priority-ordered CSV exports would be the
    case here), range-partition + within-partition sort delivers the
    order at shuffle cost with ``n_ranges``-way parallelism, instead of
    serializing the corpus through one task's sort.
    """
    ranged = df.repartitionByRange(n_ranges, *[F.col(c) for c in sort_cols])
    ranged = ranged.sortWithinPartitions(*sort_cols).withColumn(
        "range", F.format_string("%05d", F.spark_partition_id())
    )
    ranged.write.mode("overwrite").partitionBy("range").parquet(str(out_dir))


def compaction_plan(
    manifest: DataFrame,
    *,
    file_col: str = "file_id",
    size_col: str = "bytes",
    target_bytes: int,
    scope_col: str | None = None,
) -> DataFrame:
    """Small-file compaction planner: assign each input file to an
    output bin by greedy in-order packing — a file starts a new bin
    when the running total crosses a ``target_bytes`` boundary, so
    every bin except possibly the last holds at least ``target_bytes``
    minus one file and files are never split. The read-side cure for
    the small-files problem the sized writers here prevent on the
    write side: feed it a table listing (lots of tiny parquet) files
    and get back which files co-compact into each right-sized output.

    Bin id is ``cum_before div target`` with ``cum_before`` the exact
    BIGINT prefix sum of sizes before this file — deterministic,
    integer-only, and order-stable (files are packed in
    ``(scope, file_id)`` order so the same manifest always yields the
    same plan). Returns the manifest columns plus ``bin`` (0-based,
    per scope).

    Scale shape: the manifest is METADATA (one row per file — bounded
    by file count, not data volume), so the prefix-sum window is
    cheap; with ``scope_col`` (partition directory, date, source) the
    window partitions by scope and packing parallelizes across scopes,
    which is the 100 TB posture — a single global sequential pack is
    exactly what a petabyte-scale table layout can't serialize.
    """
    if target_bytes < 1:
        raise ValueError("compaction_plan: target_bytes must be >= 1")
    scope = [scope_col] if scope_col is not None else []
    w = (
        Window.partitionBy(*scope)
        .orderBy(F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(F.col(size_col).cast("long")).over(w) - F.col(
        size_col
    ).cast("long")
    # BIGINT `div`, never float division: exact at any byte magnitude
    return (
        manifest.withColumn("__cum_before", cum_before)
        .withColumn(
            "bin",
            F.expr(f"__cum_before div {int(target_bytes)}").cast("long"),
        )
        .drop("__cum_before")
    )
