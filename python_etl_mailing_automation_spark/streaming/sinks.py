"""Exactly-once streaming sinks via ``foreachBatch``.

Structured Streaming guarantees at-least-once delivery of micro-batches
to ``foreachBatch`` after a restart: a batch whose side effects were
written but whose checkpoint offset commit did not land is REPLAYED with
the SAME ``batch_id``. The sink below makes the replay harmless the
standard way — the write is keyed by ``batch_id`` (one partition
directory per batch, overwritten idempotently), so re-running a batch
replaces its own output instead of duplicating it. This is the
documented Spark pattern for exactly-once file/table sinks on top of
at-least-once semantics.

Scale posture: each micro-batch writes only its own rows; the ledger of
completed batch ids is the directory listing itself (no driver state),
and downstream batch readers see a plain partitioned table.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_sink(out_dir: str | Path):
    """Build a ``foreachBatch`` function writing each micro-batch to
    ``out_dir/batch_id=N/`` with dynamic partition overwrite: a replayed
    batch id overwrites exactly its own directory — duplicates cannot
    survive a restart.

    Usage::

        q = (df.writeStream
               .foreachBatch(idempotent_parquet_sink("/data/out"))
               .option("checkpointLocation", ckpt)
               .start())
    """
    out = str(out_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    return write_batch
