"""Email/mailing sink connector.

The reference's whole purpose is producing *mailing* files — per-agent CSV
batches and dialer feeds. This connector closes the loop: render each
output row into a ready-to-send message (template + row columns, pure
column algebra → distributed), then deliver through a transport.

Transports:
- ``OutboxFileTransport`` (default) — writes the rendered messages as an
  outbox (JSONL via the native distributed writer, or one .eml per row
  for small batches). Deterministic, offline, testable.
- SMTP delivery is deliberately NOT implemented here: an executor-side
  network transport needs credentials/rate-limit/retry policy owned by
  deployment. ``SmtpTransport.send`` raises ``NotImplementedError`` with
  the integration contract documented.

Scale: rendering is row-local column algebra (no shuffle); writes go
through the normal distributed sink. One message per row, any row count.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PLACEHOLDER = re.compile(r"\{([A-Za-z0-9_]+)\}")


def render_template(template: str, df: DataFrame) -> Column:
    """Compile ``"Olá {NOME_CLIENTE}, débito {valorDivida}"`` into a
    ``concat`` of literals and (null-safe) column refs — stays in
    whole-stage codegen, no UDF."""
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        if name not in df.columns:
            raise KeyError(f"template references missing column {name!r}")
        parts.append(F.coalesce(F.col(name).cast("string"), F.lit("")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def render_emails(
    df: DataFrame,
    *,
    to_col: str,
    subject_template: str,
    body_template: str,
    from_addr: str = "noreply@example.invalid",
) -> DataFrame:
    """Render one message per row: ``(to, from, subject, body)``."""
    return df.select(
        F.col(to_col).cast("string").alias("to"),
        F.lit(from_addr).alias("from"),
        render_template(subject_template, df).alias("subject"),
        render_template(body_template, df).alias("body"),
    ).filter(F.col("to").isNotNull() & (F.trim(F.col("to")) != ""))


class OutboxFileTransport:
    """Deliver rendered messages to an on-disk outbox.

    ``deliver`` uses the distributed JSON writer (any scale);
    ``deliver_eml`` writes one RFC822-ish file per message via
    ``foreachPartition`` — each executor task writes its own partition's
    files (``msg_p{partition}_{index}.eml``), so no message frame is ever
    collected to the driver and a 100k+-recipient mailing parallelizes
    across the cluster. Requires ``outbox_dir`` on shared storage in a
    real deployment (executors write directly).
    """

    def __init__(self, outbox_dir: str | Path) -> None:
        self.outbox_dir = Path(outbox_dir)

    def deliver(self, messages: DataFrame) -> str:
        path = str(self.outbox_dir / "outbox.jsonl")
        messages.write.mode("overwrite").json(path)
        return path

    def deliver_eml(self, messages: DataFrame) -> list[Path]:
        out_dir = self.outbox_dir
        out_dir.mkdir(parents=True, exist_ok=True)
        # Overwrite semantics, like deliver()'s mode("overwrite"): clear
        # prior .eml files first, so the returned glob lists exactly THIS
        # delivery — a re-delivery with fewer partitions must not report
        # the previous run's leftover per-partition files as delivered.
        for stale in out_dir.glob("msg_p*.eml"):
            stale.unlink()

        def _write_partition(rows) -> None:
            # Executor-side: partition id + within-partition index give a
            # collision-free, restart-stable name without any driver
            # coordination (same idea as Spark's own part-file naming).
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            for i, row in enumerate(rows):
                p = Path(out_dir) / f"msg_p{pid:05d}_{i:06d}.eml"
                p.write_text(
                    f"From: {row['from']}\nTo: {row['to']}\n"
                    f"Subject: {row['subject']}\n\n{row['body']}\n",
                    encoding="utf-8",
                )

        messages.foreachPartition(_write_partition)
        return sorted(out_dir.glob("msg_p*.eml"))


class SmtpTransport:
    """Placeholder for deployment SMTP delivery.

    Contract: ``send(messages)`` consumes the same ``(to, from, subject,
    body)`` frame, batching per-partition connections with
    ``foreachPartition``; credentials, TLS, rate limiting, and retry
    policy are deployment concerns — not implemented in this offline
    environment.
    """

    def send(self, messages: DataFrame) -> None:  # pragma: no cover
        raise NotImplementedError(
            "SMTP delivery requires deployment credentials/network; use "
            "OutboxFileTransport here"
        )
