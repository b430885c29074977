"""Lineage-detach discipline for iterative operators, parameterized for
cluster fault-tolerance postures.

The iterative operators (graph loops, the dedup star closure, the
containment fixpoint, ssjoin's shared token frame, BPE's merge folds)
detach their per-round frames so the plan does not double per round
(2^rounds lineage) and shared frames are not re-derived per consumer.
The house default is ``localCheckpoint``: cheapest (executor-local
storage, no lineage), ideal in local mode and on stable clusters.

At the 100 TB posture the trade matters: **localCheckpoint storage is
non-replicated executor state — one lost executor kills the job with no
recompute path** (the lineage was truncated). Deployments pick the
posture via the session conf ``spark.pyetl.detach.mode`` (or the
``SPARK_GRAFT_DETACH_MODE`` environment variable as a fallback):

- ``local`` (default) — ``df.localCheckpoint(eager=...)``. Fastest;
  executor loss aborts the job (rerun from scratch). The right choice
  for local mode, short loops, and preemption-free clusters.
- ``reliable`` — ``df.checkpoint(eager=...)``. Writes each detach point
  to the fault-tolerant checkpoint dir (``spark.checkpoint.dir`` /
  ``SparkContext.setCheckpointDir`` — required, or Spark raises).
  Survives executor loss at the cost of a distributed-FS round trip per
  detach: the posture for long loops on preemptible fleets.
- ``persist`` — ``df.persist(StorageLevel.MEMORY_AND_DISK)``. Keeps the
  lineage (executor loss triggers recompute of the lost partitions
  only) while still caching each round. The caveat that keeps it from
  being the default: the LOGICAL plan still grows per round, so
  analysis/optimizer time climbs with round count — use for loops with
  few rounds and expensive partitions.

All three modes produce identical RESULTS; the knob trades recovery
semantics against per-round cost, exactly like shuffle-service or
speculative-execution settings. Query semantics never depend on it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DETACH_MODE_CONF = "spark.pyetl.detach.mode"
_VALID = ("local", "reliable", "persist")


def detach_mode(df: DataFrame) -> str:
    """Resolve the detach mode: session conf, then env, then local."""
    try:
        mode = df.sparkSession.conf.get(
            DETACH_MODE_CONF, os.environ.get("SPARK_GRAFT_DETACH_MODE", "local")
        )
    except Exception:  # noqa: BLE001 - conf access locked down
        mode = os.environ.get("SPARK_GRAFT_DETACH_MODE", "local")
    if mode not in _VALID:
        raise ValueError(
            f"{DETACH_MODE_CONF}={mode!r}: expected one of {_VALID}"
        )
    return mode


def detach(df: DataFrame, *, eager: bool = False) -> DataFrame:
    """Detach ``df`` from its lineage per the configured mode.

    ``eager=False`` (the house loop discipline) defers materialization
    to the frame's first action — the convergence count/aggregate that
    every loop already runs — so no extra job is scheduled. ``persist``
    mode is inherently lazy; when a caller genuinely needs eager
    materialization under it, the first consumer provides it.
    """
    mode = detach_mode(df)
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    if mode == "persist":
        from pyspark.storagelevel import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=eager)
