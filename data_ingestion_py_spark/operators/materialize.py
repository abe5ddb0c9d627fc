"""Materialization control for corpus-sized intermediates.

Several operators pin ONE materialization of a multiply-consumed
intermediate (MinHash signatures, the range-shuffled input of a global
rank): by default an eager ``localCheckpoint`` — blocks on executor
local storage, lineage truncated, automatically released when the
DataFrame is garbage-collected.

That default is right for the bench/test posture but has two 100 TB
caveats (VERDICT r4):

- checkpoint blocks are UNREPLICATED and lineage is gone — losing an
  executor that holds blocks fails the job with no recompute path
  (acute on preemptible/spot fleets);
- corpus-sized blocks pin executor storage memory for the consumer's
  lifetime.

``pin(df, storage_level=...)`` is the swap the operator docstrings
promise: pass ``"DISK_ONLY"`` (or any ``pyspark.StorageLevel`` name,
e.g. ``"MEMORY_AND_DISK"``, ``"DISK_ONLY_2"`` for replicated blocks)
to persist-with-lineage instead — blocks spill to disk, survive with a
recompute path, and replication is available. The default (``None``)
keeps the localCheckpoint behavior.

Note for range-partitioned inputs (``ranking.with_global_rank``):
persist keeps lineage, so a lost block CAN recompute — but
``repartitionByRange`` re-samples boundaries on recompute, so under
block loss the recomputed partition ids may disagree with already-
computed offsets. ``DISK_ONLY_2`` (replicated) is the deployment
answer where that matters; single-block loss then needs both replicas
gone before recompute risk appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def pin(df: DataFrame, storage_level: str | None = None) -> DataFrame:
    """Materialize ``df`` once, now, and return a DataFrame whose
    consumers all read the materialized blocks.

    ``storage_level=None`` → eager ``localCheckpoint`` (default).
    Otherwise a ``StorageLevel`` attribute name, e.g. ``"DISK_ONLY"``:
    persist at that level and force materialization eagerly (the eager
    part matters — a lazy persist lets N consumer branches race and
    recompute the upstream N times before blocks land).
    """
    if storage_level is None:
        return df.localCheckpoint(eager=True)
    try:
        level = getattr(StorageLevel, storage_level)
    except AttributeError as exc:
        raise ValueError(
            f"unknown storage level {storage_level!r}; use a "
            "pyspark.StorageLevel attribute name like 'DISK_ONLY'"
        ) from exc
    df = df.persist(level)
    df.count()
    return df
