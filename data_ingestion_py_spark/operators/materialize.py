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

from contextlib import contextmanager
from typing import Iterator

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

    OWNERSHIP: localCheckpoint blocks are released when the returned
    DataFrame is garbage-collected, but PERSISTED pins are registered
    in the CacheManager and survive until someone unpersists them — the
    caller who passes ``storage_level`` owns calling
    ``df.unpersist()`` once every consumer has materialized (or use
    ``pinned(...)`` below, which scopes the lifetime for you).
    Long-lived sessions that call persisted-pin operators repeatedly
    without releasing will accumulate storage blocks indefinitely.
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


@contextmanager
def pinned(
    df: DataFrame, storage_level: str | None = None
) -> Iterator[DataFrame]:
    """Scoped ``pin``: yields the materialized DataFrame and, for
    persisted pins, unpersists on exit — the leak-proof way to use a
    ``storage_level`` pin when all consumers finish inside one scope::

        with pinned(sigs, "DISK_ONLY") as s:
            out = consumer_a(s).union(consumer_b(s))
            out.write.parquet(path)   # consumers materialize HERE

    Exit before the consumers materialize and they will recompute the
    upstream (persist keeps lineage) — correct but slow; keep the
    action inside the ``with`` block.
    """
    out = pin(df, storage_level)
    try:
        yield out
    finally:
        if storage_level is not None:
            out.unpersist()
