"""Skew mitigation for hot-key joins: deterministic salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only splits *sort-merge* partitions after a shuffle has
already moved the hot key to one task. Salting removes the hotspot
before the shuffle: the fact side spreads each key over ``n_salts``
sub-keys, the dimension side replicates ``n_salts``×, and the join key
becomes (key, salt) — so a key holding 30% of 100 TB lands on
``n_salts`` tasks instead of one.

The salt must be *deterministic* (derived from a stable row id, not
rand()) so retries/speculative tasks agree and results are
reproducible. Replicating the small side costs n_salts× its size —
use for dimension-vs-fact skew, not fact-vs-fact (there, prefer AQE or
isolating the hot keys into a broadcast branch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on ``key``, spread over ``n_salts`` sub-keys.

    ``salt_from`` is a stable fact column (an id) hashed into the salt.
    Output equals the plain join exactly — only the physical key
    distribution changes. Supports ``inner`` and ``left`` only: with
    right/full outer the replicated dim would emit its unmatched rows
    once per salt.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner','left'), got {how!r}: "
            "right/full outer would duplicate unmatched dim rows n_salts×"
        )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return salted_fact.join(replicated_dim, [key, "_salt"], how).drop("_salt")
