"""Count-min sketch column algebra — shared by the batch query
(``events_cms_heavy_hitters``) and the streaming maintainer
(``streaming.pipeline.run_cms_stream``), so both build bit-identical
cells from one definition.

House hashing style: md5 column algebra (identical in DuckDB) rather
than a native salted sketch aggregate, which is what makes the batch
query oracle-checkable and the streamed state comparable cell-by-cell
to a batch rebuild.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sketch geometry — the DuckDB oracle inlines these; change both or neither.
CMS_W = 256  # counters per depth: over-estimate ≤ e·N/w w.h.p.
CMS_D = 3  # independent hash rows: bound holds w.p. 1 - e^-d


def cms_key(user_col: Column, ts_col: Column) -> Column:
    """(user, day) activity key — the thing whose frequency is sketched."""
    return F.concat(
        user_col.cast("string"), F.lit("@"), F.date_format(ts_col, "yyyy-MM-dd")
    )


def cms_bucket(key: Column, j: Column) -> Column:
    """Depth-j counter index: first 8 md5 hex digits of ``key#j`` mod w."""
    h = F.md5(F.concat(key, F.lit("#"), j.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_W


def cms_cells(events: DataFrame) -> DataFrame:
    """(j, bucket, cell) sketch cells for an event batch — the fixed
    d×w counter table. Build shape: one groupBy over ≤ d·w keys after
    a per-key count, so map-side partials bound the shuffle at
    O(partitions·d·w) regardless of distinct-key count. Cells MERGE by
    sum: cms_cells(A ∪ B) ≡ cellwise-sum(cms_cells(A), cms_cells(B)) —
    the property the streaming log relies on."""
    cnts = (
        events.select(cms_key(F.col("user_id"), F.col("ts")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j")
    return (
        cnts.select("k", "c", js)
        .select("c", "j", cms_bucket(F.col("k"), F.col("j")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.sum("c").cast("long").alias("cell"))
    )
