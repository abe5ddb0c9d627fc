"""Durable IVF similarity index — ANN corpus state AT REST.

``operators/band_index.py`` gives near-dedup its at-rest form (band
rows as partitioned parquet, probes pruning partition dirs); THIS
module is the same move for similarity search. ``similarity.ivf_topk``
computes clusters per query — right for one-shot analytics, wrong for
a serving corpus at 100 TB, where the index must be built once,
appended forever, and probed by reading only the probed clusters'
bytes. Layout:

- ``centroids/`` — k rows (cid, cvec), the coarse quantizer. Trained
  ONCE on the first ingested batch with the deterministic integer
  k-means (``operators/kmeans.kmeans_integer``) and frozen thereafter
  — the standard IVF lifecycle (train once, assign forever; periodic
  retrain = build a NEW index and swap the table pointer, exactly the
  compaction pattern). cvec components are in kmeans' integer
  micro-units, so assignment replays bit-identically across process
  lifetimes.
- ``vectors/`` — (vec_id, embedding) partitioned by ``ingest_batch``
  then ``cid``. The cid partition column is what makes a probe cheap:
  the scan filters ``cid IN (<nprobe ids>)`` and Spark prunes every
  other cluster's partition DIRECTORIES (``PartitionFilters``, pinned
  by ``tests/test_ivf_index.py``) — a query touches ~nprobe/k of the
  corpus bytes no matter how big the corpus grows. Written LAST per
  batch so its top-level batch directory doubles as the batch's
  COMMIT MARKER (same crash/idempotency contract as band_index:
  ``has_batch`` = marker exists, re-delivered batches no-op).
- ``meta/`` — one row (k, n_train_iter); re-opening restores the
  parameters so a restarted job cannot silently mis-assign.

Assignment of every batch (including the first, re-assigned after
training) goes through the SAME exact-integer argmin as the trainer
(``kmeans._assign``: squared-L2 on micro-quantized components, ties to
the lower cid), so "which cluster does this vector live in" has one
answer everywhere — trainer, appender, test oracle.

Reference contrast: egorji/data_ingestion.py stubs vector search
entirely (``data_ingestion.py:283-289`` — a FAISS import that is never
used); this is the piece that serves it from parquet at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_ingestion_py_spark.operators.band_index import _fs_exists
from data_ingestion_py_spark.operators.kmeans import (
    SCALE,
    _assign,
    _centroid_array,
    kmeans_integer,
)
from data_ingestion_py_spark.operators.similarity import (
    _to_double,
    dot,
    l2_norm,
)


def _quantized(vectors: DataFrame, vec_col: str) -> DataFrame:
    """(vec_id, v) with components floor-quantized to kmeans' integer
    micro-units — the shared metric space of trainer and appender."""
    return vectors.select(
        "vec_id",
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * SCALE)
            .cast("long")
            .cast("double"),
        ).alias("v"),
    )


class IvfIndex:
    """Handle on a durable IVF index rooted at ``path``.

    Open an existing index (parameters restored from ``meta/``) or lay
    one down with the first ``append_batch`` (which trains the coarse
    quantizer on that batch).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 8,
        n_train_iter: int = 3,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.k, self.n_train_iter = k, n_train_iter
        if _fs_exists(spark, self._meta_path):
            m = spark.read.parquet(self._meta_path).first()
            self.k, self.n_train_iter = m.k, m.n_train_iter

    # -- layout ----------------------------------------------------------
    @property
    def _centroids_path(self) -> str:
        return f"{self.path}/centroids"

    @property
    def _vectors_path(self) -> str:
        return f"{self.path}/vectors"

    @property
    def _meta_path(self) -> str:
        return f"{self.path}/meta"

    # -- state inspection ------------------------------------------------
    def is_empty(self) -> bool:
        return not _fs_exists(self.spark, self._vectors_path)

    def has_batch(self, batch_id: int) -> bool:
        """True iff ``batch_id``'s vectors commit marker exists — the
        restart-safe re-delivery guard."""
        return _fs_exists(
            self.spark, f"{self._vectors_path}/ingest_batch={batch_id}"
        )

    def committed_batches(self) -> list[int]:
        if self.is_empty():
            return []
        return sorted(
            r.ingest_batch
            for r in self.vectors()
            .select("ingest_batch")
            .distinct()
            .collect()
        )

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self._centroids_path)

    def vectors(self) -> DataFrame:
        return self.spark.read.parquet(self._vectors_path)

    # -- writes ----------------------------------------------------------
    def append_batch(
        self, vectors: DataFrame, batch_id: int, vec_col: str = "embedding"
    ) -> None:
        """Admit a batch of (vec_id, embedding) rows. First batch ever:
        train the coarse quantizer on it (deterministic integer
        k-means), persist centroids, then assign + write. Later
        batches assign against the FROZEN centroids. Centroids and
        meta land before any vectors, vectors land last (commit
        marker) — a crash in between leaves a trained-but-empty index
        that the re-delivered batch completes idempotently."""
        vecs = vectors.select("vec_id", vec_col)
        if not _fs_exists(self.spark, self._centroids_path):
            assigned = kmeans_integer(
                vecs, k=self.k, n_iter=self.n_train_iter, vec_col=vec_col
            )
            vq = _quantized(vecs, vec_col)
            n = F.count(F.lit(1))
            s = F.sum("val").cast("long")
            cents = (
                vq.join(assigned, "vec_id")
                .select("cid", F.posexplode("v").alias("pos", "val"))
                .groupBy("cid", "pos")
                .agg(
                    ((s - F.pmod(s, n)) / n)
                    .cast("long")
                    .cast("double")
                    .alias("m")
                )
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "m"))),
                        lambda st: st["m"],
                    ).alias("cvec")
                )
            )
            if not _fs_exists(self.spark, self._meta_path):
                self.spark.createDataFrame(
                    [(self.k, self.n_train_iter)], "k int, n_train_iter int"
                ).write.mode("overwrite").parquet(self._meta_path)
            cents.write.mode("overwrite").parquet(self._centroids_path)
        assigned = _assign(
            _quantized(vecs, vec_col), _centroid_array(self.centroids())
        ).select("vec_id", "cid")
        (
            vecs.join(assigned, "vec_id")
            .select("vec_id", F.col(vec_col).alias("embedding"), "cid")
            .withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("ingest_batch", "cid")
            .parquet(self._vectors_path)
        )

    # -- probe -----------------------------------------------------------
    def probe_clusters(
        self, query_vec: list[float], nprobe: int
    ) -> list[int]:
        """The nprobe nearest centroid ids for a query vector —
        computed DRIVER-side over the collected k-row centroid table
        (bounded: k rows regardless of corpus size, the same class of
        driver collect as band_index's bucket list). Exact integer
        squared-L2 in the quantized space, ties to the lower cid —
        identical to the assignment metric."""
        import math

        # floor() to mirror the column-side quantization exactly
        # (int() truncates toward zero and diverges on negatives)
        qq = [math.floor(float(x) * SCALE) for x in query_vec]
        scored = []
        for r in self.centroids().collect():
            cv = [int(c) for c in r.cvec]
            d2 = sum((a - b) * (a - b) for a, b in zip(qq, cv))
            scored.append((d2, r.cid))
        scored.sort()
        return [cid for _, cid in scored[:nprobe]]

    def probe(
        self, query_vec: list[float], k: int = 10, nprobe: int = 2
    ) -> DataFrame:
        """(vec_id, cid, cosine_sim) exact-cosine top-k within the
        nprobe probed clusters. The vectors scan carries
        ``cid IN (...)`` on the PARTITION column, so every other
        cluster's directories prune at planning time — probe bytes are
        ~nprobe/k of the corpus at any size."""
        pr = self.probe_clusters(query_vec, nprobe)
        qlit = F.array(*[F.lit(float(x)) for x in query_vec])
        vec = _to_double(F.col("embedding"))
        sim = dot(vec, qlit) / (l2_norm(vec) * l2_norm(qlit))
        return (
            self.vectors()
            .where(F.col("cid").isin(pr))
            .select("vec_id", "cid", F.round(sim, 6).alias("cosine_sim"))
            .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
            .limit(k)
        )

    # -- maintenance -----------------------------------------------------
    def compacted(self, new_path: str) -> "IvfIndex":
        """Rewrite as a consolidated snapshot at ``new_path`` (same
        frozen centroids, all vectors under the MAX committed batch id,
        one file set per cluster) and return a handle. Streaming
        appends fragment vectors/ into one file set per batch per
        cluster; probe cost at scale is file-count-bound, so the
        maintenance pattern is compact-to-new-path + atomic pointer
        swap — never rewrite in place. ``has_batch`` stays true for
        the only batch a restarted stream can re-deliver (the last)."""
        batches = self.committed_batches()
        if not batches:
            raise ValueError("cannot compact an empty index")
        hi = batches[-1]
        out = IvfIndex(self.spark, new_path, self.k, self.n_train_iter)
        self.spark.createDataFrame(
            [(self.k, self.n_train_iter)], "k int, n_train_iter int"
        ).write.mode("overwrite").parquet(out._meta_path)
        self.centroids().write.mode("overwrite").parquet(
            out._centroids_path
        )
        (
            self.vectors()
            .select("vec_id", "embedding", "cid")
            .withColumn("ingest_batch", F.lit(hi))
            .repartition("cid")
            .write.mode("overwrite")
            .partitionBy("ingest_batch", "cid")
            .parquet(out._vectors_path)
        )
        return out
