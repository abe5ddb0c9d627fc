"""Similarity search over embedding columns (array<float>, dim 64).

Implements the capability the reference declares but stubs out — the
FAISS vector index over active snippets (README.md:3, commented stubs
at data_ingestion.py:283-289) — Spark-first:

- brute-force cosine top-k: broadcast the query vector, one narrow map
  computing the dot product in JVM column algebra (zip_with/aggregate),
  TakeOrderedAndProject for the top-k. Exact; O(corpus) per query —
  the correct baseline and oracle-checkable (DuckDB list_dot_product).
- LSH-bucketed ANN (random hyperplanes): deterministic md5-derived
  hyperplanes → sign bits → bucket key; candidates = same bucket (or
  Hamming-adjacent probes). Turns per-query cost into per-bucket cost:
  the 100 TB scale path. Recall vs brute force is property-tested
  (tests/test_similarity.py) rather than oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def _to_double(vec) -> F.Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    """Σ a_i·b_i via zip_with + aggregate (sequential fold — matches the
    DuckDB list_dot_product order; both sides round after)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one stored vector.

    The query row is a broadcast nested-loop join of a 1-row dim —
    exactly the "broadcast the tiny side" pattern; the corpus scan
    stays a single narrow stage.
    """
    q = (
        embeddings.where(F.col("vec_id") == query_vec_id)
        .select(_to_double(F.col(vec_col)).alias("qvec"))
    )
    corpus = embeddings.select(
        "vec_id", "label", _to_double(F.col(vec_col)).alias("vec")
    )
    sim = dot(F.col("vec"), F.col("qvec")) / (
        l2_norm(F.col("vec")) * l2_norm(F.col("qvec"))
    )
    return (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch k-NN join: the top-k corpus neighbors for EVERY query row
    (retrieval-eval / RAG-candidate generation — ``cosine_topk`` is the
    nq=1 special case). Returns (query_id, vec_id, label, cosine_sim,
    rank), rank 1..k per query.

    Scale shape: the query set broadcasts (nq vectors — eval sets are
    small by construction); the corpus stays ONE narrow scan stage
    computing all nq similarities per row. The per-query top-k is a
    single partitioned window — which Catalyst executes as the
    two-phase algorithm via ``WindowGroupLimit``: a PARTIAL group
    limit per input partition keeps ≤k rows per query BEFORE the
    exchange, so the only shuffle moves nq·P·k survivors, never the
    scored corpus (pinned by ``test_plans.py``). Ties break by vec_id
    on the ROUNDED similarity so the oracle replays exactly.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(query_id), _to_double(F.col(vec_col)).alias("qvec")
    )
    c = corpus.select(
        "vec_id", "label", _to_double(F.col(vec_col)).alias("vec")
    )
    sim = dot(F.col("vec"), F.col("qvec")) / (
        l2_norm(F.col("vec")) * l2_norm(F.col("qvec"))
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id,
        "vec_id",
        "label",
        F.round(sim, 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    cluster_col: str = "label",
    vec_col: str = "vec",
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: exact pairwise cosine
    WITHIN each semantic cluster only. Returns (cluster, vec_a, vec_b,
    cosine_sim) for pairs ≥ threshold, vec_a < vec_b.

    This is the cluster-bounded alternative to hash-banded LSH
    (``embedding_near_duplicates``): instead of bit-collision buckets,
    the candidate set is "same k-means cluster" — which is exactly how
    SemDeDup (Abbas et al. 2023) and the DataComp pipelines bound the
    O(n²) comparison. Cost is Σ_c |c|² — with balanced clustering,
    (n/k)²·k, tunable via k; the shuffle is one exchange on the cluster
    id. Here the fixture's ``label`` column stands in for the k-means
    assignment (same convention as ``ivf_topk``); production wires a
    k-means pass (or ``label_centroids`` re-assignment) upstream.
    """
    a = corpus.select(
        F.col(cluster_col).alias("cluster"),
        F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("_va"),
    )
    b = corpus.select(
        F.col(cluster_col).alias("cluster"),
        F.col("vec_id").alias("vec_b"),
        F.col(vec_col).alias("_vb"),
    )
    sim = dot(F.col("_va"), F.col("_vb")) / (
        l2_norm(F.col("_va")) * l2_norm(F.col("_vb"))
    )
    return (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "cluster",
            "vec_a",
            "vec_b",
            F.round(sim, 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def hyperplane_bits(vec, n_planes: int, dim: int) -> F.Column:
    """Deterministic random-hyperplane sign bits.

    Hyperplane p's component i = (md5-derived value in [-1, 1]); the
    whole construction is pure column algebra so the same planes can be
    recomputed anywhere (no driver-side randomness, resumable at scale).
    """
    def plane_components(p: int) -> F.Column:
        # Components are md5-derived constants of (p, i) only — compute
        # them ONCE driver-side (hashlib md5 == engine md5, and the
        # int→double / 127.5 − 1.0 arithmetic is the same IEEE ops, so
        # the values are bit-identical to the oracle's in-SQL
        # recomputation) and inline as a literal array. The previous
        # in-engine form re-evaluated dim md5 calls per plane PER ROW:
        # higher-order-function lambdas aren't constant-folded.
        import hashlib

        def comp(i: int) -> float:
            h = hashlib.md5(f"hp{p}:{i}".encode()).hexdigest()
            return (int(h[0], 16) * 16 + int(h[1], 16)) / 127.5 - 1.0

        return F.array(*[F.lit(comp(i)) for i in range(dim)])

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, plane_components(p), lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    key = None
    for i, b in enumerate(bits):
        term = b * F.lit(1 << i)
        key = term if key is None else key + term
    return key.cast("int")


def label_centroids(corpus: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Element-wise mean vector per cluster label → (label, cv).

    posexplode → groupBy(label, pos) → avg → reassemble ordered by pos.
    Centroid table size is k×dim regardless of corpus size — always
    broadcastable. In production the labels come from a k-means pass;
    the fixture's labels stand in for that assignment.
    """
    pe = corpus.select("label", F.posexplode(vec_col).alias("pos", "val"))
    cent = pe.groupBy("label", "pos").agg(F.avg("val").alias("m"))
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("cv")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: probe the nprobe nearest centroids, exact-rerank
    only inside those clusters.

    The 100 TB shape: partition the corpus by cluster id at rest; a
    query scans nprobe/k of the data (here 2/10), the centroid table
    broadcasts, and the final top-k is TakeOrderedAndProject. Recall
    follows IVF semantics — exact for vectors whose cluster is probed.
    """
    base = embeddings.select(
        "vec_id", "label", _to_double(F.col(vec_col)).alias("vec")
    )
    q = base.where(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec")
    )
    cent_sim = dot(F.col("cv"), F.col("qvec")) / (
        l2_norm(F.col("cv")) * l2_norm(F.col("qvec"))
    )
    probed = (
        label_centroids(base)
        .crossJoin(F.broadcast(q))
        .select("label", cent_sim.alias("csim"))
        .orderBy(F.desc("csim"), F.asc("label"))
        .limit(nprobe)
        .select("label")
    )
    sim = dot(F.col("vec"), F.col("qvec")) / (
        l2_norm(F.col("vec")) * l2_norm(F.col("qvec"))
    )
    return (
        base.join(F.broadcast(probed), "label")
        .crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


def active_snippet_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    status_col: str = "document_status",
    vec_col: str = "embedding",
) -> DataFrame:
    """Similarity search over ACTIVE snippets — the reference's declared
    FAISS capability end-to-end (README.md:3 "active snippets ... used
    by a similarity search"; stubs data_ingestion.py:283-289 — the whole
    reason the Active/Expired status lifecycle exists).

    Returns the snippets of the k most-similar *active* documents, each
    snippet carrying its document's cosine score:
    (id_col, snippet_id, snippet_text, cosine_sim).

    Scale shape: status filter → hash join docs⋈embeddings on id →
    broadcast 1-row query vec → TakeOrdered k — and only THEN
    snippetize, so the windowing algebra runs over k rows, not the
    corpus. Expired documents are pruned at the scan (predicate
    pushdown), exactly how the reference's index rebuild would skip
    them.
    """
    from data_ingestion_py_spark.operators.snippetize import snippetize

    base = embeddings.select(
        F.col("vec_id"), _to_double(F.col(vec_col)).alias("vec")
    )
    q = base.where(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec")
    )
    active = docs.where(F.col(status_col) == "Active").select(id_col, text_col)
    sim = dot(F.col("vec"), F.col("qvec")) / (
        l2_norm(F.col("vec")) * l2_norm(F.col("qvec"))
    )
    top_docs = (
        active.join(base, active[id_col] == base["vec_id"])
        .crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_vec_id)
        .select(id_col, text_col, F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )
    return snippetize(
        top_docs, text_col=text_col, id_cols=(id_col,), carry_cols=("cosine_sim",)
    ).select(id_col, "snippet_id", "snippet_text", "cosine_sim")


def sign_band_keys(vec, bands: int, rows: int) -> F.Column:
    """Axis-aligned hyperplane LSH band keys: bit i = (vec[i] >= 0),
    band b packs bits [b*rows, (b+1)*rows) into one int.

    Deterministic and pure column algebra (codegen-friendly, oracle-
    reproducible). bands*rows sign bits are consumed from the front of
    the vector; for dim-64 embeddings 8x8 uses every component.
    """
    keys = []
    for b in range(bands):
        key = None
        for i in range(rows):
            bit = (
                F.when(vec.getItem(b * rows + i) >= 0, F.lit(1 << i))
                .otherwise(F.lit(0))
            )
            key = bit if key is None else key + bit
        keys.append(key.cast("int"))
    return F.array(*keys)


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.9,
    bands: int = 8,
    rows: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Embedding-cosine near-dedup: banded sign-bit LSH candidates +
    exact cosine verify. Returns (vec_a, vec_b, cosine_sim >= threshold).

    Scale shape (the reason this isn't a crossJoin): the only wide ops
    are a shuffle on (band, band_key) for the candidate self-join and
    hash-joins at *candidate* cardinality for the verify — cost tracks
    collisions, not corpus². Two vectors whose signs agree on all rows
    of ≥1 band collide; near-identical vectors differ in few sign bits,
    so with bands*rows = dim a near-dup pair can only be missed if
    flipped bits land in every band. At 100 TB: raise `rows` to keep
    buckets small, pre-partition the corpus by band key, and persist
    `corpus` so the three references don't rescan.

    Capability the reference declares but stubs (FAISS index,
    README.md:3, data_ingestion.py:283-289) — recast as set-based dedup.
    """
    # the plan references corpus 3× (banding + both verify sides);
    # without this the whole upstream pipeline runs three times. At
    # 100 TB use StorageLevel.DISK_ONLY or a materialized table.
    # NOTE(r15): a spread_for_kernel rebalance here was A/B-measured
    # and REVERTED (1.27–1.58 s without vs 1.53–2.73 s with at sf0.1):
    # the extra exchange + lazily-cached shuffle output cost more than
    # the banding projections it parallelized at candidate-bounded
    # sizes; a 100 TB corpus arrives multi-file (already spread).
    corpus = corpus.persist()
    banded = corpus.select(
        id_col,
        F.posexplode(sign_band_keys(F.col(vec_col), bands, rows)).alias(
            "band", "band_key"
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    sim = dot(F.col("va"), F.col("vb")) / (
        l2_norm(F.col("va")) * l2_norm(F.col("vb"))
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def lsh_bucketed_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via random-hyperplane LSH: exact rerank inside the query's
    bucket only. At 100 TB, bucket the corpus ONCE (write partitioned by
    bucket) and each query touches ~corpus/2^n_planes rows."""
    with_bucket = embeddings.select(
        "vec_id",
        "label",
        _to_double(F.col(vec_col)).alias("vec"),
    ).withColumn("bucket", hyperplane_bits(F.col("vec"), n_planes, dim))
    q = with_bucket.where(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    sim = dot(F.col("vec"), F.col("qvec")) / (
        l2_norm(F.col("vec")) * l2_norm(F.col("qvec"))
    )
    return (
        with_bucket.join(
            F.broadcast(q), F.col("bucket") == F.col("qbucket"), "inner"
        )
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    m_sub: int = 8,
    n_cent: int = 16,
    shortlist: int = 50,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN: encode each vector as ``m_sub`` byte
    codes (nearest codebook centroid per subspace), score candidates
    with an ADC (asymmetric distance computation) lookup table, exact-
    rerank only the shortlist.

    This is the memory-side complement to IVF: at 100 TB the corpus is
    stored as codes (m_sub bytes/vector instead of dim*4), the per-query
    cost is one broadcast of an (m_sub × n_cent) distance table and a
    code-table scan, and the full-precision vectors are touched only
    for ``shortlist`` rows. The codebook here is deterministic (the
    subvectors of vec_id < n_cent) so the DuckDB oracle reproduces it
    exactly; production swaps in k-means-trained centroids — every
    plan property is identical.

    Distances use the dot-product identity ||a-b||² = a·a − 2a·b + b·b
    (sequential folds matching DuckDB's list_dot_product); argmin ties
    break on centroid id via row_number, never engine-dependent.
    """
    from pyspark.sql.window import Window

    sub_d = dim // m_sub
    base = embeddings.select(
        "vec_id", "label", _to_double(F.col(vec_col)).alias("vec")
    )
    subs = base.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(m_sub - 1))).alias("m"),
        F.col("vec"),
    ).select(
        "vec_id",
        "m",
        F.slice(F.col("vec"), F.col("m") * sub_d + 1, sub_d).alias("sv"),
    )
    codebook = subs.where(F.col("vec_id") < n_cent).select(
        F.col("vec_id").cast("int").alias("c"), "m", F.col("sv").alias("cv")
    )
    d2 = (
        dot(F.col("sv"), F.col("sv"))
        - 2 * dot(F.col("sv"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "c")
    codes = (
        subs.join(F.broadcast(codebook), "m")
        .select("vec_id", "m", "c", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "m", F.col("c").alias("code"))
    )
    qtable = (
        subs.where(F.col("vec_id") == query_vec_id)
        .join(F.broadcast(codebook), "m")
        .select("m", "c", d2.alias("qd2"))
    )
    adc = (
        codes.join(
            F.broadcast(qtable),
            (codes["m"] == qtable["m"]) & (codes["code"] == qtable["c"]),
        )
        .select("vec_id", codes["m"].alias("m"), "qd2")
        .groupBy("vec_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "qd2"))),
                    lambda s: s["qd2"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("approx_d2")
        )
    )
    short = (
        adc.where(F.col("vec_id") != query_vec_id)
        .orderBy(F.asc("approx_d2"), F.asc("vec_id"))
        .limit(shortlist)
    )
    q = base.where(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec")
    )
    sim = dot(F.col("vec"), F.col("qvec")) / (
        l2_norm(F.col("vec")) * l2_norm(F.col("qvec"))
    )
    return (
        base.join(short.select("vec_id", "approx_d2"), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(F.col("approx_d2"), 6).alias("approx_d2"),
            F.round(sim, 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


def mmr_diversify(
    embeddings: DataFrame,
    query_vec_id: int,
    m: int = 10,
    k: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998): from the exact cosine top-``m`` shortlist, greedily pick
    ``k`` results trading relevance against redundancy,

        pick_i = argmax_c [ λ·sim(q,c) − (1−λ)·max_{s∈picked} sim(c,s) ]

    with λ = 0.7 — the diversity-aware sampler a curation pipeline
    uses to avoid returning k near-copies (the same reason SemDeDup
    exists, applied at retrieval time).

    Determinism contract: similarities are quantized to integer
    micro-units up front, and the MMR objective is evaluated in pure
    integer arithmetic (score×10 = 7·rel − 3·maxsim), ties broken on
    vec_id — so the greedy trace replays bit-identically in the DuckDB
    oracle as k unrolled CTEs (same pattern as operators/kmeans.py).

    Shape at scale: stage 1 is the corpus-wide exact top-m
    (broadcast 1-row query vector → narrow map → TakeOrdered) — the
    only corpus-proportional work. Everything after runs on the m-row
    shortlist: an m×m pairwise-sim broadcast join and k unrolled
    argmax-over-m steps, all tiny-side broadcasts; cost is O(m²+k·m)
    regardless of corpus size. No driver collect — the greedy loop
    unrolls into the plan, not into Python data.
    """
    base = embeddings.select(
        "vec_id", _to_double(F.col(vec_col)).alias("v")
    )
    q = base.where(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qvec")
    )
    rel = dot(F.col("v"), F.col("qvec")) / (
        l2_norm(F.col("v")) * l2_norm(F.col("qvec"))
    )
    cand = (
        base.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            F.round(rel * 1000000.0).cast("long").alias("rel_micro"),
        )
        .orderBy(F.desc("rel_micro"), F.asc("vec_id"))
        .limit(m)
    )
    a = cand.select(
        F.col("vec_id").alias("ai"), F.col("v").alias("va")
    )
    b = cand.select(
        F.col("vec_id").alias("bi"), F.col("v").alias("vb")
    )
    psim = dot(F.col("va"), F.col("vb")) / (
        l2_norm(F.col("va")) * l2_norm(F.col("vb"))
    )
    pairs = (
        a.join(F.broadcast(b), F.col("ai") != F.col("bi"))
        .select(
            "ai",
            "bi",
            F.round(psim * 1000000.0).cast("long").alias("s_micro"),
        )
    )
    selected = (
        cand.orderBy(F.desc("rel_micro"), F.asc("vec_id"))
        .limit(1)
        .select("vec_id", "rel_micro", F.lit(1).alias("pick_order"))
    )
    for i in range(2, k + 1):
        remaining = cand.join(
            F.broadcast(selected.select("vec_id")), "vec_id", "left_anti"
        )
        scored = (
            remaining.join(
                F.broadcast(pairs), remaining["vec_id"] == pairs["ai"]
            )
            .join(
                F.broadcast(
                    selected.select(F.col("vec_id").alias("bi"))
                ),
                "bi",
            )
            .groupBy(remaining["vec_id"], "rel_micro")
            .agg(F.max("s_micro").alias("ms_micro"))
            .select(
                "vec_id",
                "rel_micro",
                (7 * F.col("rel_micro") - 3 * F.col("ms_micro")).alias(
                    "score_x10"
                ),
            )
        )
        pick = (
            scored.orderBy(F.desc("score_x10"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", "rel_micro", F.lit(i).alias("pick_order"))
        )
        selected = selected.unionByName(pick)
    return selected.select(
        F.col("pick_order").cast("int").alias("pick_order"),
        "vec_id",
        "rel_micro",
    )


RP_SEED_PREFIX = "rp"


def _jl_project_sums(
    df: DataFrame, d_in: int, d_out: int, normalize: bool
) -> DataFrame:
    """(vec_id, v: array<double>) → (vec_id, s: array<double>): the raw
    Johnson-Lindenstrauss fold sums ``s_j = Σ_i x_i·sign(j,i)`` (x = v
    L2-normalized first when ``normalize``), computed batch-wise in
    numpy inside ONE Arrow stage instead of d_out interpreted
    zip_with/aggregate folds per row (guide §4.2 — higher-order
    functions don't codegen, so the d_out×d_in fan-out was an
    interpreted per-row loop; r16).

    BIT-IDENTICAL to the Catalyst expressions it replaces: the
    accumulation is an explicit index-sequential vector fold
    (``acc = acc + x_i·sign_i``, the same IEEE-754 add order as
    ``aggregate()``'s left fold with 0.0 init), the normalization
    divides each element by ``sqrt(left-fold Σx_i²)`` exactly as
    ``l2_norm``, and the scale/round/cast stay in the JVM caller, so
    the DuckDB oracle replay is value-unchanged (pinned by the parity
    test in tests/test_similarity.py). Rows whose vector is NULL or not
    exactly ``d_in`` long yield all-NULL sums — zip_with's null-padding
    would null every component for such rows too."""
    import numpy as np
    import pandas as pd

    signs = np.array(
        [[float(rp_sign(j, i)) for i in range(d_in)] for j in range(d_out)],
        dtype=np.float64,
    )

    def _go(batches):
        for pdf in batches:
            n = len(pdf)
            vecs = list(pdf["v"])
            ok = np.fromiter(
                (v is not None and len(v) == d_in for v in vecs),
                dtype=bool,
                count=n,
            )
            out: list = [None] * n
            if ok.any():
                X = np.stack(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v, o in zip(vecs, ok)
                        if o
                    ]
                )
                if normalize:
                    acc = np.zeros(len(X), dtype=np.float64)
                    for i in range(d_in):
                        acc = acc + X[:, i] * X[:, i]
                    X = X / np.sqrt(acc)[:, None]
                s = np.zeros((len(X), d_out), dtype=np.float64)
                for i in range(d_in):
                    s = s + X[:, i, None] * signs[None, :, i]
                rows = iter(s)
                for idx in np.flatnonzero(ok):
                    out[idx] = next(rows)
            for idx in np.flatnonzero(~ok):
                out[idx] = [None] * d_out
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "s": out})

    return df.mapInPandas(_go, "vec_id bigint, s array<double>")


def rp_sign(j: int, i: int) -> int:
    """±1 Rademacher entry (j,i) of the random projection matrix,
    derived from md5 so any engine recomputes the identical matrix
    (same seam as hyperplane_bits)."""
    import hashlib

    h = hashlib.md5(f"{RP_SEED_PREFIX}{j}:{i}".encode()).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


def random_projection(
    embeddings: DataFrame,
    d_in: int,
    d_out: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce each embedding
    to ``d_out`` dims with a deterministic ±1/√d_out Rademacher matrix
    (Achlioptas 2003 — database-friendly random projections). Distance
    preservation is property-tested, not assumed.

    Output is long-form (vec_id, dim, comp_micro) — scalar rows hash
    cleanly against the oracle, and downstream ops (ANN over the
    reduced space) reassemble with a collect_list keyed on vec_id.

    Shape at scale: the projection matrix is d_out×d_in literals baked
    into the plan (no side table, no shuffle, no Python); the whole
    operator is one narrow codegen map + posexplode over the corpus —
    embarrassingly parallel, exactly like the signature stage of
    minhash. The oracle RE-derives the matrix from md5 in SQL, proving
    the construction is engine-portable rather than a frozen constant.
    """
    import math

    # Spread an under-partitioned corpus before the kernel stage (r15),
    # then run the d_out×d_in fan-out as ONE numpy Arrow stage instead
    # of d_out interpreted zip_with/aggregate folds per row (r16, guide
    # §4.2); scale/round/cast stay in the JVM so the values — and the
    # md5-rederived oracle replay — are bit-unchanged.
    from data_ingestion_py_spark.sources.spread import spread_for_kernel

    sums = _jl_project_sums(
        spread_for_kernel(
            embeddings.select(
                "vec_id", _to_double(F.col(vec_col)).alias("v")
            )
        ),
        d_in,
        d_out,
        normalize=False,
    )
    scale = 1.0 / math.sqrt(d_out)
    comp = F.transform(
        F.col("s"),
        lambda x: F.round(x * F.lit(scale) * 1000000.0).cast("long"),
    )
    return sums.select(
        "vec_id", F.posexplode(comp).alias("dim", "comp_micro")
    ).select("vec_id", F.col("dim").cast("int").alias("dim"), "comp_micro")


def rp_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    d_in: int,
    d_out: int = 16,
    shortlist: int = 50,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via JL random projection: coarse top-``shortlist`` by L2²
    in the d_out-dim projected space, exact cosine rerank of the
    shortlist — the classic compressed-first-pass / exact-second-pass
    shape (the PQ/IVF sibling, with the projection from
    random_projection's md5-derived matrix).

    Vectors are L2-NORMALIZED before projection so the coarse L2²
    ordering is monotonic with cosine (‖a−b‖² = 2−2·cos on the unit
    sphere) — without this, mixed norms make the L2 shortlist diverge
    from the cosine rerank target. The coarse distance then runs on
    micro-unit INTEGER components, so the shortlist is exactly
    reproducible (no float-sum ordering anywhere) and the oracle can
    replay both passes. Shape at scale: projection is a narrow map
    (matrix = plan literals); the coarse top-m is one TakeOrdered over
    d_out-int rows — 4× fewer bytes per row than the raw vectors at
    d_in=64 — and only m rows are ever rejoined to full vectors for
    the rerank.
    """
    # Spread an under-partitioned corpus before the projection fan-out
    # (r15): the d_out×d_in zip_with/aggregate components are
    # interpreted (higher-order functions don't codegen), and a
    # one-file corpus would compute them all on one core.
    from data_ingestion_py_spark.sources.spread import spread_for_kernel

    base = spread_for_kernel(
        embeddings.select(
            "vec_id", "label", _to_double(F.col(vec_col)).alias("v")
        )
    )
    import math

    scale = 1.0 / math.sqrt(d_out)

    # Normalization + the d_out×d_in projection fan-out run as ONE
    # numpy Arrow stage (r16, guide §4.2) — the zip_with/aggregate
    # version was interpreted per row (HOFs don't codegen) and
    # dominated this query. _jl_project_sums replays the exact
    # left-fold adds and the l2_norm fold, and the scale/round/cast
    # below stay in the JVM, so every comp_micro is bit-unchanged.
    def proj(df):
        comp = F.transform(
            F.col("s"),
            lambda x: F.round(x * F.lit(scale) * 1000000.0).cast("long"),
        )
        return _jl_project_sums(df, d_in, d_out, normalize=True).select(
            "vec_id", comp.alias("p")
        )

    proj_in = base.select("vec_id", "v")
    projected = proj(proj_in)
    # the query row's projection comes from a FILTERED branch — a
    # predicate on vec_id cannot push below the opaque Python stage,
    # and re-running the kernel over the whole corpus for one row would
    # double the stage (guide §4.1/§6: keep pushdown reaching the scan)
    qp = proj(proj_in.where(F.col("vec_id") == query_vec_id)).select(
        F.col("p").alias("qp")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("p"), F.col("qp"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    short = (
        projected.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qp))
        .select("vec_id", d2.alias("coarse_d2"))
        .orderBy(F.asc("coarse_d2"), F.asc("vec_id"))
        .limit(shortlist)
    )
    q = base.where(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qvec")
    )
    sim = dot(F.col("v"), F.col("qvec")) / (
        l2_norm(F.col("v")) * l2_norm(F.col("qvec"))
    )
    return (
        base.join(short, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "coarse_d2",
            F.round(sim * 1000000.0).cast("long").alias("cosine_micro"),
        )
        .orderBy(F.desc("cosine_micro"), F.asc("vec_id"))
        .limit(k)
    )
