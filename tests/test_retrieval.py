"""Unit tests for queries_retrieval (BM25, bigram-LM surprisal, DSIR)
on planted corpora with hand-computable expectations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestion_py_spark.queries_retrieval import (
    bigram_lm_scores,
    bm25_topk,
    dsir_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_bm25_ranks_term_density(spark):
    docs = _docs(
        spark,
        [
            ("alpha beta alpha beta alpha", "en"),  # no query terms
            ("merge merge merge beta x", "en"),  # tf=3, short
            ("merge beta gamma delta x", "en"),  # tf=1
            ("window merge beta gamma x", "en"),  # two distinct terms
        ],
    )
    out = bm25_topk(docs, ("merge", "window"), k=10).collect()
    got = {r.doc_id: (r.score_micro, r.n_terms) for r in out}
    assert 0 not in got  # no matching term → absent
    assert set(got) == {1, 2, 3}
    # matching two distinct terms beats one low-tf term
    assert got[3][1] == 2 and got[2][1] == 1
    assert got[3][0] > got[2][0]
    # tf saturation still rewards tf=3 over tf=1 at equal dl
    assert got[1][0] > got[2][0]


def test_bm25_hand_value(spark):
    """Single doc / single term: score must equal the hand formula."""
    docs = _docs(spark, [("merge beta gamma x", "en"), ("a b c d", "en")])
    out = bm25_topk(docs, ("merge",), k=10).collect()
    assert len(out) == 1
    n, df, tf, dl, avgdl = 2, 1, 1, 4, 4.0
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    s = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert out[0].score_micro == round(s * 1_000_000)


def test_bigram_lm_flags_rare_transitions(spark):
    common = "a b " * 20  # "a b" and "b a" dominate the corpus
    docs = _docs(
        spark,
        [
            (common.strip(), "en"),
            (common.strip(), "en"),
            ("q w e r t y u i o p", "en"),  # every bigram unseen elsewhere
        ],
    )
    out = bigram_lm_scores(docs).collect()
    nll = {r.doc_id: r.avg_nll for r in out}
    assert set(nll) == {0, 1, 2}
    assert nll[0] == nll[1]  # identical docs → identical score
    assert nll[2] > nll[0]  # rare transitions → higher surprisal


def test_bigram_lm_min_bigrams_floor(spark):
    docs = _docs(spark, [("a b", "en"), ("c d e f g h i j k l", "en")])
    out = bigram_lm_scores(docs).collect()
    # doc 0 has 1 bigram (< floor of 5) → filtered out
    assert [r.doc_id for r in out] == [1]


def test_dsir_prefers_target_like_docs(spark):
    # target lang 'en' uses vocab {a,b,c}; 'de' uses {x,y,z};
    # the mixed doc shares the 'en' vocab → should outrank pure-'de'.
    docs = _docs(
        spark,
        [
            ("a b c a b c", "en"),
            ("a c b b a c", "en"),
            ("x y z x y z", "de"),
            ("a b c a b c", "de"),  # de-labelled but en-like text
        ],
    )
    out = dsir_weights(docs, F.col("lang") == "en", top_n=4).collect()
    order = [r.doc_id for r in out]
    assert order[-1] == 2  # pure off-target vocab ranks last
    assert out[-1].weight_micro < 0  # …with a negative log-ratio
    assert {order[0], order[1], order[2]} == {0, 1, 3}
    assert all(r.weight_micro > 0 for r in out[:-1])


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], "l0") for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>, label string",
    )


def test_mmr_skips_redundant_candidate(spark):
    from data_ingestion_py_spark.operators.similarity import mmr_diversify

    emb = _emb(
        spark,
        [
            [1.0, 0.0, 0.0],  # query
            [0.7, 0.7, 0.0],  # A: top relevance
            [0.7, 0.71, 0.0],  # A': near-copy of A, rel #2
            [0.7, 0.0, 0.71],  # B: same rel as A', orthogonal to A
        ],
    )
    out = sorted(
        mmr_diversify(emb, 0, m=3, k=2).collect(),
        key=lambda r: r.pick_order,
    )
    # pure-relevance top-2 would be [A, A']; MMR must swap in B
    assert [r.vec_id for r in out] == [1, 3]


def test_mmr_first_pick_is_pure_relevance(spark):
    from data_ingestion_py_spark.operators.similarity import mmr_diversify

    emb = _emb(
        spark, [[1.0, 0.0], [0.9, 0.1], [0.5, 0.5], [0.1, 0.9]]
    )
    out = sorted(
        mmr_diversify(emb, 0, m=3, k=3).collect(),
        key=lambda r: r.pick_order,
    )
    assert out[0].vec_id == 1  # highest cosine to the query
    assert len(out) == 3
    assert [r.pick_order for r in out] == [1, 2, 3]


def test_bpe_merges_hand_trace(spark):
    from data_ingestion_py_spark.queries_retrieval import bpe_merges

    # vocab: "aaab"×3, "aab"×2 — merge trace is hand-computable
    docs = _docs(
        spark,
        [("aaab aaab aaab aab aab", "en")],
    )
    out = sorted(
        bpe_merges(docs, rounds=3).collect(), key=lambda r: r.merge_round
    )
    got = [(r.pair, r.cnt) for r in out]
    # r1: 'a a' appears 2×3 + 1×2 = 8 (beats 'a b' = 5)
    # r2: after greedy merge 'aaab'→[aa,a,b], 'aab'→[aa,b]:
    #     'a b'=3 ties 'aa a'=3 → lexicographic tiebreak picks 'a b'
    # r3: 'aaab'→[aa,ab]: 'aa ab'=3 beats 'aa b'=2
    assert got == [("a a", 8), ("a b", 3), ("aa ab", 3)]


def test_bpe_reuses_merged_symbols(spark):
    from data_ingestion_py_spark.queries_retrieval import bpe_merges

    # 'the'×10: 't h' and 'h e' tie at 10 → lexicographic tiebreak
    # picks 'h e'; r2 must then merge 't' with the NEW symbol 'he' —
    # proving merged symbols participate in later rounds
    docs = _docs(spark, [(" ".join(["the"] * 10), "en")])
    out = sorted(
        bpe_merges(docs, rounds=2).collect(), key=lambda r: r.merge_round
    )
    assert [(r.pair, r.cnt) for r in out] == [("h e", 10), ("t he", 10)]


def test_random_projection_preserves_distances(spark):
    """JL property on real fixture vectors: squared pairwise distances
    in the projected space concentrate around the originals (loose
    bounds — d_out=16 is coarse)."""
    import numpy as np

    from data_ingestion_py_spark.operators.similarity import (
        random_projection,
        rp_sign,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(30)
    )
    orig = {r.vec_id: np.array(r.embedding, dtype=float) for r in emb.collect()}
    proj_rows = random_projection(emb, d_in=64, d_out=16).collect()
    proj = {}
    for r in proj_rows:
        proj.setdefault(r.vec_id, [0.0] * 16)[r.dim] = r.comp_micro / 1e6
    ids = sorted(orig)
    ratios = []
    for a, b in zip(ids, ids[1:]):
        d_o = float(np.sum((orig[a] - orig[b]) ** 2))
        p_a, p_b = np.array(proj[a]), np.array(proj[b])
        d_p = float(np.sum((p_a - p_b) ** 2))
        if d_o > 0:
            ratios.append(d_p / d_o)
    assert ratios, "no nonzero-distance pairs"
    # every ratio in a wide JL band, and the mean is close to 1
    assert all(0.3 < r < 2.2 for r in ratios), ratios
    assert 0.75 < sum(ratios) / len(ratios) < 1.3

    # spot-check the matrix derivation matches the operator's output
    v = orig[ids[0]]
    j = 3
    signs = np.array([rp_sign(j, i) for i in range(64)], dtype=float)
    expected = round(float(v @ signs) * 0.25 * 1e6)
    assert proj[ids[0]][j] * 1e6 == expected * 1.0 or abs(
        proj[ids[0]][j] * 1e6 - expected
    ) <= 1


def test_rp_topk_recall_vs_brute_force(spark):
    """The JL coarse pass must keep most of the true cosine top-10 in
    its 50-candidate shortlist on real fixture vectors."""
    from data_ingestion_py_spark.operators.similarity import (
        cosine_topk,
        rp_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    truth = {r.vec_id for r in cosine_topk(emb, 0, 10).collect()}
    approx = {
        r.vec_id
        for r in rp_topk(
            emb, 0, d_in=64, d_out=32, shortlist=100
        ).collect()
    }
    # fixture vectors are near-isotropic (cosines 0.17–0.33 with no
    # cluster structure) — the JL worst case; ≥5/10 is the honest
    # floor at d_out=32 with a 20% shortlist. Clustered real
    # embeddings do far better at the same settings.
    assert len(truth & approx) >= 5, (truth, approx)


def test_weighted_sample_prefers_heavy_docs(spark):
    """A-Res with weight = n_chars must overrepresent long docs: the
    sampled mean length should exceed the corpus mean."""
    from data_ingestion_py_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    sample = QUERIES["corpus_weighted_sample"].spark(spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    assert sample_mean > corpus_mean


def test_rrf_hybrid_fusion_hand_ranks(spark):
    """RRF on a planted corpus: a doc ranked by BOTH legs must beat a
    doc ranked #1 by only one leg (1/(60+2)+1/(60+2) > 1/(60+1)); the
    integer micro-unit scores are hand-checkable."""
    from data_ingestion_py_spark.queries_retrieval import rrf_hybrid_search

    docs = _docs(
        spark,
        [
            ("merge merge merge beta x", "en"),  # lex #1, no vector match
            ("merge beta gamma delta x", "en"),  # lex #2 AND sem #2
            ("alpha beta alpha beta alpha", "en"),  # no query terms
            ("alpha gamma alpha beta alpha", "en"),  # no query terms
        ],
    )
    # embeddings keyed vec_id == doc_id; vec_id=3 is the query. doc 1
    # is closest to it, doc 0 orthogonal, doc 2 second-closest.
    emb = spark.createDataFrame(
        [
            (0, 0, [0.0, 1.0]),
            (1, 0, [1.0, 0.1]),
            (2, 0, [1.0, 0.6]),
            (3, 0, [1.0, 0.0]),
        ],
        "vec_id long, label int, embedding array<double>",
    )
    out = rrf_hybrid_search(docs, emb, ("merge",), 3, leg_k=3, k=10).collect()
    got = {r.doc_id: r for r in out}
    # legs: lex ranks {0:1, 1:2}; sem ranks {1:1, 2:2, 0:3}
    assert (got[0].lex_rank, got[0].sem_rank) == (1, 3)
    assert (got[1].lex_rank, got[1].sem_rank) == (2, 1)
    assert (got[2].lex_rank, got[2].sem_rank) == (0, 2)
    assert got[1].rrf_micro == 1000000 // 62 + 1000000 // 61
    assert got[0].rrf_micro == 1000000 // 61 + 1000000 // 63
    assert got[2].rrf_micro == 1000000 // 62
    # both-legs doc wins overall
    assert [r.doc_id for r in out][0] == 1
