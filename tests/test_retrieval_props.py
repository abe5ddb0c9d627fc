"""Property tests: the distributed BM25 and bigram-LM operators must
equal clean-room sequential Python models on hypothesis-generated
corpora (the SURVEY §5.2 strategy applied to the retrieval module)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_py_spark.queries_retrieval import (
    BM25_B,
    BM25_K1,
    LM_MIN_BIGRAMS,
    bigram_lm_scores,
    bm25_topk,
)

_WORDS = ["a", "bb", "ccc", "dog", "cat", "merge", "window"]


def _mk_docs(spark, docs: list[list[str]]):
    return spark.createDataFrame(
        [
            (i, " ".join(ws), "en", "src0", len(" ".join(ws)))
            for i, ws in enumerate(docs)
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def model_bm25(
    docs: list[list[str]], terms: tuple[str, ...]
) -> dict[int, int]:
    """Sequential BM25 → {doc_id: score_micro} for matching docs."""
    n = len(docs)
    dls = [len(d) for d in docs]
    avgdl = sum(dls) / n
    df = Counter()
    for d in docs:
        for t in set(d) & set(terms):
            df[t] += 1
    out: dict[int, int] = {}
    for i, d in enumerate(docs):
        tf = Counter(t for t in d if t in terms)
        if not tf:
            continue
        total = 0
        for t, f in tf.items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = (
                idf
                * (f * (BM25_K1 + 1.0))
                / (
                    f
                    + BM25_K1
                    * ((1.0 - BM25_B) + BM25_B * dls[i] / avgdl)
                )
            )
            total += round(s * 1_000_000)
        out[i] = total
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bm25_equals_sequential_model(spark, docs):
    terms = ("merge", "dog")
    expected = model_bm25(docs, terms)
    got = {
        r.doc_id: r.score_micro
        for r in bm25_topk(_mk_docs(spark, docs), terms, k=1000).collect()
    }
    assert got == expected


def model_bigram_lm(docs: list[list[str]]) -> dict[int, float]:
    """Sequential add-one bigram LM → {doc_id: avg_nll} (floored)."""
    c2: Counter = Counter()
    for d in docs:
        for a, b in zip(d, d[1:]):
            c2[(a, b)] += 1
    c1: Counter = Counter()
    for (a, _), c in c2.items():
        c1[a] += c
    vocab = len({t for d in docs for t in d})
    out = {}
    for i, d in enumerate(docs):
        grams = list(zip(d, d[1:]))
        if len(grams) < LM_MIN_BIGRAMS:
            continue
        tot = 0
        for g in grams:
            p = (c2[g] + 1.0) / (c1[g[0]] + vocab)
            tot += round(-math.log(p) * 1_000_000)
        # engines round HALF-UP on the SHORTEST decimal repr of the
        # double (Spark BigDecimal.valueOf / DuckDB round) — neither
        # banker's like Python round() nor exact-binary Decimal(x)
        from decimal import ROUND_HALF_UP, Decimal

        x = tot / len(grams) / 1_000_000
        out[i] = float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=15),
        min_size=1,
        max_size=10,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bigram_lm_equals_sequential_model(spark, docs):
    expected = model_bigram_lm(docs)
    got = {
        r.doc_id: r.avg_nll
        for r in bigram_lm_scores(_mk_docs(spark, docs)).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# RRF hybrid fusion vs clean-room sequential model
# ---------------------------------------------------------------------------


def model_rrf(
    docs: list[list[str]],
    vecs: list[list[float]],
    terms: tuple[str, ...],
    query_vec_id: int,
    leg_k: int,
    k: int,
) -> list[tuple[int, int, int, int]]:
    """Sequential RRF → [(doc_id, lex_rank, sem_rank, rrf_micro)] in
    output order, mirroring rrf_hybrid_search exactly: sequential-fold
    dot/norm (same accumulation order as the zip_with/aggregate
    columns), HALF-UP shortest-repr rounding of the cosine to 6
    decimals BEFORE ranking, (score desc, id asc) tie-breaks, and
    truncating integer div for the fused score."""
    from decimal import ROUND_HALF_UP, Decimal

    lex_sorted = sorted(
        model_bm25(docs, terms).items(), key=lambda kv: (-kv[1], kv[0])
    )[:leg_k]
    lex_rank = {i: r + 1 for r, (i, _) in enumerate(lex_sorted)}

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def _nrm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    q = vecs[query_vec_id]
    cos = {}
    for i, v in enumerate(vecs):
        if i == query_vec_id:
            continue
        s = _dot(v, q) / (_nrm(v) * _nrm(q))
        cos[i] = float(
            Decimal(repr(s)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
    sem_sorted = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:leg_k]
    sem_rank = {i: r + 1 for r, (i, _) in enumerate(sem_sorted)}

    fused = []
    for i in set(lex_rank) | set(sem_rank):
        lr, sr = lex_rank.get(i, 0), sem_rank.get(i, 0)
        score = (1_000_000 // (60 + lr) if lr else 0) + (
            1_000_000 // (60 + sr) if sr else 0
        )
        fused.append((i, lr, sr, score))
    fused.sort(key=lambda t: (-t[3], t[0]))
    return fused[:k]


@given(
    data=st.lists(
        st.tuples(
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
            st.lists(
                st.integers(min_value=-3, max_value=3),
                min_size=3,
                max_size=3,
            ).filter(lambda v: any(x != 0 for x in v)),
        ),
        min_size=3,
        max_size=10,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rrf_equals_sequential_model(spark, data):
    from data_ingestion_py_spark.queries_retrieval import rrf_hybrid_search

    docs = [ws for ws, _ in data]
    vecs = [[float(x) for x in v] for _, v in data]
    emb = spark.createDataFrame(
        [(i, 0, v) for i, v in enumerate(vecs)],
        "vec_id long, label int, embedding array<double>",
    )
    terms = ("merge", "dog")
    got = [
        (r.doc_id, r.lex_rank, r.sem_rank, r.rrf_micro)
        for r in rrf_hybrid_search(
            _mk_docs(spark, docs), emb, terms, 0, leg_k=3, k=100
        ).collect()
    ]
    assert got == model_rrf(docs, vecs, terms, 0, leg_k=3, k=100)
