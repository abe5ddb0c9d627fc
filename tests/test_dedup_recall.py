"""MinHash-LSH recall against an independent pure-Python Jaccard model.

The S-curve fit (operators/dedup.lsh_params) promises recall ≥ 0.9 at
the configured threshold; this seeds a corpus with pairs whose TRUE
Jaccard straddles the threshold and measures recall of the full
pipeline against brute-force shingle-set Jaccard computed in plain
Python (independent algorithm, same tokenization contract).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_ingestion_py_spark.operators import dedup


def _py_shingles(text: str, k: int = dedup.SHINGLE_K) -> set[str]:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _seeded_corpus() -> list[tuple[int, str]]:
    """60 base docs of 40 tokens + a variant each keeping a prefix of
    m ∈ {24..32} tokens (fresh-token tail) → true Jaccard ≈ (m-2)/(78-m),
    i.e. 0.42..0.65 — straddling the 0.5 threshold."""
    rng = random.Random(1234)
    fresh = iter(f"w{n}" for n in range(10_000_000))
    rows = []
    for d in range(60):
        base = [next(fresh) for _ in range(40)]
        m = 24 + rng.randrange(9)
        variant = base[:m] + [next(fresh) for _ in range(40 - m)]
        rows.append((d, " ".join(base)))
        rows.append((d + 1000, " ".join(variant)))
    return rows


def test_lsh_params_scurve_fit():
    b, r = dedup.lsh_params(0.5, 32)
    assert (b, r) == (16, 2)
    assert b * r <= 32
    # fitted recall really meets the target across thresholds
    for t in (0.3, 0.5, 0.7, 0.8, 0.9):
        b, r = dedup.lsh_params(t, 32)
        assert 1.0 - (1.0 - t**r) ** b >= 0.9, (t, b, r)


def test_minhash_lsh_recall_at_threshold(spark):
    rows = _seeded_corpus()
    truth = {
        (a_id, b_id)
        for i, (a_id, a_text) in enumerate(rows)
        for b_id, b_text in rows[i + 1 :]
        if a_id < b_id
        and (sh_a := _py_shingles(a_text))
        and (sh_b := _py_shingles(b_text))
        and len(sh_a & sh_b) / len(sh_a | sh_b) >= 0.5
    }
    assert len(truth) >= 20, "corpus must seed enough true positives"

    corpus = spark.createDataFrame(rows, "doc_id: long, text: string")
    found = {
        (r.doc_a, r.doc_b)
        for r in dedup.near_duplicates_minhash(corpus, threshold=0.5).collect()
    }
    # every reported pair is truly >= threshold (verify stage is exact)
    assert found <= truth
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9 ({len(truth)} true pairs)"


def test_short_docs_dropped_not_skew_clique(spark):
    """Docs with < k tokens must vanish before signatures/banding —
    otherwise they all share the same degenerate band keys and form one
    O(m²) candidate clique (ADVICE r1)."""
    rows = [(i, "ab") for i in range(50)] + [(100, "a b c d e f")]
    corpus = spark.createDataFrame(rows, "doc_id: long, text: string")
    sigs = dedup.minhash_signatures(corpus)
    assert sigs.count() == 1  # only the shingle-able doc survives
    pairs = dedup.lsh_candidate_pairs(sigs.select("doc_id", "sig"))
    assert pairs.count() == 0
