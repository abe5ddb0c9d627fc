"""bench.py output contract: the driver records only the LAST 2000
chars of stdout and parses the final line as JSON — these tests pin
the compact-line shape without running Spark (the expensive paths are
exercised by the driver's own per-round bench run)."""

from __future__ import annotations

import json

import bench


def _fake_probes() -> dict:
    return {
        "jpeg_kernel": {"mpix_per_sec": 0.54, "hashes_identical": True},
        "dedup_slope": {"x1_sec": 2.4, "x10_sec": 8.0, "slope": 3.33},
        "iter_slope": {
            "pagerank_slope": 1.9,
            "components_slope": 2.8,
            "rank_slope": 2.4,
        },
        "manifest_slope": {
            "slope_med": 1.5,
            "shards_per_sec_x4": 170000,
            "zip_slope_med": 1.2,
        },
        "ann_swap": {"brute_sec": 0.2, "ivf_sec": 0.4, "recall_at_10": 1.0},
        "phash_kernel": {"speedup_x": 213.0, "mpix_per_sec": 666.7},
        "codec_swap": {"err": "RuntimeError: boom"},
    }


def test_probe_medians_selects_headline_scalars_and_flags_errors():
    med = bench._probe_medians(_fake_probes())
    assert med["dedup_slope.slope"] == 3.33
    assert med["iter_slope.pagerank_slope"] == 1.9
    assert med["manifest_slope.zip_slope_med"] == 1.2
    assert med["phash_kernel.speedup_x"] == 213.0
    # a failed probe is visible, not silently absent
    assert med["codec_swap.err"] == 1
    # nothing non-scalar or unlisted leaks in
    assert all(isinstance(v, (int, float)) for v in med.values())


def test_compact_line_parses_and_fits_driver_tail():
    timings = {f"query_{i:02d}": round(0.5 + i * 0.037, 3) for i in range(40)}
    line = bench._compact_line(_fake_probes(), {}, 0.1, timings, 38.4)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["value"] == 38.4
    assert len(d["queries"]) == 40
    assert d["probe_medians"]["dedup_slope.slope"] == 3.33
    # the line parses even when it is the tail of a longer stream
    stream = "x" * 5000 + "\n" + line
    assert json.loads(stream[-2000:].strip().splitlines()[-1]) == d


def test_compact_line_sheds_fastest_queries_before_probe_scalars():
    # r15 contract (r14 verdict): when the line is over budget, the
    # FASTEST query timings shed first (down to a floor of the 20
    # slowest) and probe scalars — the round's standing evidence —
    # survive whole.
    probes = {
        "dedup_slope": {"slope": 3.33, "slope_x100": 19.7},
        "iter_slope": {
            "pagerank_slope": 1.9,
            "components_slope": 2.8,
            "rank_slope": 2.4,
        },
    }
    probes["jpeg_kernel"] = {"mpix_per_sec": 0.54}
    timings = {f"a_very_long_query_name_{i:03d}": i + 0.123456 for i in range(40)}
    line = bench._compact_line(probes, {}, 0.1, timings, 99.9)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["value"] == 99.9
    # every probe scalar survives; the shed came out of query timings
    assert d["probe_medians"]["dedup_slope.slope"] == 3.33
    assert d["probe_medians"]["dedup_slope.slope_x100"] == 19.7
    assert d["probe_medians"]["jpeg_kernel.mpix_per_sec"] == 0.54
    assert len(d["probe_medians"]) == 6
    dropped = d.get("queries_dropped", 0)
    assert len(d["queries"]) + dropped == 40
    if dropped:
        # the dropped ones were the fastest
        kept = set(d["queries"])
        slowest = sorted(timings, key=timings.get, reverse=True)[:20]
        assert set(slowest) <= kept


def test_compact_line_x100_scale_evidence_survives_50_queries():
    # The r14 artifact defect: at 45 headline queries the tail guard
    # shed slope_x100 / tar_slope_x100 — the round's own headline
    # scale evidence. Pin that a full-width probe dict plus a 50-query
    # headline dict still ships every *_x100 and *_pairs key.
    probes = {
        "ocr_kernel": {"g4_mpix_per_sec": 13.8, "ocr_pages_per_sec": 1778.0},
        "pdf_kernel": {"pages_per_sec": 3200.0, "text_ok": 1},
        "jpeg_kernel": {"mpix_per_sec": 0.54, "prog_mpix_per_sec": 0.31},
        "phash_kernel": {"speedup_x": 213.0, "mpix_per_sec": 666.7},
        "dedup_slope": {
            "slope": 3.33,
            "slope_pairs": [3.37, 2.72, 2.8],
            "slope_x100": 19.7,
        },
        "iter_slope": {
            "pagerank_slope": 2.7,
            "components_slope": 3.1,
            "rank_slope": 2.1,
            "pagerank_slope_pairs": [2.6, 2.8],
            "components_slope_pairs": [3.1, 5.9],
            "rank_slope_pairs": [2.0, 2.2],
        },
        "manifest_slope": {
            "slope_med": 1.5,
            "shards_per_sec_x4": 170000,
            "zip_slope_med": 1.2,
            "slope_pairs": [1.4, 1.6],
            "tar_slope_x100": 18.1,
        },
        "streaming_drain": {
            "b10_rows_per_sec": 91000,
            "batch_overhead_sec": 0.21,
            "rows_slope": 1.1,
        },
        "band_index_probe": {"growth": 1.2, "compaction_recovery": 0.9},
        "ivf_index_probe": {"growth": 1.3, "compaction_recovery": 0.95},
        "ann_swap": {"brute_sec": 0.2, "ivf_sec": 0.4, "recall_at_10": 1.0},
        "skew_join": {"plain_sec": 2.2, "salted_sec": 1.1},
        "bucket_join_swap": {"plain_join_sec": 1.9, "bucketed_join_sec": 0.8},
        "quantile_swap": {"exact_sec": 1.4, "approx_sec": 0.3},
        "distinct_swap": {"exact_sec": 1.2, "approx_sec": 0.2},
        "codec_swap": {"zstd_size_ratio": 0.42},
    }
    timings = {
        f"a_realistically_long_query_name_{i:03d}": round(0.1 + i * 0.173, 3)
        for i in range(50)
    }
    line = bench._compact_line(
        probes, {}, 0.1, timings, 123.4, plan_fp={"q": "ab12cd34"}
    )
    assert len(line) <= 1900
    d = json.loads(line)
    med = d["probe_medians"]
    assert med["dedup_slope.slope_x100"] == 19.7
    assert med["manifest_slope.tar_slope_x100"] == 18.1
    assert med["dedup_slope.slope_pairs"] == [3.37, 2.72, 2.8]
    assert med["manifest_slope.slope_pairs"] == [1.4, 1.6]
    # never below the slowest-20 floor before desperation stages
    assert len(d["queries"]) >= 20
    assert d["value"] == 123.4


def test_compact_line_hard_ceiling_sheds_fastest_queries_keeps_value():
    # r12: the size guard must be TOTAL — the r11 guard only shed probe
    # medians, so the ≤1900 promise silently failed once enough bench
    # queries existed. With 200 long-named queries the line must STILL
    # fit; the fastest timings are shed (with a published count), the
    # slowest survive, and value/total is never shed.
    timings = {
        f"an_extremely_long_query_name_{i:03d}": round(0.1 + i * 0.01, 3)
        for i in range(200)
    }
    line = bench._compact_line(_fake_probes(), {"q": "RuntimeError: x" * 20}, 0.1, timings, 123.4)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["value"] == 123.4
    assert d["queries_dropped"] > 0
    assert d["queries_dropped"] + len(d["queries"]) == 200
    # slowest (most load-bearing) queries survive; fastest are shed
    assert "an_extremely_long_query_name_199" in d["queries"]
    assert "an_extremely_long_query_name_000" not in d["queries"]


def test_paired_slope_median_of_ratios_discards_one_stalled_pair():
    # simulate a box stall landing in ONE pair's big leg: the median
    # of per-pair ratios must stay at the true slope (r11 shipped
    # dedup slope 35.2, true 2.1, because the legs were independent)
    import itertools

    small_times = itertools.chain([0.1, 0.1, 0.1])
    big_times = itertools.chain([0.2, 3.0, 0.2])  # pair 2 stalled

    clock = {"t": 0.0}

    real_perf = bench.time.perf_counter

    def fake_sleep_small():
        clock["t"] += next(small_times)

    def fake_sleep_big():
        clock["t"] += next(big_times)

    try:
        bench.time.perf_counter = lambda: clock["t"]
        ps = bench._paired_slope(3, fake_sleep_small, fake_sleep_big)
    finally:
        bench.time.perf_counter = real_perf
    assert ps["ratio_med"] == 2.0  # median discards the 30x pair
    assert 30.0 in ps["ratios"]  # but the poisoned pair stays visible
    assert ps["small"]["med"] == 0.1
    assert ps["big"]["min"] == 0.2


def test_compact_line_carries_and_protects_slope_pairs():
    """r13 (VERDICT task #1): per-pair slope ratios must land in the
    compact tail and survive shedding AHEAD of per-query timings —
    BENCH_r12 shipped dedup_slope 12.55 with no way to tell stall from
    regression because the tail carried medians only."""
    probes = dict(_fake_probes())
    probes["dedup_slope"] = {
        "slope": 2.63,
        "slope_pairs": [2.43, 2.63, 2.84],
    }
    probes["manifest_slope"]["slope_pairs"] = [1.4, 1.5, 1.6]
    probes["iter_slope"]["pagerank_slope_pairs"] = [1.8, 1.9, 2.0]
    timings = {f"query_{i:02d}": round(0.5 + i * 0.037, 3) for i in range(40)}
    line = bench._compact_line(probes, {}, 0.1, timings, 38.4)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["probe_medians"]["dedup_slope.slope_pairs"] == [2.43, 2.63, 2.84]
    # under pressure (200 queries) the pairs still survive; queries shed
    big = {
        f"an_extremely_long_query_name_{i:03d}": round(0.1 + i * 0.01, 3)
        for i in range(200)
    }
    line2 = bench._compact_line(probes, {}, 0.1, big, 123.4)
    assert len(line2) <= 1900
    d2 = json.loads(line2)
    assert d2["probe_medians"]["dedup_slope.slope_pairs"] == [2.43, 2.63, 2.84]
    assert d2.get("queries_dropped", 0) > 0


def test_compact_line_plan_fingerprint_verdict(tmp_path, monkeypatch):
    """The artifact must self-certify "no plan change": plans_hash over
    every per-query plan hash + plans_changed vs the committed
    bench_plans.json manifest."""
    monkeypatch.setattr(bench, "_PLANS_MANIFEST", str(tmp_path / "bp.json"))
    fp = {"q1": "aaaa1111", "q6": "bbbb2222"}
    # first run: no manifest → it is recorded, comparison not claimed
    changed, comparable = bench._plans_vs_manifest(fp, 0.1)
    assert changed == [] and comparable is False
    line = bench._compact_line(
        _fake_probes(), {}, 0.1, {"q1": 0.5}, 0.5, fp, changed, comparable
    )
    d = json.loads(line)
    assert d["plans_baseline"] == "new"
    assert d["plans_hash"] == bench._plans_overall(fp)
    # second run, same plans → comparable, nothing changed
    changed, comparable = bench._plans_vs_manifest(fp, 0.1)
    assert changed == [] and comparable is True
    d2 = json.loads(
        bench._compact_line(
            _fake_probes(), {}, 0.1, {"q1": 0.5}, 0.5, fp, changed, comparable
        )
    )
    assert d2["plans_changed"] == []
    # a plan change and a new query are both named
    fp2 = {"q1": "aaaa1111", "q6": "cccc3333", "q9": "dddd4444"}
    changed, comparable = bench._plans_vs_manifest(fp2, 0.1)
    assert comparable is True and changed == ["q6", "q9"]
    # manifest recorded at another sf is not comparable
    changed, comparable = bench._plans_vs_manifest(fp, 0.01)
    assert comparable is False


def test_plan_fingerprint_normalizes_session_noise():
    class FakeQE:
        def __init__(self, s):
            self.s = s

        def executedPlan(self):
            class P:
                def __init__(self, s):
                    self._s = s

                def toString(self):
                    return self._s

            return P(self.s)

    class FakeJdf:
        def __init__(self, s):
            self._qe = FakeQE(s)

        def queryExecution(self):
            return self._qe

    class FakeDF:
        def __init__(self, s):
            self._jdf = FakeJdf(s)

    a = FakeDF(
        "Exchange hashpartitioning(x#123L, 32), plan_id=17\n"
        "  Scan parquet [x#123L] Batched: true, RDD[42] [id=#9]"
    )
    b = FakeDF(
        "Exchange hashpartitioning(x#9876L, 32), plan_id=3\n"
        "  Scan parquet [x#9876L] Batched: true, RDD[7] [id=#2]"
    )
    c = FakeDF(
        "Exchange rangepartitioning(x#123L, 32), plan_id=17\n"
        "  Scan parquet [x#123L] Batched: true, RDD[42] [id=#9]"
    )
    assert bench._plan_fingerprint(a) == bench._plan_fingerprint(b)
    assert bench._plan_fingerprint(a) != bench._plan_fingerprint(c)


def test_plans_sf_mismatch_is_labeled(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_PLANS_MANIFEST", str(tmp_path / "bp.json"))
    fp = {"q1": "aaaa1111"}
    bench._plans_vs_manifest(fp, 0.1)  # records at sf 0.1
    changed, comparable = bench._plans_vs_manifest(fp, 0.01)
    assert comparable is False and changed == ["sf-mismatch"]
    d = json.loads(
        bench._compact_line(
            _fake_probes(), {}, 0.01, {"q1": 0.5}, 0.5, fp, changed, comparable
        )
    )
    assert d["plans_baseline"] == "sf-mismatch"
