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


def test_compact_line_sheds_probes_before_queries():
    # enough queries that probe medians must shed, but queries still fit
    probes = {
        "dedup_slope": {"slope": 3.33},
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
    # queries and total survive whole when shedding medians suffices
    assert len(d["queries"]) == 40
    assert d["value"] == 99.9
    # the newest-round probe (shed-order head) survives longest
    if d["probe_medians"]:
        assert "jpeg_kernel.mpix_per_sec" in d["probe_medians"]


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
