"""bench.py output contract: the driver records only the LAST 2000
chars of stdout and parses the final line as JSON — these tests pin
the compact-line shape without running Spark (the expensive paths are
exercised by the driver's own per-round bench run)."""

from __future__ import annotations

import json

import bench


def _fake_probes() -> dict:
    return {
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


def test_compact_line_sheds_probes_never_queries():
    # absurdly fat probe values force the size guard to shed
    probes = {
        "dedup_slope": {"slope": 3.33},
        "iter_slope": {
            "pagerank_slope": 1.9,
            "components_slope": 2.8,
            "rank_slope": 2.4,
        },
    }
    timings = {f"a_very_long_query_name_{i:03d}": i + 0.123456 for i in range(80)}
    line = bench._compact_line(probes, {}, 0.1, timings, 99.9)
    d = json.loads(line)
    # queries and total survive whole
    assert len(d["queries"]) == 80
    assert d["value"] == 99.9
    # the earliest (most load-bearing) probe median survives longest
    if d["probe_medians"]:
        assert "dedup_slope.slope" in d["probe_medians"]
