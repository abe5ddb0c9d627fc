#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs the headline queries (``bench=True`` in the registry) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is fully materialized through the ``noop`` sink (measures
engine compute, not driver-side pandas conversion). Per query the
published number is the MEDIAN of three runs, with the min..max spread
published alongside (``queries_spread``) — round 8 proved best-of-N
without a spread publishes phantom regressions on a contended box, and
round 9's fix covered only the probes; headline queries get the same
treatment now.

Output-ordering contract (round-9 lesson): the driver records only the
LAST 2000 characters of stdout, so the single JSON line is ordered
probes-first, ``queries``/``value`` LAST — the headline numbers must be
the part that survives the tail cut (round 9's probe growth evicted
every headline timing from BENCH_r09.json).

Also reports a skewed-key join micro-bench (90% of fact rows on one
key, broadcast + AQE skew handling disabled) comparing a plain
shuffle join against operators/skew.salted_join — the measured number
behind the skew-mitigation machinery.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


_PLANS_MANIFEST = os.path.join(_REPO, "bench_plans.json")


def _plan_fingerprint(df) -> str:
    """8-hex fingerprint of a query's INITIAL physical plan, normalized
    for the run-to-run noise that is NOT plan identity: expression ids
    (#123), plan/codegen/subquery/RDD ids, and temp paths all vary
    between sessions on identical code; the operators, join strategies,
    pushed filters, and exchange layout do not.

    Purpose (r13, VERDICT task #1): BENCH_r12 recorded a 1.34× total
    inflation the judge had to adjudicate as box contention by reading
    git history — the artifact itself could not show "no plan change".
    With per-query fingerprints checked against the committed
    bench_plans.json manifest, the compact tail carries
    ``plans_changed`` (names whose plan differs from the committed
    hash), so identical-plan-slower-wall — the contention signature —
    is distinguishable from a real plan regression from the artifact
    alone."""
    try:
        # plan toString truncates long field lists with '…' at a
        # budget measured in CHARACTERS, so the cut point shifts with
        # the expr-id DIGIT WIDTHS — a session-global counter (r14
        # finding: six untouched queries flagged changed once enough
        # plans were built first). Render untruncated, then normalize.
        df.sparkSession.conf.set(
            "spark.sql.debug.maxToStringFields", "100000"
        )
        # scan-node metadata (DataFilters/PushedFilters/Location) cuts
        # at a 100-CHARACTER cap by default — same digit-width shift
        df.sparkSession.conf.set(
            "spark.sql.maxMetadataStringLength", "100000"
        )
    except Exception:  # noqa: BLE001 — rendering conf is advisory
        pass
    s = df._jdf.queryExecution().executedPlan().toString()
    s = re.sub(r"#\d+L?", "#x", s)
    # higher-order-function lambda variables carry a SESSION-GLOBAL
    # counter (lambda x_42#…), so merely registering new queries ahead
    # of an unchanged one shifted its hash (r14 finding: five
    # untouched queries flagged changed when two queries joined the
    # headline set) — normalize the counter like the expr ids
    s = re.sub(r"lambda (\w+?)_\d+", r"lambda \1_x", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"\[id=#?\d+\]", "[id=x]", s)
    s = re.sub(r"RDD\[\d+\]", "RDD[x]", s)
    s = re.sub(r"RDD at \S+", "RDD at x", s)
    s = re.sub(r"/tmp/\S+", "/tmp/x", s)
    return hashlib.md5(s.encode()).hexdigest()[:8]


def _plans_overall(plan_fp: dict[str, str]) -> str:
    joined = "|".join(f"{n}:{h}" for n, h in sorted(plan_fp.items()))
    return hashlib.md5(joined.encode()).hexdigest()[:8]


def _plans_vs_manifest(
    plan_fp: dict[str, str], sf: float
) -> tuple[list[str], bool]:
    """(names whose plan hash differs from or is missing in the
    committed manifest, manifest_comparable). Writes the manifest when
    absent or when SPARK_GRAFT_WRITE_PLANS=1 (the builder commits it;
    the driver's runs then only compare). A manifest recorded at a
    different sf is not comparable (file statistics legitimately change
    join strategies across scale factors)."""
    rewrite = os.environ.get("SPARK_GRAFT_WRITE_PLANS") == "1"
    manifest = None
    if not rewrite and os.path.exists(_PLANS_MANIFEST):
        try:
            with open(_PLANS_MANIFEST) as f:
                manifest = json.load(f)
        except (OSError, ValueError):
            manifest = None
    if manifest is None or manifest.get("sf") != sf:
        if manifest is None:
            try:
                with open(_PLANS_MANIFEST, "w") as f:
                    json.dump(
                        {"sf": sf, "plans": plan_fp}, f, indent=1,
                        sort_keys=True,
                    )
                    f.write("\n")
            except OSError:
                pass
            return [], False
        return ["sf-mismatch"], False
    committed = manifest.get("plans", {})
    changed = sorted(
        {n for n, h in plan_fp.items() if committed.get(n) != h}
        | {n for n in committed if n not in plan_fp}
    )
    return changed, True


def main() -> None:
    # Bench box has 128 GiB; 32 concurrent local tasks (and the sf0.1×10
    # iter_slope probes) OOM on the library's portable 4g default.
    # Bench-specific tuning lives HERE, not in session._DEFAULTS.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from data_ingestion_py_spark.queries import QUERIES
    import data_ingestion_py_spark.queries_ext  # noqa: F401  (extends QUERIES)
    from data_ingestion_py_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in QUERIES.items() if q.bench}

    # Warm the JVM + parquet footer caches once (fault-isolated: a broken
    # first query must not kill the whole bench).
    try:
        next(iter(bench_queries.values())).spark(spark, sf_dir).count()
    except Exception:
        pass

    # Fault isolation (round-4 lesson: one AnalysisException zeroed the
    # entire round's perf signal): each query's build+run is wrapped;
    # failures land in `errors` and the run keeps going.
    # r16 (VERDICT r15 #6, adjudicated by full-bench A/B): a per-query
    # gc.collect() was tried as churn hygiene and MEASURED WORSE —
    # same box, back-to-back runs: total 64.9 s with vs 48.3 s without
    # (geomean 0.74, worst hit the checkpoint-heavy queries:
    # ivf_kmeans 4.28 vs 3.19, pagerank 2.84 vs 2.01, rfm 3.19 vs
    # 2.38). Dropping the Python refs between queries makes the JVM
    # ContextCleaner unpersist blocks INSIDE the next queries' timed
    # regions, which costs more than the heap churn it reaps; the r13
    # gc between the query phase and the PROBES (below) remains, where
    # there is a natural settling boundary. Env-gated OFF by default so
    # the measurement stays reproducible: SPARK_GRAFT_BENCH_GC=1.
    import gc

    bench_gc = os.environ.get("SPARK_GRAFT_BENCH_GC", "0") == "1"
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    plan_fp: dict[str, str] = {}
    for name, q in bench_queries.items():
        if bench_gc:
            gc.collect()
        try:
            try:
                plan_fp[name] = _plan_fingerprint(q.spark(spark, sf_dir))
            except Exception:  # noqa: BLE001 — fingerprint is advisory
                pass  # timing still runs; the name shows in plans_changed

            def _run(q=q):
                q.spark(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()

            st = _stats_of(3, _run)
            timings[name] = st["med"]
            spreads[name] = [st["min"], st["max"]]
        except Exception as exc:  # noqa: BLE001 — bench must survive anything
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
    plans_changed, plans_comparable = _plans_vs_manifest(plan_fp, sf)

    # Release the query loop's leftovers before the probes (r13): the
    # headline builds pin/localCheckpoint small tables whose JVM blocks
    # are only reaped by the ContextCleaner once the PYTHON refs die —
    # after 42 queries × 3 runs the accumulated storage turned the
    # memory-hungry dedup x10 probe leg from 5.3 s (isolated, quiet
    # box, pairs 2.51/2.54/2.60) into 54 s with 4×-scattered pairs
    # INSIDE the same bench process. gc + clearCache makes the probe
    # environment match the isolated measurement instead of inheriting
    # the query phase's heap.
    gc.collect()
    try:
        spark.catalog.clearCache()
    except Exception:  # noqa: BLE001
        pass

    probes: dict[str, dict] = {}
    for key, fn in (
        ("skew_join", _skew_bench),
        ("quantile_swap", _quantile_swap_bench),
        ("distinct_swap", _distinct_swap_bench),
        ("dedup_slope", _dedup_slope_bench),
        ("iter_slope", _iter_slope_bench),
        ("band_index_probe", _band_index_probe_bench),
        ("ann_swap", _ann_swap_bench),
        ("bucket_join_swap", _bucket_join_bench),
        ("codec_swap", _codec_swap_bench),
        ("streaming_drain", _streaming_drain_bench),
        ("manifest_slope", _manifest_slope_bench),
        ("ivf_index_probe", _ivf_index_probe_bench),
        ("phash_kernel", _phash_kernel_bench),
        ("jpeg_kernel", _jpeg_kernel_bench),
        ("pdf_kernel", _pdf_kernel_bench),
        ("ocr_kernel", _ocr_kernel_bench),
    ):
        try:
            probes[key] = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            probes[key] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        gc.collect()  # reap this probe's checkpoints before the next

    total = round(sum(timings.values()), 3)
    # ORDER MATTERS: the driver keeps the last 2000 chars of stdout.
    # Line 1 carries EVERYTHING (probes with spreads, query spreads,
    # errors) for the builder's committed record; the FINAL line is a
    # compact summary — headline medians + total + one median scalar
    # per probe — sized to fit entirely inside the 2000-char tail, so
    # the driver artifact parses and carries both the headline numbers
    # AND the probe evidence (round-10's tail evicted every probe).
    result = {
        "metric": "headline_queries_total_sec",
        "unit": "sec",
        **probes,
        "queries_spread": spreads,
        "plan_fp": plan_fp,
    }
    if errors:
        result["errors"] = errors
    result["sf"] = sf
    result["queries"] = timings
    result["value"] = total
    # r16 (VERDICT r15 #8): the compact stdout line sheds the fastest
    # timings to fit the driver's 2000-char tail, leaving 29 of 49
    # invisible to PERF — so the FULL per-query table also lands in a
    # committed artifact every run (publication-additive; nothing in
    # the timing loop or the stdout contract changes).
    try:
        with open(os.path.join(_REPO, "BENCH_FULL.json"), "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass
    print(json.dumps(result))
    print(
        _compact_line(
            probes, errors, sf, timings, total,
            plan_fp, plans_changed, plans_comparable,
        )
    )
    spark.stop()


def _compact_line(
    probes: dict,
    errors: dict,
    sf: float,
    timings: dict,
    total: float,
    plan_fp: dict[str, str] | None = None,
    plans_changed: list[str] | None = None,
    plans_comparable: bool = False,
) -> str:
    """The FINAL stdout line — the one the driver's 2000-char tail is
    guaranteed to contain whole, so it must parse as JSON and carry
    headline medians + total + one median scalar per probe, PLUS the
    r13 self-adjudication evidence: per-pair ratio lists for the slope
    probes (``*_pairs`` — a stall poisons one visible pair, a real
    regression moves them all) and the plan-fingerprint verdict vs the
    committed bench_plans.json (``plans_hash`` over all per-query plan
    hashes + ``plans_changed`` names). TOTAL size guard (r12 — the r11
    guard only shed probe medians, so the ≤1900 promise silently failed
    once enough bench queries existed), shed order rewritten r15 —
    r13's order shed probe scalars before query timings, and at 45
    headline queries that consumed the round's own x100 scale
    evidence (the r11 phash failure mode recurring) — so now: the
    FASTEST per-query timings shed FIRST down to a floor of the 20
    slowest (each timing is re-derivable from any quiet rerun; probe
    scalars are the round's standing evidence and a
    ``queries_dropped`` count survives), then the least-load-bearing
    NON-protected probe medians (end of the priority order;
    ``*_pairs`` stall-vs-regression lists AND ``*_x100`` two-decade
    scale points are protected), then error details (a count
    survives), then the remaining queries below the floor, and only
    in desperation the protected evidence;
    ``value``/``plans_*`` are never shed."""
    compact = {
        "metric": "headline_queries_total_sec",
        "unit": "sec",
        "probe_medians": _probe_medians(probes),
    }
    if plan_fp is not None:
        compact["plans_hash"] = _plans_overall(plan_fp)
        if plans_comparable:
            compact["plans_changed"] = (plans_changed or [])[:8]
            if plans_changed and len(plans_changed) > 8:
                compact["plans_changed_n"] = len(plans_changed)
        elif plans_changed == ["sf-mismatch"]:
            # a manifest exists but was recorded at another scale
            # factor: statistics legitimately change plans across SFs
            compact["plans_baseline"] = "sf-mismatch"
        else:
            compact["plans_baseline"] = "new"  # manifest just recorded
    if errors:
        compact["errors"] = {k: v[:80] for k, v in errors.items()}
    compact["sf"] = sf
    compact["queries"] = dict(timings)
    compact["value"] = total

    def _fits() -> bool:
        return len(json.dumps(compact)) <= 1900

    med = compact["probe_medians"]
    q = compact["queries"]

    def _protected(key: str) -> bool:
        return key.endswith("_pairs") or key.endswith("_x100")

    def _shed_queries(floor: int) -> None:
        # fastest-first: the slow queries carry the regression signal
        if "queries_dropped" not in compact and not _fits():
            compact["queries_dropped"] = 0
        for name in sorted(q, key=q.get):
            if _fits() or len(q) <= floor:
                break
            del q[name]
            compact["queries_dropped"] += 1

    _shed_queries(floor=20)
    for victim in list(med)[::-1]:
        if _fits():
            break
        if _protected(victim):
            continue  # stall-pair lists + x100 scale evidence
        del med[victim]
    if not _fits() and errors:
        compact["errors"] = {"count": len(errors)}
    _shed_queries(floor=0)
    for victim in list(med)[::-1]:  # desperation only
        if _fits():
            break
        del med[victim]
    return json.dumps(compact)


# One headline scalar (or few) per probe for the compact driver line.
# Shed order (the size guard sheds from the END): the CURRENT round's
# new probes come FIRST — r11's order shed its own new phash_kernel
# evidence off the driver artifact — then the standing scale-slope
# claims, then the swap/index probes whose numbers are stable
# round-over-round and fully recorded in git-committed BASELINE.md.
_PROBE_HEADLINE_KEYS = {
    "ocr_kernel": ("g4_mpix_per_sec", "ocr_pages_per_sec"),  # r13
    "pdf_kernel": ("pages_per_sec", "text_ok"),  # r12
    "jpeg_kernel": ("mpix_per_sec", "prog_mpix_per_sec"),  # r12
    "phash_kernel": ("speedup_x", "mpix_per_sec"),  # r11
    "dedup_slope": ("slope", "slope_pairs", "slope_x100"),
    "iter_slope": (
        "pagerank_slope",
        "components_slope",
        "rank_slope",
        "pagerank_slope_pairs",
        "components_slope_pairs",
        "rank_slope_pairs",
    ),
    "manifest_slope": (
        "slope_med",
        "shards_per_sec_x4",
        "zip_slope_med",
        "slope_pairs",
        "tar_slope_x100",
    ),
    "streaming_drain": ("b10_rows_per_sec", "batch_overhead_sec", "rows_slope"),
    "band_index_probe": ("growth", "compaction_recovery"),
    "ivf_index_probe": ("growth", "compaction_recovery"),
    "ann_swap": ("brute_sec", "ivf_sec", "recall_at_10"),
    "skew_join": ("plain_sec", "salted_sec"),
    "bucket_join_swap": ("plain_join_sec", "bucketed_join_sec"),
    "quantile_swap": ("exact_sec", "approx_sec"),
    "distinct_swap": ("exact_sec", "approx_sec"),
    "codec_swap": ("zstd_size_ratio",),
}


def _probe_medians(probes: dict[str, dict]) -> dict:
    out: dict = {}
    for probe, keys in _PROBE_HEADLINE_KEYS.items():
        vals = probes.get(probe) or {}
        if "err" in vals:
            out[f"{probe}.err"] = 1
            continue
        for k in keys:
            v = vals.get(k)
            if isinstance(v, (int, float)) or (
                k.endswith("_pairs")
                and isinstance(v, list)
                and all(isinstance(x, (int, float)) for x in v)
            ):
                out[f"{probe}.{k}"] = v
    return out


def _phash_kernel_bench(spark, sf_dir: str) -> dict:
    """Megapixel probe for the vectorized average-hash kernel (the
    round-10 verdict's last interpreted-Python pixel loop): a 2 MP P5
    raster hashed by the shipping prefix-sum kernel vs the per-pixel
    generator definition it replaced — hashes must be bit-identical,
    the speedup is the published number (the resize/checksum kernels'
    round-10 twin)."""
    import numpy as np

    from data_ingestion_py_spark.sources.multimodal import average_hash

    w, h = 1600, 1250  # 2.0 MP
    rng = (np.arange(w * h, dtype=np.int64) * 2654435761) % 251
    payload = b"P5 %d %d 255 " % (w, h) + rng.astype(np.uint8).tobytes()

    def _reference(pix, grid=4):
        total_sum = int(sum(pix))
        total_px = w * h
        bits = 0
        for b in range(grid * grid):
            bx, by = b % grid, b // grid
            x0, x1 = (w * bx) // grid, (w * (bx + 1)) // grid
            y0, y1 = (h * by) // grid, (h * (by + 1)) // grid
            bsum = sum(
                int(pix[y * w + x])
                for y in range(y0, y1)
                for x in range(x0, x1)
            )
            bpx = (x1 - x0) * (y1 - y0)
            if bpx and bsum * total_px > total_sum * bpx:
                bits |= 1 << b
        return bits

    got = {}
    vec = _stats_of(3, lambda: got.__setitem__("v", average_hash(payload)))
    raster = rng.astype(np.uint8)
    t0 = time.perf_counter()
    # the replaced path went through decode_pnm's ndarray -> python-list
    # round-trip before the per-pixel loop; time the whole old shape
    ref_hash = _reference([int(p) for p in raster])
    ref_sec = round(time.perf_counter() - t0, 3)
    out = {
        "raster_mpix": round(w * h / 1e6, 2),
        "vectorized_sec": vec["med"],
        "per_pixel_python_sec": ref_sec,
        "hashes_identical": got["v"] == ref_hash,
        "speedup_x": round(ref_sec / vec["med"], 1) if vec["med"] else None,
        "mpix_per_sec": (
            round(w * h / 1e6 / vec["med"], 1) if vec["med"] else None
        ),
    }
    return out


def _jpeg_kernel_bench(spark, sf_dir: str) -> dict:
    """Decode throughput of the r12 extras-free baseline JPEG kernel
    (Huffman + dequant + IDCT) on a realistic AC-dense 0.2 MP image
    produced by the INDEPENDENT reference encoder in tests/test_jpeg —
    the honest number for the interpreted fallback path (bit-exactness
    vs the independent IDCT is pinned in pytest; in an ``[ingest]``
    container the PIL-first dispatch routes JPEG to the C decoder and
    this kernel never runs in the hot path). ``hashes_identical``
    confirms the decoded raster feeds the phash pipeline consistently
    (hash of the JPEG == hash of its decoded raster re-encoded
    lossless)."""
    from data_ingestion_py_spark.sources.multimodal import (
        average_hash,
        decode_jpeg_array,
    )
    from tests.test_jpeg import _jpeg_bytes, _rng_raster

    w, h = 512, 384
    raster = _rng_raster(w, h, 3)
    payload, _ = _jpeg_bytes([raster], [(1, 1)], w, h)
    got: dict = {}
    st = _stats_of(3, lambda: got.__setitem__("v", decode_jpeg_array(payload)))
    decoded = got["v"]
    if decoded is None:
        return {"err": "decode returned None"}
    pgm = b"P5\n%d %d\n255\n" % (w, h) + decoded[2].tobytes()
    out = {
        "raster_mpix": round(w * h / 1e6, 3),
        "decode_sec": st["med"],
        "decode_spread_sec": [st["min"], st["max"]],
        "mpix_per_sec": (
            round(w * h / 1e6 / st["med"], 3) if st["med"] else None
        ),
        "hashes_identical": average_hash(payload) == average_hash(pgm),
    }
    # r12: the SAME raster as a progressive (SOF2) stream — the
    # multi-scan successive-approximation path most large web JPEGs
    # take; correctness = bit-match vs the baseline decode
    try:
        from tests.test_jpeg import _jpeg_progressive_bytes

        prog, _ = _jpeg_progressive_bytes([raster], [(1, 1)], w, h)
        pg: dict = {}
        stp = _stats_of(
            3, lambda: pg.__setitem__("v", decode_jpeg_array(prog))
        )
        pdec = pg["v"]
        out["prog_mpix_per_sec"] = (
            round(w * h / 1e6 / stp["med"], 3) if stp["med"] else None
        )
        out["prog_matches_baseline"] = pdec is not None and bool(
            (pdec[2] == decoded[2]).all()
        )
    except Exception as exc:  # noqa: BLE001
        out["prog_err"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def _pdf_kernel_bench(spark, sf_dir: str) -> dict:
    """Throughput of the r12 pure-byte PDF text parser
    (sources/pdf_pure.parse_pdf_text) on a 64-page document with
    FlateDecoded content streams built by the INDEPENDENT test writer
    — pages/s for the extras-free S1 path (with fitz installed the
    dispatch never runs this kernel). ``text_ok`` pins the first and
    last page strings so the number can't be bought by skipping
    work."""
    from data_ingestion_py_spark.sources.pdf_pure import parse_pdf_text
    from tests.test_pdf_pure import _basic_pdf

    n_pages = 64
    contents = [
        (
            "BT /F1 12 Tf (Page %04d of the corpus) Tj T* "
            "[(second ) -80 (line %04d)] TJ T* (third line) Tj ET"
            % (i, i)
        ).encode()
        for i in range(n_pages)
    ]
    pdf = _basic_pdf(contents, compress=True)
    got: dict = {}
    st = _stats_of(3, lambda: got.__setitem__("v", parse_pdf_text(pdf)))
    parsed = got["v"]
    if parsed is None:
        return {"err": "parse returned None"}
    pages, _meta = parsed
    return {
        "n_pages": n_pages,
        "pdf_kb": round(len(pdf) / 1024, 1),
        "parse_sec": st["med"],
        "parse_spread_sec": [st["min"], st["max"]],
        "pages_per_sec": (
            round(n_pages / st["med"], 1) if st["med"] else None
        ),
        "text_ok": (
            len(pages) == n_pages
            and pages[0].startswith("Page 0000 of the corpus\nsecond line 0000")
            and pages[-1].endswith("third line")
        ),
    }


def _ocr_kernel_bench(spark, sf_dir: str) -> dict:
    """Throughput of the r13 scanned-document kernels on rasters built
    by the INDEPENDENT test writers: CCITT Group 4 decode (Mpix/s on a
    fax-class bilevel page) and strict OCR-lite glyph matching
    (pages/s on multi-row bitmap-font pages). ``text_ok`` pins the
    recognized string so neither number can be bought by skipping
    work."""
    import numpy as np

    from data_ingestion_py_spark.sources.ccitt import g4_decode
    from data_ingestion_py_spark.sources.ocr_pure import (
        TEXT_TEMPLATES,
        match_glyph_grid,
    )
    from tests.test_ccitt import g4_encode

    # a fax-class 1728x128 page: text-like runs (glyph stripes)
    page = np.full((128, 1728), 255, np.uint8)
    for r in range(0, 128, 16):
        for c in range(0, 1728, 24):
            if (r // 16 + c // 24) % 3:
                page[r : r + 8, c : c + 12] = 0
    enc = g4_encode(page)
    got: dict = {}
    st = _stats_of(
        3, lambda: got.__setitem__("v", g4_decode(enc, 1728, 128))
    )
    if got["v"] is None or not (got["v"] == page).all():
        return {"err": "g4 decode mismatch"}
    mpix = 1728 * 128 / 1e6
    out: dict = {
        "g4_mpix_per_sec": (
            round(mpix / st["med"], 2) if st["med"] else None
        ),
        "g4_decode_spread_sec": [st["min"], st["max"]],
    }
    # OCR-lite: 4 rows x 20 glyphs per page, 32 pages per repetition
    text_rows = [
        "".join("0123456789. "[(r * 7 + g) % 12] for g in range(20))
        for r in range(4)
    ]
    img = np.full((4 * 24, 20 * 16), 224, np.uint8)
    for r, row in enumerate(text_rows):
        for g, ch in enumerate(row):
            t = TEXT_TEMPLATES[ch]
            for rr in range(3):
                for cc in range(2):
                    if t[rr][cc]:
                        img[
                            r * 24 + rr * 8 : r * 24 + rr * 8 + 8,
                            g * 16 + cc * 8 : g * 16 + cc * 8 + 8,
                        ] = 32
    expect = "\n".join(text_rows)
    n_pages = 32

    def _run():
        for _ in range(n_pages):
            got["t"] = match_glyph_grid(img, templates=TEXT_TEMPLATES)

    st2 = _stats_of(3, _run)
    out["ocr_pages_per_sec"] = (
        round(n_pages / st2["med"], 1) if st2["med"] else None
    )
    out["ocr_spread_sec"] = [st2["min"], st2["max"]]
    out["text_ok"] = got.get("t") == expect
    return out


def _skew_bench(spark, sf_dir: str) -> dict[str, float]:
    """Plain vs salted join on a 90%-hot key, best of 3.

    Broadcast and AQE skew-splitting are disabled for both sides so the
    measurement isolates what salting does to a raw shuffle join: the
    hot key lands on ONE task in the plain plan and on n_salts tasks in
    the salted one.
    """
    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.operators.skew import salted_join

    # 95% of fact rows on one key; dim is SMALL (a few hundred rows)
    # but broadcast is disabled — the regime salting exists for: the
    # hot key's task dominates the stage and dim replication is cheap.
    # (With a fact-sized dim, replication cost would swamp the win —
    # that case wants AQE skew-split or a broadcast branch instead.)
    fact = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 20 < 19, F.lit(1))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        F.col("l_orderkey").alias("salt_src"),
        "l_quantity",
    )
    dim = (
        load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderkey") == 1) | (F.col("o_orderkey") % 600 == 0))
        .select(F.col("o_orderkey").alias("k"), "o_totalprice")
    )
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.enabled": spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        out: dict[str, float] = {}
        for label, joined in (
            ("plain_sec", lambda: fact.join(dim, "k")),
            ("salted_sec", lambda: salted_join(fact, dim, "k", "salt_src")),
        ):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                joined().write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            out[label] = round(best, 3)
        return out
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _best_of(n: int, act) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        act()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _median(vals: list[float]) -> float:
    vs = sorted(vals)
    mid = len(vs) // 2
    return vs[mid] if len(vs) % 2 else (vs[mid - 1] + vs[mid]) / 2


def _paired_slope(n_pairs: int, run_small, run_big) -> dict:
    """Interleaved slope measurement — the round-12 fix for BENCH_r11's
    stall-poisoned ratios. Each pair times the small and the big leg
    BACK-TO-BACK and the published slope is the MEDIAN of per-pair
    ratios, with every per-pair ratio published alongside.

    Why: r11's driver run recorded dedup slope 35.2 / manifest 6.53 /
    pagerank 3.66 where the true values (judge re-runs, same box) were
    2.1 / 1.6-2.9 / 1.83 — the legs were timed in separate blocks
    minutes apart, so one multi-10-second disk stall landed entirely
    in one leg and the RATIO exploded; best-of-N per leg cannot fix a
    ratio of independently-stalled legs. With adjacent legs a stall
    either spans the pair (inflating both legs, mostly cancelling in
    the ratio) or poisons ONE pair — and the median over pairs
    discards a single poisoned pair entirely. The per-pair ratios in
    the full line make any residual interference visible."""
    smalls: list[float] = []
    bigs: list[float] = []
    ratios: list[float] = []
    for _ in range(n_pairs):
        t0 = time.perf_counter()
        run_small()
        s = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_big()
        b = time.perf_counter() - t0
        smalls.append(s)
        bigs.append(b)
        if s > 0:
            ratios.append(b / s)

    def _st(ts: list[float]) -> dict[str, float]:
        return {
            "med": round(_median(ts), 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
        }

    return {
        "small": _st(smalls),
        "big": _st(bigs),
        "ratio_med": round(_median(ratios), 2) if ratios else None,
        "ratio_min": round(min(ratios), 2) if ratios else None,
        "ratios": [round(r, 2) for r in ratios],
    }


def _stats_of(n: int, act) -> dict[str, float]:
    """median + min + max over n runs — the round-9 probe method.

    Round 8 published three probe numbers (pagerank_x10 18.5 s,
    snappy_write 11.5 s, bucketed_join 1.36 s) that regressed up to 11×
    on UNCHANGED code — single-digit-second I/O measurements at
    best-of-2 on a contended box. Publishing the median with the
    min..max spread makes that noise visible in the JSON instead of
    indistinguishable from a real regression."""
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        act()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    mid = len(ts) // 2
    med = ts[mid] if len(ts) % 2 else (ts[mid - 1] + ts[mid]) / 2
    return {
        "med": round(med, 3),
        "min": round(ts[0], 3),
        "max": round(ts[-1], 3),
    }


def _put_stats(out: dict, key: str, stats: dict[str, float]) -> None:
    """Publish `<key>_sec` = median (round-over-round comparable scalar)
    plus `<key>_spread_sec` = [min, max] (noise floor)."""
    out[f"{key}_sec"] = stats["med"]
    out[f"{key}_spread_sec"] = [stats["min"], stats["max"]]


def _quantile_swap_bench(spark, sf_dir: str) -> dict:
    """Exact two-phase quantiles vs approx_percentile — the swap the
    ranking docstrings promise at 100 TB, with the error actually
    observed instead of assumed. Exact = the registry's
    orders_exact_quantiles (two-phase global rank + integer
    interpolation); approx = one pass of approx_percentile at default
    accuracy (10000)."""
    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.queries import QUERIES

    pcts = [0.25, 0.50, 0.75, 0.90, 0.99]
    exact_q = QUERIES["orders_exact_quantiles"]
    exact_row = {}

    def _run_exact():
        exact_row["r"] = exact_q.spark(spark, sf_dir).collect()[0]

    o = load_table(spark, sf_dir, "orders")
    approx_row = {}

    def _run_approx():
        approx_row["r"] = o.agg(
            F.percentile_approx("o_totalprice", pcts).alias("qs")
        ).collect()[0]

    out = {
        "exact_sec": _best_of(3, _run_exact),
        "approx_sec": _best_of(3, _run_approx),
    }
    exact_vals = [exact_row["r"][i] for i in range(len(pcts))]
    approx_vals = list(approx_row["r"].qs)
    out["max_rel_err"] = round(
        max(
            abs(a - e) / abs(e)
            for a, e in zip(approx_vals, exact_vals)
            if e != 0
        ),
        6,
    )
    return out


def _distinct_swap_bench(spark, sf_dir: str) -> dict:
    """Exact countDistinct vs approx_count_distinct (HLL++, default
    rsd 5%) over the fact table's key — times + observed error."""
    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact_v, approx_v = {}, {}

    def _run_exact():
        exact_v["n"] = li.agg(
            F.countDistinct("l_orderkey").alias("n")
        ).collect()[0].n

    def _run_approx():
        approx_v["n"] = li.agg(
            F.approx_count_distinct("l_orderkey").alias("n")
        ).collect()[0].n

    out = {
        "exact_sec": _best_of(3, _run_exact),
        "approx_sec": _best_of(3, _run_approx),
    }
    out["rel_err"] = round(
        abs(approx_v["n"] - exact_v["n"]) / exact_v["n"], 6
    )
    return out


def _manifest_slope_bench(spark, sf_dir: str) -> dict:
    """Shard-manifest walk slope vs shard count: the tar/zip/WARC
    manifest stages are NARROW Arrow fan-outs (no shuffle), so wall
    time must grow ~linearly with shard count and parallelize with the
    scan. Measured: tar_members over N and 4N identical real tar
    shards (3 members each, built once with stdlib tarfile and
    broadcast as a literal column — the walk cost is per-shard, not
    per-distinct-shard). Published: median+spread at both points (after
    one warmup run so Arrow worker spin-up doesn't pollute the x1
    spread), the slope (≤4 is linear-or-better — per-job overhead
    amortizes, so sublinear is expected at these sizes; >>4 would mean
    a hidden superlinear stage), and shards/s at the larger point.

    The x1/x4 legs run INTERLEAVED (``_paired_slope``) and slope_med
    is the median of per-pair ratios — the r12 stall-robustness fix;
    BENCH_r11 shipped slope_med 6.53 (judge re-run: 1.6-2.9) because
    the tar 4x leg caught a multi-10-second stall the x1 leg,
    measured minutes earlier, did not."""
    import io
    import tarfile

    from pyspark.sql import functions as F

    from data_ingestion_py_spark.sources.archive import tar_manifest

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in (
            ("sample/0001.jpg", b"\xff\xd8" + b"j" * 900),
            ("sample/0001.txt", b"a caption " * 20),
            ("sample/0001.json", b'{"k": 1}'),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    payload = buf.getvalue()
    # 25k/100k: large enough that per-job overhead doesn't swamp the
    # walk, small enough that the 4x point's ~350 MB Arrow transfer
    # doesn't trip full GCs when the probe runs late in a bench pass
    n1 = 25_000

    def run(n: int):
        media = spark.range(n).select(
            F.col("id").alias("media_id"),
            F.lit(payload).alias("payload"),
        )
        tar_manifest(media).write.mode("overwrite").format("noop").save()

    out: dict = {}
    run(1_000)  # warmup: Python worker + Arrow codepath spin-up
    ps = _paired_slope(3, lambda: run(n1), lambda: run(4 * n1))
    _put_stats(out, "shards_x1", ps["small"])
    _put_stats(out, "shards_x4", ps["big"])
    # slope_med = median of per-pair ratios (stall-robust); slope_min =
    # quietest pair, approximating the intrinsic per-shard cost when
    # even adjacent legs catch a full GC (observed max 21 s vs min
    # 2.6 s on the same plan); per-pair ratios keep interference
    # visible.
    out["slope_min"] = ps["ratio_min"]
    out["slope_med"] = ps["ratio_med"]
    out["slope_pairs"] = ps["ratios"]
    out["shards_per_sec_x4"] = (
        round(4 * n1 / ps["big"]["min"]) if ps["big"]["min"] else None
    )

    # r14 (VERDICT task #7): a two-DECADE tar point — one pair at
    # x1=2.5k vs x100=250k shards (same per-shard walk, ~875 MB of
    # Arrow traffic streamed through the noop sink). Linear-or-better
    # means slope ≤100; per-job overhead amortizing at the big point
    # usually lands it well under.
    t100 = _paired_slope(1, lambda: run(2_500), lambda: run(250_000))
    _put_stats(out, "shards_x100", t100["big"])
    out["tar_slope_x100"] = t100["ratio_med"]
    out["shards_per_sec_x100"] = (
        round(250_000 / t100["big"]["min"]) if t100["big"]["min"] else None
    )

    # SECOND format, same method: the scale claim for the shard walks
    # should rest on more than tar — a real 3-member ZIP (central
    # directory walk, stdlib-built) through zip_manifest at the same
    # two points.
    import zipfile

    from data_ingestion_py_spark.sources.archive import zip_manifest

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("sample/0001.jpg", b"\xff\xd8" + b"j" * 900)
        zf.writestr("sample/0001.txt", b"a caption " * 20)
        zf.writestr("sample/0001.json", b'{"k": 1}')
    zpayload = zbuf.getvalue()

    def run_zip(n: int):
        media = spark.range(n).select(
            F.col("id").alias("media_id"),
            F.lit(zpayload).alias("payload"),
        )
        zip_manifest(media).write.mode("overwrite").format("noop").save()

    run_zip(1_000)
    zs = _paired_slope(3, lambda: run_zip(n1), lambda: run_zip(4 * n1))
    _put_stats(out, "zip_x1", zs["small"])
    _put_stats(out, "zip_x4", zs["big"])
    out["zip_slope_min"] = zs["ratio_min"]
    out["zip_slope_med"] = zs["ratio_med"]
    out["zip_slope_pairs"] = zs["ratios"]
    out["zip_shards_per_sec_x4"] = (
        round(4 * n1 / zs["big"]["min"]) if zs["big"]["min"] else None
    )
    return out


def _dedup_slope_bench(spark, sf_dir: str) -> dict:
    """MinHash+LSH wall-time slope vs corpus growth: the band-bucket
    design claims cost ∝ collisions (~linear in corpus size), not
    corpus². Measured: near_duplicates_minhash over the documents
    table at 1× and 10×, where the 10× corpus is ten deterministic
    copies with every token suffixed by the copy index — each copy
    keeps the original's internal similarity structure but shares no
    shingles across copies, i.e. \"10× the data at the same dup-rate\"
    (naive all-pairs would grow 100×; band-bucketed should be ~10×,
    plus constant factors that AMORTIZE at larger data).

    The two legs run INTERLEAVED (``_paired_slope``) and the published
    slope is the median of per-pair ratios — the r12 stall-robustness
    fix; BENCH_r11 shipped slope 35.2 (true value 2.1) because the
    legs were timed minutes apart around a box stall."""
    from functools import reduce

    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.operators.dedup import (
        near_duplicates_minhash,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # Force shuffle joins for BOTH sizes: the corpus-sized shingle
    # tables in the verify join are exactly what a 100 TB run could
    # never broadcast (size ESTIMATES of text-heavy checkpointed
    # tables also undershoot badly enough that AQE's broadcast attempt
    # OOMs the single-JVM driver at 10×) — the shuffle-join plan is
    # the scale-representative one the slope claim is about.
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def corpus(m: int):
        parts = []
        for c in range(m):
            text = (
                F.col("text")
                if c == 0
                else F.regexp_replace("text", r"(\S+)", f"$1_{c}")
            )
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"),
                    text.alias("text"),
                )
            )
        return reduce(lambda a, b: a.unionByName(b), parts)

    try:
        corp1, corp10 = corpus(1), corpus(10)

        def _run(corp):
            near_duplicates_minhash(corp, threshold=0.5).write.mode(
                "overwrite"
            ).format("noop").save()

        _run(corp1)  # warmup: shuffle-join codepath + Arrow spin-up
        ps = _paired_slope(3, lambda: _run(corp1), lambda: _run(corp10))
        out: dict = {}
        _put_stats(out, "x1", ps["small"])
        _put_stats(out, "x10", ps["big"])
        out["slope"] = ps["ratio_med"]
        out["slope_pairs"] = ps["ratios"]
        # r14 (VERDICT task #7): a THIRD scale point — one x1/x100
        # pair (500k docs at sf0.1), making "bucketed, not all-pairs"
        # a measured two-decade line: all-pairs would grow 10,000×
        # from x1; band-bucketing should stay ~100× or (amortizing
        # fixed costs) under it. One pair keeps the leg affordable;
        # its single ratio is adjacent-timed, so a stall inflates both
        # legs and mostly cancels.
        corp100 = corpus(100)
        p100 = _paired_slope(1, lambda: _run(corp1), lambda: _run(corp100))
        _put_stats(out, "x100", p100["big"])
        out["slope_x100"] = p100["ratio_med"]
        return out
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def _iter_slope_bench(spark, sf_dir: str) -> dict:
    """Wall-time slope of the ITERATIVE operators at 1× vs 10× input
    growth — the dedup_slope method applied where scale surprises hide
    (per-round joins whose lineage/shuffle behavior could degrade
    superlinearly). 10× = ten disjoint id-shifted copies of the same
    graph/table: per-copy structure (and so round count) is unchanged,
    so a healthy slope is ~10× wall or less; a superlinear slope means
    a per-round cost that scales worse than the data.

    Three shapes, matching the registry's iterative families:
    - pagerank: integer power iteration (fixed 5 rounds) on an
      orders-derived bipartite customer→order-slot graph;
    - components: large-star/small-star alternation on the same edges;
    - rank: the two-phase global rank + exact NTILE rollup that
      customer_decile_gains runs (range shuffle + per-partition
      windows + broadcast offsets)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.operators.components import (
        connected_components,
    )
    from data_ingestion_py_spark.operators.pagerank import pagerank_integer
    from data_ingestion_py_spark.operators.ranking import (
        ntile_expr,
        with_global_rank,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # Auto-broadcast off (dedup_slope pattern): at sf0.1×10 the x10
    # label/frontier tables sit near the size-estimate threshold and a
    # mis-estimated auto-broadcast OOMs the driver mid-checkpoint; the
    # slope claim is about the keyed-shuffle iterative shape anyway.
    # Explicit F.broadcast calls inside the operators are unaffected.
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def edges(m: int):
        parts = [
            o.select(
                (F.col("o_custkey") + F.lit(c * 10_000_000)).alias("src"),
                (
                    F.lit(1_000_000)
                    + (F.col("o_orderkey") % 9973)
                    + F.lit(c * 10_000_000)
                ).alias("dst"),
            )
            for c in range(m)
        ]
        return (
            reduce(lambda a, b: a.unionByName(b), parts)
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("w"))
        )

    def revenue(m: int):
        parts = [
            o.select(
                (F.col("o_custkey") + F.lit(c * 10_000_000)).alias("k"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
            for c in range(m)
        ]
        return (
            reduce(lambda a, b: a.unionByName(b), parts)
            .groupBy("k")
            .agg(F.sum("cents").alias("rev_c"))
        )

    def run_rank(m: int):
        ranked = with_global_rank(
            revenue(m),
            order_by=[F.col("rev_c").desc(), F.col("k")],
            rank_col="rnk",
            total_col="tot_n",
        )
        (
            ranked.withColumn(
                "decile", ntile_expr(F.col("rnk"), F.col("tot_n"), 10)
            )
            .groupBy("decile")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("rev_c").alias("dec_rev"),
            )
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    try:
        # Interleaved x1/x10 pairs per shape (r12, _paired_slope): the
        # published slope is the median of per-pair ratios, so a box
        # stall poisons one pair instead of one whole leg (BENCH_r11's
        # pagerank_slope 3.66 vs the judge-measured 1.83 was exactly
        # that failure). 4 pairs = 8 runs per shape, comparable wall
        # cost to the old 5-repeats-per-leg shape with none of its
        # minutes-apart ratio fragility.
        out: dict = {}
        e1, e10 = edges(1), edges(10)

        def _noop(df):
            df.write.mode("overwrite").format("noop").save()

        shapes = {
            "pagerank": (
                lambda: _noop(pagerank_integer(e1, n_iter=5)),
                lambda: _noop(pagerank_integer(e10, n_iter=5)),
            ),
            "components": (
                lambda: _noop(
                    connected_components(
                        e1.select("src", "dst"), "src", "dst", method="star"
                    )
                ),
                lambda: _noop(
                    connected_components(
                        e10.select("src", "dst"), "src", "dst", method="star"
                    )
                ),
            ),
            "rank": (lambda: run_rank(1), lambda: run_rank(10)),
        }
        for k, (small, big) in shapes.items():
            small()  # warmup: plan + checkpoint codepath spin-up
            ps = _paired_slope(4, small, big)
            _put_stats(out, f"{k}_x1", ps["small"])
            _put_stats(out, f"{k}_x10", ps["big"])
            out[f"{k}_slope"] = ps["ratio_med"]
            out[f"{k}_slope_pairs"] = ps["ratios"]
        return out
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def _band_index_probe_bench(spark, sf_dir: str) -> dict:
    """Probe-cost growth of the durable at-rest band index as batches
    accumulate: append the corpus in 10 batches and probe the SAME
    held-out batch after batch 1 and after batch 10. The bucket
    IN-list partition pruning (PartitionFilters) is supposed to keep
    probe cost governed by the probe batch's collision set, not the
    total index size — this measures that claim instead of documenting
    it. ``growth`` is probe-time(10 batches)/probe-time(1 batch);
    candidate counts are reported so a flat time with an empty probe
    would be visible as the lie it'd be."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.operators.band_index import BandIndex
    from data_ingestion_py_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = minhash_signatures(docs).localCheckpoint()
    # held-out probe batch: every 17th doc re-signed under a shifted id
    # (identical text → guaranteed collisions → realistic verify load)
    probe_sigs = (
        sigs.where(F.col("doc_id") % 17 == 0)
        .withColumn("doc_id", F.col("doc_id") + 5_000_000)
        .localCheckpoint()
    )
    base = tempfile.mkdtemp(prefix="bench_bandindex_")
    try:
        idx = BandIndex(spark, base + "/idx")
        out: dict[str, float] = {}
        n_cand = {}

        def _probe():
            n_cand["n"] = idx.probe(probe_sigs, 0.5).count()

        for b in range(10):
            idx.append_batch(
                sigs.where(F.col("doc_id") % 10 == b), batch_id=b
            )
            if b == 0:
                _put_stats(out, "probe_after_1", _stats_of(3, _probe))
                out["pairs_after_1"] = n_cand["n"]
        _put_stats(out, "probe_after_10", _stats_of(3, _probe))
        out["pairs_after_10"] = n_cand["n"]
        out["growth"] = round(
            out["probe_after_10_sec"] / out["probe_after_1_sec"], 2
        )
        # Residual growth is FILE-COUNT (10 batches × bucket dirs of
        # small files), the documented compaction territory — measure
        # that the maintenance path actually restores probe cost.
        idx = idx.compacted(base + "/idx_compacted")
        _put_stats(out, "probe_after_10_compacted", _stats_of(3, _probe))
        out["compaction_recovery"] = round(
            out["probe_after_10_compacted_sec"] / out["probe_after_1_sec"],
            2,
        )
        # Life continues AFTER compaction: append 5 more batches (new
        # shifted-id docs, same texts → same collision load per batch)
        # to the compacted index and probe again. The claim under test:
        # probe cost re-grows from the compacted floor (one file set +
        # 5 batch dirs), NOT from the original 10-small-batch curve —
        # i.e. probe_after_15 should sit well under probe_after_10
        # even though the index now holds 1.5× the data.
        for b in range(5):
            idx.append_batch(
                sigs.where(F.col("doc_id") % 10 == b).withColumn(
                    "doc_id", F.col("doc_id") + 20_000_000
                ),
                batch_id=10 + b,
            )
        _put_stats(out, "probe_after_15_from_compacted", _stats_of(3, _probe))
        out["pairs_after_15"] = n_cand["n"]
        out["regrowth_from_compacted"] = round(
            out["probe_after_15_from_compacted_sec"]
            / out["probe_after_1_sec"],
            2,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _ann_swap_bench(spark, sf_dir: str) -> dict:
    """Brute-force exact cosine top-10 vs IVF ANN (nprobe=2 of k=10
    clusters) — the documented scale swap for similarity search, with
    the recall actually observed.

    Runs on a deterministically CLUSTERED corpus (each fixture vector
    pulled toward one of 10 arithmetic centers, 10% of its original
    self as noise) because that is the regime IVF exists for: on the
    raw fixture's isotropic vectors recall ≈ nprobe/k by construction
    (measured 0.3 — no cluster structure to exploit), which says
    nothing about the swap. The number that carries to 100 TB is the
    fraction of the corpus scanned (nprobe/k) at the measured recall,
    not the absolute times at this SF."""
    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x, j: (
                ((F.col("label") * 37 + j * 11) % 13 - 6).cast("double")
                / 6.0
                + 0.1 * x.cast("double")
            ),
        ).alias("embedding"),
    ).localCheckpoint()
    exact_ids, ann_ids = {}, {}

    def _run_exact():
        exact_ids["r"] = [
            r.vec_id for r in cosine_topk(emb, 0, k=10).collect()
        ]

    def _run_ann():
        ann_ids["r"] = [r.vec_id for r in ivf_topk(emb, 0, k=10).collect()]

    out = {
        "brute_sec": _best_of(3, _run_exact),
        "ivf_sec": _best_of(3, _run_ann),
    }
    out["recall_at_10"] = round(
        len(set(exact_ids["r"]) & set(ann_ids["r"])) / 10, 2
    )
    return out



def _codec_swap_bench(spark, sf_dir: str) -> dict:
    """Parquet codec tradeoff measured on the biggest fact table:
    snappy (default, fast) vs zstd (denser) — write time, scan time,
    and on-disk bytes. At 100 TB the ratio decides storage cost vs
    CPU; the scan numbers show whether decompression is the
    bottleneck at the local I/O profile."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table

    import shutil

    li = load_table(spark, sf_dir, "lineitem")
    base = tempfile.mkdtemp(prefix="bench_codec_")
    out = {}
    try:
        for codec in ("snappy", "zstd"):
            path = os.path.join(base, codec)
            # mode=overwrite makes each repeat do the same full write,
            # so the median is a defensible write-cost figure (r8
            # published a single-shot 11.5 s snappy write that was pure
            # disk contention)
            _put_stats(
                out,
                f"{codec}_write",
                _stats_of(
                    3,
                    lambda: li.write.mode("overwrite")
                    .option("compression", codec)
                    .parquet(path),
                ),
            )
            nbytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            )
            out[f"{codec}_bytes"] = nbytes

            def _scan(p=path):
                spark.read.parquet(p).agg(
                    F.sum("l_extendedprice"), F.count(F.lit(1))
                ).collect()

            _put_stats(out, f"{codec}_scan", _stats_of(3, _scan))
        out["zstd_size_ratio"] = round(
            out["zstd_bytes"] / out["snappy_bytes"], 4
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _bucket_join_bench(spark, sf_dir: str) -> dict:
    """Bucketed vs plain sort-merge join on the customer key (broadcast
    off so both plans are SMJ): the measured number behind
    `io.write_bucketed` / SCALE.md "Bucketing". The one-time bucket
    write is reported separately — it amortizes over every repeated
    join, which is the whole point of the layout."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table, write_bucketed

    bucket_base = None
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:

        def _join(lo, lc):
            (
                lo.join(lc, lo["o_custkey"] == lc["c_custkey"])
                .groupBy("c_nationkey")
                .agg(F.count(F.lit(1)).alias("n"))
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        out: dict = {}
        _put_stats(out, "plain_join", _stats_of(5, lambda: _join(o, c)))
        base = bucket_base = tempfile.mkdtemp(prefix="bench_buckets_")
        t0 = time.perf_counter()
        write_bucketed(o, "bench_orders_b", ["o_custkey"], 16, base + "/o")
        write_bucketed(c, "bench_customer_b", ["c_custkey"], 16, base + "/c")
        out["bucket_write_once_sec"] = round(time.perf_counter() - t0, 3)
        ob = spark.table("bench_orders_b")
        cb = spark.table("bench_customer_b")
        _put_stats(out, "bucketed_join", _stats_of(5, lambda: _join(ob, cb)))
        return out
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS bench_orders_b")
        spark.sql("DROP TABLE IF EXISTS bench_customer_b")
        # external-location tables: DROP TABLE leaves the files behind
        if bucket_base is not None:
            shutil.rmtree(bucket_base, ignore_errors=True)


def _streaming_drain_bench(spark, sf_dir: str) -> dict:
    """Micro-batch drain throughput of the durable incremental rollup
    stream (streaming/pipeline.run_rollup_stream): the sf events table
    split into N files, drained one file per trigger under
    availableNow — N foreachBatch rounds, each an algebraic partial
    agg + idempotency probe + tiny state append. Streaming is
    restart/idempotence-TESTED in tests/test_streaming.py; this
    measures it, so 'the streaming path keeps up' is a number
    (rows/sec through the maintained state), not a docstring.

    THREE points so both scale axes get a slope like every other
    claim: 10 and 100 micro-batches over the SAME rows (the handler's
    work per batch is batch-sized and state is an append-only partial
    log, so 10× the batch count for the same data should cost the
    per-batch overhead only — ``batch_overhead_sec`` =
    (drain_100 − drain_10)/90 is one more micro-batch's price), and —
    r12 — 10 batches over TEN id-suffixed copies of the rows (each
    copy contributes its own event_type groups, so state cardinality
    scales with the data like a real corpus): ``rows_slope`` =
    drain(10× rows)/drain(1× rows) at equal batch count, measured as
    interleaved pairs (``_paired_slope``) so a box stall poisons one
    pair, not the claim. An incomplete drain (awaitTermination
    timeout) is flagged, never silently published as throughput."""
    import shutil
    import tempfile

    from functools import reduce

    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.streaming.pipeline import (
        read_rollup_state,
        run_rollup_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    n_rows = ev.count()
    out: dict = {"rows": n_rows}

    def _one_drain(df, n_batches: int, report_groups: bool = False) -> float:
        base = tempfile.mkdtemp(prefix="bench_stream_")
        try:
            src = base + "/events"
            df.repartition(n_batches).write.parquet(src)
            t0 = time.perf_counter()
            q = run_rollup_stream(spark, src, base + "/state", base + "/ckpt")
            finished = q.awaitTermination(1200)
            wall = time.perf_counter() - t0
            if not finished:
                q.stop()
                raise TimeoutError(f"drain b{n_batches} timed out")
            if report_groups:
                out["state_groups"] = read_rollup_state(
                    spark, base + "/state"
                ).count()
            return wall
        finally:
            shutil.rmtree(base, ignore_errors=True)

    for n_batches in (10, 100):
        try:
            wall = _one_drain(ev, n_batches, report_groups=n_batches == 10)
        except TimeoutError:
            out[f"b{n_batches}_timed_out"] = True
            continue
        out[f"b{n_batches}_drain_sec"] = round(wall, 3)
        out[f"b{n_batches}_rows_per_sec"] = int(n_rows / wall)
    if "b10_drain_sec" in out and "b100_drain_sec" in out:
        out["batch_overhead_sec"] = round(
            (out["b100_drain_sec"] - out["b10_drain_sec"]) / 90, 4
        )
    # 10x-ROWS point: ten copies, each with its own event_type suffix
    # (group cardinality scales with the data); interleaved pairs
    ev10 = reduce(
        lambda a, b: a.unionByName(b),
        [
            ev.withColumn(
                "event_type",
                F.concat(F.col("event_type"), F.lit(f"_{c}"))
                if c
                else F.col("event_type"),
            )
            for c in range(10)
        ],
    ).localCheckpoint()
    try:
        ps = _paired_slope(
            2, lambda: _one_drain(ev, 10), lambda: _one_drain(ev10, 10)
        )
        _put_stats(out, "rows_x1_b10", ps["small"])
        _put_stats(out, "rows_x10_b10", ps["big"])
        out["rows_slope"] = ps["ratio_med"]
        out["rows_slope_pairs"] = ps["ratios"]
        out["rows_x10_rows_per_sec"] = (
            int(10 * n_rows / ps["big"]["min"]) if ps["big"]["min"] else None
        )
    except TimeoutError:
        out["rows_slope_timed_out"] = True
    return out


def _ivf_index_probe_bench(spark, sf_dir: str) -> dict:
    """band_index_probe's twin for the durable IVF similarity index
    (operators/ivf_index): append the embeddings corpus in 5 batches
    (shifted ids, so the index grows 5×), probe the SAME query after
    batch 1 and after batch 5, then compact and probe again. The cid
    partition pruning should keep probe cost governed by the probed
    clusters' bytes + file count, not total index size; scanned-bytes
    fraction is reported so a flat time with an unpruned scan would be
    visible."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.operators.ivf_index import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qv = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first().embedding
    ]
    base = tempfile.mkdtemp(prefix="bench_ivfindex_")
    try:
        idx = IvfIndex(spark, base + "/idx", k=8)
        out: dict = {}

        def _probe():
            idx.probe(qv, k=10, nprobe=2).collect()

        for b in range(5):
            idx.append_batch(
                emb.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(b * 10_000_000)
                ),
                batch_id=b,
            )
            if b == 0:
                _put_stats(out, "probe_after_1", _stats_of(3, _probe))
        _put_stats(out, "probe_after_5", _stats_of(3, _probe))
        out["growth"] = round(
            out["probe_after_5_sec"] / out["probe_after_1_sec"], 2
        )
        probed = idx.probe_clusters(qv, 2)
        n_all = idx.vectors().count()
        n_probed = (
            idx.vectors().where(F.col("cid").isin(probed)).count()
        )
        out["corpus_fraction_scanned"] = round(n_probed / n_all, 3)
        idx = idx.compacted(base + "/idx_compacted")
        _put_stats(out, "probe_after_5_compacted", _stats_of(3, _probe))
        out["compaction_recovery"] = round(
            out["probe_after_5_compacted_sec"] / out["probe_after_1_sec"], 2
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
