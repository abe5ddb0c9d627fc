"""Physical-plan regression tests: the properties that decide whether a
query survives a 100× scale-up, pinned as assertions.

If one of these fails after a change, the plan regressed — not just the
runtime on the 60k-row fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import data_ingestion_py_spark.queries_ext  # noqa: F401
from data_ingestion_py_spark.plans import explain as E
from data_ingestion_py_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return QUERIES[name].spark(spark, SF_SMOKE)


def test_q6_filters_pushed_to_scan(spark):
    df = _q(spark, "q6_revenue_filter")
    pushed = " ".join(E.pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_column_pruning(spark):
    schemas = E.read_schemas(_q(spark, "q6_revenue_filter"))
    assert schemas, "no scan found"
    # only the 4 referenced columns are read, not all 11
    assert all(s.count(":") <= 4 for s in schemas), schemas


def test_filter_eq_project_prunes_and_pushes(spark):
    df = _q(spark, "filter_eq_project")
    assert any("source" in f for f in E.pushed_filters(df))
    schemas = E.read_schemas(df)
    assert all("text" not in s for s in schemas), (
        f"giant text column read unnecessarily: {schemas}"
    )


def test_dim_join_broadcasts(spark):
    df = _q(spark, "dim_broadcast_join")
    assert E.has_broadcast_join(df)
    assert not E.has_sort_merge_join(df), "dim join must not shuffle-sort"
    # only the final groupBy may shuffle
    assert E.num_exchanges(df) <= 1, E.executed_plan(df)


def test_q3_broadcasts_filtered_dim(spark):
    df = _q(spark, "q3_top_revenue_orders")
    assert E.has_broadcast_join(df)


def test_q5_six_way_join_limits_shuffles(spark):
    df = _q(spark, "q5_region_volume")
    assert E.has_broadcast_join(df)
    # big-side joins + final agg; dims must not add exchanges
    assert E.num_exchanges(df) <= 4, E.executed_plan(df)


def test_snippetize_is_narrow_and_jvm_only(spark):
    df = _q(spark, "snippets_flat")
    assert E.num_exchanges(df) == 0, "snippetize must not shuffle"
    assert not E.uses_python_eval(df)
    assert E.codegen_stage_count(df) >= 1


def test_flagship_agg_single_shuffle(spark):
    df = _q(spark, "snippet_stats_by_lang")
    # countDistinct adds an expand/second agg pass; ≤2 exchanges total
    assert E.num_exchanges(df) <= 2
    assert not E.uses_python_eval(df)


def test_similarity_topk_no_shuffle_before_topk(spark):
    df = _q(spark, "similarity_cosine_topk")
    assert not E.uses_python_eval(df)
    # broadcast of the query vector, TakeOrdered on top — corpus side
    # must not shuffle
    assert E.num_exchanges(df) == 0, E.executed_plan(df)


def test_dedup_exact_single_shuffle(spark):
    df = _q(spark, "dedup_exact")
    assert E.num_exchanges(df) <= 1
    assert not E.uses_python_eval(df)


@pytest.mark.slow  # registry-wide plan sweep (~1-3 min; r16: the
# five whole-registry lints were 37% of suite wall time and pushed
# the driver's pytest past its window — run explicitly with
# `pytest -m slow` or `-m ''`; the builder's close sweep does)
def test_no_python_udfs_anywhere_in_registry(spark):
    """Every registered query stays JVM-side, except the multimodal
    entries whose decode stage is BY DESIGN an Arrow-batched
    mapInPandas (never row-at-a-time BatchEvalPython).

    Error-isolated: a query that fails to even build is reported as
    that query's failure, without hiding the lint result for the rest
    of the registry (round-4 lesson: 3 broken queries took down 4
    lints)."""
    failures: list[str] = []
    for name, q in QUERIES.items():
        try:
            df = q.spark(spark, SF_SMOKE)
            if "multimodal" in q.tags:
                plan = E.executed_plan(df)
                if "MapInPandas" not in plan:
                    failures.append(f"{name}: lost its Arrow stage")
                if "BatchEvalPython" in plan:
                    failures.append(f"{name}: row-at-a-time Python")
            elif E.uses_python_eval(df):
                failures.append(f"{name}: uses Python eval")
        except Exception as exc:  # noqa: BLE001 — collect, don't abort
            failures.append(f"{name}: BROKEN ({type(exc).__name__}: {exc})")
    assert not failures, "\n".join(failures)


def test_embedding_near_dup_no_crossjoin(spark):
    """The LSH candidate join must be a real equi-join on band keys —
    a crossJoin here is the O(n²) plan that dies at scale."""
    df = _q(spark, "dedup_embedding_cosine")
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not E.uses_python_eval(df)


def test_asof_join_single_shuffle_no_python(spark):
    """The as-of join must stay a union + one keyed window: one
    exchange, no cartesian/range join, no Python."""
    df = _q(spark, "events_asof_join")
    plan = E.executed_plan(df)
    assert E.num_exchanges(df) == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not E.uses_python_eval(df)


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """The 100 TB co-location story: bucketing both join sides on the
    key removes the per-query exchanges entirely — the join reads
    pre-shuffled data. This is the deploy-time answer to the
    lineitem⋈orders shuffles the plan tests above merely bound."""
    from data_ingestion_py_spark.io import load_table
    from tests.conftest import SF_SMOKE

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    load_table(spark, SF_SMOKE, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    load_table(spark, SF_SMOKE, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_b")
    try:
        li, od = spark.table("li_b"), spark.table("ord_b")
        joined = li.join(
            od, li["l_orderkey"] == od["o_orderkey"]
        ).groupBy("o_orderpriority").count()
        # disable broadcast so the join itself is exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = E.executed_plan(joined)
            assert E.num_exchanges(joined) <= 1, plan  # only the final agg
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_range_join_is_banded_equi_join(spark):
    """The bounded-distance join must execute as an equi-join on
    (key, bin) — a BroadcastNestedLoopJoin here is the O(n·m) plan
    the banding exists to prevent."""
    df = _q(spark, "events_range_join_pairs")
    plan = E.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert E.num_exchanges(df) <= 2, plan
    assert not E.uses_python_eval(df)


def test_salted_join_equals_plain_join_and_distributes(spark):
    """Salting must not change results, only the key distribution:
    every output row of the salted join matches the plain join, and the
    physical join key includes the salt."""
    from data_ingestion_py_spark.io import load_table
    from data_ingestion_py_spark.operators.skew import salted_join
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    # simulate a hot-key dim join: parts joined from lineitem
    part = load_table(spark, SF_SMOKE, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    salted = salted_join(li, part, key="l_partkey", salt_from="l_orderkey")
    plain = li.join(part, "l_partkey")
    a = salted.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("q"),
    )
    b = plain.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("q"),
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    assert "_salt" in E.executed_plan(salted.select("p_brand")), (
        "salt not part of the join key"
    )


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """write_partitioned → read with a partition predicate must scan
    only the matching partition directories (PartitionFilters in the
    scan, not a post-scan Filter over everything)."""
    from data_ingestion_py_spark.io import load_table, write_partitioned
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = E.formatted_plan(back)
    assert "PartitionFilters" in plan
    import re as _re

    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan
    assert back.count() > 0


# queries that intentionally broadcast a 1-row/tiny DataFrame via
# crossJoin (scalar subqueries, query vectors, doc counts) — their BNLJ
# is a broadcast of O(1) rows, not an accidental cartesian
#
# LIMITATION of every plan assertion in this file: a localCheckpoint /
# persisted pin truncates the visible plan at a LogicalRDD / InMemory
# node, so operators that pin intermediates (materialize.pin, the
# per-round checkpoints in kmeans/pagerank/components, packing's
# derived-range sizing) hide everything BELOW the pin from these
# lints — the checks cover each query's post-pin composition, and the
# pinned stages are covered where their builders are linted directly
# (e.g. the signature pipeline via dedup-query plans before pinning).
# A lint pass over a pinned stage's pre-pin plan requires asserting on
# the builder expression itself, which the operator unit tests do.
_TINY_BROADCAST_OK = {
    "similarity_cosine_topk",
    "similarity_lsh_ann",
    "similarity_ivf_topk",
    "similarity_active_snippets",
    "customers_above_avg_balance",
    "q15_top_supplier",
    "q22_dormant_rich_customers",
    "text_tfidf_top_terms",
    "dedup_embedding_cosine",
    "similarity_knn_join",
    "embedding_kmeans_assign",
    "dedup_semdedup_kmeans",
    "similarity_ivf_kmeans",
    "events_value_histogram",
    "events_funnel_conversion",
    "dq_constraint_violations",
    "similarity_pq_topk",
    "corpus_build_e2e",
    "orders_winsorized_stats",
    # 1-row corpus stats (N, Σdl) / vocab-size broadcasts
    "text_bm25_topk",
    "corpus_bigram_lm_score",
    "corpus_dsir_weights",
    # 1-row query vector + m-row shortlist self-join (m=10)
    "similarity_mmr_diversify",
    # 1-row argmax merge broadcast per BPE round / stats scalars
    "text_bpe_merges",
    "corpus_subword_tokens",
    "text_pmi_pairs",
    "corpus_temperature_mixture",
    # 1-row projected-query + query-vector broadcasts
    "similarity_rp_topk",
    # 10-row anchor broadcast with a non-equi (source<>source) guard
    "corpus_negative_samples",
    # 1-row snapshot-totals broadcast
    "corpus_drift_terms",
    # BM25 over snippets: same 1-row corpus-stats broadcast as
    # text_bm25_topk
    "snippets_bm25_search",
    # 1-row basket-count broadcast
    "orders_brand_basket_pairs",
    # 1-row leaked-pairs counter broadcast onto the 3-row split report
    "dataset_split_leakage_safe",
    # 1-row token-budget scalar broadcast onto the source-sized plan
    "corpus_token_budget_allocation",
    # 1-row revenue-total broadcast onto the 10-row decile rollup
    "customer_decile_gains",
    # 1-row traffic-total broadcast onto the 168-row weekly profile
    "events_weekly_seasonality",
    # type-pair scaffolding: a types² (≤ ~10²-row) broadcast drives the
    # a<b pair generation and the IN-(ta,tb) membership probe — the
    # broadcast side is bounded by distinct types, never data-sized
    "events_kmv_set_overlap",
    # ≤9-row first-digit agg × 1-row total-count broadcast (the same
    # scalar-denominator shape as events_value_histogram); added in r7
    # without this entry — the lint was red for two rounds over it
    "dq_benford_first_digit",
    # inherits both legs' scalar broadcasts: BM25's 1-row corpus stats
    # (as text_bm25_topk) + cosine's 1-row query vector
    "text_rrf_hybrid_search",
}


@pytest.mark.slow  # registry-wide plan sweep (~1-3 min; r16: the
# five whole-registry lints were 37% of suite wall time and pushed
# the driver's pytest past its window — run explicitly with
# `pytest -m slow` or `-m ''`; the builder's close sweep does)
def test_no_accidental_cartesian_anywhere(spark):
    """No registry query may contain a CartesianProduct, and
    BroadcastNestedLoopJoin only where a deliberate 1-row/tiny
    broadcast is part of the algorithm. Error-isolated per query."""
    failures: list[str] = []
    for name, q in QUERIES.items():
        try:
            plan = E.executed_plan(q.spark(spark, SF_SMOKE))
            if "CartesianProduct" in plan:
                failures.append(f"{name}: has a cartesian")
            if name not in _TINY_BROADCAST_OK and "BroadcastNestedLoopJoin" in plan:
                failures.append(f"{name}: unexpected nested-loop join")
        except Exception as exc:  # noqa: BLE001 — collect, don't abort
            failures.append(f"{name}: BROKEN ({type(exc).__name__}: {exc})")
    assert not failures, "\n".join(failures)


@pytest.mark.slow  # registry-wide plan sweep (~1-3 min; r16: the
# five whole-registry lints were 37% of suite wall time and pushed
# the driver's pytest past its window — run explicitly with
# `pytest -m slow` or `-m ''`; the builder's close sweep does)
def test_tiny_broadcast_allowlist_is_actually_tiny(spark):
    """The BNLJ allowlist is a CHECKED contract, not a trust-forever
    list: execute every allowlisted query and measure the actual
    broadcast row count of each BroadcastNestedLoopJoin build side
    (numOutputRows on the feeding BroadcastExchange). A name whose
    "1-row scalar" broadcast silently grows to corpus size fails here
    even though the cartesian lint above would keep waving it through.

    Bound: 1000 rows — an order of magnitude above the biggest
    legitimate scalar/shortlist broadcast (k-row shortlists, 10-row
    anchors) and far below any data-sized relation even at SF_SMOKE.
    events_kmv_set_overlap gets a documented higher bound: its
    broadcast is the distinct-type-pair scaffold (types², 792 rows at
    SF_SMOKE) — bounded by event-type cardinality, which does NOT grow
    with data volume."""
    bounds = {"events_kmv_set_overlap": 4096}
    failures: list[str] = []
    for name in sorted(_TINY_BROADCAST_OK):
        bound = bounds.get(name, 1000)
        try:
            rows = E.bnlj_broadcast_rows(QUERIES[name].spark(spark, SF_SMOKE))
        except Exception as exc:  # noqa: BLE001 — collect, don't abort
            failures.append(f"{name}: BROKEN ({type(exc).__name__}: {exc})")
            continue
        oversized = [r for r in rows if r > bound]
        if oversized:
            failures.append(
                f"{name}: broadcast side(s) {oversized} exceed {bound} rows"
            )
    assert not failures, "\n".join(failures)


def test_knn_join_uses_partial_window_group_limit(spark):
    """The batch k-NN per-query top-k must execute two-phase: a PARTIAL
    WindowGroupLimit per input partition ahead of the exchange (only
    ≤k rows per query per partition shuffle), never the full scored
    corpus. This is the Catalyst-native form of the hand-rolled
    local-top-k pattern — if a refactor loses the rank<=k filter shape,
    the partial limit disappears and this pins the regression."""
    df = _q(spark, "similarity_knn_join")
    plan = E.executed_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan
    assert E.num_exchanges(df) == 1, plan


def test_deterministic_sample_is_scan_side(spark):
    """The hash-bucket sample filter must be a narrow scan-side filter:
    no shuffle, no Python — at 100 TB a sample that shuffles first
    defeats its own purpose."""
    df = _q(spark, "sample_deterministic_pct")
    assert E.num_exchanges(df) == 0, E.executed_plan(df)
    assert not E.uses_python_eval(df)


def test_pii_redaction_stays_codegen(spark):
    """Regex scrub is a pure map stage: zero shuffles, zero Python."""
    df = _q(spark, "text_redact_pii")
    assert E.num_exchanges(df) == 0, E.executed_plan(df)
    assert not E.uses_python_eval(df)
    assert E.codegen_stage_count(df) >= 1


def test_merge_upsert_single_shuffle(spark):
    """MERGE-shape upsert = one exchange on the merge key (the window's
    partitionBy); updates and base co-shuffle in the same exchange."""
    df = _q(spark, "documents_merge_upsert")
    assert E.num_exchanges(df) <= 1, E.executed_plan(df)
    assert not E.uses_python_eval(df)


def test_grouping_sets_single_expand_pass(spark):
    """GROUPING SETS must be one Expand + hash-agg pass over the scan,
    not one job per dimension."""
    df = _q(spark, "events_grouping_sets")
    plan = E.executed_plan(df)
    assert plan.count("Expand") >= 1, plan
    # one shuffle for the (expanded) group keys
    assert E.num_exchanges(df) <= 1, plan


def test_runtime_bloom_filter_injected_on_selective_join(spark):
    """Scale machinery pin: with a selective filter on the build side of
    a shuffle join, the optimizer must inject a runtime bloom filter
    into the fact scan (might_contain over bloom_filter_agg) so the
    fact table is pruned BEFORE the exchange. Thresholds are lowered
    here because the payoff condition (fact bytes >> filtered build
    side) only exists at cluster scale; session.py enables the feature
    so a real deployment gets this plan automatically."""
    from data_ingestion_py_spark.io import load_table

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        o = load_table(spark, SF_SMOKE, "orders")
        l = load_table(spark, SF_SMOKE, "lineitem")
        sel = o.where(F.col("o_orderpriority") == "1-URGENT")
        j = (
            l.join(sel, l.l_orderkey == sel.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = E.executed_plan(j)
        assert "might_contain" in plan, "runtime bloom filter not injected"
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# queries whose executed plan legitimately contains partition-less
# Window operators — every entry's window input is provably BOUNDED
# (calendar-sized or partition-count-sized), never row-proportional:
#   orders_yoy_revenue        lag over the year rollup (rows = years)
#   orders_rolling_7d_revenue range window over the day rollup
#                             (rows = calendar days)
#   corpus_pack_sequences     packing offsets table (rows = id-ranges,
#                             operators/packing.py two-phase form).
#                             NOTE: its default derived-range_size path
#                             localCheckpoints, so the executed plan
#                             shows Scan ExistingRDD — scan-level
#                             assertions (pushed_filters/read_schemas)
#                             on this query must use an explicit
#                             range_size build instead.
#   customer_rfm_segments     3x ranking offsets tables (rows =
#                             shuffle partitions, operators/ranking.py)
#   orders_pareto_revenue     1x ranking offsets table (same)
# name -> max allowed count, so a regression that ADDS one still fails.
_BOUNDED_GLOBAL_WINDOW_OK = {
    # RRF fusion: two row_number windows, each over a ≤20-row LIMIT
    # shortlist (per-leg top-k already cut) — bounded by construction
    "text_rrf_hybrid_search": 2,
    "orders_yoy_revenue": 1,
    "orders_rolling_7d_revenue": 1,
    "corpus_pack_sequences": 1,
    "customer_rfm_segments": 3,
    "orders_pareto_revenue": 1,
    "orders_exact_quantiles": 1,
    # two-phase global rank: offsets window runs over the bounded
    # per-partition-count aggregate (operators/ranking.py:94-98)
    "corpus_global_shuffle": 1,
    "corpus_length_powerlaw": 1,
    # Heaps-law: with_global_rank's offsets window over the
    # #partitions-row aggregate (two cumsums ride one window spec)
    "corpus_heaps_law": 1,
    # budget planning: rank+cumsum over the SOURCE-cardinality
    # aggregate (~1e2-1e4 rows at any corpus size)
    "corpus_token_budget_allocation": 1,
    # Gini rank formula over the same source-cardinality rollup
    "corpus_source_gini": 1,
    # per-group quantile transform: with_global_rank offsets table
    # surfaces its prefix and total windows (#partitions-row input)
    "customer_quantile_normalize": 2,
    # decile gains: 2 offsets windows (with_global_rank) + the cumsum
    # over the 10-row decile rollup
    "customer_decile_gains": 3,
    # sorted-neighborhood linkage: one with_global_rank whose offsets
    # table surfaces both its prefix and total windows in this plan —
    # both run over the #partitions-row aggregate
    "parts_sorted_neighborhood": 2,
}


@pytest.mark.slow  # registry-wide plan sweep (~1-3 min; r16: the
# five whole-registry lints were 37% of suite wall time and pushed
# the driver's pytest past its window — run explicitly with
# `pytest -m slow` or `-m ''`; the builder's close sweep does)
def test_single_partition_window_inputs_measured_bounded(spark):
    """The bounded-window allowlist as a MEASURED contract (the
    bnlj-broadcast-lint pattern applied to windows): execute EVERY
    registry query at SF_SMOKE and read the actual input row count of
    every partition-less Window/WindowGroupLimit off the executed
    plan's SQL metrics — partitionSpec is read from the node itself,
    so this also catches partition-less windows the text walk above
    can't see (e.g. fed by pre-materialized single-partition inputs).
    Every such window must stay under a grain constant (4096 rows —
    an order of magnitude above the biggest legitimate bounded input:
    calendar-day spines, #shuffle-partitions offset tables, top-k
    shortlists) no matter which query it hides in; a future window
    over a corpus-proportional input fails here even if its query
    name is allowlisted for plan SHAPE above."""
    # calendar-grain overrides: the gap-fill spine is one row per
    # 10-minute bin over the generator's FIXED event time span —
    # measured 4274 at every SF (more data densifies the bins, it
    # doesn't lengthen the calendar), so the input is constant in data
    # volume; the override leaves room for a longer planted span while
    # still tripping on anything data-proportional.
    bounds = {
        "events_gap_fill_locf": 65536,
        "events_gap_fill_interp": 65536,
    }
    failures: list[str] = []
    for name, q in QUERIES.items():
        bound = bounds.get(name, 4096)
        try:
            rows = E.single_partition_window_input_rows(
                q.spark(spark, SF_SMOKE)
            )
        except Exception as exc:  # noqa: BLE001 — collect, don't abort
            failures.append(f"{name}: BROKEN ({type(exc).__name__}: {exc})")
            continue
        oversized = [r for r in rows if r > bound]
        if oversized:
            failures.append(
                f"{name}: partition-less window input(s) {oversized} "
                f"exceed {bound} rows — use the two-phase "
                "global-rank/offsets form"
            )
    assert not failures, "\n".join(failures)


@pytest.mark.slow  # registry-wide plan sweep (~1-3 min; r16: the
# five whole-registry lints were 37% of suite wall time and pushed
# the driver's pytest past its window — run explicitly with
# `pytest -m slow` or `-m ''`; the builder's close sweep does)
def test_no_unbounded_single_partition_windows(spark):
    """No registry query may single-partition a row-proportional input
    through a partition-less Window. The allowlist above enumerates the
    windows that run over bounded aggregates (the correct two-phase
    form); anything else must use operators/ranking.py or
    operators/packing.py. This pins VERDICT r2 finding #2 permanently."""
    failures: list[str] = []
    for name, q in QUERIES.items():
        try:
            n = E.single_partition_windows(q.spark(spark, SF_SMOKE))
            cap = _BOUNDED_GLOBAL_WINDOW_OK.get(name, 0)
            if n > cap:
                failures.append(
                    f"{name}: {n} single-partition Window(s), allowed {cap} — "
                    "use the two-phase global-rank/offsets form"
                )
        except Exception as exc:  # noqa: BLE001 — collect, don't abort
            failures.append(f"{name}: BROKEN ({type(exc).__name__}: {exc})")
    assert not failures, "\n".join(failures)
