"""Data-quality and warehouse-maintenance operators: declarative
constraint checking and SCD2 (slowly-changing-dimension) versioning.

The reference enforces its invariants imperatively, one document at a
time (name-duplicate guard at data_ingestion.py:232, category-value
guard at :338); at corpus scale invariants are checked set-wise — one
pass, one violations report — and dimension history is kept as
versioned rows, not overwrites. Both are pure column algebra with
DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.queries import register


# ---------------------------------------------------------------------------
# Declarative constraint checking
# ---------------------------------------------------------------------------


@register(
    "dq_constraint_violations",
    """
SELECT 'orders.custkey_not_null' AS rule,
       CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
           AS n_violations,
       CAST(count(*) AS BIGINT) AS n_checked
FROM orders
UNION ALL
SELECT 'orders.orderkey_unique',
       CAST(COALESCE(sum(cnt - 1), 0) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'lineitem.orderkey_refs_orders',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'orders.status_accepted',
       CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
            AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem.discount_range',
       CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
            AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM lineitem
""",
    tags=("dq", "constraints"),
)
def q_dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite — not-null, uniqueness,
    referential integrity, accepted values, numeric range — one
    violations row per rule. Each rule is a single aggregate (or one
    anti-join for the FK rule) over its table; nothing materializes on
    the driver. At 100 TB the per-table rules share one scan each and
    the FK check is the only shuffle (orderkey anti-join) — the shape
    every expectations framework compiles to."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    not_null = o.agg(
        F.lit("orders.custkey_not_null").alias("rule"),
        F.sum(F.col("o_custkey").isNull().cast("int"))
        .cast("long")
        .alias("n_violations"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
    )
    unique = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.lit("orders.orderkey_unique").alias("rule"),
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
            .cast("long")
            .alias("n_violations"),
            F.count(F.lit(1)).cast("long").alias("n_checked"),
        )
    )
    orphans = l.join(
        o.select("o_orderkey"),
        l["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    fk = orphans.crossJoin(
        F.broadcast(l.agg(F.count(F.lit(1)).cast("long").alias("n_checked")))
    ).select(
        F.lit("lineitem.orderkey_refs_orders").alias("rule"),
        "n_violations",
        "n_checked",
    )
    accepted = o.agg(
        F.lit("orders.status_accepted").alias("rule"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("int"))
        .cast("long")
        .alias("n_violations"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
    )
    rng = l.agg(
        F.lit("lineitem.discount_range").alias("rule"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_violations"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
    )
    return not_null.unionByName(unique).unionByName(fk).unionByName(
        accepted
    ).unionByName(rng)


# ---------------------------------------------------------------------------
# SCD2 dimension versioning
# ---------------------------------------------------------------------------

_SCD2_SQL = """
WITH current AS (
    SELECT doc_id, lang, source,
           '2024-01-01' AS valid_from, NULL AS valid_to
    FROM documents
), updates AS (
    -- the synthetic change batch: every %4 doc re-languaged, every %6
    -- doc re-sourced (doc %12 changes both)
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN 'xx' ELSE lang END AS lang,
           CASE WHEN doc_id % 6 = 0 THEN 'src_new' ELSE source END AS source
    FROM documents
    WHERE doc_id % 4 = 0 OR doc_id % 6 = 0
), changed AS (
    SELECT u.doc_id, u.lang, u.source
    FROM updates u JOIN current c ON u.doc_id = c.doc_id
    WHERE u.lang <> c.lang OR u.source <> c.source
)
SELECT c.doc_id, c.lang, c.source, c.valid_from,
       CASE WHEN ch.doc_id IS NOT NULL THEN '2024-06-01' END AS valid_to,
       CAST(ch.doc_id IS NULL AS INT) AS is_current
FROM current c LEFT JOIN changed ch ON c.doc_id = ch.doc_id
UNION ALL
SELECT doc_id, lang, source, '2024-06-01' AS valid_from,
       NULL AS valid_to, 1 AS is_current
FROM changed
"""


@register("dq_scd2_document_versions", _SCD2_SQL, tags=("dq", "scd2"))
def q_dq_scd2_document_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge: apply a change batch to a dimension while keeping
    history — changed rows get their old version closed (valid_to
    stamped) and a new open version appended; no-op updates (batch rows
    equal to current) are detected and skipped. One equi-join on the
    business key plus a union — the MERGE a Delta/Iceberg table runs,
    expressed engine-neutral. Dates are literal strings: the batch's
    effective date is pipeline metadata, not data."""
    d = load_table(spark, sf_dir, "documents")
    current = d.select(
        "doc_id",
        "lang",
        "source",
        F.lit("2024-01-01").alias("valid_from"),
    )
    updates = d.where((F.col("doc_id") % 4 == 0) | (F.col("doc_id") % 6 == 0)).select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, "xx").otherwise(F.col("lang")).alias("lang"),
        F.when(F.col("doc_id") % 6 == 0, "src_new")
        .otherwise(F.col("source"))
        .alias("source"),
    )
    changed = (
        updates.alias("u")
        .join(current.alias("c"), "doc_id")
        .where(
            (F.col("u.lang") != F.col("c.lang"))
            | (F.col("u.source") != F.col("c.source"))
        )
        .select("doc_id", F.col("u.lang").alias("lang"), F.col("u.source").alias("source"))
    )
    closed_or_open = (
        current.alias("c")
        .join(changed.select("doc_id", F.lit(1).alias("_chg")), "doc_id", "left")
        .select(
            "doc_id",
            F.col("c.lang").alias("lang"),
            F.col("c.source").alias("source"),
            "valid_from",
            F.when(F.col("_chg").isNotNull(), "2024-06-01").alias("valid_to"),
            F.col("_chg").isNull().cast("int").alias("is_current"),
        )
    )
    new_versions = changed.select(
        "doc_id",
        "lang",
        "source",
        F.lit("2024-06-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    return closed_or_open.unionByName(new_versions)


# ---------------------------------------------------------------------------
# Snapshot diff (table version comparison)
# ---------------------------------------------------------------------------


@register(
    "dq_snapshot_diff",
    """
WITH v1 AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0
), v2 AS (
    -- synthetic next snapshot: %13 docs removed (above), %7 docs
    -- rewritten, 50 new ids appended
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN 'rewritten ' || doc_id
                ELSE text END AS text
    FROM documents
    UNION ALL
    SELECT doc_id + 5000000, 'new doc ' || doc_id
    FROM documents WHERE doc_id % 10 = 0
)
SELECT status, CAST(count(*) AS BIGINT) AS n_rows
FROM (
    SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.text <> v2.text THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
GROUP BY status
""",
    tags=("dq", "diff"),
)
def q_dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: full-outer join of two table versions on the
    primary key, rows classified added / removed / changed / unchanged
    — the audit every incremental publish runs before swapping a table
    pointer. One co-partitioned shuffle on the key; change detection
    compares the payload column directly (at width, a row-hash column
    computed scan-side replaces the per-column compare — same plan).
    The second snapshot is synthesized deterministically from the
    fixture so both engines diff identical inputs."""
    d = load_table(spark, sf_dir, "documents")
    v1 = d.where(F.col("doc_id") % 13 != 0).select("doc_id", "text")
    v2 = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("rewritten "), F.col("doc_id")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        d.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 5000000).alias("doc_id"),
            F.concat(F.lit("new doc "), F.col("doc_id")).alias("text"),
        )
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.text") != F.col("b.text"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Z-order layout key (oracle twin of operators/layout.zorder_key)
# ---------------------------------------------------------------------------


@register(
    "layout_zorder_keys",
    """
SELECT l_orderkey, l_linenumber,
       CAST(list_sum(list_transform(generate_series(0, 7), i ->
           (((l_orderkey % 256) // (1 << i)) % 2) * (1 << (2 * i))
           + (((l_partkey % 256) // (1 << i)) % 2) * (1 << (2 * i + 1))
       )) AS BIGINT) AS zkey
FROM lineitem
""",
    tags=("layout", "zorder"),
)
def q_layout_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) key per row over two independent dimensions —
    the sort key operators/layout.write_zordered range-partitions by,
    so files become 2-D tiles and min/max stats prune on either
    predicate. Pure integer bit algebra, no UDF; the oracle recomputes
    the interleave arithmetically (division/modulo) while Spark uses
    shifts — independent constructions, same integers."""
    from data_ingestion_py_spark.operators.layout import zorder_key

    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key(F.col("l_orderkey"), F.col("l_partkey"), bits=8).alias(
            "zkey"
        ),
    )


@register(
    "dq_functional_dependencies",
    """
WITH cands AS (
    SELECT 'p_partkey->p_name' AS fd, CAST(p_partkey AS VARCHAR) AS k,
           p_name AS v FROM part
    UNION ALL
    SELECT 'p_type->p_size', p_type, CAST(p_size AS VARCHAR) FROM part
    UNION ALL
    SELECT 'p_brand->p_type', p_brand, p_type FROM part
), s AS (
    SELECT fd, k, count(DISTINCT v) AS nv FROM cands GROUP BY 1, 2
)
SELECT fd, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_keys,
       CAST(max(nv) AS BIGINT) AS max_values_per_key,
       CAST(CASE WHEN sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) = 0
                 THEN 1 ELSE 0 END AS INT) AS holds
FROM s GROUP BY fd
""",
    tags=("dq", "profiling"),
)
def q_dq_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for candidate FDs over the part
    dimension, count determinant keys mapping to >1 dependent value —
    the schema-inference / normalization check every profiler runs
    (p_partkey→p_name holds — the key determines every attribute;
    p_type→p_size and p_brand→p_type are expected to fail, so the
    report exercises both outcomes). Shape:
    one union of narrow projections, a (fd, key) distinct-count agg,
    and an fd-keyed rollup — two keyed shuffles at dimension
    cardinality, no windows. At 100 TB candidate generation is the
    quadratic part (profile column pairs on a SAMPLE first); the
    verification pass shown here is linear per candidate."""
    p = load_table(spark, sf_dir, "part")
    cands = (
        p.select(
            F.lit("p_partkey->p_name").alias("fd"),
            F.col("p_partkey").cast("string").alias("k"),
            F.col("p_name").alias("v"),
        )
        .unionByName(
            p.select(
                F.lit("p_type->p_size").alias("fd"),
                F.col("p_type").alias("k"),
                F.col("p_size").cast("string").alias("v"),
            )
        )
        .unionByName(
            p.select(
                F.lit("p_brand->p_type").alias("fd"),
                F.col("p_brand").alias("k"),
                F.col("p_type").alias("v"),
            )
        )
    )
    s = cands.groupBy("fd", "k").agg(F.countDistinct("v").alias("nv"))
    viol = F.sum(F.when(F.col("nv") > 1, 1).otherwise(0))
    return s.groupBy("fd").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        viol.cast("long").alias("n_violating_keys"),
        F.max("nv").cast("long").alias("max_values_per_key"),
        (viol == 0).cast("int").alias("holds"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

#: round(log10(1 + 1/d) * 1e6) per digit — Python-evaluated integer
#: literals so both engines compare against the identical expectation.
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_PPM_SQL = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
)


@register(
    "dq_benford_first_digit",
    f"""
WITH d AS (
    SELECT CAST(substr(CAST(CAST(o_totalprice * 100 AS BIGINT) AS VARCHAR),
                       1, 1) AS INT) AS digit
    FROM orders WHERE o_totalprice > 0
), c AS (
    SELECT digit, count(*) AS n FROM d GROUP BY digit
), t AS (SELECT sum(n) AS tot FROM c)
SELECT CAST(c.digit AS INT) AS digit,
       CAST(c.n AS BIGINT) AS n_obs,
       CAST(c.n * 1000000 // t.tot AS BIGINT) AS obs_ppm,
       CAST(CASE c.digit {_BENFORD_PPM_SQL} END AS BIGINT) AS exp_ppm,
       CAST(c.n * 1000000 // t.tot
            - CASE c.digit {_BENFORD_PPM_SQL} END AS BIGINT) AS delta_ppm
FROM c, t
""",
    tags=("dq", "fraud"),
)
def q_dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-numbers screen (synthetic or tampered monetary data
    rarely matches the log distribution of real multiplicative
    processes). Per digit 1-9: observed count, observed parts-per-
    million (EXACT integer ``n·10⁶ div total``), the Benford
    expectation as a shared integer literal, and the signed gap a
    release gate thresholds on. Everything integer end-to-end — no
    float in the compared output. TPC-H prices are uniform-ish, so the
    big deltas HERE are themselves the demo: the audit flags this
    synthetic table as non-Benford, which is correct.

    Scale shape: first digit via integer→string prefix (no log10
    float), one ≤9-key groupBy with map-side partials + a 1-row total
    broadcast — output bounded by the digit domain, not the data."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.agg(F.sum("n").alias("tot"))
    exp_ppm = F.coalesce(
        *[
            F.when(F.col("digit") == d, F.lit(p))
            for d, p in _BENFORD_PPM.items()
        ]
    ).cast("long")
    return c.crossJoin(F.broadcast(t)).select(
        F.col("digit").cast("int").alias("digit"),
        F.col("n").cast("long").alias("n_obs"),
        F.expr("n * 1000000 div tot").cast("long").alias("obs_ppm"),
        exp_ppm.alias("exp_ppm"),
        (F.expr("n * 1000000 div tot").cast("long") - exp_ppm)
        .cast("long")
        .alias("delta_ppm"),
    )


# ---------------------------------------------------------------------------
# Laplace-shaped noisy count release (deterministic pseudo-DP DEMO —
# NOT a privacy mechanism; see docstring)
# ---------------------------------------------------------------------------

_DP_EPSILON = 1.0  # noise-scale parameter of the demo (NOT a real DP budget)
_DP_SALT = "dp-release-v1"  # PUBLIC salt, committed to the repo — see docstring


@register(
    "dp_noisy_counts",
    f"""
WITH g AS (
    SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
), u AS (
    SELECT lang, source, n,
           ((('0x' || substr(md5(lang || '|' || source || '|{_DP_SALT}'),
                      1, 8))::BIGINT + 0.5) / 4294967296.0) AS unif
    FROM g
)
SELECT lang, source, CAST(n AS BIGINT) AS n_true,
       round(n + (-1.0 / {_DP_EPSILON!r}) * sign(unif - 0.5)
               * ln(1.0 - 2.0 * abs(unif - 0.5)), 3) AS n_noisy,
       {_DP_EPSILON!r} AS noise_scale
FROM u
""",
    tags=("dq", "noise-demo"),
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-SHAPED noisy per-(lang, source) document counts — a
    deterministic pseudo-DP DEMO, **NOT a privacy mechanism**.

    The noise is a pure function of the PUBLIC group key plus a salt
    committed to this repo, so anyone can recompute and subtract it
    exactly: the release provides ZERO differential privacy. (That is
    also why it is oracle-replayable — determinism from public inputs
    is what makes the benchmark exact, and precisely what breaks the
    privacy guarantee.) What this query demonstrates is the Spark
    *shape* of a Laplace release — inverse-CDF transform of an md5-
    derived uniform over the group-domain-sized aggregate. To turn it
    into real DP you must (a) draw the uniform from a secret key held
    OUT of the release (or true randomness plus a stored ledger), and
    (b) calibrate scale = sensitivity/ε per the composition budget;
    ``noise_scale`` here is just the demo's 1/λ parameter, not an ε
    guarantee. ``n_true`` rides along for the oracle gate; any real
    release drops it.

    Scale shape: one keyed count agg (combiner-friendly), then per-row
    scalar math on the group-domain-sized result — the noise step adds
    zero shuffles at any corpus size. Float discipline: one division,
    one ln, fixed multiply order, shared literals; round(3)."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("|", F.col("lang"), F.col("source"), F.lit(_DP_SALT))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    unif = (h32 + F.lit(0.5)) / F.lit(4294967296.0)
    noise = (
        F.lit(-1.0 / _DP_EPSILON)
        * F.signum(unif - 0.5)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(unif - 0.5))
    )
    return g.select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n_true"),
        F.round(F.col("n") + noise, 3).alias("n_noisy"),
        F.lit(_DP_EPSILON).alias("noise_scale"),
    )
