"""Data-governance queries: quality expectations, provenance
manifests, and GDPR tombstone cascades.

These extend the reference's transfer-verification surface
(lib/taps/data_stream.rb:88-109 verify_stream; lib/taps/operation.rb
verify counts) into the governance layer a 100 TB training-data
pipeline needs: declarative constraint suites evaluated in one pass,
per-file provenance audits, and right-to-be-forgotten cascade
deletes across referential chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taps_spark.io.tables import load_tables
from taps_spark.operators.expectations import (
    GE,
    LE,
    Expectation,
    completeness,
    domain_fraction,
    uniqueness,
    verify,
)
from taps_spark.queries import query

EXPECTATIONS_ORACLE = """
WITH j AS (
  SELECT o.*, c.c_custkey AS ck
  FROM orders o
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o.o_custkey = c.c_custkey
),
m AS (
  -- RAW metrics: the pass/fail comparison must see the unrounded
  -- value (rounding first would let completeness 0.9999996 "pass"
  -- an exact >= 1.0 constraint); ROUND is display-only below.
  SELECT
    CAST(AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS completeness_custkey,
    CAST(AVG(CASE WHEN ck IS NOT NULL THEN 1.0 ELSE 0.0 END) AS DOUBLE)        AS fk_customer_containment,
    CAST(MAX(o_totalprice) AS DOUBLE)                                          AS max_totalprice_bound,
    CAST(MIN(o_totalprice) AS DOUBLE)                                          AS min_totalprice_nonneg,
    CAST(AVG(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS status_domain,
    CAST(COUNT(DISTINCT o_orderkey) * 1.0 / COUNT(*) AS DOUBLE)                AS uniqueness_orderkey
  FROM j
)
SELECT 'completeness_custkey' AS check_name, ROUND(completeness_custkey, 6) AS metric,
       1.0 AS threshold, '>=' AS op, completeness_custkey >= 1.0 AS passed FROM m
UNION ALL
SELECT 'fk_customer_containment', ROUND(fk_customer_containment, 6), 1.0, '>=',
       fk_customer_containment >= 1.0 FROM m
UNION ALL
SELECT 'max_totalprice_bound', ROUND(max_totalprice_bound, 6), 1000000.0, '<=',
       max_totalprice_bound <= 1000000.0 FROM m
UNION ALL
SELECT 'min_totalprice_nonneg', ROUND(min_totalprice_nonneg, 6), 0.0, '>=',
       min_totalprice_nonneg >= 0.0 FROM m
UNION ALL
SELECT 'status_domain', ROUND(status_domain, 6), 1.0, '>=', status_domain >= 1.0 FROM m
UNION ALL
SELECT 'uniqueness_orderkey', ROUND(uniqueness_orderkey, 6), 1.0, '>=',
       uniqueness_orderkey >= 1.0 FROM m
ORDER BY check_name
"""


@query("validation_expectations", oracle=EXPECTATIONS_ORACLE)
def validation_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suite over orders, verified in ONE
    aggregation pass (operators/expectations.py).

    The referential-containment check pre-joins the de-duplicated
    customer key set so it rides the same scan; at 100 TB AQE picks
    broadcast vs shuffled hash for that join by actual size — no
    forced broadcast hint (the lesson from validate_fk_orphans).
    """
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    keys = t["customer"].select("c_custkey").distinct()
    j = t["orders"].join(
        keys, t["orders"]["o_custkey"] == keys["c_custkey"], "left"
    )
    suite = [
        Expectation("completeness_custkey", completeness("o_custkey"), 1.0, GE),
        Expectation(
            "fk_customer_containment",
            F.avg(F.when(F.col("c_custkey").isNotNull(), 1.0).otherwise(0.0)),
            1.0,
            GE,
        ),
        Expectation("max_totalprice_bound", F.max("o_totalprice"), 1000000.0, LE),
        Expectation("min_totalprice_nonneg", F.min("o_totalprice"), 0.0, GE),
        Expectation(
            "status_domain", domain_fraction("o_orderstatus", ("O", "F", "P")), 1.0, GE
        ),
        Expectation("uniqueness_orderkey", uniqueness("o_orderkey"), 1.0, GE),
    ]
    return verify(j, suite)


PROVENANCE_ORACLE = """
SELECT 'customer' AS table_name, 'customer.parquet' AS file_name,
       COUNT(*) AS n_rows, MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM customer
UNION ALL
SELECT 'documents', 'documents.parquet', COUNT(*), MIN(doc_id), MAX(doc_id),
       CAST(SUM(doc_id) AS BIGINT) FROM documents
UNION ALL
SELECT 'events', 'events.parquet', COUNT(*), MIN(event_id), MAX(event_id),
       CAST(SUM(event_id) AS BIGINT) FROM events
UNION ALL
SELECT 'lineitem', 'lineitem.parquet', COUNT(*),
       MIN(l_orderkey * 10 + l_linenumber), MAX(l_orderkey * 10 + l_linenumber),
       CAST(SUM(l_orderkey * 10 + l_linenumber) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'orders', 'orders.parquet', COUNT(*), MIN(o_orderkey), MAX(o_orderkey),
       CAST(SUM(o_orderkey) AS BIGINT) FROM orders
ORDER BY table_name, file_name
"""


@query("pipeline_provenance_manifest", oracle=PROVENANCE_ORACLE)
def pipeline_provenance_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-file provenance manifest: the Spark side derives the
    file name from the hidden `_metadata.file_path` column (real
    provenance — at 100 TB each table is thousands of files and this
    groupBy(file) yields the audit ledger data versioning needs); the
    oracle pins the expected single-file layout of the fixtures.

    Key sums/min/max are engine-neutral integer checksums — the same
    idea as the reference's per-chunk verification
    (lib/taps/data_stream.rb:88-109), lifted to per-file granularity.
    Map-side combinable agg; shuffle carries one row per file.
    """
    t = load_tables(
        spark, sf_dir, ("customer", "documents", "events", "lineitem", "orders")
    )
    rowkeys = {
        "customer": F.col("c_custkey"),
        "documents": F.col("doc_id"),
        "events": F.col("event_id"),
        "lineitem": F.col("l_orderkey") * 10 + F.col("l_linenumber"),
        "orders": F.col("o_orderkey"),
    }
    parts = []
    for name, df in t.items():
        parts.append(
            df.select(
                F.lit(name).alias("table_name"),
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                    "file_name"
                ),
                rowkeys[name].cast("long").alias("rowkey"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("table_name", "file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("rowkey").alias("min_key"),
            F.max("rowkey").alias("max_key"),
            F.sum("rowkey").alias("key_sum"),
        )
        .orderBy("table_name", "file_name")
    )


TOMBSTONE_ORACLE = """
WITH tomb AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
del_orders AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM tomb)
)
SELECT 'customer' AS table_name,
       (SELECT COUNT(*) FROM customer) AS rows_before,
       (SELECT COUNT(*) FROM tomb) AS rows_deleted,
       (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM tomb) AS rows_after
UNION ALL
SELECT 'lineitem',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)),
       (SELECT COUNT(*) FROM lineitem)
         - (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
UNION ALL
SELECT 'orders',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM del_orders),
       (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM del_orders)
ORDER BY table_name
"""


@query("transfer_tombstone_cascade", oracle=TOMBSTONE_ORACLE)
def transfer_tombstone_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade: a tombstone set of customer keys
    propagates through the referential chain customer → orders →
    lineitem; the audit reports per-table before/deleted/after counts.

    Plan: the tombstone set is a filtered key projection (tiny vs its
    parent — AQE broadcasts it at runtime; no forced hint, so a
    pathological 50%-tombstone batch degrades to shuffled joins
    instead of OOM).  The lineitem leg keys on deleted ORDER keys, so
    each hop shuffles only the join keys, never payload columns.
    The actual delete is `io/sinks.merge_apply_changes` with
    WHEN-MATCHED-DELETE; this query is its dry-run audit.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    tomb = t["customer"].filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    orders_marked = t["orders"].join(
        tomb, t["orders"]["o_custkey"] == tomb["c_custkey"], "left"
    )
    del_orders = orders_marked.filter(F.col("c_custkey").isNotNull()).select(
        "o_orderkey"
    )
    li_marked = t["lineitem"].join(
        del_orders, t["lineitem"]["l_orderkey"] == del_orders["o_orderkey"], "left"
    )

    def audit(df: DataFrame, name: str, deleted_flag) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("rows_before"),
            F.sum(F.when(deleted_flag, 1).otherwise(0)).alias("rows_deleted"),
        ).select(
            F.lit(name).alias("table_name"),
            "rows_before",
            "rows_deleted",
            (F.col("rows_before") - F.col("rows_deleted")).alias("rows_after"),
        )

    cust = audit(t["customer"], "customer", F.col("c_custkey") % 97 == 0)
    orde = audit(orders_marked, "orders", F.col("c_custkey").isNotNull())
    li = audit(li_marked, "lineitem", F.col("o_orderkey").isNotNull())
    return cust.unionByName(li).unionByName(orde).orderBy("table_name")


INCREMENTAL_AGG_ORACLE = """
SELECT o_custkey,
       COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,6))), 4) AS DOUBLE) AS total_v,
       (CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) * 1000000 AS BIGINT)
          // (COUNT(*) * 100)) / 10000.0 AS avg_v,
       ROUND(MIN(o_totalprice), 4) AS lo_v,
       ROUND(MAX(o_totalprice), 4) AS hi_v
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
"""


@query("pipeline_incremental_agg_merge", oracle=INCREMENTAL_AGG_ORACLE)
def pipeline_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance: the per-customer revenue
    rollup is built as a mergeable agg state from a historical batch
    (orders before 1998-01-01), then two later delta batches are
    folded in by key-wise state merge (operators/incremental.py) —
    the oracle recomputes the whole rollup from scratch and the two
    must agree exactly, which is the algebraic point: cnt/sum/min/max
    are mergeable, so incremental == full recompute.

    At 100 TB the state table is orders-of-magnitude smaller than the
    fact stream; each refresh shuffles only the delta's keyspace plus
    the touched state rows, never re-reading history.  avg is derived
    at read time (finalize) because it is not mergeable.
    """
    from taps_spark.operators.incremental import agg_state, finalize, merge_states

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    hist = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    d1 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01"))
        & (F.col("o_orderdate") < F.lit("2000-01-01"))
    )
    d2 = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    state = merge_states(
        agg_state(hist, ["o_custkey"], "o_totalprice"),
        agg_state(d1, ["o_custkey"], "o_totalprice"),
        agg_state(d2, ["o_custkey"], "o_totalprice"),
    )
    return finalize(state).orderBy("o_custkey")


SURROGATE_KEYS_ORACLE = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS sk
FROM documents
ORDER BY doc_id
"""


@query("pipeline_assign_surrogate_keys", oracle=SURROGATE_KEYS_ORACLE)
def pipeline_assign_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense gap-free surrogate ids without a global sort to one
    node: range-shuffle + per-partition offsets + map-only numbering
    (operators/keys.py).  The oracle is the single-node
    ROW_NUMBER() — the distributed two-phase assignment must be
    indistinguishable from it."""
    from taps_spark.operators.keys import assign_surrogate_keys

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select("doc_id")
    return assign_surrogate_keys(docs, "doc_id", num_partitions=8).orderBy("doc_id")


ORDER_RECON_ORACLE = """
WITH li AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))
                  * (1 - CAST(l_discount AS DECIMAL(27,6)))
                  * (1 + CAST(l_tax AS DECIMAL(27,6)))) AS DOUBLE) AS rebuilt
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderkey, o.o_totalprice, li.rebuilt,
         ABS(li.rebuilt - o.o_totalprice) / o.o_totalprice AS rel_err
  FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT COUNT(*) AS n_orders_with_lines,
       CAST(SUM(CASE WHEN rel_err <= 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
       CAST(SUM(CASE WHEN rel_err > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_1pct,
       ROUND(MAX(rel_err), 4) AS max_rel_err
FROM j
"""


@query("validate_order_totals", oracle=ORDER_RECON_ORACLE)
def validate_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: rebuild each order's total from its
    line items (price × (1−discount) × (1+tax), summed in exact
    decimal) and band the relative error against the stored
    o_totalprice — the financial-audit query a replicated warehouse
    runs to prove the copy is internally consistent, beyond the
    per-table checksums the reference stops at.

    One grouped decimal agg on lineitem keyed by orderkey + one
    equi-join to orders + a 1-row banding agg.  At 100 TB both sides
    shuffle on the same orderkey; bucketed layout makes the join
    exchange-free (tests/test_plans.py::test_bucketed_join).
    """
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    from taps_spark.queries.numeric import DECIMAL_T

    li = t["lineitem"].groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice").cast(DECIMAL_T)
            * (F.lit(1) - F.col("l_discount").cast(DECIMAL_T))
            * (F.lit(1) + F.col("l_tax").cast(DECIMAL_T))
        )
        .cast("double")
        .alias("rebuilt")
    )
    j = t["orders"].join(li, t["orders"]["o_orderkey"] == li["l_orderkey"]).select(
        (F.abs(F.col("rebuilt") - F.col("o_totalprice")) / F.col("o_totalprice")).alias(
            "rel_err"
        )
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_orders_with_lines"),
        F.sum(F.when(F.col("rel_err") <= 0.01, 1).otherwise(0))
        .cast("long")
        .alias("n_within_1pct"),
        F.sum(F.when(F.col("rel_err") > 0.01, 1).otherwise(0))
        .cast("long")
        .alias("n_beyond_1pct"),
        F.round(F.max("rel_err"), 4).alias("max_rel_err"),
    )


K_ANONYMITY_ORACLE = """
WITH qid AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS acct_band,
         COUNT(*) AS grp_size
  FROM customer
  GROUP BY 1, 2, 3
),
ks AS (SELECT UNNEST([2, 5, 10]) AS k)
SELECT k,
       (SELECT COUNT(*) FROM qid)                 AS n_groups,
       (SELECT CAST(MIN(grp_size) AS BIGINT) FROM qid) AS min_group_size,
       CAST(COALESCE(SUM(CASE WHEN grp_size < k THEN 1 ELSE 0 END), 0) AS BIGINT) AS groups_below_k,
       CAST(COALESCE(SUM(CASE WHEN grp_size < k THEN grp_size ELSE 0 END), 0) AS BIGINT) AS rows_below_k
FROM qid CROSS JOIN ks
GROUP BY k
ORDER BY k
"""


@query("governance_k_anonymity", oracle=K_ANONYMITY_ORACLE)
def governance_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit before a data release: group the table by its
    quasi-identifiers (nation, market segment, account-balance band)
    and report, for k in {2, 5, 10}, how many equivalence classes and
    rows fall below the re-identification threshold — the standard
    privacy gate a 100 TB corpus must pass before leaving the
    governed zone (the reference moves rows verbatim and has no
    notion of release safety).

    Scale: one hash aggregation on the QID tuple (map-side combined),
    then a constant-size (groups × 3 thresholds) summary agg — the
    second stage's input is one row per equivalence class, already
    orders of magnitude smaller than the table. No joins, no windows.
    """
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    qid = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("acct_band"),
    ).agg(F.count(F.lit(1)).alias("grp_size"))

    ks = [2, 5, 10]
    per_k = qid.select(
        "grp_size",
        F.explode(F.array(*[F.lit(k) for k in ks])).alias("k"),
    )
    return (
        per_k.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.min("grp_size").alias("min_group_size"),
            F.sum(F.when(F.col("grp_size") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("groups_below_k"),
            F.sum(F.when(F.col("grp_size") < F.col("k"), F.col("grp_size")).otherwise(0))
            .cast("long")
            .alias("rows_below_k"),
        )
        .orderBy("k")
    )


ENTITY_RESOLUTION_ORACLE = """
WITH RECURSIVE p AS (
  SELECT doc_id, lang,
         array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:5], ' ') AS prefix
  FROM documents
),
edges AS (
  SELECT b.doc_id AS src, a.doc_id AS dst
  FROM p a JOIN p b
    ON a.lang = b.lang
   AND split_part(a.prefix, ' ', 1) = split_part(b.prefix, ' ', 1)
   AND b.doc_id < a.doc_id
  WHERE levenshtein(a.prefix, b.prefix) <= 3
),
sym AS (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL SELECT dst, src FROM edges
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS entity_id
  FROM reach GROUP BY a
),
members AS (
  SELECT c.entity_id, d.doc_id, d.lang, LEN(d.text) AS n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.node
),
golden AS (
  SELECT entity_id, doc_id AS survivor_id
  FROM (
    SELECT entity_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY entity_id
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM members
  ) WHERE rn = 1
)
SELECT m.entity_id,
       COUNT(*)                        AS n_records,
       COUNT(DISTINCT m.lang)          AS n_langs,
       CAST(SUM(m.n_chars) AS BIGINT)  AS total_chars,
       MAX(g.survivor_id)              AS survivor_id
FROM members m JOIN golden g USING (entity_id)
GROUP BY m.entity_id
ORDER BY m.entity_id
"""


@query("pipeline_entity_resolution", oracle=ENTITY_RESOLUTION_ORACLE)
def pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (the MDM golden-record pipeline):
    (1) block on (language, first title token) and match by bounded
    Levenshtein <= 3 over 5-token prefixes — the same match rule as
    text_fuzzy_match_pairs; (2) resolve the match graph to entities
    by iterative min-label connected components (transitive closure:
    A~B, B~C => one entity even if A,C never matched directly);
    (3) survivorship — the longest record (tiebreak: lowest id) wins
    as the golden record; per-entity rollup of members, languages,
    and merged bytes.

    The DuckDB oracle replays the whole pipeline as a recursive-CTE
    closure. Scale: blocking bounds candidate pairs by sum-of-block²,
    label propagation is O(diameter) rounds of equi-join +
    min-aggregate (near-clique match graphs converge in 2-4), and
    survivorship is one WindowGroupLimit-reduced rank per entity.
    The reference moves records verbatim and can only ever have
    exact-duplicate awareness (pk collisions); this is the §2c
    generalization.
    """
    from taps_spark.operators.dedup import connected_components
    from taps_spark.operators.text import tokens

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    p = docs.select(
        "doc_id",
        "lang",
        F.array_join(F.slice(tokens("text"), 1, 5), " ").alias("prefix"),
    )
    a = p.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("prefix").alias("pa"),
        F.split("prefix", " ")[0].alias("tok1"),
    )
    b = p.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
        F.col("prefix").alias("pb"), F.split("prefix", " ")[0].alias("tok1_b"),
    )
    edges = (
        a.join(b, (a.lang == b.lang_b) & (a.tok1 == b.tok1_b) & (b.doc_b < a.doc_a))
        .filter(F.levenshtein("pa", "pb", 3) >= 0)
        .select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    comp = connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("entity_id")
    )
    members = comp.join(docs.select("doc_id", "lang", F.length("text").alias("n_chars")), "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("entity_id").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    golden = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("entity_id", F.col("doc_id").alias("survivor_id"))
    )
    return (
        members.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .join(golden, "entity_id")
        .select("entity_id", "n_records", "n_langs", "total_chars", "survivor_id")
        .orderBy("entity_id")
    )


FRESHNESS_ORACLE = """
WITH per_type AS (
  SELECT event_type,
         MIN(CAST(ts AS DATE)) AS first_day,
         MAX(CAST(ts AS DATE)) AS last_day,
         COUNT(DISTINCT CAST(ts AS DATE)) AS n_days_observed
  FROM events GROUP BY event_type
),
g AS (SELECT MAX(CAST(ts AS DATE)) AS global_last FROM events)
SELECT event_type,
       STRFTIME(last_day, '%Y-%m-%d') AS last_seen,
       n_days_observed,
       CAST(DATEDIFF('day', first_day, last_day) + 1 - n_days_observed AS BIGINT)
         AS missing_days,
       CAST(DATEDIFF('day', last_day, g.global_last) AS BIGINT) AS staleness_days,
       CAST(CASE WHEN DATEDIFF('day', last_day, g.global_last) <= 1
                 THEN 1 ELSE 0 END AS INT) AS fresh
FROM per_type CROSS JOIN g
ORDER BY event_type
"""


@query("validation_freshness", oracle=FRESHNESS_ORACLE)
def validation_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness / cadence audit per event stream: last-seen day,
    gap days inside the observed span (a feed that skipped Tuesdays),
    staleness versus the most recent arrival anywhere, and a
    fresh-within-1-day verdict — the SLA check a scheduler gates
    downstream jobs on (the reference trusts whatever rows exist;
    it has no notion of a LATE table).

    All day arithmetic is integer; dates render as formatted strings
    so both engines hash identically. Scale: one map-side-combined
    aggregation to event_type grain + a 1-row global max broadcast.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = F.col("ts").cast("date")
    per_type = ev.groupBy("event_type").agg(
        F.min(d).alias("first_day"),
        F.max(d).alias("last_day"),
        F.countDistinct(d).alias("n_days_observed"),
    )
    g = ev.agg(F.max(d).alias("global_last"))
    stale = F.datediff(F.col("global_last"), F.col("last_day"))
    return (
        per_type.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.date_format("last_day", "yyyy-MM-dd").alias("last_seen"),
            "n_days_observed",
            (F.datediff(F.col("last_day"), F.col("first_day")) + 1 - F.col("n_days_observed"))
            .cast("long")
            .alias("missing_days"),
            stale.cast("long").alias("staleness_days"),
            (stale <= 1).cast("int").alias("fresh"),
        )
        .orderBy("event_type")
    )


PII_CENSUS_ORACLE = """
WITH pats(pattern_name, pat) AS (
  VALUES ('digit_run_3plus', '[0-9]{3,}'),
         ('email_like', '[A-Za-z0-9._]+@[A-Za-z0-9.]+'),
         ('upper_token', '[A-Z]{2,}')
),
cols AS (
  SELECT 'customer' AS tbl, 'c_name' AS col, c_name AS v FROM customer
  UNION ALL SELECT 'customer', 'c_mktsegment', c_mktsegment FROM customer
  UNION ALL SELECT 'orders', 'o_orderpriority', o_orderpriority FROM orders
  UNION ALL SELECT 'supplier', 's_name', s_name FROM supplier
)
SELECT c.tbl, c.col, p.pattern_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN regexp_matches(c.v, p.pat) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       ROUND(CAST(SUM(CASE WHEN regexp_matches(c.v, p.pat) THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS hit_rate
FROM cols c CROSS JOIN pats p
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@query("governance_pii_pattern_census", oracle=PII_CENSUS_ORACLE)
def governance_pii_pattern_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pattern CENSUS: scan a declared set of string columns for
    sensitive-looking patterns (digit runs, email shapes, shouting
    tokens) and report hit rates per (table, column, pattern) — the
    discovery step BEFORE pii_redact_digits' targeted masking: you
    cannot mask what you haven't located, and at 100 TB the census is
    how a governance team decides which columns need policies.

    Scale: each table scans ONCE — all of its (column, pattern) hit
    flags compute in one select over the scan and stack to long form;
    everything aggregates map-side to the (table, column, pattern)
    key space. No joins.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders", "supplier"))
    pats = [
        ("digit_run_3plus", r"[0-9]{3,}"),
        ("email_like", r"[A-Za-z0-9._]+@[A-Za-z0-9.]+"),
        ("upper_token", r"[A-Z]{2,}"),
    ]
    plan = {
        "customer": ("c_name", "c_mktsegment"),
        "orders": ("o_orderpriority",),
        "supplier": ("s_name",),
    }
    # ONE scan per table: every (column, pattern) hit flag computes in
    # a single select over that scan, then stacks to long form —
    # 3 FileScans total, not one per (column, pattern) pair.
    from functools import reduce

    parts = []
    for tbl, cols in plan.items():
        flags = t[tbl].select(
            *[
                F.col(c).rlike(pat).cast("int").alias(f"{c}__{pname}")
                for c in cols
                for pname, pat in pats
            ]
        )
        triples = ", ".join(
            f"'{c}', '{pname}', {c}__{pname}" for c in cols for pname, _ in pats
        )
        n = len(cols) * len(pats)
        parts.append(
            flags.selectExpr(
                f"stack({n}, {triples}) AS (col, pattern_name, hit)"
            ).select(F.lit(tbl).alias("tbl"), "col", "pattern_name", "hit")
        )
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        allp.groupBy("tbl", "col", "pattern_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("hit").cast("long").alias("n_hits"),
            F.round(F.sum("hit").cast("double") / F.count(F.lit(1)), 4).alias("hit_rate"),
        )
        .orderBy("tbl", "col", "pattern_name")
    )


L_DIVERSITY_ORACLE = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS grp_size,
         COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)) AS l
  FROM customer
  GROUP BY 1, 2
),
ls AS (SELECT UNNEST([2, 3, 5]) AS l_req)
SELECT l_req,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM g)  AS n_groups,
       (SELECT CAST(MIN(l) AS BIGINT) FROM g)    AS min_l,
       CAST(COALESCE(SUM(CASE WHEN l < l_req THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS groups_below_l,
       CAST(COALESCE(SUM(CASE WHEN l < l_req THEN grp_size ELSE 0 END), 0) AS BIGINT)
         AS rows_below_l
FROM g CROSS JOIN ls
GROUP BY l_req
ORDER BY l_req
"""


@query("governance_l_diversity", oracle=L_DIVERSITY_ORACLE)
def governance_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's standard companion: a
    quasi-identifier group can be large (k-safe) yet still leak if
    every member shares the SAME sensitive value. Group by the QI
    tuple (nation, market segment), count DISTINCT sensitive values
    (account-balance band) per group, and report for l in {2, 3, 5}
    how many groups and rows fall below the diversity threshold.

    Scale: one two-level hash aggregation (QI tuple -> distinct
    sensitive) with map-side partial distinct, then a constant-size
    (groups x 3 thresholds) summary — same exchange shape as
    governance_k_anonymity; no joins, no windows.
    """
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp_size"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000.0).cast("long")
        ).alias("l"),
    )
    per_l = g.select(
        "grp_size",
        "l",
        F.explode(F.array(*[F.lit(lr) for lr in (2, 3, 5)])).alias("l_req"),
    )
    totals = g.agg(
        F.count(F.lit(1)).alias("n_groups"), F.min("l").alias("min_l")
    )
    return (
        per_l.groupBy("l_req")
        .agg(
            F.sum(F.when(F.col("l") < F.col("l_req"), 1).otherwise(0))
            .cast("long")
            .alias("groups_below_l"),
            F.sum(F.when(F.col("l") < F.col("l_req"), F.col("grp_size")).otherwise(0))
            .cast("long")
            .alias("rows_below_l"),
        )
        .join(F.broadcast(totals))
        .select("l_req", "n_groups", "min_l", "groups_below_l", "rows_below_l")
        .orderBy("l_req")
    )


T_CLOSENESS_ORACLE = """
WITH base AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
  FROM customer
),
cell AS (SELECT nat, seg, band, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2, 3),
grp AS (SELECT nat, seg, CAST(SUM(c) AS BIGINT) AS n_g FROM cell GROUP BY 1, 2),
gband AS (SELECT band, CAST(SUM(c) AS BIGINT) AS cb FROM cell GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cell),
fullg AS (
  SELECT g.nat, g.seg, g.n_g, b.band, b.cb, COALESCE(c.c, 0) AS c, t.n
  FROM grp g CROSS JOIN gband b CROSS JOIN tot t
  LEFT JOIN cell c ON c.nat = g.nat AND c.seg = g.seg AND c.band = b.band
),
tvd AS (
  SELECT nat, seg, n_g,
         CAST(FLOOR((CAST(SUM(ABS(c * n - cb * n_g)) AS DOUBLE)
                     / (2.0 * n_g * n)) * 1000000 + 0.5) AS BIGINT) AS tvd_ppm
  FROM fullg
  GROUP BY nat, seg, n_g, n
),
ts AS (SELECT UNNEST([100000, 200000, 300000]) AS t_ppm)
SELECT CAST(t_ppm AS BIGINT) AS t_ppm,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM tvd) AS n_groups,
       (SELECT CAST(MAX(tvd_ppm) AS BIGINT) FROM tvd) AS max_tvd_ppm,
       CAST(COALESCE(SUM(CASE WHEN tvd_ppm > t_ppm THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS groups_above_t,
       CAST(COALESCE(SUM(CASE WHEN tvd_ppm > t_ppm THEN n_g ELSE 0 END), 0) AS BIGINT)
         AS rows_above_t
FROM tvd CROSS JOIN ts
GROUP BY t_ppm
ORDER BY t_ppm
"""


@query("governance_t_closeness", oracle=T_CLOSENESS_ORACLE)
def governance_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the k-anonymity /
    l-diversity ladder: a QI group can be large AND diverse yet still
    leak when its sensitive-value DISTRIBUTION skews far from the
    table's. Per (nation, market-segment) group, compute the total
    variation distance between the group's account-balance-band
    distribution and the global one (exact integer cross-products:
    |c_gb*N - C_b*n_g| summed over the full band set, divided once),
    then report for t in {0.1, 0.2, 0.3} how many groups and rows
    exceed the distance.

    Scale: everything aggregates at (QI x band) grain, then a
    #groups x #bands densify against the BROADCAST band margin —
    group count x ~11 bands, never row grain. The BIGINT
    cross-products hold to ~3e9 rows per margin pair; past that,
    widen to DECIMAL(38,0) (same fold).

    Determinism: exact integer counts and cross-products; one double
    division folded to ppm with FLOOR(x*1e6 + 0.5).
    """
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    base = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("band"),
    )
    cell = base.groupBy("nat", "seg", "band").agg(F.count("*").alias("c"))
    grp = cell.groupBy("nat", "seg").agg(F.sum("c").alias("n_g"))
    glob = cell.groupBy("band").agg(F.sum("c").alias("cb"))
    tot = cell.agg(F.sum("c").alias("n"))
    fullg = (
        grp.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cell, ["nat", "seg", "band"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    tvd = (
        fullg.groupBy("nat", "seg", "n_g", "n")
        .agg(
            F.sum(F.abs(F.col("c") * F.col("n") - F.col("cb") * F.col("n_g"))).alias(
                "sad"
            )
        )
        .select(
            "nat",
            "seg",
            "n_g",
            F.floor(
                (F.col("sad").cast("double") / (F.lit(2.0) * F.col("n_g") * F.col("n")))
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("tvd_ppm"),
        )
    )
    ts = tvd.crossJoin(
        F.broadcast(
            spark.range(1).select(
                F.explode(
                    F.array(F.lit(100000), F.lit(200000), F.lit(300000))
                ).alias("t_ppm")
            )
        )
    )
    return (
        ts.groupBy("t_ppm")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.max("tvd_ppm").alias("max_tvd_ppm"),
            F.sum(F.when(F.col("tvd_ppm") > F.col("t_ppm"), 1).otherwise(0))
            .cast("long")
            .alias("groups_above_t"),
            F.sum(F.when(F.col("tvd_ppm") > F.col("t_ppm"), F.col("n_g")).otherwise(0))
            .cast("long")
            .alias("rows_above_t"),
        )
        .select(
            F.col("t_ppm").cast("long").alias("t_ppm"),
            "n_groups",
            "max_tvd_ppm",
            "groups_above_t",
            "rows_above_t",
        )
        .orderBy("t_ppm")
    )


SURROGATE_VAULT_ORACLE = """
WITH s AS (
  SELECT c_nationkey,
         c_name,
         MD5('vault1:' || c_name) AS surrogate
  FROM customer
),
per_name AS (
  SELECT c_nationkey, c_name, COUNT(*) AS freq
  FROM s GROUP BY c_nationkey, c_name
)
SELECT s.c_nationkey AS nationkey,
       COUNT(*)::BIGINT AS n_rows,
       COUNT(DISTINCT s.c_name)::BIGINT AS n_distinct_names,
       COUNT(DISTINCT s.surrogate)::BIGINT AS n_distinct_surrogates,
       (COUNT(DISTINCT s.c_name) - COUNT(DISTINCT s.surrogate))::BIGINT
         AS n_collisions,
       (SELECT COUNT(*) FROM per_name p
        WHERE p.c_nationkey = s.c_nationkey AND p.freq = 1)::BIGINT
         AS n_singleton_names
FROM s
GROUP BY s.c_nationkey
ORDER BY nationkey
"""


@query("governance_surrogate_vault", oracle=SURROGATE_VAULT_ORACLE)
def governance_surrogate_vault(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization-vault audit: replace the direct identifier
    (customer name) with a keyed deterministic surrogate
    (md5('vault1:' || name) — stable across runs so joins keep
    working) and verify the two properties a privacy review asks for:
    (a) cardinality preservation — distinct surrogates == distinct
    names, i.e. ZERO collisions, because a collision silently merges
    two people; (b) the residual re-identification surface —
    singleton names (freq = 1 within their nation) remain linkable by
    frequency analysis even after tokenization, so their count is the
    k=1 risk mass the k-anonymity queries (governance_k_anonymity)
    then treat. Complements PII redaction (pii_redact_digits) with
    the reversible-by-vault flavor actually used for join keys.

    Scale: one scan; the census is two grouped aggregations at
    (nation, name) grain with map-side combine; exact counts only.
    The surrogate is computed per row JVM-side (md5 codegen) — at
    100 TB the vault write is the same map-only pass.
    """
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    s = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_name").alias("name"),
        F.md5(F.concat(F.lit("vault1:"), F.col("c_name"))).alias("surrogate"),
    )
    per_name = (
        s.groupBy("nationkey", "name")
        .agg(F.count("*").alias("freq"))
        .groupBy("nationkey")
        .agg(
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_singleton_names")
        )
    )
    census = s.groupBy("nationkey").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("name").alias("n_distinct_names"),
        F.countDistinct("surrogate").alias("n_distinct_surrogates"),
    )
    return (
        census.join(per_name, "nationkey")
        .select(
            "nationkey",
            "n_rows",
            "n_distinct_names",
            "n_distinct_surrogates",
            (F.col("n_distinct_names") - F.col("n_distinct_surrogates"))
            .cast("long")
            .alias("n_collisions"),
            "n_singleton_names",
        )
        .orderBy("nationkey")
    )


RETENTION_SWEEP_ORACLE = """
WITH pol AS (
  SELECT * FROM (VALUES
    ('click',    90),
    ('view',    180),
    ('purchase', 3650),
    ('signup',  3650),
    ('error',    30)
  ) AS t(event_type, keep_days)
),
horizon AS (SELECT MAX(ts) AS now_ts FROM events),
tagged AS (
  SELECT e.event_type,
         COALESCE(p.keep_days, 365) AS keep_days,
         CASE WHEN e.ts < h.now_ts - COALESCE(p.keep_days, 365) * INTERVAL 1 DAY
              THEN 1 ELSE 0 END AS expired,
         LENGTH(e.props) AS props_bytes
  FROM events e
  LEFT JOIN pol p ON p.event_type = e.event_type
  CROSS JOIN horizon h
)
SELECT event_type,
       CAST(MAX(keep_days) AS INT) AS keep_days,
       COUNT(*)::BIGINT AS n_rows,
       SUM(expired)::BIGINT AS n_expired,
       SUM(CASE WHEN expired = 1 THEN props_bytes ELSE 0 END)::BIGINT
         AS expired_props_bytes,
       (SUM(expired)::HUGEINT * 1000000 // COUNT(*))::BIGINT AS expired_ppm
FROM tagged
GROUP BY event_type
ORDER BY event_type
"""


@query("governance_retention_sweep", oracle=RETENTION_SWEEP_ORACLE)
def governance_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy deletion plan: given per-event-type retention
    windows (errors 30 d, clickstream 90/180 d, transactional records
    10 y, default 365 d), how many rows and how much payload does the
    next compliance sweep delete per type? This is the sizing pass a
    GDPR/CCPA retention job runs BEFORE rewriting partitions — the
    deletion-side counterpart of the vault/redaction/k-anonymity
    queries, and the generalization of the reference's whole-table
    truncate-and-reload lifecycle to policy-driven row TTLs.

    The horizon is the corpus max(ts), not wall-clock — deterministic
    and fixture-independent (the same choice the freshness and SCD
    queries made). Day arithmetic is timestamp-native in both engines
    (keep_days * INTERVAL 1 DAY); counts and byte sums are exact
    integers; expired_ppm is exact integer division.

    Scale: one scan, the policy is a 5-row broadcast, the horizon a
    1-row broadcast; per-type aggregation with map-side combine. At
    100 TB the same predicate becomes the partition-pruning filter of
    the actual DELETE (ts-partitioned layout ⇒ expired partitions
    drop without a rewrite).
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    pol = spark.createDataFrame(
        [("click", 90), ("view", 180), ("purchase", 3650),
         ("signup", 3650), ("error", 30)],
        ["event_type", "keep_days"],
    )
    horizon = ev.agg(F.max("ts").alias("now_ts"))
    tagged = (
        ev.join(F.broadcast(pol), "event_type", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "event_type",
            F.coalesce("keep_days", F.lit(365)).alias("keep_days"),
            F.when(
                F.col("ts")
                < F.col("now_ts")
                - F.coalesce("keep_days", F.lit(365))
                * F.expr("INTERVAL 1 DAY"),
                1,
            )
            .otherwise(0)
            .alias("expired"),
            F.length("props").alias("props_bytes"),
        )
    )
    return (
        tagged.groupBy("event_type")
        .agg(
            F.max("keep_days").cast("int").alias("keep_days"),
            F.count("*").alias("n_rows"),
            F.sum("expired").cast("long").alias("n_expired"),
            F.sum(
                F.when(F.col("expired") == 1, F.col("props_bytes")).otherwise(0)
            )
            .cast("long")
            .alias("expired_props_bytes"),
            F.expr(
                "CAST(CAST(SUM(expired) AS DECIMAL(38,0)) * 1000000"
                " div COUNT(*) AS BIGINT)"
            ).alias("expired_ppm"),
        )
        .orderBy("event_type")
    )


DP_COUNT_RELEASE_ORACLE = """
WITH g AS (
  SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM orders GROUP BY o_orderpriority
),
u AS (
  SELECT priority, n_true,
         CAST(('0x' || SUBSTRING(MD5(priority || '|dp-seed-9'), 1, 15)) AS BIGINT)
           / 1152921504606846976.0 AS unif
  FROM g
),
z AS (
  SELECT priority, n_true, unif,
         CASE WHEN unif < 0.5 THEN 1.0 ELSE -1.0 END
           * LN(1.0 - 2.0 * ABS(unif - 0.5)) AS lap
  FROM u
)
SELECT priority, n_true,
       CAST(FLOOR(lap * 1000 + 0.5) AS BIGINT) AS noise_milli,
       CAST(FLOOR((CAST(n_true AS DOUBLE) + lap) * 1000 + 0.5) AS BIGINT)
         AS released_milli,
       1000000 AS epsilon_micro
FROM z
ORDER BY priority
"""


@query("governance_dp_count_release", oracle=DP_COUNT_RELEASE_ORACLE)
def governance_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-style count release: per-group counts
    with Laplace(1/ε) noise at ε=1 (sensitivity 1 for a count) — the
    mechanism shape behind private aggregate publishing, wired
    end-to-end: group, draw, perturb, release.

    The noise draw here is SEEDED AND DETERMINISTIC (inverse-CDF on
    a uniform derived from MD5(group||seed) — MD5 because both
    engines share it bit-for-bit; xxhash64 has no DuckDB twin) so
    the release is oracle-checkable and replayable in tests. That
    deterministic draw is exactly what production DP must NOT do —
    a real deployment swaps in calibrated true randomness and drops
    n_true from the output; the query documents the mechanism and
    its plan shape, not a privacy guarantee.

    Determinism: the uniform is a 60-bit integer over 2⁶⁰ (exact in
    double); sign/LN/scale is one fixed IEEE chain per group row;
    milli-quantization at the end.

    Scale: one map-side-combined count per group + per-row scalar
    math — no second shuffle, no window.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    g = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    unif = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("priority"), F.lit("|dp-seed-9"))), 1, 15),
            16,
            10,
        ).cast("long")
        / F.lit(1152921504606846976.0)
    )
    z = g.select(
        "priority", "n_true", unif.alias("unif")
    ).select(
        "priority", "n_true",
        (
            F.when(F.col("unif") < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
            * F.log(F.lit(1.0) - 2.0 * F.abs(F.col("unif") - 0.5))
        ).alias("lap"),
    )
    return z.select(
        "priority",
        "n_true",
        F.floor(F.col("lap") * 1000 + F.lit(0.5)).cast("long").alias("noise_milli"),
        F.floor((F.col("n_true").cast("double") + F.col("lap")) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("released_milli"),
        F.lit(1000000).alias("epsilon_micro"),
    ).orderBy("priority")


ERASURE_IMPACT_ORACLE = """
WITH ev AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS affected,
         CAST(COUNT(DISTINCT CASE WHEN user_id % 97 = 0 THEN user_id END)
              AS BIGINT) AS subjects
  FROM events
),
cu AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS affected,
         CAST(COUNT(DISTINCT CASE WHEN c_custkey % 97 = 0 THEN c_custkey END)
              AS BIGINT) AS subjects
  FROM customer
),
od AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS affected,
         CAST(COUNT(DISTINCT CASE WHEN o_custkey % 97 = 0 THEN o_custkey END)
              AS BIGINT) AS subjects
  FROM orders
)
SELECT * FROM (
  SELECT 'events' AS table_name, total, affected, subjects,
         CAST(FLOOR(CAST(affected AS DOUBLE) / CAST(total AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT) AS share_ppm
  FROM ev
  UNION ALL
  SELECT 'customer', total, affected, subjects,
         CAST(FLOOR(CAST(affected AS DOUBLE) / CAST(total AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT)
  FROM cu
  UNION ALL
  SELECT 'orders', total, affected, subjects,
         CAST(FLOOR(CAST(affected AS DOUBLE) / CAST(total AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT)
  FROM od
)
ORDER BY table_name
"""


@query("governance_erasure_impact", oracle=ERASURE_IMPACT_ORACLE)
def governance_erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) impact sizing: given a
    deterministic erasure cohort (subject id ≡ 0 mod 97, ≈1% — the
    stand-in for a DSR batch list), report per table how many rows
    and distinct subjects a deletion touches and the affected share —
    the number a data-governance owner needs BEFORE running the
    tombstone cascade (transfer_tombstone_cascade is the execution
    half; this is its dry-run sizing, the same dry-run-then-apply
    split as transfer_dryrun_plan).

    Exactness: pure integer counts per table plus one ppm fold each.

    Scale: three independent map-side-combined single-row aggregates
    (conditional aggregation, no joins); at 100 TB each is a
    column-pruned scan of one id column, and a real subject LIST
    would broadcast into the same CASE/semi-join shape.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cu = load_tables(spark, sf_dir, ("customer",))["customer"]
    od = load_tables(spark, sf_dir, ("orders",))["orders"]

    def impact(df: DataFrame, idcol: str, name: str) -> DataFrame:
        hit = F.col(idcol) % 97 == 0
        return df.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("affected"),
            F.countDistinct(F.when(hit, F.col(idcol))).alias("subjects"),
        ).select(
            F.lit(name).alias("table_name"),
            "total",
            "affected",
            "subjects",
            F.floor(
                F.col("affected").cast("double")
                / F.col("total").cast("double")
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("share_ppm"),
        )

    return (
        impact(ev, "user_id", "events")
        .unionByName(impact(cu, "c_custkey", "customer"))
        .unionByName(impact(od, "o_custkey", "orders"))
        .orderBy("table_name")
    )


PII_REDACT_ORACLE = """
WITH t AS (
  SELECT c_mktsegment AS segment,
         c_name || ' call ' ||
         CAST(c_nationkey + 10 AS VARCHAR) || '-' ||
         LPAD(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
         LPAD(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
         LPAD(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0') AS ticket
  FROM customer
),
r AS (
  SELECT segment, ticket,
         CAST(LENGTH(regexp_extract_all(ticket,
              '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS phone_hits,
         regexp_replace(ticket, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}',
                        '[PHONE]', 'g') AS p1
  FROM t
),
r2 AS (
  SELECT segment, phone_hits,
         CAST(LENGTH(regexp_extract_all(p1, '[0-9]{4,}')) AS BIGINT) AS num_hits,
         regexp_replace(p1, '[0-9]{4,}', '[NUM]', 'g') AS redacted
  FROM r
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_tickets,
       CAST(SUM(phone_hits) AS BIGINT) AS phone_hits,
       CAST(SUM(num_hits) AS BIGINT) AS num_hits,
       CAST(SUM(CASE WHEN NOT regexp_matches(redacted, '[0-9]{4,}') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_no_long_digit_runs,
       MIN(MD5(redacted)) AS min_redacted_md5,
       MAX(MD5(redacted)) AS max_redacted_md5
FROM r2
GROUP BY segment
ORDER BY segment
"""


@query("governance_pii_redact", oracle=PII_REDACT_ORACLE)
def governance_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction TRANSFORM (the acting half next to
    governance_pii_pattern_census's counting half): support-ticket
    text — customer name plus a TPC-H-format phone derived
    deterministically from the keys (the truncated fixture schema
    drops c_phone/c_comment) — gets phone numbers, then residual
    long digit runs (the 9-digit customer ids inside c_name),
    replaced by typed placeholders. Per-segment hit counts, a
    zero-leak assertion column, and MD5 witnesses of the redacted
    text itself, so the oracle gates the actual output strings, not
    just the counts (MD5 is the repo's only cross-engine hash).

    Regex surface is digit classes/quantifiers only (identical in
    Java regex and RE2); DuckDB's regexp_replace needs the 'g' flag
    to match Spark's replace-all default.

    Scale: map-only per-row regex work (JVM, no UDF) folding into a
    |segments|-row aggregate; the raw text never shuffles.
    """
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    phone_pat = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
    t = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.concat(
            F.col("c_name"),
            F.lit(" call "),
            (F.col("c_nationkey") + 10).cast("string"),
            F.lit("-"),
            F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((F.col("c_custkey") * 7) % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((F.col("c_custkey") * 13) % 10000).cast("string"), 4, "0"),
        ).alias("ticket"),
    )
    r = t.select(
        "segment",
        F.size(F.expr(f"regexp_extract_all(ticket, '{phone_pat}', 0)"))
        .cast("long")
        .alias("phone_hits"),
        F.regexp_replace("ticket", phone_pat, "[PHONE]").alias("p1"),
    )
    r2 = r.select(
        "segment",
        "phone_hits",
        F.size(F.expr("regexp_extract_all(p1, '[0-9]{4,}', 0)"))
        .cast("long")
        .alias("num_hits"),
        F.regexp_replace("p1", "[0-9]{4,}", "[NUM]").alias("redacted"),
    )
    return (
        r2.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tickets"),
            F.sum("phone_hits").cast("long").alias("phone_hits"),
            F.sum("num_hits").cast("long").alias("num_hits"),
            F.sum(
                F.when(F.col("redacted").rlike("[0-9]{4,}"), 0).otherwise(1)
            )
            .cast("long")
            .alias("n_no_long_digit_runs"),
            F.min(F.md5("redacted")).alias("min_redacted_md5"),
            F.max(F.md5("redacted")).alias("max_redacted_md5"),
        )
        .orderBy("segment")
    )
