"""Physical-plan regression tests: the properties that matter at
100 TB (predicate pushdown, column pruning, broadcast strategies)
asserted on the actual optimized plans, so a refactor that silently
de-optimizes a query fails CI, not the cluster."""

from __future__ import annotations

import pytest

from taps_spark.queries import REGISTRY, _load

_load()


def formatted_plan(spark, name, sf_dir) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = formatted_plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # Projection must prune to the 7 referenced columns — reading all
    # 11 lineitem columns for this query would be wrong at any scale.
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_shipdate" in read_schema and "l_returnflag" in read_schema


def test_q5_uses_broadcast_joins(spark, sf_dir):
    plan = formatted_plan(spark, "q5_region_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    # The explicitly broadcast dims must never fall back to sort-merge.
    assert plan.count("BroadcastHashJoin") >= 3


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    plan = formatted_plan(spark, "join_range_price_bands", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan, (
        "non-equi band join must broadcast the band table; a cartesian "
        "or shuffled NLJ melts at scale"
    )


def test_semi_anti_join_strategies(spark, sf_dir):
    semi = formatted_plan(spark, "join_semi_active_customers", sf_dir)
    anti = formatted_plan(spark, "join_anti_dormant_customers", sf_dir)
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_keyset_scan_pushes_pk_predicate(spark, sf_dir):
    plan = formatted_plan(spark, "scan_keyset_page", sf_dir)
    assert "GreaterThan(o_orderkey,500)" in plan


def test_topk_is_windowed_not_global_sort(spark, sf_dir):
    plan = formatted_plan(spark, "window_rank_top_orders", sf_dir)
    assert "RunningWindowFunction" in plan or "Window" in plan
    # The filter on rn must sit above the window, and the final
    # ordering is the only global sort.
    assert "row_number()" in plan


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "agg_distinct", "join_broadcast_enrich"]
)
def test_no_python_udfs_in_relational_plans(spark, sf_dir, name):
    plan = formatted_plan(spark, name, sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        f"{name} must stay JVM-side (no Python UDF nodes)"
    )


def test_window_family_single_exchange(spark, sf_dir):
    """Both window specs share PARTITION BY o_custkey — Spark must
    plan exactly one hash-partition exchange, not one per window."""
    plan = formatted_plan(spark, "window_function_family", sf_dir)
    # one exchange for the windows + the final presentation sort's
    # range exchange; no third.
    assert plan.count("hashpartitioning(o_custkey") == 1
    assert plan.count("Window") >= 2


def test_q4_exists_compiles_to_semi_join(spark, sf_dir):
    plan = formatted_plan(spark, "q4_late_order_priority", sf_dir)
    assert "LeftSemi" in plan, "EXISTS must be a semi join, not inner+distinct"


def test_q10_topk_avoids_full_global_sort(spark, sf_dir):
    plan = formatted_plan(spark, "q10_returned_revenue", sf_dir)
    assert "TakeOrderedAndProject" in plan, (
        "ORDER BY + LIMIT must plan per-partition heaps, not a full sort"
    )


def test_grouping_sets_is_one_expand_one_shuffle(spark, sf_dir):
    plan = formatted_plan(spark, "agg_grouping_sets", sf_dir)
    assert "Expand" in plan


def test_partitioned_write_prunes_partitions_on_read(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + a filter on the partition column must
    prune at PLANNING time (PartitionFilters, not a post-scan filter)
    — the layout decision that turns a 100 TB scan into a 1-year scan."""
    from pyspark.sql import functions as F

    from taps_spark.io.sinks import write_parquet
    from taps_spark.io.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    target = str(tmp_path / "li_by_year")
    write_parquet(li, target, mode="overwrite", partition_by=["ship_year"])

    df = spark.read.parquet(target).filter(F.col("ship_year") == 1996)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = qe.explainString(mode)
    assert "PartitionFilters: [isnotnull(ship_year" in plan, plan[:2000]
    # correctness: pruned read equals the filtered full read
    expected = li.filter(F.col("ship_year") == 1996).count()
    assert df.count() == expected


def test_contamination_probe_is_broadcast(spark, sf_dir):
    plan = formatted_plan(spark, "text_contamination", sf_dir)
    # The eval gram set is fixed-size; if it ever degrades to a
    # sort-merge join the 100 TB train side shuffles on gram.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_skew_profiler_uses_topk_not_global_sort(spark, sf_dir):
    plan = formatted_plan(spark, "profile_skew_heavy_hitters", sf_dir)
    assert "TakeOrderedAndProject" in plan, (
        "top-20 heavy hitters must be a partial top-k, not a full sort"
    )


def test_q2_pushes_part_filter_before_agg(spark, sf_dir):
    plan = formatted_plan(spark, "q2_min_cost_supplier", sf_dir)
    # The p_size filter must prune the fact scan via broadcast semi
    # join BEFORE the (partkey, suppkey) aggregation.
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_gap_fill_spine_has_no_cartesian(spark, sf_dir):
    plan = formatted_plan(spark, "events_gap_fill_daily", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_expansion_is_map_only(spark, sf_dir):
    """Audio windowing and frame sampling are 1→N expansions — at
    100 TB they must stay map-only (no Exchange below the final sort,
    which only the query-level orderBy adds for oracle determinism)."""
    from taps_spark.io.tables import load_tables
    from taps_spark.operators.multimodal import (
        sample_audio_windows,
        synthesize_assets,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = sample_audio_windows(synthesize_assets(docs))
    qe = out._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = qe.explainString(mode)
    assert "Exchange" not in plan, "audio windowing must not shuffle"
    assert "MapInPandas" in plan


def test_topk_similarity_reduces_before_shuffle(spark, sf_dir):
    """Exact top-k must keep only k rows per (query, input-partition)
    MAP-SIDE — Spark's WindowGroupLimit in Partial mode — so the
    window shuffle never carries the whole scored candidate set. If
    this shape regresses, brute-force top-k melts at corpus scale."""
    plan = formatted_plan(spark, "similarity_topk_bruteforce", sf_dir)
    assert "WindowGroupLimit" in plan, plan
    args = [l.strip() for l in plan.splitlines() if "row_number(), 5," in l]
    assert any(a.endswith("Partial") for a in args), plan
    assert any(a.endswith("Final") for a in args), plan


def test_fk_orphans_broadcast_is_size_gated(spark, sf_dir):
    """validate_fk_orphans must broadcast only bounded dimension
    parents (nation); fact-sized parents (orders, customer) carry NO
    broadcast hint — at 100 TB a forced broadcast of those key sets
    OOMs. With auto-broadcast disabled, the unhinted anti-joins must
    fall back to shuffle while nation stays broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(spark, "validate_fk_orphans", sf_dir)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # Exactly one broadcast anti-join (customer->nation, hinted);
    # the other two relations shuffle (SortMergeJoin/ShuffledHashJoin).
    n_bcast_anti = plan.count("BroadcastHashJoin LeftAnti")
    n_shuffle_anti = plan.count("SortMergeJoin LeftAnti") + plan.count(
        "ShuffledHashJoin LeftAnti"
    )
    assert n_bcast_anti == 1, plan
    assert n_shuffle_anti == 2, plan


def test_hypertable_rollup_two_shuffles_and_pruned_scan(spark, sf_dir):
    """Continuous-aggregate rollup: exactly one shuffle per grain
    (hourly, daily) and a scan pruned to (ts, event_type, value)."""
    plan = formatted_plan(spark, "events_hypertable_rollup", sf_dir)
    # 2 grain shuffles + at most 1 for the output sort/collect.
    n_exchanges = sum(
        1 for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l
    )
    assert n_exchanges <= 3, plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "props" not in read_schema and "user_id" not in read_schema


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key co-locate: the join plan
    has NO Exchange on either side (SortMergeJoin reads bucketed
    scans directly). This is the bucketing contract a 100 TB
    fact-fact join relies on."""
    from taps_spark.io.sources import read_table, write_bucketed
    from taps_spark.io.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", ["o_orderkey"], num_buckets=8,
        )
        joined = read_table(spark, "b_orders").join(
            read_table(spark, "b_lineitem"), "o_orderkey"
        )
        qe = joined._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = qe.explainString(mode)
        body = plan.split("===== Subqueries")[0]
        exchanges = [
            l for l in body.splitlines()
            if "Exchange" in l and "BroadcastExchange" not in l
        ]
        assert not exchanges, plan
        assert "SortMergeJoin" in body or "ShuffledHashJoin" in body, plan
        # Sanity: result matches the plain (shuffled) join.
        n_plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_no_scale_killers_in_any_registered_plan(spark, sf_dir):
    """Global hygiene gate over EVERY registered batch query's
    physical plan: no CartesianProduct anywhere, and no pickle-based
    row-at-a-time Python exchange (BatchEvalPython) — Python must
    enter plans only through Arrow (ArrowEvalPython*, MapInPandas,
    FlatMapGroupsInPandas*). One regression here is the difference
    between hours and weeks at 100 TB."""
    violations = {}
    for name, rq in REGISTRY.items():
        if name.startswith("events_stream"):
            continue  # streaming plans materialize only on query start
        df = rq.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        hits = [k for k in ("CartesianProduct", "BatchEvalPython") if k in plan]
        if hits:
            violations[name] = hits
    assert not violations, violations


def test_no_first_in_non_windowed_aggregates():
    """Source-level hygiene gate (r11 VERDICT #3): `F.first` is
    contractually non-deterministic in Spark outside an ordered
    window, even when every row in the group carries identical
    values — a shuffle-order change can silently flip results. The
    only sanctioned shape is `F.first(...).over(ordered window)`;
    everything else must use F.max / a post-aggregate 1-row join
    (the cvm precedent, queries/profiling.py)."""
    import pathlib
    import re as _re

    root = pathlib.Path(__file__).resolve().parent.parent / "taps_spark"
    violations = []
    for path in sorted(root.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if "F.first(" not in line:
                continue
            window = "\n".join(lines[i : i + 3])
            if not _re.search(r"\.over\(", window):
                violations.append(f"{path.name}:{i + 1}: {line.strip()}")
    assert not violations, violations


def test_cross_source_overlap_has_no_self_join(spark, sf_dir):
    """dedup_cross_source_overlap must expand source pairs JVM-side
    from each gram's collected source set — a gram-keyed SELF-JOIN
    would shuffle the shingle set twice and explode on hot grams. The
    plan must contain no join at all and exactly two aggregate
    exchanges (gram rollup + |sources|^2 pair rollup)."""
    plan = formatted_plan(spark, "dedup_cross_source_overlap", sf_dir)
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert bad not in plan, plan
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if l.strip().startswith("Arguments: hashpartitioning(")
    )
    assert n_hash_exchanges == 2, plan


def test_quantile_gate_broadcasts_thresholds(spark, sf_dir):
    """The per-language median thresholds are a few-row dimension and
    must come back as a broadcast join — no giant per-language sort
    window over the corpus, no shuffle of the document side."""
    plan = formatted_plan(spark, "text_quality_quantile_gate", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_fixed_sample_group_limits_before_shuffle(spark, sf_dir):
    """sample_fixed_per_group must compile to WindowGroupLimit with a
    Partial (map-side) mode: each task truncates to 5 rows per group
    BEFORE the window exchange, so the shuffle is bounded by
    5·|groups| per task no matter how large the corpus grows."""
    plan = formatted_plan(spark, "sample_fixed_per_group", sf_dir)
    assert "WindowGroupLimit" in plan, plan
    args = [l.strip() for l in plan.splitlines() if "row_number(), 5," in l]
    assert any(a.endswith("Partial") for a in args), plan
    assert any(a.endswith("Final") for a in args), plan


def test_dynamic_partition_pruning_prunes_fact_scan(spark, sf_dir, tmp_path):
    """A fact table partitioned on the join key must receive a
    dynamicpruningexpression partition filter when joined to a
    filtered dimension — at 100 TB this is the difference between
    scanning one partition and scanning the whole table. Catalyst
    injects it only when the layout cooperates; this pins that our
    partitioned-write layout + join shape qualify."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fact_path = str(tmp_path / "fact_by_flag")
    li.write.partitionBy("l_returnflag").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("A", "grpA"), ("N", "grpN"), ("R", "grpR")], ["flag", "grp"]
    )
    j = (
        fact.join(dim.filter(F.col("grp") == "grpR"), fact.l_returnflag == dim.flag)
        .groupBy("grp")
        .count()
    )
    qe = j._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = qe.explainString(mode)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("dynamicpruningexpression" in l for l in pf), plan


def test_runtime_bloom_filter_reaches_probe_scan(spark, sf_dir):
    """When the build side of a shuffle join carries a selective
    predicate, Spark's runtime bloom filter must be injected on the
    probe side (bloom_filter_agg on the build keys, might_contain at
    the probe scan) — rows that cannot match die before the exchange
    instead of shuffling. The row-level complement of DPP."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        qe = j._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = qe.explainString(mode)
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bloom_probe_is_broadcast_no_shuffle_on_miss_path(spark, sf_dir):
    """The bloom bitmap must reach the incoming batch by broadcast
    (one-row bitmap), and the CDC/window shapes stay single-exchange:
    the whole point of the prefilter is that probe-miss rows never
    shuffle."""
    plan = formatted_plan(spark, "dedup_bloom_incremental", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # The bitmap side must be broadcast-exchanged, never shuffled.
    assert "BroadcastExchange" in plan


def test_cdc_apply_single_window_exchange(spark, sf_dir):
    """row_number and count share one partitioning: exactly one
    exchange feeds the window stage (plus the shuffle AQE may add for
    the final sort)."""
    plan = formatted_plan(spark, "transfer_cdc_apply", sf_dir)
    # Both window functions must evaluate in a single Window node.
    assert plan.count("Window") >= 1
    window_exchanges = plan.count("Exchange hashpartitioning(key")
    assert window_exchanges <= 1, f"window should shuffle once on key, got {window_exchanges}"


def test_pq_adc_lookup_is_broadcast(spark, sf_dir):
    """The ADC lookup table (queries × m × ksub) and the codebooks
    must both move by broadcast — the corpus-side code stream never
    shuffles to meet them."""
    plan = formatted_plan(spark, "similarity_ann_pq", sf_dir)
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan  # partial top-k still reduces map-side


def test_expectation_suite_is_single_aggregation(spark, sf_dir):
    """All six declared constraints must ride ONE aggregate over the
    joined relation (that's the operator's whole point): exactly one
    aggregate subtree reading the scan, no per-constraint jobs. The
    verdict explode runs on the single result row."""
    plan = formatted_plan(spark, "validation_expectations", sf_dir)
    assert "Generate" in plan  # the one-row verdict explode
    # One distinct-style expand is allowed (uniqueness), but there
    # must be no join strategy heavier than hash for the key set.
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bm25_filters_before_explode_and_broadcasts_stats(spark, sf_dir):
    """BM25 must explode only query-term hits (filter() inside the
    array before Generate) and bring term stats back by broadcast —
    a sort-merge join on (doc, term) would shuffle the corpus
    token stream."""
    plan = formatted_plan(spark, "text_bm25_search", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "explode(filter(" in plan, (
        "explode input must be the filtered token array, not the raw one"
    )


def test_weighted_sample_is_partial_topk(spark, sf_dir):
    """A-ES selection must compile to TakeOrderedAndProject
    (per-partition partial top-k + driver merge), never a global
    range-partitioned sort."""
    plan = formatted_plan(spark, "sample_weighted", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_dim_standardize_combines_map_side(spark, sf_dir):
    """The posexplode fan-out must be collapsed by a partial
    aggregate BEFORE the exchange — the shuffle carries ≤ partitions
    × 64 rows, not corpus × 64."""
    import re

    plan = formatted_plan(spark, "similarity_dim_standardize", sf_dir)
    # r7: the hardened query sums exact decimal moments instead of
    # avg/stddev — the map-side combine is now partial_sum/partial_min.
    assert "partial_sum" in plan, "map-side partial aggregate missing"
    assert "partial_min" in plan and "partial_max" in plan

    def node_num(pattern):
        m = re.search(r"\((\d+)\) " + pattern, plan)
        assert m, pattern
        return int(m.group(1))

    # Formatted detail numbers increase leaf→root: the explode must
    # feed the partial aggregate, which must run BEFORE the exchange.
    gen, agg, exch = node_num("Generate"), node_num("HashAggregate"), node_num("Exchange")
    assert gen < agg < exch


def test_incremental_merge_no_sort_merge_join(spark, sf_dir):
    """State build + merge is union + groupBy — there must be no join
    at all in the maintained-rollup plan, and the merge must reuse
    hash aggregation (mergeable-state algebra), not sorts."""
    plan = formatted_plan(spark, "pipeline_incremental_agg_merge", sf_dir)
    assert "Join" not in plan
    assert "Union" in plan


def test_minmax_by_is_windowless_hash_agg(spark, sf_dir):
    """agg_minmax_by's whole point vs a rank window: arg-max state
    merges map-side inside one hash aggregation — the plan must have
    NO window and show a partial max_by before the exchange."""
    plan = formatted_plan(spark, "agg_minmax_by", sf_dir)
    assert "Window" not in plan
    assert "partial_max_by" in plan or "partial_maxby" in plan.replace("_", ""), plan[:2000]


def test_ks_test_has_no_global_window(spark, sf_dir):
    """stats_ks_test must compute its ECDF via the distributed
    prefix-sum primitive (mapInPandas numbering pass), never a
    single-partition global window."""
    plan = formatted_plan(spark, "stats_ks_test", sf_dir)
    assert "MapInPandas" in plan
    assert "Window" not in plan


def test_contrastive_negatives_partial_topk(spark, sf_dir):
    """The per-anchor hash rank must reduce map-side: WindowGroupLimit
    in Partial mode before the exchange, same as the similarity
    top-k family."""
    plan = formatted_plan(spark, "sample_contrastive_negatives", sf_dir)
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_arrow_quantize_is_map_only_arrow(spark, sf_dir):
    """udf_arrow_quantize: Python enters via mapInArrow only, and the
    job is map-only — no aggregation or join exchange before the
    display sort."""
    plan = formatted_plan(spark, "udf_arrow_quantize", sf_dir)
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan or "ArrowEvalPython" in plan, plan[:1500]
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" not in plan and "SortMergeJoin" not in plan
