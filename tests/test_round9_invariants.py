"""Mathematical invariants for the round-9 continued-session queries —
properties the DuckDB oracle CANNOT pin (it would fail identically if
both engines shared a logic bug), asserted directly on the Spark
output. Each is a theorem about the operator, not a fixture accident,
so these hold on any data the query is pointed at.
"""

from __future__ import annotations

import pytest

from taps_spark.queries import REGISTRY, _load

_load()


def _rows(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_kaplan_meier_monotonicity(spark, sf_dir):
    rows = _rows("events_kaplan_meier", spark, sf_dir)
    assert rows, "life table must be non-empty on the fixture"
    prev_day, prev_risk, prev_nls = None, None, None
    pop = rows[0]["n_risk"]
    exits = 0
    for r in rows:
        if prev_day is not None:
            assert r["day"] > prev_day
            # risk sets shrink strictly between event days (at least
            # the previous day's events left the set)
            assert r["n_risk"] < prev_risk
        # -log10 S(t) is nondecreasing (survival never rises); the
        # terminal all-exit day carries NULL (S = 0 exactly)
        if r["neg_log10_survival_micro"] is not None:
            assert r["neg_log10_survival_micro"] >= 0
            if prev_nls is not None:
                assert r["neg_log10_survival_micro"] >= prev_nls
            prev_nls = r["neg_log10_survival_micro"]
        else:
            assert r["n_risk"] == r["n_events"], "NULL only at full exit"
        exits += r["n_events"]
        prev_day, prev_risk = r["day"], r["n_risk"]
    assert exits <= pop


def test_psi_nonnegative_and_complete(spark, sf_dir):
    rows = {r["bin"]: r for r in _rows("profile_psi_drift", spark, sf_dir)}
    # Gibbs' inequality: sum of (p-q)ln(p/q) terms is >= 0
    assert rows[-1]["psi_term_nano"] >= 0
    per_bin = [rows[b] for b in rows if b >= 0]
    assert sum(r["n_base"] for r in per_bin) == rows[-1]["n_base"]
    assert sum(r["n_curr"] for r in per_bin) == rows[-1]["n_curr"]
    assert sum(r["psi_term_nano"] for r in per_bin) == rows[-1]["psi_term_nano"]


def test_kmeans_estep_mstep_consistency(spark, sf_dir):
    assign = {r["centroid_id"]: r for r in _rows("similarity_kmeans_assign", spark, sf_dir)}
    update = {r["centroid_id"]: r for r in _rows("similarity_kmeans_update", spark, sf_dir)}
    assert set(assign) == set(update), "both steps see the same clusters"
    for cid, a in assign.items():
        assert a["n_assigned"] == update[cid]["n_assigned"]
        assert update[cid]["shift_micro"] >= 0
        assert a["inertia_milli"] >= 0
        assert a["mean_cos_micro"] <= 1_000_000
    # every centroid captures at least itself (cos=1 with itself)
    assert all(a["n_assigned"] >= 1 for a in assign.values())


def test_peak_concurrency_global_is_hourly_max(spark, sf_dir):
    rows = {r["hour_utc"]: r for r in _rows("events_peak_concurrency", spark, sf_dir)}
    hourly = [r for h, r in rows.items() if h >= 0]
    assert rows[-1]["peak_concurrency"] == max(r["peak_concurrency"] for r in hourly)
    assert rows[-1]["n_active_minutes"] == sum(r["n_active_minutes"] for r in hourly)
    assert all(r["peak_concurrency"] >= 1 for r in hourly)


def test_bfs_levels_partition_the_reachable_set(spark, sf_dir):
    rows = _rows("graph_bfs_hops", spark, sf_dir)
    hops = [r["hop"] for r in rows]
    assert hops == sorted(hops) and hops[0] == 0
    assert rows[0]["n_nodes"] == 5, "seed level is the 5-node seed set"
    assert all(r["n_nodes"] >= 1 for r in rows)


def test_local_clustering_coefficient_bounds(spark, sf_dir):
    for r in _rows("graph_local_clustering", spark, sf_dir):
        assert 0.0 <= r["local_clustering"] <= 1.0
        assert r["degree"] >= 2
        # t <= C(d, 2): a node cannot close more triangles than wedges
        assert r["n_triangles"] <= r["degree"] * (r["degree"] - 1) // 2


def test_velocity_peak_bounded_by_history(spark, sf_dir):
    for r in _rows("events_velocity_alert", spark, sf_dir):
        assert 1 <= r["peak_10min_events"] <= r["n_events"]


def test_heaps_curve_monotone_and_saturating(spark, sf_dir):
    rows = _rows("text_heaps_law", spark, sf_dir)
    assert [r["decile"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b["vocab"] >= a["vocab"]
        assert b["total_tokens"] >= a["total_tokens"]
        assert b["n_prefix_docs"] >= a["n_prefix_docs"]
        # type/token ratio falls as the corpus grows (Heaps sublinearity)
        assert b["type_token_ppm"] <= a["type_token_ppm"]


def test_burstiness_nonnegative_and_df_bounded(spark, sf_dir):
    for r in _rows("text_term_burstiness", spark, sf_dir):
        assert r["vmr"] >= 0.0
        assert 1 <= r["doc_freq"] <= r["n_docs"]
        assert r["total_count"] >= r["doc_freq"]


def test_fd_audit_pk_rows_hold(spark, sf_dir):
    rows = {(r["tbl"], r["lhs"], r["rhs"]): r for r in _rows("profile_fd_audit", spark, sf_dir)}
    assert rows[("orders", "o_orderkey", "o_orderstatus")]["holds"] is True
    assert rows[("part", "p_partkey", "p_brand")]["holds"] is True
    for r in rows.values():
        assert 0 <= r["g3_ppm"] <= 1_000_000
        assert (r["violations"] == 0) == r["holds"]


def test_candidate_keys_flags_known_fixture_trap(spark, sf_dir):
    rows = {(r["tbl"], r["key_cols"]): r for r in _rows("profile_candidate_keys", spark, sf_dir)}
    assert rows[("orders", "o_orderkey")]["is_key"] is True
    assert rows[("customer", "c_custkey")]["is_key"] is True
    # The FIXTURES.md non-unique pair that broke r8 spearman
    li = rows[("lineitem", "l_orderkey,l_linenumber")]
    assert li["is_key"] is False and li["dup_rows"] > 0


def test_entropy_bounded_by_log_distinct(spark, sf_dir):
    import math

    for r in _rows("profile_column_entropy", spark, sf_dir):
        hi = math.log2(r["n_distinct"]) * 1000 + 1  # +1 for milli rounding
        assert 0 <= r["entropy_milli_bits"] <= hi


def test_cramers_v_bounds_and_mi_consistency(spark, sf_dir):
    v = {(r["tbl"], r["col_x"]): r for r in _rows("stats_cramers_v", spark, sf_dir)}
    mi = {(r["tbl"], r["col_x"]): r for r in _rows("profile_mutual_info", spark, sf_dir)}
    assert set(v) == set(mi)
    for k, r in v.items():
        assert 0.0 <= r["cramers_v"] <= 1.0
        assert r["chi2"] >= 0.0
        assert mi[k]["mi_milli_bits"] >= 0


def test_vad_segments_are_disjoint_islands(spark, sf_dir):
    rows = _rows("multimodal_audio_vad_segments", spark, sf_dir)
    assert rows
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for segs in by_asset.values():
        segs.sort(key=lambda r: r["segment_id"])
        for a, b in zip(segs, segs[1:]):
            # islands: a strict gap separates consecutive segments
            assert b["start_ms"] > a["end_ms"]
        for s in segs:
            assert s["end_ms"] - s["start_ms"] == s["n_windows"] * 1000
            assert 500 <= s["mean_rms_milli"] <= 1000


def test_release_diff_conserves_documents(spark, sf_dir):
    rows = _rows("pipeline_release_diff", spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    total_v2 = sum(r["n_added"] + r["n_changed"] + r["n_unchanged"] for r in rows)
    assert total_v2 == n, "v2 is the full corpus"
    n_removed = sum(r["n_removed"] for r in rows)
    assert n_removed == 0, "v1 ⊂ v2 by construction: nothing is only-in-v1"
    assert sum(r["n_added"] for r in rows) == docs.filter("doc_id % 7 = 0").count()


def test_dp_release_noise_is_centered_and_bounded(spark, sf_dir):
    rows = _rows("governance_dp_count_release", spark, sf_dir)
    for r in rows:
        # Laplace(1) noise beyond |20| has probability ~2e-9; with a
        # seeded draw this is a deterministic fact of the fixture, and
        # a regression here means the uniform derivation broke.
        assert abs(r["noise_milli"]) < 20_000
        assert r["released_milli"] - r["n_true"] * 1000 == r["noise_milli"]
        assert r["epsilon_micro"] == 1_000_000


def test_lifecycle_growth_accounting_identity(spark, sf_dir):
    rows = sorted(
        _rows("events_user_lifecycle_states", spark, sf_dir),
        key=lambda r: r["week_index"],
    )
    prev = None
    for r in rows:
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        if prev is not None and r["week_index"] == prev["week_index"] + 1:
            # MAU waterfall: active(m) = active(m-1) + new + resurrected - churned
            assert (
                r["n_active"]
                == prev["n_active"] + r["n_new"] + r["n_resurrected"] - r["n_churned"]
            )
        prev = r


def test_compression_ratio_orders_redundancy(spark, sf_dir):
    """zlib ratio must (a) be bounded, (b) price redundancy: a highly
    repetitive document compresses strictly below a diverse one, and
    (c) be deterministic across two runs."""
    from taps_spark.operators.text import compression_ratio

    rows1 = {r["source"]: r for r in REGISTRY["text_compression_ratio"].fn(spark, sf_dir).collect()}
    rows2 = {r["source"]: r for r in REGISTRY["text_compression_ratio"].fn(spark, sf_dir).collect()}
    assert rows1.keys() == rows2.keys() and all(
        rows1[s].asDict() == rows2[s].asDict() for s in rows1
    )
    for r in rows1.values():
        assert 0 < r["min_ratio_tt"] <= r["mean_ratio_tt"] <= r["max_ratio_tt"]
        assert r["max_ratio_tt"] < 12000  # zlib overhead tops out well below 1.2x

    toy = spark.createDataFrame(
        [(1, "spam " * 400), (2, " ".join(f"w{i}x{i * 7 % 97}" for i in range(400)))],
        "doc_id long, text string",
    )
    t = {r["doc_id"]: r["ratio_tt"] for r in compression_ratio(toy).collect()}
    assert t[1] < t[2], "repetitive text must compress better than diverse text"
