"""Smoke: the driver contract module works end-to-end."""

from __future__ import annotations


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {
        "nationkey",
        "nation_name",
        "sum_cust_bal",
        "sum_supp_bal",
    }


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


# Round-9 window composition: the driver hash-checks the FIRST 50
# QUERIES entries in dict order; no-oracle keys get a weaker
# rows+schema record. This round's window is ONE canonical list
# (queries.py::_WINDOW_R9): the 11 keys whose latest driver row is
# round 4 (deferred from round 8's rotation — this finally meets the
# "no oracle key's latest row predates round 5" bar) and every
# round-9 debut (39 of them — debuts outrank round-5-stale
# rotations for the remaining slots).
STALE_R4 = {
    "q_clean_lines", "q_explode", "q_fingerprint", "q_gap_fill",
    "q_interval_join", "q_rare_words", "q_region_revenue",
    "q_scan_where", "q_top_orders", "q_window_tumbling", "q_zscore",
}
# round-9 debuts — every NEW key takes its first driver record in the
# window (intersected with the live key set so the lock tracks the
# build)
PLANNED_R9 = {
    "q_seq_patterns",
    "q_quantile_sketch",
    "q_kmv_intersect",
    "q_edit_join",
    "q_quantile_sketch_grouped",
    "q_keywords",
    "q_h3_compact",
    "q_theil_sen",
    "q_anova",
    "q_bootstrap_ci",
    "q_graph_jaccard",
    "q_log_odds",
    "q_mutual_best",
    "q_cramers_v",
    "q_did",
    "q_psm_match",
    "q_spearman",
    "q_levene",
    "q_cronbach_alpha",
    "q_simpsons",
    "q_mde",
    "q_partial_corr",
    "q_reciprocity",
    "q_skew_report",
    "q_kendall",
    "q_assortativity",
    "q_hhi",
    "q_wilcoxon",
    "q_tukey_hsd",
    "q_price_index",
    # continuation-session debuts — these outrank round-5-stale
    # rotations for the last 9 slots (a key with NO driver row is
    # strictly worse than one whose latest row is round 5)
    "q_kruskal",
    "q_jarque_bera",
    "q_xcorr",
    "q_item_cf",
    "q_woe_iv",
    "q_drawdown",
    "q_pr_auc",
    "q_file_compaction",
    "q_zipf_fit",
}
# the 48 round-5 keys the 50-slot budget defers to round 10 (the
# local mirror re-verifies them every session regardless)
DEFERRED_TO_R10 = {
    "q_active_users", "q_analytics_pipeline", "q_anomalies",
    "q_autocorr", "q_boilerplate", "q_boilerplate_clean",
    "q_chi_square", "q_chunk_docs", "q_clustering_coeff",
    "q_co_occurrence", "q_data_split", "q_dedup_exact",
    "q_domain_cap", "q_dup_spans", "q_dwell_times",
    "q_event_gaps", "q_expectations", "q_frequent_items_scalable",
    "q_funnel", "q_groupby_sum", "q_growth_accounting",
    "q_histogram", "q_impute",
    "q_json_extract", "q_knn_ivf", "q_mad",
    "q_minmax_scale", "q_mode", "q_moments", "q_ntile_bins",
    "q_one_hot",
    "q_pii_scrub", "q_profile", "q_rebalance_sources",
    "q_regression", "q_repetition",
    "q_scan_parquet", "q_semantic_dedup", "q_seq_pack", "q_snapshot_diff",
    "q_time_rollup", "q_top_paths", "q_transitions", "q_triangles",
    "q_twap", "q_unpivot", "q_url_normalize", "q_weighted_sample",
}
# rows-only keys allowed in the round-9 window (no SQL mirror) —
# none planned: every round-9 debut is oracle-checked
ROWS_ONLY_R9: set[str] = set()


def test_round9_window_composition():
    """All 11 round-4-stale keys and each implemented round-9 debut
    sit inside the 50-key window; every window key is oracle-checked
    (no rows-only slots this round); the deferred round-5 keys are
    genuinely outside."""
    import __spark_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    window = set(q[:50])
    must_rotate = STALE_R4 | (PLANNED_R9 & set(q))
    missing = must_rotate - window
    assert not missing, f"stale keys fell out of the window: {missing}"
    no_oracle = {k for k in q[:50] if k not in o}
    assert no_oracle <= ROWS_ONLY_R9, (
        f"unexpected no-oracle keys in window: {no_oracle - ROWS_ONLY_R9}"
    )
    assert not (DEFERRED_TO_R10 & window), (
        "deferred keys must not burn window slots"
    )


def test_every_oracle_key_has_a_driver_row():
    """Union of historical CORRECTNESS driver rows plus the current
    window must cover every ORACLES key — i.e. after this round's driver
    run, no oracle key will ever have been skipped by the gate."""
    import glob
    import json
    import os

    import __spark_entry__ as e

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set(list(e.queries())[:50])
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            seen |= set(json.load(open(path)))
        except (json.JSONDecodeError, OSError):  # pragma: no cover
            continue
    uncovered = set(e.oracle_sql()) - seen
    assert not uncovered, f"oracle keys never driver-checked: {uncovered}"


def test_no_array_columns_cross_contract_boundary(spark):
    """The driver's canonicalizer sorts rows by every column and dies
    on unhashable cells (CORRECTNESS_r03: q_approx_stats TypeError).
    No contract query may emit array/map/struct columns."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as e

    from tests.conftest import SF_SMALL

    bad = []
    for name, fn in e.queries().items():
        for f in fn(spark, SF_SMALL).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"complex-typed contract columns: {bad}"
