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


# Round-11 window composition: the driver hash-checks the FIRST 50
# QUERIES entries in dict order; no-oracle keys get a weaker
# rows+schema record. This round executes SURVEY §7.1's rotation plan
# (queries.py::_WINDOW_R11): the 39 oracle keys whose latest driver
# row is round 6 take the window (after this round no oracle key's
# latest driver row predates round 7), plus the 5 round-11 debuts,
# plus the 6 oldest round-7 oracle keys alphabetically. The round-10
# window's 50 keys all took fresh rows in round 10 and yield their
# slots.
ROTATED_R11 = {
    "q_ab_test", "q_attribution_positional", "q_changepoint",
    "q_count_distinct", "q_cube", "q_cuped", "q_dedup_windowed",
    "q_entropy", "q_groupby_stats", "q_incremental_agg",
    "q_join_anti", "q_join_left_attr", "q_join_semi", "q_knn_batch",
    "q_label_future", "q_lang_id", "q_media_audio", "q_media_meta",
    "q_merge_upsert", "q_ngram_bigrams", "q_period_over_period",
    "q_pivot_events", "q_psi_drift", "q_quantile_normalize",
    "q_quantiles", "q_retention_curve", "q_rolling_median",
    "q_rollup", "q_sample_per_group", "q_sample_stratified",
    "q_sort_limit", "q_target_encode", "q_text_stats",
    "q_topk_window", "q_weighted_median", "q_window_lag",
    "q_window_rank", "q_window_sliding", "q_winsorize",
}
# round-11 debuts — every NEW key takes its first driver record in
# its debut round (driver-window-slot rule)
DEBUTS_R11 = {
    "q_seq_patterns_full", "q_fisher_exact", "q_k_anon_generalize",
    "q_class_report_summary", "q_l_diversity",
}
# oldest round-7 oracle keys filling the remaining slots (§7.1)
R7_TAIL_R11 = {
    "q_assoc_rules", "q_auc", "q_benford", "q_bfs_hops", "q_bm25",
    "q_bpe_pairs",
}
# rows-only keys allowed in the round-11 window (no SQL mirror) —
# none planned: all five debuts are oracle-checked
ROWS_ONLY_R11: set[str] = set()


def test_round11_window_composition():
    """All 39 round-6-stale oracle keys, the five round-11 debuts, and
    the six oldest round-7 keys sit inside the 50-key window; every
    window key is oracle-checked (no rows-only slots this round)."""
    import __spark_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    window = set(q[:50])
    must_rotate = ROTATED_R11 | (DEBUTS_R11 & set(q)) | R7_TAIL_R11
    missing = must_rotate - window
    assert not missing, f"stale keys fell out of the window: {missing}"
    no_oracle = {k for k in q[:50] if k not in o}
    assert no_oracle <= ROWS_ONLY_R11, (
        f"unexpected no-oracle keys in window: {no_oracle - ROWS_ONLY_R11}"
    )


def test_no_stale_driver_rows_after_round11():
    """The freshness invariant VERDICT r9 #1 prescribes, advanced one
    round: every oracle key's latest driver row, once this round's
    window lands, is round 7 or later. Historical CORRECTNESS files
    give each key's latest recorded round; keys in the current window
    count as latest=current."""
    import glob
    import json
    import os
    import re

    import __spark_entry__ as e

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            keys = set(json.load(open(path)))
        except (json.JSONDecodeError, OSError):  # pragma: no cover
            continue
        for k in keys:
            latest[k] = max(latest.get(k, 0), rnd)
    current_round = max(latest.values(), default=0) + 1
    for k in list(e.queries())[:50]:
        latest[k] = current_round
    stale = {
        k: latest.get(k)
        for k in e.oracle_sql()
        if latest.get(k, 0) < 7
    }
    assert not stale, f"keys whose latest driver row predates round 7: {stale}"


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
