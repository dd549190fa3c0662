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


# Round-12 window composition: the driver hash-checks the FIRST 50
# QUERIES entries in dict order; no-oracle keys get a weaker
# rows+schema record. This round executes SURVEY §7.1's rotation plan
# (queries.py::_WINDOW_R12): the 42 oracle keys whose latest driver
# row is round 7 take the window (after this round no oracle key's
# latest driver row predates round 8), plus the 3 round-12 debuts,
# plus the 5 oldest stale rows-only keys (r6 cohort — VERDICT r11
# #4). The round-11 window's 50 keys all took fresh rows in round 11
# and yield their slots.
ROTATED_R12 = {
    "q_calibration", "q_cohens_kappa", "q_collocations", "q_count",
    "q_distinct", "q_embed_normalize", "q_except", "q_feature_hash",
    "q_filter_notnull", "q_first", "q_forecast_wape", "q_gini",
    "q_h3_radius_join", "q_hll_grouped", "q_hll_registers",
    "q_intersect", "q_js_divergence", "q_knn_ivfpq_rerank",
    "q_ks_test", "q_label_vote", "q_lit_cols", "q_lm_score",
    "q_lorenz", "q_mul_ratio", "q_mutual_info", "q_ndcg",
    "q_point_in_polygon", "q_project", "q_quality_score",
    "q_readability", "q_retrieval_eval", "q_rfm", "q_rrf_fusion",
    "q_seasonality", "q_skyline", "q_spatial_knn", "q_string_agg",
    "q_survival", "q_time_to_convert", "q_token_count", "q_union",
    "q_vocab_encode",
}
# round-12 debuts — every NEW key takes its first driver record in
# its debut round (driver-window-slot rule)
DEBUTS_R12 = {
    "q_t_closeness", "q_trend_test", "q_auc_ovr",
}
# rows-only keys allowed in the round-12 window (no SQL mirror):
# the oldest stale mirror-less driver records, refreshed per
# VERDICT r11 #4
ROWS_ONLY_R12 = {
    "q_approx_stats", "q_ewma", "q_kmeans", "q_knn_ivfpq",
    "q_media_frames",
}


def test_round12_window_composition():
    """All 42 round-7-stale oracle keys, the three round-12 debuts,
    and the five oldest rows-only keys sit inside the 50-key window;
    the only non-oracle window keys are the planned rows-only
    refreshes."""
    import __spark_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    window = set(q[:50])
    must_rotate = ROTATED_R12 | (DEBUTS_R12 & set(q)) | ROWS_ONLY_R12
    missing = must_rotate - window
    assert not missing, f"stale keys fell out of the window: {missing}"
    no_oracle = {k for k in q[:50] if k not in o}
    assert no_oracle <= ROWS_ONLY_R12, (
        f"unexpected no-oracle keys in window: {no_oracle - ROWS_ONLY_R12}"
    )


def test_no_stale_driver_rows_after_round12():
    """The freshness invariant VERDICT r9 #1 prescribes, advanced one
    round: every oracle key's latest driver row, once this round's
    window lands, is round 8 or later. Historical CORRECTNESS files
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
        if latest.get(k, 0) < 8
    }
    assert not stale, f"keys whose latest driver row predates round 8: {stale}"


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
