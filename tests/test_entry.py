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


# Round-10 window composition: the driver hash-checks the FIRST 50
# QUERIES entries in dict order; no-oracle keys get a weaker
# rows+schema record. This round executes SURVEY §7.1's rotation plan
# verbatim (queries.py::_WINDOW_R10): the 48 keys whose latest driver
# row is round 5 take the window (after this round no oracle key's
# latest driver row predates round 6), plus the 2 round-10 debuts.
# The round-9 window's 50 keys all took fresh rows in round 9 and
# yield their slots.
ROTATED_R10 = {
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
# round-10 debuts — every NEW key takes its first driver record in
# its debut round (driver-window-slot rule)
DEBUTS_R10 = {"q_k_anonymity", "q_class_report"}
# rows-only keys allowed in the round-10 window (no SQL mirror) —
# none planned: both debuts are oracle-checked
ROWS_ONLY_R10: set[str] = set()


def test_round10_window_composition():
    """All 48 round-5-stale keys and both round-10 debuts sit inside
    the 50-key window; every window key is oracle-checked (no
    rows-only slots this round); no freshly-rotated round-9 key burns
    a slot."""
    import __spark_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    window = set(q[:50])
    must_rotate = ROTATED_R10 | (DEBUTS_R10 & set(q))
    missing = must_rotate - window
    assert not missing, f"stale keys fell out of the window: {missing}"
    no_oracle = {k for k in q[:50] if k not in o}
    assert no_oracle <= ROWS_ONLY_R10, (
        f"unexpected no-oracle keys in window: {no_oracle - ROWS_ONLY_R10}"
    )


def test_no_stale_driver_rows_after_round10():
    """The freshness invariant VERDICT r9 #1 prescribes: every oracle
    key's latest driver row, once this round's window lands, is round
    6 or later. Historical CORRECTNESS files give each key's latest
    recorded round; keys in the current window count as
    latest=current."""
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
        if latest.get(k, 0) < 6
    }
    assert not stale, f"keys whose latest driver row predates round 6: {stale}"


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
