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


def test_driver_window_all_oracle_checkable():
    """The round driver hash-checks only the FIRST 50 QUERIES entries
    (dict order). Every one of those positions must carry a DuckDB
    oracle — a rows-only or broken key inside the window wastes a
    verification slot. Keep all no_oracle keys strictly after 50."""
    import __spark_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    window = q[:50]
    missing = [k for k in window if k not in o]
    assert not missing, f"non-oracle keys inside the driver window: {missing}"


ROTATED_R5 = {
    # The 30 oracle keys that had never had a driver-green CORRECTNESS
    # row in rounds 1-4; round 5 rotates them into the 50-key window so
    # every oracle key has been driver-verified at least once.
    "q_active_users", "q_growth_accounting", "q_transitions",
    "q_top_paths", "q_impute", "q_one_hot", "q_chi_square", "q_twap",
    "q_moments", "q_clustering_coeff", "q_retention_curve",
    "q_dwell_times", "q_pii_scrub", "q_repetition", "q_event_gaps",
    "q_anomalies", "q_time_rollup", "q_co_occurrence",
    "q_frequent_items_scalable", "q_unpivot", "q_dup_spans",
    "q_histogram", "q_chunk_docs", "q_seq_pack", "q_json_extract",
    "q_domain_cap", "q_rebalance_sources", "q_ntile_bins",
    "q_minmax_scale", "q_url_normalize",
}


def test_round5_window_composition():
    """Round-5 rotation: the 30 never-driver-verified oracle keys all sit
    inside the driver's 50-key window, alongside 20 regression anchors
    covering scan/agg/dedup/knn/graph/media."""
    import __spark_entry__ as e

    window = set(list(e.queries())[:50])
    missing = ROTATED_R5 - window
    assert not missing, f"rotated keys fell out of the window: {missing}"
    anchors = {
        "q_scan_parquet", "q_groupby_sum", "q_funnel", "q_dedup_exact",
        "q_semantic_dedup", "q_knn_ivf", "q_profile",
        "q_expectations", "q_triangles",
    }
    assert anchors <= window
    # round-5 NEW operators debut in the window so they get a driver
    # row in their first round (the keys they displaced are all
    # driver-green from r4)
    new_r5 = {
        "q_data_split", "q_boilerplate", "q_boilerplate_clean",
        "q_regression", "q_mode", "q_mad", "q_autocorr", "q_entropy",
        "q_snapshot_diff", "q_weighted_sample", "q_analytics_pipeline",
    }
    assert new_r5 <= window


def test_every_oracle_key_has_a_driver_row():
    """Union of CORRECTNESS_r01-r04 driver rows plus the current window
    must cover every ORACLES key — i.e. after this round's driver run,
    no oracle key will ever have been skipped by the gate."""
    import glob
    import json
    import os

    import __spark_entry__ as e

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set(list(e.queries())[:50])
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r0*.json")):
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
