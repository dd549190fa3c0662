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


# Round-7 window composition (VERDICT r6 items #1/#2/#4): the driver
# hash-checks the FIRST 50 QUERIES entries in dict order; no-oracle keys
# get a weaker rows+schema record. This round's window: q_kcore (the
# only key with no driver record in any round), the 12 keys whose last
# driver window was round 3, the two reworked spatial joins, the new
# round-7 operators as they land, and the stalest round-4 keys.
NEVER_RECORDED_R7 = {"q_kcore"}
STALE_R3 = {
    "q_project", "q_lit_cols", "q_mul_ratio", "q_filter_notnull",
    "q_first", "q_count", "q_distinct", "q_union", "q_intersect",
    "q_except", "q_token_count", "q_quality_score",
}
REWORKED_R7 = {"q_point_in_polygon", "q_h3_radius_join"}
# planned round-7 debuts — asserted in the window once implemented
# (intersected with the live key set so the lock tracks the build)
PLANNED_R7 = {
    "q_knn_ivfpq_rerank", "q_bpe_pairs", "q_assoc_rules", "q_gini",
    "q_rfm", "q_hll_registers", "q_survival", "q_skyline", "q_bm25",
    "q_dbscan", "q_lm_score", "q_feature_hash", "q_spatial_knn",
    "q_seasonality", "q_hll_grouped", "q_time_to_convert",
    "q_vocab_encode",
}
# rows-only keys allowed in the round-7 window (no SQL mirror)
ROWS_ONLY_R7 = {"q_kcore", "q_dbscan", "q_label_prop"}


def test_round7_window_composition():
    """Every key whose latest driver record is round 3 or older (or
    missing entirely) sits inside the 50-key window, together with the
    reworked spatial joins and each implemented round-7 debut."""
    import __spark_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    window = set(q[:50])
    must_rotate = (
        NEVER_RECORDED_R7 | STALE_R3 | REWORKED_R7
        | (PLANNED_R7 & set(q))
    )
    missing = must_rotate - window
    assert not missing, f"stale keys fell out of the window: {missing}"
    # Only deliberate rows-only keys may occupy no-oracle slots —
    # any other non-oracle key in the window wastes a hash-check slot.
    no_oracle = {k for k in q[:50] if k not in o}
    assert no_oracle <= ROWS_ONLY_R7, (
        f"unexpected no-oracle keys in window: {no_oracle - ROWS_ONLY_R7}"
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
