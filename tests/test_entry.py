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


# Round-8 window composition (VERDICT r7 item #1): the driver
# hash-checks the FIRST 50 QUERIES entries in dict order; no-oracle
# keys get a weaker rows+schema record. This round's window is ONE
# canonical list (queries.py::_WINDOW_R8 — ADVICE r7 collapsed the
# incremental splices): q_label_prop (the only key with no driver
# record), the 41 keys whose latest driver row is round 4, and the 8
# round-8 debuts.
NEVER_RECORDED_R8 = {"q_label_prop"}
STALE_R4 = {
    "q_asof_join", "q_attribution",
    "q_contamination_frac", "q_corpus_curation", "q_corr",
    "q_decontaminate", "q_decontaminate_bloom", "q_dedup_clusters",
    "q_dedup_embedding", "q_dedup_embedding_lsh", "q_dedup_keep_best",
    "q_dedup_minhash", "q_dedup_ngram_jaccard", "q_dedup_resolve",
    "q_dedup_simhash", "q_dedup_spans_global",
    "q_frequent_items", "q_fuzzy_join",
    "q_join_full_outer", "q_join_left_small",
    "q_join_skew_salted", "q_knn_brute", "q_knn_lsh", "q_media_dedup",
    "q_range_join",
    "q_retention_cohorts", "q_robust_scale", "q_rolling_features",
    "q_sessionize", "q_tfidf",
}
# 7 trivial r4-stale keys displaced by the 7 continuation debuts —
# they keep their round-4 history rows, the local mirror re-verifies
# them every session, and they lead the round-9 rotation list
DEFERRED_TO_R9 = {
    "q_clean_lines", "q_explode", "q_fingerprint", "q_gap_fill",
    "q_interval_join", "q_rare_words", "q_region_revenue",
    "q_scan_where", "q_top_orders", "q_window_tumbling", "q_zscore",
}
# round-8 debuts — every NEW key takes its first driver record in the
# window (intersected with the live key set so the lock tracks the
# build)
PLANNED_R8 = {
    "q_bpe_encode", "q_hybrid_retrieval", "q_active_users_hll",
    "q_degree_dist", "q_containment", "q_vocab_coverage",
    "q_diversity", "q_fleiss_kappa",
    # continuation debuts
    "q_cms_estimate", "q_kmv_distinct", "q_adamic_adar",
    "q_mann_whitney", "q_scd2", "q_corr_matrix", "q_embed_quantize",
    "q_eventually_follows", "q_ohlc_bars", "q_market_share",
    "q_charset_stats",
}
# rows-only keys allowed in the round-8 window (no SQL mirror)
ROWS_ONLY_R8 = {"q_label_prop"}


def test_round8_window_composition():
    """q_label_prop (never recorded), all 41 round-4-stale keys, and
    each implemented round-8 debut sit inside the 50-key window —
    and only deliberate rows-only keys occupy no-oracle slots."""
    import __spark_entry__ as e

    q = list(e.queries())
    o = e.oracle_sql()
    window = set(q[:50])
    must_rotate = (
        NEVER_RECORDED_R8 | STALE_R4 | (PLANNED_R8 & set(q))
    )
    missing = must_rotate - window
    assert not missing, f"stale keys fell out of the window: {missing}"
    no_oracle = {k for k in q[:50] if k not in o}
    assert no_oracle <= ROWS_ONLY_R8, (
        f"unexpected no-oracle keys in window: {no_oracle - ROWS_ONLY_R8}"
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
