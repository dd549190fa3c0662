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
