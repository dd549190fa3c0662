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
