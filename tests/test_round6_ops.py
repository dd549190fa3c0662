"""Round-6 operators: row-level MERGE (merge_by_key)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from h3_indexer_spark.operators.relational import merge_by_key


def _target(spark):
    return spark.createDataFrame(
        [
            Row(k=1, v="a", n=10),
            Row(k=2, v="b", n=20),
            Row(k=3, v="c", n=30),
        ]
    )


def test_merge_update_insert_delete(spark):
    src = spark.createDataFrame(
        [
            Row(k=2, v="B2", n=200, deleted=False),  # update
            Row(k=3, v=None, n=None, deleted=True),  # delete
            Row(k=4, v="d", n=40, deleted=False),  # insert
            Row(k=9, v=None, n=None, deleted=True),  # tombstone no-op
        ]
    )
    out = merge_by_key(_target(spark), src, ["k"], delete_col="deleted")
    got = {r["k"]: (r["v"], r["n"]) for r in out.collect()}
    assert got == {1: ("a", 10), 2: ("B2", 200), 4: ("d", 40)}


def test_merge_null_source_value_wins(spark):
    """Matching is presence-based, not COALESCE — a matched source row
    with a legitimately-NULL value must overwrite the target value."""
    src = spark.createDataFrame(
        [(1, None, 99)], schema="k bigint, v string, n bigint"
    )
    out = merge_by_key(_target(spark), src, ["k"])
    got = {r["k"]: (r["v"], r["n"]) for r in out.collect()}
    assert got[1] == (None, 99)
    assert got[2] == ("b", 20) and got[3] == ("c", 30)


def test_merge_idempotent(spark):
    src = spark.createDataFrame(
        [Row(k=2, v="B2", n=200, deleted=False),
         Row(k=4, v="d", n=40, deleted=False)]
    )
    once = merge_by_key(_target(spark), src, ["k"], delete_col="deleted")
    twice = merge_by_key(once, src, ["k"], delete_col="deleted")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_merge_value_cols_subset_and_extra_source_cols(spark):
    """value_cols defaults to the intersection of non-key columns;
    source-only columns (audit fields) must not leak into the output."""
    src = spark.createDataFrame([Row(k=2, n=200, batch_id="b7")])
    out = merge_by_key(_target(spark), src, ["k"])
    assert set(out.columns) == {"k", "n"}
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {1: 10, 2: 200, 3: 30}


def test_merge_bucketed_zero_exchange(spark, tmp_path):
    """The 100 TB nightly-merge plan: both sides bucketed on the key →
    the full-outer join runs with ZERO Exchange (the files carry the
    hash partitioning)."""
    from h3_indexer_spark.sources.writers import write_bucketed_table

    spark.sql("DROP TABLE IF EXISTS m6_tgt")
    spark.sql("DROP TABLE IF EXISTS m6_src")
    tgt = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("n")
    )
    src = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("n")
    )
    write_bucketed_table(tgt, "m6_tgt", "k", n_buckets=8)
    write_bucketed_table(src, "m6_src", "k", n_buckets=8)
    out = merge_by_key(
        spark.table("m6_tgt"), spark.table("m6_src"), ["k"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["k"]: r["n"] for r in out.collect()}
    assert len(got) == 1000
    assert got[3] == 21 and got[4] == 8
    spark.sql("DROP TABLE IF EXISTS m6_tgt")
    spark.sql("DROP TABLE IF EXISTS m6_src")
