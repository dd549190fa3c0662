"""Source/sink layer tests (SURVEY §2.1 S1-S5): format dispatch, WHERE
pushdown reaching the scan, the shapefile substitution message, and the
partitioned sink round-trip with partition pruning."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from h3_indexer_spark.sources.readers import read_source
from h3_indexer_spark.sources.writers import write_partitioned_parquet
from tests.conftest import SF_ORACLE


def test_parquet_dispatch(spark):
    df = read_source(spark, path=f"{SF_ORACLE}/region.parquet")
    assert df.count() == 5


def test_csv_dispatch_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="h3idx_csv_")
    try:
        src = spark.range(20).select(
            F.col("id"), (F.col("id") * 2.5).alias("v")
        )
        src.coalesce(1).write.mode("overwrite").option("header", "true").csv(d)
        got = read_source(spark, path=f"{d}/part-00000*.csv")
        assert got.count() == 20
        assert {r.id for r in got.collect()} == set(range(20))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_json_dispatch(spark):
    d = tempfile.mkdtemp(prefix="h3idx_json_")
    try:
        spark.range(7).coalesce(1).write.mode("overwrite").json(d)
        got = read_source(spark, path=f"{d}/part-00000*.json")
        assert got.count() == 7
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_shapefile_substitution_message(spark):
    with pytest.raises(NotImplementedError, match="ogr2ogr"):
        read_source(spark, path="/tmp/whatever.shp")


def test_where_clause_pushed_to_scan(spark):
    df = read_source(
        spark,
        path=f"{SF_ORACLE}/orders.parquet",
        where_clause="o_totalprice > 100000.0",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice" in plan


def test_table_source_with_where(spark):
    spark.read.parquet(f"{SF_ORACLE}/nation.parquet").createOrReplaceTempView(
        "nation_v"
    )
    got = read_source(spark, table="nation_v", where_clause="n_regionkey = 0")
    assert 0 < got.count() < 25


def test_exactly_one_source_required(spark):
    with pytest.raises(ValueError):
        read_source(spark)
    with pytest.raises(ValueError):
        read_source(spark, path="x.parquet", table="t")


def test_partitioned_sink_roundtrip_and_pruning(spark):
    d = tempfile.mkdtemp(prefix="h3idx_sink_")
    try:
        df = spark.range(1000).select(
            F.col("id"),
            F.lit(6).alias("h3_resolution"),
            F.concat(F.lit("p"), (F.col("id") % 4).cast("string")).alias(
                "h3_r3_parent"
            ),
            (F.col("id") * 1.5).alias("val"),
        )
        write_partitioned_parquet(df, d)
        back = spark.read.parquet(d)
        assert back.count() == 1000
        # partition filter must prune directories, not scan-and-filter
        pruned = back.where(F.col("h3_r3_parent") == "p1")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert pruned.count() == 250
        assert "PartitionFilters: [isnotnull(h3_r3_parent" in plan
    finally:
        shutil.rmtree(d, ignore_errors=True)
