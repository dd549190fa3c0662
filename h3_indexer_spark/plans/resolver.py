"""Resolve stage (reference h3_resolver.py:45-160). Implemented in M2+."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from h3_indexer_spark.config.job import Job


def h3_resolver_spark(spark: SparkSession, job: Job) -> DataFrame:  # pragma: no cover
    raise NotImplementedError("resolve stage lands in M2+")


def h3_resolver_single_input_spark(
    spark: SparkSession, job: Job
) -> DataFrame:  # pragma: no cover
    raise NotImplementedError("resolve stage lands in M2+")
