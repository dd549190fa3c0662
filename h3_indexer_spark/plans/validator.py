"""Validate stage (reference validator.py:64-115). Implemented in M2."""

from __future__ import annotations

from pyspark.sql import SparkSession

from h3_indexer_spark.config.job import Job


def validate_config(job: Job, spark: SparkSession) -> Job:  # pragma: no cover
    raise NotImplementedError("validate stage lands in M2")
