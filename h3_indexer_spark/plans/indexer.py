"""Index stage (reference h3_indexer.py:31-81). Implemented in M3/M4."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from h3_indexer_spark.config.vector import VectorTable


def h3_indexer_spark(
    spark: SparkSession, input_config: VectorTable, h3_resolution: int
) -> DataFrame:  # pragma: no cover
    raise NotImplementedError("index stage lands in M3/M4")
