"""Partitioned Parquet sink (SURVEY.md §2.1 S5).

Parity: reference ``spark/spark.py:154-196`` + call sites
``main.py:63-64,95-96`` — overwrite-mode snappy Parquet partitioned by
``(h3_resolution, h3_r3_parent)`` with ≤500k records per file.

Scale posture: the caller repartitions by the partition key first
(operators.relational.repartition_by), so each task owns few partition
directories and the sink emits large, well-sized files instead of a
small-files explosion (the classic failure of partitionBy at 1000
executors × 5000 partition values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from h3_indexer_spark.constants import OUTPUT_PARTITION_COLS


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = OUTPUT_PARTITION_COLS,
    max_records_per_file: int = 500_000,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .option("compression", "snappy")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Unpartitioned sink for intermediate artifacts."""
    df.write.mode(mode).option("compression", "snappy").parquet(path)
