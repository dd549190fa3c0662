"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's Resolve-stage
shape: per-input aggregation + full-outer alignment, SURVEY.md §7 M0) on
sf0.001. ``queries()``/``oracle_sql()`` expose the §2 operator
inventory for the DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from h3_indexer_spark.queries import ORACLES, QUERIES  # noqa: E402

SF_0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the Resolve-stage capability (reference
    h3_resolver.py:22-42,71-82) on relational inputs — group-and-sum two
    inputs on a shared key, full-outer align them into one wide table,
    then enrich via a broadcast dimension join."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators import relational as R

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cust = spark.read.parquet(f"{SF_0001}/customer.parquet").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("cust_bal")
    )
    supp = spark.read.parquet(f"{SF_0001}/supplier.parquet").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("supp_bal")
    )
    nation = spark.read.parquet(f"{SF_0001}/nation.parquet").select(
        F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("nation_name")
    )
    aligned = R.full_outer_align(
        [
            R.group_and_sum(cust, "nationkey", ["cust_bal"]),
            R.group_and_sum(supp, "nationkey", ["supp_bal"]),
        ],
        "nationkey",
    )
    return R.join_left_small(aligned, nation, "nationkey").select(
        "nationkey", "nation_name", "sum_cust_bal", "sum_supp_bal"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _with_utc(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        return wrapped

    return {name: _with_utc(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable key."""
    return dict(ORACLES)
