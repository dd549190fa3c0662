"""SparkSession bootstrap.

Capability parity with the reference's session factory
(``/root/reference/src/h3_indexer/spark/spark.py:76-136``) minus the
environment plumbing we don't need (Sedona jars, Kryo registrator, S3A,
Athena JDBC). Keeps the reference's performance posture: AQE with
partition coalescing + skew-join handling, 128 MB advisory partitions,
Arrow-vectorized Python interop, and a shuffle-partition width keyed to
the H3 resolution (reference ``spark/spark.py:14-23,115``).

Designed for a 1000-executor cluster; on ``local[N]`` the same settings
are safe because AQE coalesces the excess shuffle partitions at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Reference spark/spark.py:14-23 — initial shuffle width per H3
# resolution. With AQE coalescing enabled this is an upper hint, not a
# hard width: at 100 TB the finer resolutions explode row counts, so the
# hint scales with resolution.
PARTITION_MAPPING = {
    3: 100,
    4: 200,
    5: 400,
    6: 800,
    7: 1600,
    8: 3200,
    9: 6400,
    10: 8000,
}


def get_spark_session(
    h3_resolution: int = 6,
    app_name: str = "h3_indexer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the indexing workload.

    ``master`` defaults to ``local[N]`` with N from ``SPARK_GRAFT_CPUS``
    (driver contract) or all cores; on a real cluster pass ``None`` and
    let spark-submit supply the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = PARTITION_MAPPING.get(h3_resolution, 800)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Deterministic timestamps across engines (oracle comparisons).
        .config("spark.sql.session.timeZone", "UTC")
        # Reference spark/spark.py:115 — initial shuffle width.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Reference spark/spark.py:120-125 — AQE posture.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Reference spark/spark.py:127-128 — Arrow interop; ours is
        # actually vectorized (pandas UDFs), batch size tuned larger.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Reference spark/spark.py:118 — bound output file sizes.
        .config("spark.sql.files.maxRecordsPerFile", "500000")
        # The driver's events table stores TIMESTAMP(NANOS); read as
        # long nanoseconds (Spark has no nanos timestamp type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Broadcast threshold: dims (region/nation/hex-geometry tables)
        # must broadcast; AQE can also convert to broadcast at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
