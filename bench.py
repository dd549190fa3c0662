#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q_groupby_sum": sec, ...}, "sf": 0.1}

Each query is executed to completion with a count-free full
materialization (``noop`` write) so timing covers the whole plan but
not driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Heavy/representative subset of the oracle inventory: scans+filters,
# the two resolver-shaped kernels (groupby-sum, full-outer align),
# joins, explode, windows, and the training-data operators.
HEADLINE = [
    "q_scan_where",
    "q_mul_ratio",
    "q_join_left_small",
    "q_join_left_attr",
    "q_join_full_outer",
    "q_groupby_sum",
    "q_distinct",
    "q_explode",
    "q_union",
    "q_sort_limit",
    "q_topk_window",
    "q_window_lag",
    "q_window_tumbling",
    "q_text_stats",
    "q_dedup_exact",
    "q_knn_brute",
    "q_token_count",
    "q_lang_id",
    "q_quality_score",
    "q_fingerprint",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_knn_batch",
    "q_knn_lsh",
    "q_media_meta",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(Path(sf_dir).name.replace("sf", "") or "0.1")

    from pyspark.sql import SparkSession

    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="h3_indexer_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup on an untimed scan.
    run(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))

    timings: dict[str, float] = {}
    for key in HEADLINE:
        fn = queries[key]
        t0 = time.perf_counter()
        run(fn(spark, sf_dir))
        timings[key] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
