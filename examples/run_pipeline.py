"""End-to-end library-API example (the reference's notebook flow,
examples/run_h3_indexer.ipynb): config dict → validate → index →
resolve → inspect, all programmatic.

    python examples/run_pipeline.py [output_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from h3_indexer_spark import get_spark_session  # noqa: E402
from h3_indexer_spark.config.loader import job_from_dict  # noqa: E402
from h3_indexer_spark.plans.indexer import index_job  # noqa: E402
from h3_indexer_spark.plans.resolver import resolve_job  # noqa: E402
from h3_indexer_spark.plans.validator import validate_config  # noqa: E402
from h3_indexer_spark.sources.writers import (  # noqa: E402
    write_partitioned_parquet,
)

FIXTURES = REPO / "tests" / "_geo_fixtures"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/h3idx_example_out"
    job = job_from_dict(
        {
            "name": "example",
            "version": "1.0.0",
            "h3_resolution": 7,
            # the reference's field name works too: output_s3_path
            "output_path": out,
            "inputs": {
                "sensors": {
                    "s3_path": str(FIXTURES / "geo_points_latlon.parquet"),
                    "unique_id": "pixel_id",
                    "geometry_type": "POINT",
                    "method": "WITHIN",
                    "lat_column_name": "latitude",
                    "lon_column_name": "longitude",
                    "input_columns": ["population", "reading"],
                },
                "routes": {
                    "s3_path": str(FIXTURES / "geo_lines.parquet"),
                    "unique_id": "route_id",
                    "geometry_type": "LINE",
                    "method": "PCT_LENGTH",
                    "geometry_column_name": "geometry",
                    "input_columns": ["emissions", "traffic"],
                },
            },
        }
    )
    spark = get_spark_session(job.h3_resolution, app_name="h3idx-example")

    validate_config(job, spark)
    print(f"validated: {job.status.value}, {len(job.inputs)} inputs")

    index_job(job, spark)
    for name, vt in job.inputs.items():
        print(f"indexed {name}:")
        vt.h3_indexed_df.show(3, truncate=False)

    resolve_job(job, spark)
    print("resolved:")
    job.h3_resolved_df.show(5, truncate=False)
    write_partitioned_parquet(job.h3_resolved_df, f"{out}/resolved")
    print(f"wrote {out}/resolved")
    spark.stop()


if __name__ == "__main__":
    main()
