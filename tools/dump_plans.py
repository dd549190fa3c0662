#!/usr/bin/env python
"""Dump .explain("formatted") for contract keys to plans/<tag>/.

Usage:
  python tools/dump_plans.py --tag r12 --suffix _before q_item_cf ...
  python tools/dump_plans.py --tag r12 --suffix _before --bench
      (all bench HEADLINE keys)

Plans are BUILT at $SPARK_GRAFT_SF_DIR (default sf0.1) with the
bench-identical session width so the dumped shape is the benched shape.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    argv = sys.argv[1:]
    tag = "r12"
    suffix = ""
    keys: list[str] = []
    use_bench = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--tag":
            tag = argv[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = argv[i + 1]
            i += 2
        elif a == "--bench":
            use_bench = True
            i += 1
        else:
            keys.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="dump_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    import bench

    queries = entrymod.queries()
    if use_bench:
        keys = list(bench.HEADLINE) + keys
    sf_dir = bench._normalize_layout(spark, sf_dir, int(cpus))

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out_dir = Path(_REPO_ROOT) / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for key in keys:
        try:
            df = queries[key](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            print(f"ERROR {key}: {exc}")
            continue
        path = out_dir / f"{key}{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
    spark.stop()


if __name__ == "__main__":
    main()
