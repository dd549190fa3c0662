#!/usr/bin/env python
"""Duplicate-stage sweep (guide §1 measure-first tooling).

For every bench HEADLINE key (or the keys given on the CLI), run the
query once to warm, once measured, then pull the run's completed
stages from the local UI REST API and group them by a coarse
signature (inputBytes, shuffleWriteBytes, taskCount). Two stages with
the same non-trivial signature in ONE execution almost always mean a
duplicated subtree the AQE stage cache failed to reuse — the
join-inferred isnotnull() canonicalization break found on q_kruskal
(an explicit notnull filter on the shared table re-unifies the
canonical form; task time 35 s -> 11 s there).

Output: one line per key with suspect duplicate groups, largest first.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="h3_indexer_dup_sweep",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        spark.sparkContext.uiWebUrl
        + "/api/v1/applications/"
        + spark.sparkContext.applicationId
    )

    import bench as benchmod
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    if not keys:
        keys = list(benchmod.HEADLINE)
    bench_dir = benchmod._normalize_layout(spark, sf_dir, int(cpus))

    def run(key: str) -> None:
        queries[key](spark, bench_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def stage_ids() -> set[int]:
        with urllib.request.urlopen(base + "/stages?status=complete") as r:
            return {s["stageId"] for s in json.load(r)}

    for key in keys:
        try:
            run(key)  # warm (codegen + any pinned tables)
            seen = stage_ids()
            run(key)
            time.sleep(0.3)
            with urllib.request.urlopen(
                base + "/stages?status=complete"
            ) as r:
                st = [s for s in json.load(r) if s["stageId"] not in seen]
        except Exception as exc:  # noqa: BLE001
            print(f"{key}: ERROR {exc}")
            continue
        groups: dict[tuple, list[dict]] = {}
        for s in st:
            sig = (
                round(s["inputBytes"] / 1e5),
                round(s["shuffleWriteBytes"] / 1e5),
                s["numCompleteTasks"],
            )
            if sig == (0, 0, 1):
                continue  # trivial probe/collect stages
            groups.setdefault(sig, []).append(s)
        dups = {
            sig: ss
            for sig, ss in groups.items()
            if len(ss) > 1 and (sig[0] > 1 or sig[1] > 1)
        }
        total_task = sum(s["executorRunTime"] for s in st) / 1e3
        if dups:
            det = "; ".join(
                f"x{len(ss)} in={sig[0]/10:.1f}MB sw={sig[1]/10:.1f}MB "
                f"tasks={sig[2]} task_s={sum(x['executorRunTime'] for x in ss) / 1e3:.1f}"
                for sig, ss in sorted(
                    dups.items(),
                    key=lambda kv: -sum(x["executorRunTime"] for x in kv[1]),
                )
            )
            print(
                f"{key}: DUP stages={len(st)} task_s={total_task:.1f} | {det}"
            )
        else:
            print(f"{key}: ok stages={len(st)} task_s={total_task:.1f}")

    spark.stop()


if __name__ == "__main__":
    main()
