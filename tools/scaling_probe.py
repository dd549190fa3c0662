#!/usr/bin/env python
"""Larger-SF scaling probe (VERDICT r12 #8): at sf0.1 every query is
sub-5 s and per-task scheduling overhead dominates, so the bench's
8-vs-32-core ratios sit at ~1 and say nothing about whether the
operators parallelize. This probe builds a 5x-scaled dataset DERIVED
from sf0.1 (deterministic key-offset copies — each copy's key domains
are disjoint, so the co-purchase graph becomes five disconnected
replicas, join/group cardinalities scale linearly, and every query
still computes real work) and times a parallel-heavy key subset at a
given core count.

The official /root/testdata is read-only and the probe NEVER touches
it; the derived dir lives under /tmp and is rebuilt deterministically
(pure key arithmetic, no RNG).

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py --out /tmp/p32.json
  SPARK_GRAFT_CPUS=8  python tools/scaling_probe.py --out /tmp/p8.json
  python tools/scaling_probe.py --merge /tmp/p32.json /tmp/p8.json \
      --out SCALING_r13.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SRC = "/root/testdata/sf0.1"
PROBE_DIR = "/tmp/sfprobe_x5"
COPIES = 5
KEYS = [
    "q_adamic_adar",
    "q_graph_jaccard",
    "q_kcore",
    "q_bfs_hops",
    "q_spearman",
    "q_kruskal",
    "q_assoc_rules",
    "q_item_cf",
    "q_h3_compact",
    "q_funnel",
]
# per-table key columns that must stay consistent across tables when
# offset: copy i adds i * (global max of that DOMAIN + 1)
DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "user": [("events", "user_id")],
    "event": [("events", "event_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}
DIMS = ["region", "nation"]
FACTS = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(PROBE_DIR, exist_ok=True)
    marker = os.path.join(PROBE_DIR, "_built")
    if os.path.exists(marker):
        return
    # events carries TIMESTAMP(NANOS); read as long (session conf
    # nanosAsLong is set by the bench session already)
    offsets: dict[tuple[str, str], int] = {}
    for dom, cols in DOMAINS.items():
        hi = 0
        for table, col in cols:
            df = spark.read.parquet(f"{SRC}/{table}.parquet")
            if col not in df.columns:
                continue
            v = df.agg(F.max(F.col(col).cast("long"))).collect()[0][0]
            hi = max(hi, int(v or 0))
        for table, col in cols:
            offsets[(table, col)] = hi + 1
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{PROBE_DIR}/{t}.parquet")
    for t in FACTS:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = df
            for (table, col), off in offsets.items():
                if table == t and col in c.columns:
                    c = c.withColumn(
                        col,
                        (F.col(col).cast("long") + F.lit(i * off)).cast(
                            df.schema[col].dataType
                        ),
                    )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # 32 row groups per table, mirroring the bench layout
        out.repartition(32).write.mode("overwrite").parquet(
            f"{PROBE_DIR}/{t}.parquet"
        )
    open(marker, "w").write("ok")


def run(out_path: str) -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="h3_indexer_scaling_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark.read.parquet(f"{PROBE_DIR}/lineitem.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    res: dict[str, dict] = {}
    for key in KEYS:
        fn = queries[key]

        def one() -> float:
            t0 = time.perf_counter()
            fn(spark, PROBE_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        cold = one()
        steadies = sorted(one() for _ in range(3))
        res[key] = {
            "cold": round(cold, 3),
            "steady_med": round(steadies[1], 3),
            "steady": [round(s, 3) for s in steadies],
        }
        print(f"RES {key} {res[key]}", flush=True)
    json.dump(
        {"cpus": int(cpus), "copies": COPIES, "keys": res},
        open(out_path, "w"),
        indent=1,
    )
    spark.stop()


def merge(paths: list[str], out_path: str) -> None:
    runs = [json.load(open(p)) for p in paths]
    runs.sort(key=lambda r: -r["cpus"])
    hi, lo = runs[0], runs[1]
    per = {}
    for k in hi["keys"]:
        a = hi["keys"][k]["steady_med"]
        b = lo["keys"][k]["steady_med"]
        per[k] = {
            f"steady_c{hi['cpus']}": a,
            f"steady_c{lo['cpus']}": b,
            "speedup_hi_over_lo": round(b / a, 2) if a else None,
        }
    json.dump(
        {
            "probe": f"{COPIES}x sf0.1 derived (disjoint key-offset "
            "copies), /tmp-resident, deterministic",
            "cpus_hi": hi["cpus"],
            "cpus_lo": lo["cpus"],
            "per_query": per,
        },
        open(out_path, "w"),
        indent=1,
    )
    print(json.dumps(per, indent=1))


def main() -> None:
    argv = sys.argv[1:]
    if "--merge" in argv:
        i = argv.index("--merge")
        paths = argv[i + 1 : i + 3]
        out = argv[argv.index("--out") + 1]
        merge(paths, out)
        return
    out = argv[argv.index("--out") + 1] if "--out" in argv else "/tmp/probe.json"
    run(out)


if __name__ == "__main__":
    main()
