#!/usr/bin/env python
"""Spot-check given contract keys against the DuckDB oracle at a
given sf dir (default sf0.01), with the same order-insensitive
value comparison discipline as the verify skill.

Usage: python tools/oracle_check.py [--sf /root/testdata/sf0.01] KEY...
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    keys: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            keys.append(argv[i])
            i += 1

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    q, o = e.queries(), e.oracle_sql()
    bad = 0
    for key in keys:
        if key not in o:
            n = q[key](spark, sf).count()
            print(f"rows-only {key} {n}")
            continue
        s = q[key](spark, sf).toPandas()
        d = con.execute(o[key]).df()
        s = s.reindex(sorted(s.columns), axis=1).sort_values(
            by=list(sorted(s.columns)), ignore_index=True,
            na_position="first",
        )
        d = d.reindex(sorted(d.columns), axis=1).sort_values(
            by=list(sorted(d.columns)), ignore_index=True,
            na_position="first",
        )
        ok = list(s.columns) == list(d.columns) and len(s) == len(d) and all(
            s[c].equals(d[c].astype(s[c].dtype))
            if str(s[c].dtype) != "object"
            else s[c].fillna("\0").tolist() == d[c].fillna("\0").tolist()
            for c in s.columns
        )
        print(("OK " if ok else "MISMATCH ") + key, len(s))
        bad += 0 if ok else 1
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
