#!/usr/bin/env python
"""Scaling evidence: run the engine's heavy operators at growing data
sizes and print rows/sec at each, to show the plans scale linearly
(i.e. no hidden O(n^2) stage, no driver collect, no broadcast of a
growing side).

Usage:  python examples/scale_check.py [max_factor]

Data is synthesized deterministically from the sf0.1 testdata tables by
unioning shifted copies — same row width, same value distributions, so
throughput comparisons across factors are apples-to-apples.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = "/root/testdata/sf0.1"


def scaled(df, id_col: str, factor: int, text_col: str | None = None):
    """factor shifted copies of df with disjoint ids. When ``text_col``
    is given, each copy's vocabulary is made disjoint (every token
    prefixed with the copy index) so near-dup pair counts stay linear
    in the factor instead of exploding quadratically on identical
    copies."""
    from pyspark.sql import functions as F

    out = None
    n = df.count()
    for i in range(factor):
        c = df.withColumn(id_col, F.col(id_col) + F.lit(i * 10 * n))
        if text_col is not None and i > 0:
            c = c.withColumn(
                text_col,
                F.regexp_replace(F.col(text_col), r"(\S+)", f"c{i}$1"),
            )
        out = c if out is None else out.unionByName(c)
    return out


def timed(label: str, df, rows: int) -> None:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(
        f"{label:42s} rows={rows:>10,} wall={dt:7.2f}s "
        f"throughput={rows / dt:>12,.0f} rows/s",
        flush=True,
    )


def main() -> None:
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from pyspark.sql import functions as F

    from h3_indexer_spark.config.vector import AllocationMethod, GeometryType
    from h3_indexer_spark.functions.udfs import make_index_map_fn
    from h3_indexer_spark.operators.dedup import (
        minhash_near_dups,
        simhash_near_dups,
    )
    from h3_indexer_spark.operators.textops import fingerprint, language_id
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    factors = [f for f in (1, 5, 20, 50) if f <= max_factor]

    for factor in factors:
        d = scaled(docs, "doc_id", factor, text_col="text").repartition(64).cache()
        rows = d.count()
        timed(f"fingerprint x{factor}", fingerprint(d), rows)
        timed(f"lang_id x{factor}", language_id(d), rows)
        timed(f"simhash_near_dups x{factor}", simhash_near_dups(d), rows)
        timed(f"minhash_near_dups x{factor}", minhash_near_dups(d), rows)
        d.unpersist()

    # feature engineering over events: rolling window (one window
    # shuffle, frame-bounded state) and EWMA (applyInPandas recurrence
    # kernel). Copies shift BOTH ids so user count grows with the
    # factor and per-key history stays constant — the linear-scaling
    # regime a 100 TB event log actually presents (more keys, not
    # unboundedly deeper histories).
    from h3_indexer_spark.operators.features import (
        ewma_features,
        rolling_features,
    )
    from h3_indexer_spark.queries import _load_events

    ev = _load_events(spark, SF_DIR).select(
        "event_id", "user_id",
        F.expr("ts div 1000").alias("ts_us"), "value",
    )
    n_ev = ev.count()
    for factor in factors:
        e = None
        for i in range(factor):
            c = ev.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10 * n_ev)
            ).withColumn("user_id", F.col("user_id") + F.lit(i * 100_000))
            e = c if e is None else e.unionByName(c)
        e = e.repartition(64).cache()
        rows = e.count()
        timed(
            f"rolling_features x{factor}",
            rolling_features(e, "user_id", ["ts_us", "event_id"], "value"),
            rows,
        )
        timed(
            f"ewma_features x{factor}",
            ewma_features(e, "user_id", ["ts_us", "event_id"], "value"),
            rows,
        )
        e.unpersist()

    # behavioral analytics over the same grown event log: the funnel's
    # S-1 join rounds and gap-fill's grid explode must stay linear in
    # key count (same more-keys-not-deeper-histories regime as above)
    from h3_indexer_spark.operators.analytics import (
        funnel,
        gap_fill_daily,
    )

    ev_f = _load_events(spark, SF_DIR).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    for factor in factors:
        e = None
        for i in range(factor):
            c = ev_f.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 100_000)
            )
            e = c if e is None else e.unionByName(c)
        e = e.repartition(64).cache()
        rows = e.count()
        timed(
            f"funnel x{factor}",
            funnel(e, ["view", "click", "purchase"]),
            rows,
        )
        timed(f"gap_fill_daily x{factor}", gap_fill_daily(e), rows)
        e.unpersist()

    # round-5 operators: boilerplate census/removal over the grown
    # corpus (distinct-pair shuffle keyed on the line; removal is a
    # narrow map behind a bounded vocabulary broadcast), CDC diff
    # between two grown snapshots (ONE full-outer join), and
    # entropy/autocorr over the grown event log (key-linear regime)
    from h3_indexer_spark.operators.analytics import (
        event_type_entropy,
        lag1_autocorr,
    )
    from h3_indexer_spark.operators.curation import remove_boilerplate
    from h3_indexer_spark.operators.relational import snapshot_diff

    for factor in factors:
        d = scaled(docs, "doc_id", factor, text_col="text").repartition(
            64
        ).cache()
        rows = d.count()
        timed(
            f"remove_boilerplate x{factor}",
            remove_boilerplate(d, min_docs=2, min_chars=10, delimiter=". "),
            rows,
        )
        old_snap = d.where(F.col("doc_id") % 7 != 0)
        new_snap = d.where(F.col("doc_id") % 5 != 0)
        timed(
            f"snapshot_diff x{factor}",
            snapshot_diff(old_snap, new_snap, ["doc_id"], ["text"]),
            rows,
        )
        d.unpersist()

    for factor in factors:
        e = None
        for i in range(factor):
            c = ev_f.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 100_000)
            ).withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10_000_000)
            )
            e = c if e is None else e.unionByName(c)
        e = e.repartition(64).cache()
        rows = e.count()
        timed(f"event_type_entropy x{factor}", event_type_entropy(e), rows)
        timed(f"lag1_autocorr x{factor}", lag1_autocorr(e), rows)
        e.unpersist()

    # geo: points at growing n (the index-stage kernel)
    for n_pts in [100_000, 1_000_000, 5_000_000]:
        if n_pts > 100_000 * max_factor:
            break
        pts = spark.range(n_pts).select(
            F.col("id").alias("uid"),
            F.format_string(
                "POINT (%s %s)",
                F.rand(seed=4) * 50 - 120,
                F.rand(seed=3) * 23 + 25,
            ).alias("geom_wkt"),
        ).repartition(64).cache()
        pts.count()
        fn = make_index_map_fn(
            "uid", GeometryType.POINT, AllocationMethod.WITHIN, 7, "total_count"
        )
        schema = (
            "uid bigint, h3_index string, ratio double, total_count double, "
            "h3_area_km2 double"
        )
        timed(
            f"geo_index_points n={n_pts}",
            pts.mapInPandas(fn, schema=schema),
            n_pts,
        )
        pts.unpersist()

    # polygons (PCT_AREA res 6): the heaviest kernel — clip + area per
    # covered cell
    for n_polys in [3_000, 30_000, 100_000]:
        if n_polys > 3_000 * max_factor:
            break
        x0 = F.rand(seed=21) * 50 - 120
        y0 = F.rand(seed=22) * 23 + 25
        w = F.rand(seed=23) * 0.15 + 0.05
        h = F.rand(seed=24) * 0.15 + 0.05
        polys = spark.range(n_polys).select(
            F.col("id").alias("uid"),
            F.format_string(
                "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
                x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h, x0, y0,
            ).alias("geom_wkt"),
        ).repartition(64).cache()
        polys.count()
        fn = make_index_map_fn(
            "uid", GeometryType.POLYGON, AllocationMethod.PCT_AREA, 6,
            "total_area_km2",
        )
        schema = (
            "uid bigint, h3_index string, ratio double, "
            "total_area_km2 double, h3_area_km2 double"
        )
        timed(
            f"geo_index_polygons n={n_polys}",
            polys.mapInPandas(fn, schema=schema),
            n_polys,
        )
        polys.unpersist()


def semantic_dedup_scale(spark) -> None:
    """Reproduces the SCALE.md §3 semantic-dedup table: expression
    (oracle-baseline) vs per-cluster GEMM path on synthetic 64-dim
    Gaussian embeddings, k = n/100 clusters."""
    import time

    import numpy as np
    import pandas as pd

    from h3_indexer_spark.operators.dedup import (
        semantic_dedup_pairs,
        semantic_dedup_pairs_fast,
    )
    from h3_indexer_spark.operators.similarity import sampled_centroids

    for n in (5_000, 20_000):
        rng = np.random.default_rng(7)
        m = rng.standard_normal((n, 64))
        pdf = pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [r.tolist() for r in m]}
        )
        df = (
            spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
            .repartition(32)
            .cache()
        )
        df.count()
        cents = sampled_centroids(df, n_cells=max(16, n // 100))
        t0 = time.perf_counter()
        c1 = semantic_dedup_pairs(df, cents, threshold=0.5).count()
        t1 = time.perf_counter()
        c2 = semantic_dedup_pairs_fast(df, cents, threshold=0.5).count()
        t2 = time.perf_counter()
        assert c1 == c2
        print(
            f"semantic_dedup n={n}: expr {t1 - t0:.1f}s | "
            f"gemm {t2 - t1:.1f}s | {c1} pairs"
        )
        df.unpersist()


def round6_scale(max_factor: int = 50) -> None:
    """Round-6 curves: the config-driven analytics pipeline end-to-end
    (verdict r5 item #6 — the one round-5 addition without a SCALE.md
    row), row-level merge_by_key, and PQ encode+ADC search. Run alone:
    ``python examples/scale_check.py <max_factor> round6``."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from h3_indexer_spark.operators.relational import merge_by_key
    from h3_indexer_spark.plans.analytics_pipeline import run_analytics
    from h3_indexer_spark.queries import _load_events
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r6", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    factors = [f for f in (1, 5, 20, 50) if f <= max_factor]

    # analytics pipeline (prepare filter + funnel report) over events
    # grown by disjoint user-id copies (more keys, constant history)
    ev = _load_events(spark, SF_DIR).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    cfg = {
        "prepare": [
            {"stage": "filter", "predicate": "value IS NOT NULL"},
        ],
        "reports": [
            {
                "report": "funnel",
                "name": "f",
                "stages": ["view", "click", "purchase"],
            },
        ],
    }
    for factor in factors:
        e = None
        for i in range(factor):
            c = ev.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 100_000)
            )
            e = c if e is None else e.unionByName(c)
        e = e.repartition(64).cache()
        rows = e.count()
        timed(
            f"analytics_pipeline x{factor}",
            run_analytics(spark, e, cfg)["f"],
            rows,
        )
        e.unpersist()

    # merge_by_key: target = grown orders snapshot, source = 30% of
    # keys updated + 10% inserted + 10% delete-flagged
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    n_ord = orders.count()
    for factor in factors:
        t = None
        for i in range(factor):
            c = orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * 10 * n_ord)
            )
            t = c if t is None else t.unionByName(c)
        t = t.repartition(64).cache()
        rows = t.count()
        upd = t.where(F.col("o_orderkey") % 10 < 3).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
        ).withColumn("deleted", F.lit(False))
        ins = t.where(F.col("o_orderkey") % 10 == 3).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000)
        ).withColumn("deleted", F.lit(False))
        dels = t.where(F.col("o_orderkey") % 10 == 4).withColumn(
            "deleted", F.lit(True)
        )
        src = upd.unionByName(ins).unionByName(dels)
        timed(
            f"merge_by_key x{factor}",
            merge_by_key(t, src, ["o_orderkey"], delete_col="deleted"),
            rows,
        )
        t.unpersist()

    # PQ: encode throughput and ADC search over grown embeddings
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb.count()
    books = pq_train(emb, m=16, nbits=6, sample=500)
    q_rows = emb.orderBy("vec_id").limit(1).collect()
    query = list(q_rows[0]["embedding"])
    for factor in factors:
        e = None
        for i in range(factor):
            c = emb.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10 * n_emb)
            )
            e = c if e is None else e.unionByName(c)
        e = e.repartition(64).cache()
        rows = e.count()
        timed(f"pq_encode x{factor}", pq_encode(e, books), rows)
        enc = pq_encode(e, books).cache()
        enc.count()
        timed(
            f"pq_adc_topk x{factor}",
            pq_adc_topk(enc, query, books, k=10),
            rows,
        )
        enc.unpersist()
        e.unpersist()


    # spatial joins: radius self-join and point-in-polygon at growing
    # point counts (candidate volume tracks local density; the PIP
    # polygon side is fixed at a 25-rect grid)
    from h3_indexer_spark.operators.geo_join import (
        h3_self_radius_join,
        point_in_polygon_join,
    )

    for n_pts in (20_000, 100_000, 500_000):
        pts = (
            spark.range(n_pts)
            .select(
                F.col("id"),
                (F.lit(40.0) + (F.col("id") * 2654435761 % 100000)
                 .cast("double") / F.lit(40000.0)).alias("lat"),
                (F.lit(-100.0) + (F.col("id") * 40503 % 100000)
                 .cast("double") / F.lit(40000.0)).alias("lng"),
            )
            .repartition(64)
            .cache()
        )
        pts.count()
        timed(
            f"h3_radius_join n={n_pts}",
            h3_self_radius_join(pts, 2.0),
            n_pts,
        )
        rects = spark.range(25).select(
            F.col("id").alias("poly_id"),
            F.concat(
                F.lit("POLYGON (("),
                (F.lit(-100.0) + (F.col("id") % 5).cast("double") * 0.5).cast("string"), F.lit(" "),
                (F.lit(40.0) + F.floor(F.col("id") / 5).cast("double") * 0.5).cast("string"), F.lit(", "),
                (F.lit(-99.55) + (F.col("id") % 5).cast("double") * 0.5).cast("string"), F.lit(" "),
                (F.lit(40.0) + F.floor(F.col("id") / 5).cast("double") * 0.5).cast("string"), F.lit(", "),
                (F.lit(-99.55) + (F.col("id") % 5).cast("double") * 0.5).cast("string"), F.lit(" "),
                (F.lit(40.45) + F.floor(F.col("id") / 5).cast("double") * 0.5).cast("string"), F.lit(", "),
                (F.lit(-100.0) + (F.col("id") % 5).cast("double") * 0.5).cast("string"), F.lit(" "),
                (F.lit(40.45) + F.floor(F.col("id") / 5).cast("double") * 0.5).cast("string"), F.lit(", "),
                (F.lit(-100.0) + (F.col("id") % 5).cast("double") * 0.5).cast("string"), F.lit(" "),
                (F.lit(40.0) + F.floor(F.col("id") / 5).cast("double") * 0.5).cast("string"),
                F.lit("))"),
            ).alias("geom_wkt"),
        )
        timed(
            f"point_in_polygon n={n_pts}",
            point_in_polygon_join(pts, rects, res=6),
            n_pts,
        )
        pts.unpersist()

    # feature/analytics additions over grown lineitem/events
    from h3_indexer_spark.operators.analytics import changepoint_cusum
    from h3_indexer_spark.operators.features import (
        target_encode,
        winsorize,
    )
    from h3_indexer_spark.operators.relational import weighted_median

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice",
    )
    n_li = li.count()
    for factor in factors:
        t = None
        for i in range(factor):
            c = li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 10 * n_li)
            )
            t = c if t is None else t.unionByName(c)
        t = t.repartition(64).cache()
        rows = t.count()
        timed(
            f"target_encode x{factor}",
            target_encode(t, "l_returnflag", "l_extendedprice"),
            rows,
        )
        timed(
            f"winsorize x{factor}",
            winsorize(
                t, "l_extendedprice", group_col="l_returnflag"
            ),
            rows,
        )
        timed(
            f"weighted_median x{factor}",
            weighted_median(
                t, "l_extendedprice", "l_quantity", ["l_returnflag"]
            ),
            rows,
        )
        t.unpersist()

    ev_cp = _load_events(spark, SF_DIR).select(
        "event_id", "user_id", "ts", "value"
    )
    for factor in factors:
        e = None
        for i in range(factor):
            c = ev_cp.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 100_000)
            ).withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10_000_000)
            )
            e = c if e is None else e.unionByName(c)
        e = e.repartition(64).cache()
        rows = e.count()
        timed(
            f"changepoint_cusum x{factor}",
            changepoint_cusum(e, "user_id", ["ts", "event_id"]),
            rows,
        )
        e.unpersist()



def round7_scale(max_factor: int = 50) -> None:
    """Round-7 curves. Two parts:

    (a) point_in_polygon_join against HARD polygons — 25 two-part
    MULTIPOLYGONs whose outer rings are 500-vertex wavy stars, each
    part carrying a 100-vertex hole (the round-6 curve used plain
    rectangles; VERDICT r6 asked for the many-vertex-with-holes
    case). With the round-7 slim shuffle the per-cover-cell exchange
    is 16 bytes regardless of the ~14 KB WKT.

    (b) throughput curves for the round-7 operator family
    (association rules, gini, skyline, HLL registers, survival,
    BM25, BPE census) over disjoint-copy-scaled inputs.

    Run: ``python examples/scale_check.py <max_factor> round7``."""
    import math

    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import (
        gini_coefficient,
        survival_risk_table,
    )
    from h3_indexer_spark.operators.geo_join import point_in_polygon_join
    from h3_indexer_spark.operators.mining import (
        association_rules,
        skyline_2d,
    )
    from h3_indexer_spark.operators.sketches import hll_registers
    from h3_indexer_spark.operators.textops import (
        bm25_scores,
        bpe_pair_counts,
    )
    from h3_indexer_spark.queries import _load_events
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r7", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- (a) PIP with many-vertex multipolygons-with-holes
    def ring(cx, cy, r0, n, wave=0.0, reverse=False):
        pts = []
        for i in range(n):
            th = 2 * math.pi * i / n
            r = r0 * (1.0 + wave * math.sin(12 * th))
            pts.append((cx + r * math.cos(th), cy + r * math.sin(th)))
        pts.append(pts[0])
        if reverse:
            pts = pts[::-1]
        return "(" + ", ".join(f"{x!r} {y!r}" for x, y in pts) + ")"

    polys = []
    for pid in range(25):
        cx = -100.0 + (pid % 5) * 0.5 + 0.22
        cy = 40.0 + (pid // 5) * 0.5 + 0.22
        parts = []
        for dx in (0.0, 0.26):
            outer = ring(cx + dx, cy, 0.11, 500, wave=0.3)
            hole = ring(cx + dx, cy, 0.03, 100, reverse=True)
            parts.append(f"({outer}, {hole})")
        polys.append((pid, "MULTIPOLYGON (" + ", ".join(parts) + ")"))
    poly_df = spark.createDataFrame(polys, "poly_id long, geom_wkt string")
    print(f"polygon WKT bytes each: ~{len(polys[0][1])}")

    for n_pts in (20_000, 100_000, 500_000):
        pts = (
            spark.range(n_pts)
            .select(
                F.col("id"),
                (F.lit(40.0) + (F.col("id") * 2654435761 % 100000)
                 .cast("double") / F.lit(40000.0)).alias("lat"),
                (F.lit(-100.0) + (F.col("id") * 40503 % 100000)
                 .cast("double") / F.lit(40000.0)).alias("lng"),
            )
            .repartition(64)
            .cache()
        )
        pts.count()
        timed(
            f"point_in_polygon HARD n={n_pts}",
            point_in_polygon_join(pts, poly_df, res=6),
            n_pts,
        )
        pts.unpersist()

    # ---- (b) round-7 operator curves
    factors = [f for f in (1, 5, 20, 50) if f <= max_factor]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_DIR}/part.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = _load_events(spark, SF_DIR)

    for factor in factors:
        o = scaled(orders, "o_orderkey", factor)
        o = o.repartition(64).cache()
        rows = o.count()
        timed(f"gini x{factor}", gini_coefficient(o, "o_totalprice"), rows)
        timed(f"hll_registers x{factor}",
              hll_registers(o, "o_custkey", p=8), rows)
        o.unpersist()

        p = scaled(pt, "p_partkey", factor).repartition(64).cache()
        rows = p.count()
        timed(f"skyline x{factor}",
              skyline_2d(p, "p_retailprice", "p_size"), rows)
        p.unpersist()

        l2 = scaled(li, "l_orderkey", factor)
        baskets = l2.join(F.broadcast(pt),
                          l2["l_partkey"] == pt["p_partkey"]).select(
            "l_orderkey", "p_brand"
        ).repartition(64).cache()
        rows = baskets.count()
        timed(f"assoc_rules x{factor}",
              association_rules(baskets, "l_orderkey", "p_brand"), rows)
        baskets.unpersist()

        e2 = scaled(ev, "user_id", factor).repartition(64).cache()
        rows = e2.count()
        timed(f"survival x{factor}", survival_risk_table(e2), rows)
        e2.unpersist()

        d2 = scaled(docs, "doc_id", factor, text_col=None)
        d2 = d2.repartition(64).cache()
        rows = d2.count()
        timed(f"bm25 x{factor}",
              bm25_scores(d2, ["join", "query", "spark", "stream"],
                          "text", "doc_id"), rows)
        timed(f"bpe_pairs x{factor}", bpe_pair_counts(d2, "text"), rows)
        d2.unpersist()


def round7b_scale(max_factor: int = 50) -> None:
    """Round-7 continuation curves: collocations, calibration,
    Benford, BFS hops, and the hybrid RRF retrieval pipeline, over
    disjoint-copy-scaled inputs.

    Run: ``python examples/scale_check.py <max_factor> round7b``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import (
        benford_profile,
        calibration_bins,
    )
    from h3_indexer_spark.operators.graph import bfs_hops
    from h3_indexer_spark.operators.retrieval import rrf_fuse
    from h3_indexer_spark.operators.textops import bm25_scores, collocations
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r7b", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    for factor in (1, 5, 20, max_factor):
        d = scaled(docs, "doc_id", factor).localCheckpoint()
        n = d.count()
        timed(f"collocations x{factor}", collocations(d, "text", 5, 30), n)

        o = scaled(orders, "o_orderkey", factor).localCheckpoint()
        no = o.count()
        timed(f"benford x{factor}", benford_profile(o, "o_totalprice"), no)

        s = scaled(li.withColumn("_id", F.monotonically_increasing_id()),
                   "_id", factor).select(
            (F.col("l_discount") * F.lit(10.0)).alias("score"),
            (F.col("l_returnflag") == F.lit("R")).cast("int").alias("y"),
        ).localCheckpoint()
        ns = s.count()
        timed(f"calibration x{factor}",
              calibration_bins(s, "score", "y", 10), ns)

        # hybrid RRF: BM25 pool + cosine pool, fused; rows = docs scanned
        sparse = bm25_scores(d, ["join", "query", "spark", "stream"],
                             "text", "doc_id", k=50)
        from pyspark.sql import Window as W
        sr = sparse.select("doc_id", F.row_number().over(
            W.orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        ).alias("rank"))
        e = scaled(emb, "vec_id", factor).localCheckpoint()
        ne = e.count()
        q = [((i * 37) % 128 - 64) / 64.0 for i in range(
            len(e.select("embedding").first()[0]))]
        dot = " + ".join(
            f"CAST(embedding[{i}] AS DOUBLE) * ({v!r})"
            for i, v in enumerate(q))
        nrm = " + ".join(
            f"CAST(embedding[{i}] AS DOUBLE) * CAST(embedding[{i}] AS DOUBLE)"
            for i in range(len(q)))
        import math
        qn = math.sqrt(sum(v * v for v in q))
        dr = e.select(F.col("vec_id").alias("doc_id"), F.expr(
            f"({dot}) / (sqrt({nrm}) * ({qn!r}))").alias("sim")
        ).orderBy(F.col("sim").desc(), F.col("doc_id").asc()).limit(50
        ).select("doc_id", F.row_number().over(
            W.orderBy(F.col("sim").desc(), F.col("doc_id").asc())
        ).alias("rank"))
        timed(f"rrf_hybrid x{factor}",
              rrf_fuse({"dense": dr, "sparse": sr}, "doc_id", topk=20),
              n + ne)

        # BFS over the co-purchase graph: copies must shift BOTH keys
        # (orderkey-only copies collapse under the pair distinct), and
        # each copy carries its own seed set so the frontier scales.
        base = li.select("l_orderkey", "l_partkey").distinct()
        shift_o = base.agg(F.max("l_orderkey")).first()[0] + 1
        shift_p = base.agg(F.max("l_partkey")).first()[0] + 10
        lis = None
        for i in range(factor):
            c = base.select(
                (F.col("l_orderkey") + F.lit(i * shift_o)).alias("o"),
                (F.col("l_partkey") + F.lit(i * shift_p)).alias("p"),
            )
            lis = c if lis is None else lis.unionByName(c)
        lis = lis.localCheckpoint()
        a = lis.select(F.col("o").alias("_b"), F.col("p").alias("src"))
        b = lis.select(F.col("o").alias("_b"), F.col("p").alias("dst"))
        edges = (a.join(b, "_b").where(F.col("src") < F.col("dst"))
                 .select("src", "dst").distinct().localCheckpoint())
        nedge = edges.count()
        srcs = lis.select(F.col("p").alias("node")).where(
            (F.col("node") % F.lit(shift_p)) <= 20).distinct()
        # bfs_hops materializes eagerly (per-round localCheckpoint),
        # so the construction IS the work — time it directly.
        t0 = time.perf_counter()
        res = bfs_hops(edges, srcs, max_hops=3)
        res.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"bfs_hops(3) x{factor} (edges)                 "
              f"rows={nedge:>10,} wall={dt:7.2f}s "
              f"throughput={nedge / dt:>12,.0f} rows/s", flush=True)
    spark.stop()


def round8_scale(max_factor: int = 50) -> None:
    """Round-8 curves: containment pairs, BPE document encoding,
    rolling HLL actives, degree histogram, Fleiss' kappa — over
    disjoint-copy-scaled inputs (text copies get disjoint
    vocabularies so inverted-index pair counts stay linear; event
    copies get disjoint user universes so the sketch sees real
    cardinality growth).

    Run: ``python examples/scale_check.py <max_factor> round8``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.dedup import containment_pairs
    from h3_indexer_spark.operators.graph import degree_distribution
    from h3_indexer_spark.operators.labeling import fleiss_kappa
    from h3_indexer_spark.operators.sketches import (
        rolling_active_users_hll,
    )
    from h3_indexer_spark.operators.textops import bpe_encode_docs
    from h3_indexer_spark.queries import _BPE_MERGES
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r8", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    ev_raw = spark.read.parquet(f"{sf}/events.parquet")
    ev = ev_raw.select(
        "user_id", "event_type",
        F.unix_timestamp("ts").cast("long").alias("_s"),
    ).select(
        "user_id", "event_type", (F.col("_s") * F.lit(10**9)).alias("ts")
    )

    for factor in (1, 5, 20, max_factor):
        d = scaled(docs, "doc_id", factor, text_col="text").localCheckpoint()
        n = d.count()
        timed(
            f"containment_pairs x{factor}",
            containment_pairs(d, threshold=0.5, max_df=100),
            n,
        )
        timed(
            f"bpe_encode_docs x{factor}",
            bpe_encode_docs(d, _BPE_MERGES),
            n,
        )

        e = scaled(ev.withColumn("_id", F.col("user_id")), "_id", factor)
        e = e.select(
            F.col("_id").alias("user_id"), "event_type", "ts"
        ).localCheckpoint()
        ne = e.count()
        timed(
            f"rolling_hll_actives x{factor}",
            rolling_active_users_hll(e),
            ne,
        )
        timed(
            f"fleiss_kappa x{factor}",
            fleiss_kappa(e, "user_id", "event_type"),
            ne,
        )

        l2 = scaled(
            li.select("l_orderkey", "l_partkey").withColumn(
                "_id", F.col("l_orderkey")
            ),
            "_id",
            factor,
        ).select(F.col("_id").alias("l_orderkey"), "l_partkey")
        items = l2.distinct().localCheckpoint()
        a = items.select(
            F.col("l_orderkey").alias("_b"), F.col("l_partkey").alias("src")
        )
        b = items.select(
            F.col("l_orderkey").alias("_b"), F.col("l_partkey").alias("dst")
        )
        edges = (
            a.join(b, "_b")
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
        nl = items.count()
        timed(
            f"degree_distribution x{factor}",
            degree_distribution(edges),
            nl,
        )





def round8b_scale(max_factor: int = 50) -> None:
    """Round-8 continuation curves: CMS frequency estimation, KMV
    distinct, Adamic-Adar link prediction, Mann-Whitney U, SCD2
    build, one-pass corr matrix, int8 quantization.

    Run: ``python examples/scale_check.py <max_factor> round8b``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import mann_whitney_u
    from h3_indexer_spark.operators.features import (
        embedding_quantize_int8,
    )
    from h3_indexer_spark.operators.graph import adamic_adar
    from h3_indexer_spark.operators.relational import (
        corr_matrix,
        scd2_build,
    )
    from h3_indexer_spark.operators.sketches import (
        count_min_estimate,
        count_min_registers,
        kmv_distinct,
    )
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r8b", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    ev_raw = spark.read.parquet(f"{sf}/events.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    ev = ev_raw.select(
        "user_id", "event_type",
        (F.unix_timestamp("ts").cast("long") * F.lit(10**9)).alias("ts"),
        F.col("event_id"),
    )

    for factor in (1, 5, 20, max_factor):
        # events: disjoint user universes per copy
        e = scaled(
            ev.withColumn("_id", F.col("user_id")), "_id", factor
        ).select(
            F.col("_id").alias("user_id"), "event_type", "ts", "event_id"
        ).localCheckpoint()
        ne = e.count()
        regs = count_min_registers(e, "event_type", depth=4, width=64)
        timed(
            f"cms_estimate x{factor}",
            count_min_estimate(
                regs, e.select("event_type").distinct(), "event_type",
                depth=4, width=64,
            ),
            ne,
        )
        timed(f"kmv_distinct x{factor}", kmv_distinct(e, "user_id"), ne)
        timed(
            f"scd2_build x{factor}",
            scd2_build(e, "user_id", ["event_type"], "ts"),
            ne,
        )

        l = scaled(
            li.withColumn("_id", F.col("l_orderkey")), "_id", factor
        ).localCheckpoint()
        nl = l.count()
        timed(
            f"mann_whitney x{factor}",
            mann_whitney_u(l, "l_returnflag", "l_extendedprice",
                           "R", "A"),
            nl,
        )
        timed(
            f"corr_matrix x{factor}",
            corr_matrix(
                l,
                ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            ),
            nl,
        )

        items = (
            l.where(F.expr("_id % 4 = 0"))
            .select(F.col("_id").alias("l_orderkey"), "l_partkey")
            .distinct()
            .localCheckpoint()
        )
        a = items.select(
            F.col("l_orderkey").alias("_b"), F.col("l_partkey").alias("src")
        )
        b = items.select(
            F.col("l_orderkey").alias("_b"), F.col("l_partkey").alias("dst")
        )
        edges = (
            a.join(b, "_b")
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
        ni = items.count()
        timed(
            f"adamic_adar x{factor}",
            adamic_adar(edges, min_common=2),
            ni,
        )

        em = scaled(
            emb.withColumn("_id", F.col("vec_id")), "_id", factor
        ).select(F.col("_id").alias("vec_id"), "embedding")
        nv = em.count()
        timed(
            f"embed_quantize_int8 x{factor}",
            embedding_quantize_int8(em),
            nv,
        )




def round9_scale(max_factor: int = 50) -> None:
    """Round-9 curves: sequential pattern mining, bottom-k quantile
    sketch, and DBSCAN end-to-end (spatially-contracted components).

    Run: ``python examples/scale_check.py <max_factor> round9``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.clustering import dbscan
    from h3_indexer_spark.operators.mining import sequential_patterns
    from h3_indexer_spark.operators.sketches import quantile_sketch
    from h3_indexer_spark.operators.textops import (
        edit_distance_join,
        rake_keywords,
    )
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r9", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    ev_raw = spark.read.parquet(f"{sf}/events.parquet")
    ev = ev_raw.select(
        "user_id", "event_type",
        (F.unix_timestamp("ts").cast("long") * F.lit(10**9)).alias("ts"),
        F.col("event_id"),
    )
    cust = spark.read.parquet(f"{sf}/customer.parquet")

    for factor in (1, 5, 20, max_factor):
        # seq patterns: disjoint user universes per copy (pattern
        # supports grow linearly; the candidate fan-out is per-event)
        e = scaled(
            ev.withColumn("_id", F.col("user_id")), "_id", factor
        ).select(
            F.col("_id").alias("user_id"), "event_type", "ts", "event_id"
        ).localCheckpoint()
        ne = e.count()
        timed(
            f"seq_patterns x{factor}",
            sequential_patterns(e),
            ne,
        )

        l = scaled(
            li.withColumn("_id", F.col("l_orderkey")), "_id", factor
        ).localCheckpoint()
        nl = l.count()
        timed(
            f"quantile_sketch x{factor}",
            quantile_sketch(
                l,
                "l_extendedprice",
                F.concat_ws(
                    "|",
                    F.col("_id").cast("string"),
                    F.col("l_linenumber").cast("string"),
                ),
                k=256,
            ),
            nl,
        )

        # dbscan: each copy gets its own 3-degree-shifted longitude
        # band, so cluster structure is copy-local and total work is
        # linear in copies (the honest scale axis: more REGIONS, not
        # more density — density growth percolates by geometry,
        # q_dbscan docstring)
        pts = None
        for i in range(factor):
            c = cust.where(F.col("c_custkey") <= 2000).select(
                (F.col("c_custkey") + F.lit(i * 100_000)).alias("id"),
                (
                    F.lit(40.0)
                    + ((F.col("c_custkey") * F.lit(2654435761))
                       % F.lit(100000)).cast("double") / F.lit(50000.0)
                ).alias("lat"),
                (
                    F.lit(-100.0) + F.lit(3.0 * i)
                    + ((F.col("c_custkey") * F.lit(40503))
                       % F.lit(100000)).cast("double") / F.lit(50000.0)
                ).alias("lng"),
            )
            pts = c if pts is None else pts.unionByName(c)
        docs = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "text"
        )
        d = scaled(docs, "doc_id", factor, text_col="text").localCheckpoint()
        nd = d.count()
        timed(f"rake_keywords x{factor}", rake_keywords(d), nd)

        sup = spark.read.parquet(f"{sf}/supplier.parquet")
        # copy prefixes are doubled ("q3q3q") so CROSS-copy name pairs
        # sit at edit distance >= 2 — the output and block sizes stay
        # linear in the factor (a single-char prefix would make every
        # cross-copy base-name pair an ed-1 match: quadratic truth)
        s_scaled = None
        nsup = sup.count()
        for i in range(factor):
            c = sup.select(
                (F.col("s_suppkey") + F.lit(i * 10 * nsup)).alias(
                    "s_suppkey"
                ),
                F.concat(
                    F.lit(f"q{i}q{i}q" if i else ""), F.col("s_name")
                ).alias("s_name"),
            )
            s_scaled = c if s_scaled is None else s_scaled.unionByName(c)
        s_scaled = s_scaled.localCheckpoint()
        ns = s_scaled.count()
        timed(
            f"edit_distance_join x{factor}",
            edit_distance_join(s_scaled, "s_suppkey", "s_name"),
            ns,
        )

        pts = pts.localCheckpoint()
        np_ = pts.count()
        # dbscan's components loop runs jobs at CONSTRUCTION (the
        # convergence probes), so time construction + materialization
        # together — timed(dbscan(...)) would start the clock after
        # most of the work already ran
        t0 = time.perf_counter()
        dbscan(pts, 5.0, 4).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        print(
            f"{'dbscan x' + str(factor):42s} rows={np_:>10,} "
            f"wall={dt:7.2f}s throughput={np_ / dt:>12,.0f} rows/s",
            flush=True,
        )


def round9b_scale(max_factor: int = 50) -> None:
    """Round-9 continuation curves: one-way ANOVA, Poisson bootstrap
    CI, Jaccard link prediction, fightin'-words log-odds, reciprocal
    best match.

    Run: ``python examples/scale_check.py <max_factor> round9b``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import (
        bootstrap_mean_ci,
        one_way_anova,
    )
    from h3_indexer_spark.operators.graph import jaccard_link_prediction
    from h3_indexer_spark.operators.textops import (
        log_odds_terms,
        reciprocal_best_match,
    )
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r9b", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sup = spark.read.parquet(f"{sf}/supplier.parquet")

    for factor in (1, 5, 20, max_factor):
        l = scaled(
            li.withColumn("_id", F.col("l_orderkey")), "_id", factor
        ).localCheckpoint()
        nl = l.count()
        timed(
            f"one_way_anova x{factor}",
            one_way_anova(l, "l_returnflag", "l_extendedprice"),
            nl,
        )

        o = scaled(orders, "o_orderkey", factor).localCheckpoint()
        no = o.count()
        timed(
            f"bootstrap_ci(B=100) x{factor}",
            bootstrap_mean_ci(o, "o_orderkey", "o_totalprice", b=100),
            no,
        )

        # log-odds: vocabulary held CONSTANT across factors (text
        # copies unprefixed) — token volume grows linearly while the
        # vocab shuffle stays Zipf-bounded, the 100 TB regime
        d = scaled(docs, "doc_id", factor).localCheckpoint()
        nd = d.count()
        timed(
            f"log_odds_terms x{factor}",
            log_odds_terms(d, "lang", "en", min_count=50),
            nd,
        )

        # mutual best: doubled copy prefixes keep cross-copy pairs at
        # distance >= 2 (the edit_distance_join fixture rule), so
        # block sizes and output stay linear in the factor
        nsup = sup.count()
        s_scaled = None
        for i in range(factor):
            c = sup.select(
                (F.col("s_suppkey") + F.lit(i * 10 * nsup)).alias(
                    "s_suppkey"
                ),
                F.concat(
                    F.lit(f"q{i}q{i}q" if i else ""), F.col("s_name")
                ).alias("s_name"),
            )
            s_scaled = c if s_scaled is None else s_scaled.unionByName(c)
        s_scaled = s_scaled.localCheckpoint()
        ns = s_scaled.count()
        timed(
            f"reciprocal_best_match x{factor}",
            reciprocal_best_match(
                s_scaled, "s_suppkey", "s_name", max_dist=2, prefix_len=12
            ),
            ns,
        )

        # jaccard link prediction over the sampled co-purchase graph
        # (the adamic_adar fixture: copies shift the order key so pair
        # volume is copy-local)
        items = (
            l.where(F.expr("_id % 4 = 0"))
            .select(F.col("_id").alias("l_orderkey"), "l_partkey")
            .distinct()
            .localCheckpoint()
        )
        a = items.select(
            F.col("l_orderkey").alias("_b"), F.col("l_partkey").alias("src")
        )
        b = items.select(
            F.col("l_orderkey").alias("_b"), F.col("l_partkey").alias("dst")
        )
        edges = (
            a.join(b, "_b")
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
        ni = items.count()
        timed(
            f"jaccard_link_pred x{factor}",
            jaccard_link_prediction(edges, min_common=2),
            ni,
        )

        # causal pair: PSM banding over grown customers (disjoint key
        # copies keep per-band density constant so candidate volume is
        # linear), DiD's 1-row fold over grown orders
        from h3_indexer_spark.operators.analytics import (
            diff_in_diff,
            psm_match,
        )

        cust = spark.read.parquet(f"{sf}/customer.parquet")
        cu = scaled(cust, "c_custkey", factor).select(
            "c_custkey", "c_acctbal",
            (F.col("c_custkey") % 2 == 0).alias("treated"),
        ).localCheckpoint()
        nc = cu.count()
        timed(
            f"psm_match x{factor}",
            psm_match(cu, "c_custkey", "treated", "c_acctbal", 5.0),
            nc,
        )
        o2 = o.select(
            "o_totalprice",
            (F.col("o_custkey") % 2 == 0).alias("treated"),
            (F.col("o_orderdate")
             >= F.lit("1998-01-01 00:00:00").cast("timestamp")
             ).alias("post"),
        )
        timed(
            f"diff_in_diff x{factor}",
            diff_in_diff(o2, "treated", "post", "o_totalprice"),
            no,
        )


def round9d_scale(max_factor: int = 50) -> None:
    """Round-9 third-continuation curves: Kruskal-Wallis, Jarque-Bera,
    cross-correlation, item-CF cosine, WoE/IV, max drawdown, average
    precision, compaction planning, Zipf fit.

    Run: ``python examples/scale_check.py <max_factor> round9d``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import (
        average_precision,
        cross_correlation,
        jarque_bera,
        kruskal_wallis,
        max_drawdown,
        woe_iv,
    )
    from h3_indexer_spark.operators.mining import item_cf_similarity
    from h3_indexer_spark.operators.relational import compaction_plan
    from h3_indexer_spark.operators.textops import zipf_fit
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r9d", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    for factor in (1, 5, 20, max_factor):
        o = scaled(orders, "o_orderkey", factor).localCheckpoint()
        no = o.count()
        # value histogram is FIXED as rows grow — the ranking window
        # never sees volume (the mann_whitney/spearman regime)
        timed(
            f"kruskal_wallis x{factor}",
            kruskal_wallis(o, "o_orderpriority", "o_totalprice"),
            no,
        )
        timed(
            f"woe_iv x{factor}",
            woe_iv(
                o.select(
                    "o_orderpriority",
                    (F.col("o_orderstatus") == "F").alias("y"),
                ),
                "o_orderpriority",
                "y",
            ),
            no,
        )
        # daily collapse: |dates| constant as copies multiply volume
        cents = F.round(
            F.col("o_totalprice").cast("double") * 100.0, 0
        ).cast("long")
        daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT",
                         cents).otherwise(F.lit(0)))
            .cast("bigint").alias("a"),
            F.sum(F.when(F.col("o_orderpriority") == "5-LOW",
                         cents).otherwise(F.lit(0)))
            .cast("bigint").alias("b"),
        )
        timed(
            f"cross_correlation x{factor}",
            cross_correlation(daily, "d", "a", "b", max_lag=7),
            no,
        )
        # AP stays an eval-table metric: rank ONE year's orders per
        # copy scale (the documented bounded-candidate contract)
        timed(
            f"average_precision x{factor}",
            average_precision(
                o.where(
                    (F.col("o_orderdate")
                     >= F.lit("1995-01-01").cast("timestamp"))
                    & (F.col("o_orderdate")
                       < F.lit("1996-01-01").cast("timestamp"))
                ).select(
                    (F.col("o_orderstatus") == "F").alias("y"),
                    "o_totalprice",
                    "o_orderkey",
                ),
                "y", "o_totalprice", "o_orderkey",
            ),
            no,
        )

        l = scaled(
            li.withColumn("_id", F.col("l_orderkey")), "_id", factor
        ).localCheckpoint()
        nl = l.count()
        timed(
            f"jarque_bera x{factor}",
            jarque_bera(l, "l_extendedprice",
                        group_cols=["l_returnflag"]),
            nl,
        )
        timed(
            f"max_drawdown x{factor}",
            max_drawdown(
                l.select(
                    F.to_date("l_shipdate").alias("d"),
                    F.when(F.col("l_returnflag") == "R",
                           -F.col("l_extendedprice"))
                    .otherwise(F.col("l_extendedprice"))
                    .cast("double").alias("flow"),
                ),
                "d", "flow",
            ),
            nl,
        )
        # copies shift the order key -> disjoint baskets: pair volume
        # grows linearly with the copy count (never quadratically)
        timed(
            f"item_cf x{factor}",
            item_cf_similarity(
                l, "_id", "l_partkey", min_joint=2, k=30,
                log_exclusions=False,
            ),
            nl,
        )

        d = scaled(docs, "doc_id", factor).localCheckpoint()
        nd = d.count()
        timed(
            f"compaction_plan x{factor}",
            compaction_plan(d, "source", "doc_id", "n_chars", 65536),
            nd,
        )
        # identical copies multiply head frequencies; the vocabulary
        # (and so the collapse + head cut) is constant
        timed(f"zipf_fit x{factor}", zipf_fit(d, "text"), nd)

def round10_scale(max_factor: int = 50) -> None:
    """Round-10 curves: k-anonymity risk report + suppression,
    per-class classification report, and the full-PrefixSpan miner.

    Run: ``python examples/scale_check.py <max_factor> round10``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import classification_report
    from h3_indexer_spark.operators.curation import (
        k_anonymity_report,
        suppress_small_groups,
    )
    from h3_indexer_spark.operators.mining import sequential_patterns_full
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r10", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    ev_raw = spark.read.parquet(f"{sf}/events.parquet")
    ev = ev_raw.select(
        "user_id", "event_type",
        (F.unix_timestamp("ts").cast("long") * F.lit(10**9)).alias("ts"),
        F.col("event_id"),
    )

    for factor in (1, 5, 20, max_factor):
        # k-anonymity: copies keep the SAME quasi-identifier universe
        # (nation x segment x bal bucket), so equivalence classes grow
        # linearly in rows while the histogram stays <= k-1 rows —
        # the honest axis for a groupBy-collapse report
        c = scaled(
            cust.withColumn("_id", F.col("c_custkey")), "_id", factor
        ).select(
            "c_nationkey", "c_mktsegment",
            F.floor(F.col("c_acctbal").cast("double") / F.lit(1000.0))
            .cast("bigint").alias("bal_bucket"),
            F.col("_id"),
        ).localCheckpoint()
        nc = c.count()
        qi = ["c_nationkey", "c_mktsegment", "bal_bucket"]
        timed(
            f"k_anonymity_report x{factor}",
            k_anonymity_report(c, qi, k=10 * factor),
            nc,
        )
        timed(
            f"suppress_small_groups x{factor}",
            suppress_small_groups(c, qi, k=10 * factor),
            nc,
        )

        o = scaled(
            orders.withColumn("_id", F.col("o_orderkey")), "_id", factor
        ).localCheckpoint()
        no = o.count()
        price = F.col("o_totalprice").cast("double")
        scored = o.select(
            F.col("o_orderstatus").alias("label"),
            F.when(price < 100000.0, F.lit("F"))
            .when(price < 200000.0, F.lit("O"))
            .otherwise(F.lit("P")).alias("pred"),
        )
        timed(
            f"classification_report x{factor}",
            classification_report(scored, "label", "pred"),
            no,
        )

        # full miner: disjoint user universes per copy, so each
        # pattern's support grows linearly with the factor —
        # min_support scales with it to keep the FREQUENT SET constant
        # (the honest axis: per-level join work is then linear in
        # events, not in an exploding pattern table)
        e = scaled(
            ev.withColumn("_id", F.col("user_id")), "_id", factor
        ).select(
            F.col("_id").alias("user_id"), "event_type", "ts", "event_id"
        ).localCheckpoint()
        ne = e.count()
        # pins_out + explicit release (ADVICE r10): unpersist exactly
        # the miner's own pinned tables once this factor's action is
        # done, instead of clearCache() nuking every cached table in
        # the session (which would also evict unrelated pins)
        pins: list = []
        timed(
            f"seq_patterns_full x{factor}",
            sequential_patterns_full(
                e, min_support=40 * factor, max_len=4, pins_out=pins
            ),
            ne,
        )
        for p in pins:
            p.unpersist()
        spark.catalog.clearCache()


def round9c_scale(max_factor: int = 50) -> None:
    """Round-9 second-continuation curves: Spearman rho,
    Brown-Forsythe W, Cronbach alpha, Simpson check, MDE sizing,
    partial correlation, transition reciprocity, key-skew census.

    Run: ``python examples/scale_check.py <max_factor> round9c``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import (
        brown_forsythe,
        cronbach_alpha,
        hhi_concentration,
        kendall_tau,
        laspeyres_index,
        mde_readout,
        partial_corr,
        simpsons_check,
        spearman_corr,
        tukey_contrasts,
        wilcoxon_signed_rank,
    )

    def li_years(df):
        return df.withColumn(
            "ship_year", F.year("l_shipdate").cast("int")
        )
    from h3_indexer_spark.operators.expectations import key_skew_census
    from h3_indexer_spark.operators.graph import reciprocity
    from h3_indexer_spark.queries import _load_events
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r9c", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    ev0 = _load_events(spark, sf)

    for factor in (1, 5, 20, max_factor):
        l = scaled(
            li.withColumn("_id", F.col("l_orderkey")), "_id", factor
        ).localCheckpoint()
        nl = l.count()
        # distinct-value cardinality is FIXED as rows grow (50
        # quantities x 11 discounts) — the bounded-histogram regime
        # spearman/levene are designed for
        timed(
            f"spearman x{factor}",
            spearman_corr(l, "l_quantity", "l_discount"),
            nl,
        )
        timed(
            f"brown_forsythe x{factor}",
            brown_forsythe(l, "l_returnflag", "l_quantity"),
            nl,
        )
        timed(
            f"partial_corr x{factor}",
            partial_corr(
                l, "l_quantity", "l_extendedprice", "l_discount"
            ),
            nl,
        )
        timed(
            f"key_skew_census x{factor}",
            key_skew_census(l, "l_partkey", "lineitem.l_partkey"),
            nl,
        )

        o = scaled(orders, "o_orderkey", factor).localCheckpoint()
        no = o.count()
        o2 = o.select(
            "o_totalprice",
            (F.col("o_custkey") % 2 == 0).alias("treated"),
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .alias("high_prio"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        timed(
            f"mde_readout x{factor}",
            mde_readout(o2, "treated", "o_totalprice"),
            no,
        )
        timed(
            f"simpsons_check x{factor}",
            simpsons_check(o2, "treated", "high_prio", "order_year"),
            no,
        )
        timed(
            f"kendall_tau x{factor}",
            kendall_tau(l, "l_quantity", "l_discount"),
            nl,
        )
        timed(
            f"hhi_concentration x{factor}",
            hhi_concentration(o, "o_custkey", "o_totalprice"),
            no,
        )
        timed(
            f"tukey_contrasts x{factor}",
            tukey_contrasts(l, "l_returnflag", "l_extendedprice"),
            nl,
        )
        timed(
            f"laspeyres_index x{factor}",
            laspeyres_index(
                li_years(l), "l_partkey", "ship_year",
                "l_extendedprice", "l_quantity",
            ),
            nl,
        )
        # wilcoxon over paired per-customer before/after means: copies
        # shift the customer key, so pair count grows linearly
        pairs = (
            o.where(
                F.col("o_totalprice").isNotNull()
                & F.col("o_orderdate").isNotNull()
            )
            .groupBy("o_custkey")
            .agg(
                F.avg(F.when(F.col("o_orderdate")
                             < F.lit("1997-07-01").cast("timestamp"),
                             F.col("o_totalprice"))).alias("b"),
                F.avg(F.when(F.col("o_orderdate")
                             >= F.lit("1997-07-01").cast("timestamp"),
                             F.col("o_totalprice"))).alias("a"),
            )
            .where(F.col("b").isNotNull() & F.col("a").isNotNull())
        )
        timed(
            f"wilcoxon_signed_rank x{factor}",
            wilcoxon_signed_rank(pairs, "b", "a"),
            no,
        )

        # events copies shift user ids: MORE users, per-user history
        # constant — transition edges and cells grow with the type
        # space (fixed), not the volume
        e = scaled(ev0, "user_id", factor).localCheckpoint()
        ne = e.count()
        timed(
            f"cronbach_alpha x{factor}",
            cronbach_alpha(e, "user_id", "event_type", "value"),
            ne,
        )
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        edges = e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        ).where(F.col("dst").isNotNull())
        timed(f"reciprocity x{factor}", reciprocity(edges), ne)

        # assortativity over the sampled co-purchase graph (the
        # round9b jaccard fixture: copies shift the order key so pair
        # volume is copy-local, never cross-copy)
        from h3_indexer_spark.operators.graph import degree_assortativity

        items = (
            l.where(F.expr("_id % 4 = 0"))
            .select(F.col("_id").alias("l_orderkey"), "l_partkey")
            .distinct()
            .localCheckpoint()
        )
        ia = items.select(
            F.col("l_orderkey").alias("_b"),
            F.col("l_partkey").alias("src"),
        )
        ib = items.select(
            F.col("l_orderkey").alias("_b"),
            F.col("l_partkey").alias("dst"),
        )
        g_edges = (
            ia.join(ib, "_b")
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
        ni = items.count()
        timed(
            f"degree_assortativity x{factor}",
            degree_assortativity(g_edges),
            ni,
        )


def round11_scale(max_factor: int = 50) -> None:
    """Round-11 curves: Fisher's exact test, the k-anonymity
    generalization ladder, l-diversity, and the classification
    summary.

    Run: ``python examples/scale_check.py <max_factor> round11``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import (
        classification_summary,
        fisher_exact,
    )
    from h3_indexer_spark.operators.curation import (
        k_anonymity_generalize,
        l_diversity_report,
        sample_per_group,
    )
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r11", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    for factor in (1, 5, 20, max_factor):
        # fisher: copies get disjoint GROUP universes (nation shifted
        # per copy), so the group count grows linearly while each
        # group's sample stays bounded at 24 — the honest axis for a
        # bounded-margin exact test (per-group compute is a constant
        # <= 61x60 fold; total work is linear in groups)
        c = scaled(
            cust.withColumn("_id", F.col("c_custkey")), "_id", factor
        ).select(
            (F.col("c_nationkey")
             + (F.col("_id") % F.lit(factor)) * 25).alias("g"),
            F.col("_id"),
            F.col("c_mktsegment"),
            F.col("c_acctbal").cast("double").alias("bal"),
        ).localCheckpoint()
        nc = c.count()
        samp = sample_per_group(c, "g", k=24, id_col="_id", salt="f")
        t = samp.select(
            "g",
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
            .alias("a"),
            (F.col("bal") > 4500.0).alias("b"),
        )
        timed(f"fisher_exact x{factor}", fisher_exact(t, ["g"], "a", "b"), nc)

        # ladder + l-diversity: copies keep the SAME quasi universe,
        # classes grow linearly in rows, reports stay <= 5 rows
        q = scaled(
            cust.withColumn("_id", F.col("c_custkey")), "_id", factor
        ).select(
            "c_nationkey", "c_mktsegment",
            F.col("c_acctbal").cast("double").alias("bal"),
        ).localCheckpoint()
        nq = q.count()
        nat, seg = F.col("c_nationkey"), F.col("c_mktsegment")

        def bucket(w):
            return (F.floor(F.col("bal") / F.lit(w))
                    .cast("bigint").alias("bb"))

        timed(
            f"k_anon_generalize x{factor}",
            k_anonymity_generalize(q, [
                ("l0", [nat, seg, bucket(1000.0)]),
                ("l1", [nat, seg, bucket(2000.0)]),
                ("l2", [nat, seg, bucket(5000.0)]),
                ("l3", [nat, seg]),
                ("l4", [seg]),
            ], k=10 * factor),
            nq,
        )
        qd = q.select(
            "c_nationkey", bucket(100.0), "c_mktsegment"
        )
        timed(
            f"l_diversity x{factor}",
            l_diversity_report(qd, ["c_nationkey", "bb"],
                               "c_mktsegment", l_min=4),
            nq,
        )

        o = scaled(
            orders.withColumn("_id", F.col("o_orderkey")), "_id", factor
        ).localCheckpoint()
        no = o.count()
        price = F.col("o_totalprice").cast("double")
        scored = o.select(
            F.col("o_orderstatus").alias("label"),
            F.when(price < 100000.0, F.lit("F"))
            .when(price < 200000.0, F.lit("O"))
            .otherwise(F.lit("P")).alias("pred"),
        )
        timed(
            f"classification_summary x{factor}",
            classification_summary(scored, "label", "pred"),
            no,
        )
        spark.catalog.clearCache()


def round12_scale(max_factor: int = 50) -> None:
    """Round-12 curves: the t-closeness EMD report, the
    Cochran-Armitage trend test, and the one-vs-rest AUC summary.

    Run: ``python examples/scale_check.py <max_factor> round12``."""
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.analytics import (
        cochran_armitage_trend,
        roc_auc_ovr_summary,
    )
    from h3_indexer_spark.operators.curation import t_closeness_report
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="scale_check_r12", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    for factor in (1, 5, 20, max_factor):
        # t-closeness: copies get disjoint CLASS universes (nation
        # shifted per copy) over the SHARED sensitive vocabulary, so
        # the class count grows linearly while the per-class EMD fold
        # stays a constant m-term expression — the 100 TB regime is
        # more classes, not a wider sensitive vocabulary
        c = scaled(
            cust.withColumn("_id", F.col("c_custkey")), "_id", factor
        ).select(
            (F.col("c_nationkey")
             + (F.col("_id") % F.lit(factor)) * 25).alias("qn"),
            "c_mktsegment",
            F.floor(F.col("c_acctbal").cast("double") / F.lit(2000.0))
            .cast("bigint").alias("band"),
        ).localCheckpoint()
        nc = c.count()
        timed(
            f"t_closeness x{factor}",
            t_closeness_report(
                c, ["qn", "c_mktsegment"], "band",
                t_max=0.02, n_buckets=20,
            ),
            nc,
        )

        # trend test: disjoint group universes per copy; five exact
        # BIGINT partials per group from ONE map-side-combined shuffle
        t = scaled(
            li.withColumn("_id", F.col("l_orderkey")), "_id", factor
        ).select(
            F.concat(
                F.col("l_returnflag"),
                (F.col("_id") % F.lit(factor)).cast("string"),
            ).alias("g"),
            (F.col("l_discount").cast("double") > F.lit(0.05))
            .alias("deep"),
            F.floor(
                (F.col("l_quantity").cast("double") - F.lit(1.0))
                / F.lit(10.0)
            ).cast("bigint").alias("band"),
        ).localCheckpoint()
        nt = t.count()
        timed(
            f"trend_test x{factor}",
            cochran_armitage_trend(t, ["g"], "deep", "band"),
            nt,
        )

        # OvR AUC: rows (and distinct score levels) grow linearly;
        # the midrank window runs per class over its LEVELS, the
        # summary is a 3-row readout
        o = scaled(
            orders.withColumn("_id", F.col("o_orderkey")), "_id", factor
        ).localCheckpoint()
        no = o.count()
        price = F.col("o_totalprice").cast("double")
        longf = o.select(
            F.col("o_orderstatus").alias("_st"),
            F.explode(F.array(
                F.struct(F.lit("F").alias("cls"),
                         (F.lit(200000.0) - price).alias("score")),
                F.struct(F.lit("O").alias("cls"),
                         (-F.abs(price - F.lit(150000.0))).alias("score")),
                F.struct(F.lit("P").alias("cls"), price.alias("score")),
            )).alias("_e"),
        ).select(
            F.col("_e.cls").alias("cls"),
            F.col("_e.score").alias("score"),
            (F.col("_st") == F.col("_e.cls")).cast("int").alias("label"),
        )
        timed(
            f"auc_ovr x{factor}",
            roc_auc_ovr_summary(longf, "cls", "score", "label"),
            no * 3,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "round6":
        round6_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round7":
        round7_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round7b":
        round7b_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round8":
        round8_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round8b":
        round8b_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round9":
        round9_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round9b":
        round9b_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round9c":
        round9c_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round9d":
        round9d_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round10":
        round10_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round11":
        round11_scale(int(sys.argv[1]))
    elif len(sys.argv) > 2 and sys.argv[2] == "round12":
        round12_scale(int(sys.argv[1]))
    else:
        main()
