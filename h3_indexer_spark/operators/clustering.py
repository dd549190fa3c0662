"""Distributed k-means (Lloyd's algorithm) over an embedding column —
the clustering primitive behind IVF index training, corpus topic
bucketing, and semantic-dedup partitioning in training-data pipelines.

Spark-first formulation: centroids are a SMALL array broadcast into a
vectorized assignment kernel; each Lloyd iteration is

  assign:  one mapInPandas pass (a single (batch x k) GEMM argmin —
           no per-row Python, no UDF per centroid)
  update:  one groupBy(cluster).agg(avg per dimension) — partial
           aggregation map-side, so the shuffle carries k rows per
           partition, never the corpus

so the per-iteration cost at 100 TB is one corpus scan plus a
k-row-per-partition shuffle, and the centroid table on the driver is
k x dim floats (tiny). Initialization is deterministic (first k
vectors by id order) so runs are reproducible and testable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_kernel(centroids: np.ndarray, id_col: str, vec_col: str):
    """Vectorized nearest-centroid assignment: squared-L2 argmin via
    the ||x-c||^2 = ||x||^2 - 2xC^T + ||c||^2 expansion — one GEMM per
    Arrow batch. ||x||^2 is constant per row and irrelevant to the
    argmin, so only the cross term and centroid norms are computed."""
    c = centroids.astype(np.float64)
    c_norm = (c * c).sum(axis=1)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            scores = x @ c.T * -2.0 + c_norm
            best = scores.argmin(axis=1)
            dist = (x * x).sum(axis=1) + scores[
                np.arange(len(best)), best
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cluster": best.astype(np.int32),
                    # clamp tiny negative float error so inertia sums
                    # are valid distances
                    "sq_dist": np.maximum(dist, 0.0),
                }
            )

    return fn


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2).
    Narrow — zero shuffle; adds (cluster int, sq_dist double)."""
    id_type = df.schema[id_col].dataType.simpleString()
    vec_type = df.schema[vec_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        _assign_kernel(centroids, id_col, vec_col),
        schema=(
            f"{id_col} {id_type}, {vec_col} {vec_type}, "
            "cluster int, sq_dist double"
        ),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-6,
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's k-means. Returns (centroids k x dim, inertia history).

    Deterministic init: the k vectors with the smallest ids (stable
    across runs and engines; for clustering QUALITY on pathological
    data swap in k-means|| — the iteration machinery is unchanged).
    Each iteration runs exactly one job: the update aggregation
    (per-dimension avg + inertia sum in the same groupBy). Convergence
    is declared when relative inertia improvement drops below ``tol``.
    Inertia is monotonically non-increasing — locked by test.

    The centroid collect is k rows (k x dim floats) — bounded driver
    state, not a corpus collect. An empty cluster keeps its previous
    centroid (standard practice; avoids k shrinking mid-run).
    """
    dim = len(
        df.select(vec_col).limit(1).collect()[0][0]
    )
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids = np.asarray(
        [r[1] for r in seed_rows], dtype=np.float64
    ).reshape(k, dim)

    history: list[float] = []
    # avg over each dimension: exploding dims would shuffle n x dim
    # rows; aggregating the array column per-dimension keeps the
    # shuffle at k rows per partition
    dim_avgs = [
        F.avg(F.col(vec_col)[d]).alias(f"c{d}") for d in range(dim)
    ]
    for _ in range(max_iter):
        assigned = assign_clusters(df, centroids, id_col, vec_col)
        stats = (
            assigned.groupBy("cluster")
            .agg(F.sum("sq_dist").alias("_inertia"), *dim_avgs)
            .collect()
        )
        inertia = float(sum(r["_inertia"] for r in stats))
        new_c = centroids.copy()
        for r in stats:
            new_c[r["cluster"]] = [r[f"c{d}"] for d in range(dim)]
        centroids = new_c
        if history and history[-1] - inertia <= tol * max(
            history[-1], 1e-12
        ):
            history.append(inertia)
            break
        history.append(inertia)
    return centroids, history


def dbscan(
    points: DataFrame,
    eps_km: float,
    min_pts: int,
    id_col: str = "id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    cc_shuffle_partitions: int | None = None,
) -> DataFrame:
    """Density-based spatial clustering (DBSCAN, Ester et al. 1996),
    composed entirely from the engine's scale primitives — no new
    kernel: neighborhoods come from the H3-bucketed radius self-join
    (geo_join.h3_radius_join: certain recall, one cell-keyed shuffle
    per side), core points are a neighbor-count aggregation, clusters
    are connected components over the core-core adjacency
    (graph.connected_components: pointer jumping, O(log n) rounds),
    and border points attach to their smallest-labelled core
    neighbor. Labels are the minimum member id of each cluster's core
    set — fully deterministic, no seed, no visit order.

    Output: (id, cluster, is_core) — cluster NULL for noise points;
    is_core ∈ {0,1}. Standard DBSCAN border semantics: a border point
    belongs to A cluster it is density-reachable from; when several
    qualify, the smallest label wins (deterministic choice of the
    algorithm's order-dependent freedom).

    Scale: every stage is a bounded equi-join or aggregation — the
    radius join never goes n², components never iterate past log n,
    and the only driver actions are the components' 1-row
    convergence probes. Before the iterative loop, core-core edges
    are locally contracted within coarse H3 cells
    (graph.contract_edges: one union-find applyInPandas pass, one
    shuffle): a dense spatial graph percolates into chains whose
    diameter grows with density, but every chain segment inside a
    coarse cell collapses to depth 1, so the loop iterates only over
    the between-cell star graph (diameter bounded by the region's
    extent in coarse cells, not by point density — measured at sf0.1:
    18 pointer-jump rounds → 4, steady 16 s → ~4 s). Cell groups are
    memory-bounded by cell area × density; at higher density drop
    ``coarse_offset`` toward 0."""
    from h3_indexer_spark.functions.h3.sql import parent_long_expr
    from h3_indexer_spark.operators.geo_join import (
        h3_radius_join,
        pick_res_for_radius,
    )
    from h3_indexer_spark.operators.graph import (
        connected_components,
        contract_edges,
    )

    res = pick_res_for_radius(eps_km)
    pairs = h3_radius_join(
        points,
        points,
        eps_km,
        (id_col, lat_col, lng_col),
        (id_col, lat_col, lng_col),
        keep_cell=True,
    ).select(
        F.col(f"l_{id_col}").alias("a"),
        F.col(f"r_{id_col}").alias("b"),
        F.col("_cell"),
    ).localCheckpoint()  # neighbor pairs feed 3 branches; the radius
    # join's pandas-UDF stages should run once, and the iterative
    # components would otherwise re-nest them every round
    # pairs includes the self-pair (dist 0), so |N_eps(p)| is the
    # plain count per left id — the textbook definition
    ncount = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("n_nbr"))
    core_ids = ncount.where(F.col("n_nbr") >= min_pts).select("a")
    core_edges = (
        pairs.where(F.col("a") < F.col("b"))
        .join(core_ids, "a", "left_semi")
        .join(core_ids.select(F.col("a").alias("b")), "b", "left_semi")
    )
    # two staggered local-contraction passes before the iterative CC
    # (graph.contract_edges). Pass 1 keys each core-core edge by the
    # COARSE parent (join res − 2: ~7²× the cell area) of the left
    # endpoint's join cell — a pure bit-op on the cell id the radius
    # join already computed, no second lat/lng kernel. Pass 2 re-keys
    # the pass-1 STAR graph (≤1 edge per vertex) by an even coarser
    # parent of the pass-1 group key: chains that zigzag along pass-1
    # cell boundaries land in one pass-2 group and collapse there.
    coarse1 = max(res - 2, 0)
    coarse2 = max(res - 4, 0)
    star1 = contract_edges(
        core_edges.withColumn(
            "_k1", parent_long_expr(F.col("_cell"), coarse1)
        ),
        "_k1",
        src="a",
        dst="b",
        emit_key=True,
    )
    star2 = contract_edges(
        star1.withColumn("_k2", parent_long_expr(F.col("key"), coarse2)),
        "_k2",
    ).localCheckpoint()  # CC's src∪dst-reversed union would otherwise
    # execute the two pandas contraction passes once PER BRANCH
    # cc_shuffle_partitions defaults to None (session width + AQE
    # coalesce — the scale-safe choice: the CC label table is one row
    # per CORE POINT, data-scale). A caller whose point set is
    # STRUCTURALLY bounded (a capped fixture, a per-city slice) may
    # pass a small width to shrink the loop's per-round stage fan-out
    # — the connected_components caveat about session-wide conf
    # scoping applies.
    comps = connected_components(
        star2,
        core_ids.select(F.col("a").alias("vid")),
        id_col="vid",
        loop_shuffle_partitions=cc_shuffle_partitions,
    ).select(F.col("vid"), F.col("component"))
    # one left join + ONE aggregation labels core and border points
    # alike AND recounts neighbors for the is_core flag:
    # cluster(x) = min component over x's CORE neighbors — a core x is
    # its own neighbor (self-pair) and all its core neighbors share
    # its component, so the min reproduces comp(x); a border x gets
    # the smallest label among reachable cores (the deterministic
    # resolution of DBSCAN's order-dependent freedom); noise points
    # have only null components under the min and stay NULL
    lab = (
        pairs.join(
            comps.select(F.col("vid").alias("b"), F.col("component")),
            "b",
            "left",
        )
        .groupBy("a")
        .agg(
            F.min("component").alias("cluster"),
            F.count(F.lit(1)).alias("n_nbr"),
        )
    )
    return (
        points.select(F.col(id_col))
        .join(lab, points[id_col] == lab["a"], "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.coalesce(
                (F.col("n_nbr") >= min_pts).cast("int"), F.lit(0)
            ).alias("is_core"),
        )
    )
