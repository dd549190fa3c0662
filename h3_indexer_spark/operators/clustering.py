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
