"""Product-quantization ANN: the memory-bounded refinement of the IVF
coarse index (operators/similarity.py::ivf_topk).

IVF prunes WHICH vectors to score; PQ bounds the MEMORY each scored
vector costs. A dim-d float32 vector (d*4 bytes) compresses to m
sub-space codes (m bytes at nbits<=8): at 100 TB of dim-768
embeddings that is 3072 bytes -> 96 bytes per vector — the difference
between an index that fits executor memory and one that doesn't. The
classic construction (Jégou et al., "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011):

  train:  split each vector into m contiguous sub-vectors; k-means
          (2^nbits codewords) per sub-space on a BOUNDED driver-side
          sample — the codebook is m * 2^nbits * (d/m) floats, tiny
          and broadcast into every kernel closure.
  encode: per sub-space nearest-codeword argmin — one numpy GEMM per
          (sub-space, Arrow batch); narrow, zero shuffle. Codes are
          an array<smallint> column stored alongside (or instead of)
          the raw vectors.
  search: asymmetric distance computation (ADC) — the query stays
          un-quantized; a per-query (m x 2^nbits) lookup table of
          exact query-sub-vector-to-codeword distances is built once
          on the driver, and each candidate's approximate distance is
          m table gathers + a sum (numpy fancy indexing per batch,
          no per-row Python). Top-k via Spark's TakeOrdered (per-
          partition heap + driver merge of k rows per partition).

Everything is deterministic: k-means init is the k
lexicographically-SMALLEST distinct sub-vectors of the sample
(np.unique row order — a value-sorted convention, unlike
clustering.kmeans_fit's smallest-id seeds), ties break to the lowest
code id, so encode/search are reproducible
across runs and engines — locked by numpy-equivalence and
recall-vs-brute tests (tests/test_round6_ops.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _subspaces(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    return [(j * d, (j + 1) * d) for j in range(m)]


def pq_train(
    df: DataFrame,
    m: int = 8,
    nbits: int = 4,
    sample: int = 1024,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train PQ codebooks on the ``sample`` lowest-id vectors (a
    BOUNDED, deterministic driver pull — the same contract as
    similarity.sampled_centroids; at 100 TB the sample is still
    ``sample`` rows). Returns codebooks of shape (m, 2**nbits, dim/m).

    Per sub-space Lloyd iterations run in driver numpy on the sample
    (sample x 2^nbits GEMMs — microseconds); init is the ksub
    lexicographically-smallest distinct sub-vectors (np.unique order);
    an empty codeword keeps
    its previous position, and if the sample has fewer distinct
    sub-vectors than codewords the surplus codewords duplicate the
    last distinct one (argmin ties then resolve to the lowest id, so
    encoding stays deterministic).
    """
    ksub = 1 << nbits
    rows = (
        df.select(id_col, vec_col)
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.col(id_col).asc())
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError(
            "no vectors to train PQ codebooks on: the input has no "
            f"non-null rows in column {vec_col!r}"
        )
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    books = []
    for lo, hi in _subspaces(dim, m):
        sub = x[:, lo:hi]
        uniq = np.unique(sub, axis=0)  # sorted lexicographically
        if len(uniq) >= ksub:
            cents = uniq[:ksub].copy()
        else:
            cents = np.vstack(
                [uniq, np.repeat(uniq[-1:], ksub - len(uniq), axis=0)]
            )
        for _ in range(iters):
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                - 2.0 * sub @ cents.T
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        books.append(cents)
    return np.stack(books)  # (m, ksub, dsub)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Quantize every vector to its per-sub-space nearest codeword ids
    (array<smallint>, length m). Narrow — zero shuffle; one GEMM per
    (sub-space, Arrow batch). At ingest, write the codes column (plus
    ``ivf_cell``) and drop the raw vectors from the search index."""
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    norms = [(books[j] * books[j]).sum(axis=1) for j in range(m)]

    @F.pandas_udf("array<smallint>")
    def encode(vecs: pd.Series) -> pd.Series:
        x = np.asarray(vecs.tolist(), dtype=np.float64)
        codes = np.empty((len(x), m), dtype=np.int16)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            # ||s-c||^2 argmin == argmin(-2 s.c + ||c||^2)
            codes[:, j] = (
                sub @ books[j].T * -2.0 + norms[j]
            ).argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(code_col, encode(F.col(vec_col)))


def pq_adc_topk(
    encoded: DataFrame,
    query: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: approximate squared-L2
    distance = sum_j LUT[j, code_j] with LUT the EXACT distances from
    the un-quantized query's sub-vectors to every codeword. One narrow
    pass over the codes (m gathers + a sum per row, vectorized), then
    TakeOrdered(k) — k rows per partition reach the driver, never the
    corpus. Returns (id_col, adc_dist) ascending, id-tiebroken."""
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    q = np.asarray(query, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(
            f"query dim {q.shape[0]} != codebook dim {m * dsub}"
        )
    lut = np.empty((m, ksub))
    for j in range(m):
        diff = books[j] - q[j * dsub : (j + 1) * dsub]
        lut[j] = (diff * diff).sum(axis=1)

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        c = np.asarray(codes.tolist(), dtype=np.int64)
        return pd.Series(lut[np.arange(m), c].sum(axis=1))

    return (
        encoded.select(id_col, adc(F.col(code_col)).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    codebooks: np.ndarray,
    n_probe: int = 4,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ: prune to the query's ``n_probe`` nearest coarse cells
    (partition pruning when stored partitioned by ``ivf_cell``), then
    rank the surviving candidates by PQ asymmetric distance. The scan
    reads n_probe/n_cells of the data and each candidate costs m
    bytes — the standard billion-scale ANN layout, with Spark
    partition pruning playing the role of the inverted lists."""
    from h3_indexer_spark.operators.similarity import ivf_assign

    qv = np.asarray(query, dtype=np.float64)
    scores = [float(qv @ np.asarray(c)) for c in centroids]
    probe = sorted(
        range(len(centroids)), key=lambda i: -scores[i]
    )[:n_probe]
    cand = ivf_assign(df, centroids, vec_col).where(
        F.col("ivf_cell").isin(*probe)
    )
    return pq_adc_topk(
        pq_encode(cand, codebooks, vec_col),
        query,
        codebooks,
        k,
        id_col,
    )


def ivfpq_topk_rerank(
    df: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    codebooks: np.ndarray,
    n_probe: int = 4,
    k: int = 10,
    n_refine: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC+R (the re-rank refinement of Jégou, Douze, Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011
    §V): ADC selects the ``n_refine`` best candidates by quantized
    distance, then ONLY those candidates' raw vectors are re-scored
    with the EXACT squared-L2 distance and the final top-``k`` is
    taken from the exact scores. Whenever the true top-k survives the
    ADC cut (empirically near-certain for n_refine >> k — the recall
    curve is asserted in tests), the composed index returns exactly
    the brute-force answer while still reading PQ codes for the
    corpus and raw vectors for just ``n_refine`` rows.

    Scale shape: the ADC pass is the same narrow scan + TakeOrdered
    as ivfpq_topk (n_refine rows reach the driver side of the plan);
    the refine pass broadcast-semi-joins those n_refine ids against
    the raw table — the corpus is scanned, never shuffled, and the
    exact distance is a pure codegen expression (no Python). At
    100 TB keep the raw vectors partitioned by ``ivf_cell`` so the
    refine scan prunes to the probed partitions too."""
    cand = ivfpq_topk(
        df, query, centroids, codebooks, n_probe,
        max(int(n_refine), int(k)), vec_col, id_col,
    )
    q = [float(v) for v in query]
    # exact squared-L2, left-associative — the identical IEEE op
    # sequence any external engine produces from the mirrored SQL
    terms = " + ".join(
        f"(CAST({vec_col}[{i}] AS DOUBLE) - ({v!r})) * "
        f"(CAST({vec_col}[{i}] AS DOUBLE) - ({v!r}))"
        for i, v in enumerate(q)
    )
    refined = (
        df.join(F.broadcast(cand.select(id_col)), id_col, "left_semi")
        .select(id_col, F.expr(f"0.0 + {terms}").alias("l2_dist"))
        .orderBy(F.col("l2_dist").asc(), F.col(id_col).asc())
        .limit(int(k))
    )
    return refined
