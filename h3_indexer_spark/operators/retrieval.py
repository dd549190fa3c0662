"""Retrieval-pipeline operators: rank fusion and ranking evaluation.

A training-data / RAG pipeline retrieves with SEVERAL signals at once
(BM25 over an inverted index, dense-embedding kNN, recency or quality
priors) and needs (a) a principled way to merge the ranked lists and
(b) an evaluation harness that scores any ranking against relevance
judgments. Both are pure relational plans — rank windows, one join per
signal, conditional aggregation — nothing here leaves the JVM.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) is
the standard score-free merge: rrf(d) = Σ_signals 1/(k0 + rank_s(d)).
It only consumes INTEGER ranks, so it composes signals whose raw
scores live on incomparable scales, and every arithmetic step here is
a single IEEE division of exact integers summed in a FIXED
(name-sorted) signal order — bit-deterministic across engines, no
quantization needed.

The evaluation operator emits the per-query readout (precision@k,
recall@k, first relevant rank, reciprocal rank) rather than a
pre-averaged MAP/MRR scalar: means over queries are a trivial
client-side fold, while the per-query rows are the actionable
artifact (which queries fail) and keep every emitted float a single
division of exact counts.

Beyond-reference surface: the reference engine (amazon-science/
h3-indexer) has no retrieval layer at all; this is part of the
LLM-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: dict[str, DataFrame],
    key_col: str,
    rank_col: str = "rank",
    k0: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Fuse named ranked lists by reciprocal-rank fusion.

    ``ranked`` maps a signal name to a DataFrame carrying
    (``key_col``, ``rank_col``) with ranks starting at 1. Output:
    one row per key that appears in ANY list, a ``rank_<name>``
    column per signal (NULL where the signal did not return the key),
    and ``rrf_score`` = Σ 1/(k0 + rank) over the signals that did,
    summed in sorted-name order (a fixed fold order keeps the float
    bit-deterministic — engines must not own the accumulation order).

    Scale shape: one full-outer hash join per additional signal, each
    keyed on ``key_col`` only; candidate lists are top-N per signal so
    the join inputs are bounded by N × signals, not the corpus. With
    ``topk`` the final cut is (rrf desc, key asc) via
    TakeOrderedAndProject — no global sort.
    """
    if not ranked:
        raise ValueError("ranked must map at least one signal name")
    names = sorted(ranked)
    fused: DataFrame | None = None
    for name in names:
        part = ranked[name].select(
            F.col(key_col),
            F.col(rank_col).cast("bigint").alias(f"rank_{name}"),
        )
        fused = part if fused is None else fused.join(
            part, on=key_col, how="full_outer"
        )
    assert fused is not None
    score = None
    for name in names:
        contrib = F.coalesce(
            F.lit(1.0)
            / (F.lit(float(k0)) + F.col(f"rank_{name}").cast("double")),
            F.lit(0.0),
        )
        score = contrib if score is None else score + contrib
    out = fused.select(
        key_col,
        *[F.col(f"rank_{n}") for n in names],
        score.alias("rrf_score"),
    )
    if topk is not None:
        out = out.orderBy(
            F.col("rrf_score").desc(), F.col(key_col).asc()
        ).limit(topk)
    return out


def retrieval_eval(
    ranked: DataFrame,
    qrels: DataFrame,
    query_col: str = "query",
    key_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Score a ranking against relevance judgments, per query.

    ``ranked``: (query, key, rank) system results — the FULL returned
    list; the @k cut happens here so one input serves every k.
    ``qrels``: (query, key) binary relevance pairs (the ground truth).

    Output, one row per query present in ``qrels``:
      n_rel          relevant documents for the query (BIGINT)
      hits_at_k      relevant docs ranked in the top ``k`` (BIGINT)
      precision_at_k hits_at_k / k          (single exact division)
      recall_at_k    hits_at_k / n_rel      (single exact division)
      first_rank     rank of the first relevant result over the WHOLE
                     returned list (NULL when none was returned)
      rr             1 / first_rank, 0.0 when no relevant result was
                     returned (the MRR summand)

    Every float is one division of exact integer counts — the
    readout hashes identically in any engine. Mean-over-queries
    (MAP/MRR) is a client-side fold over these rows by design.

    Scale shape: ONE (query, key)-keyed inner join between ranking
    and judgments, then a query-keyed conditional aggregation; the
    qrels side broadcasts when the judgment set is small (the usual
    case — judgments are human-bounded).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    rel_ranked = ranked.join(
        qrels.select(query_col, key_col), on=[query_col, key_col]
    )
    per_q = rel_ranked.groupBy(query_col).agg(
        F.min(F.col(rank_col)).cast("bigint").alias("first_rank"),
        F.sum(
            F.when(F.col(rank_col) <= k, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("hits_at_k"),
    )
    n_rel = qrels.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    joined = n_rel.join(per_q, on=query_col, how="left")
    hits = F.coalesce(F.col("hits_at_k"), F.lit(0).cast("bigint"))
    return joined.select(
        query_col,
        F.col("n_rel").cast("bigint").alias("n_rel"),
        hits.alias("hits_at_k"),
        (hits.cast("double") / F.lit(float(k))).alias("precision_at_k"),
        (hits.cast("double") / F.col("n_rel").cast("double")).alias(
            "recall_at_k"
        ),
        F.col("first_rank"),
        F.coalesce(
            F.lit(1.0) / F.col("first_rank").cast("double"), F.lit(0.0)
        ).alias("rr"),
    )


# 1/log2(i+1) for ranks i = 1..10, fixed to full repr precision so the
# SAME literal text appears in the Spark plan and any SQL oracle —
# neither engine evaluates log2 at runtime (the ulp-divergent op).
NDCG_DISCOUNTS: tuple[str, ...] = (
    "1.0",
    "0.6309297535714575",
    "0.5",
    "0.43067655807339306",
    "0.38685280723454163",
    "0.3562071871080222",
    "0.3333333333333333",
    "0.31546487678572877",
    "0.3010299956639812",
    "0.2890648263178879",
)


def ndcg_at_k(
    ranked: DataFrame,
    qrels: DataFrame,
    query_col: str = "query",
    key_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """NDCG@k per query — the graded-relevance ranking metric
    (Järvelin & Kekäläinen 2002), with linear gain: DCG = Σ rel_i /
    log2(i+1) over the top-k returned, IDCG the same sum over the
    query's relevance grades sorted descending, NDCG = DCG / IDCG
    (NULL when the query has no relevant documents).

    Determinism shape (the bm25 recipe): the discounts are FIXED
    literals (``NDCG_DISCOUNTS`` — no runtime log2), each rank's
    gain pivots to ONE column via conditional aggregation, and both
    weighted sums add their k terms in literal rank order — never a
    float SUM whose accumulation order the engine owns. Every gain is
    an exact integer, so DCG/IDCG are fixed IEEE sequences and the
    final NDCG is one division.

    ``k`` is capped at len(NDCG_DISCOUNTS) = 10 (extend the literal
    table to raise it — deliberately explicit, since each extra rank
    adds a pivot column). Scale shape: one (query, key) join, one
    query-keyed conditional aggregation for DCG; IDCG ranks the
    qrels per query (judgment sets are human-bounded, so this window
    is small by construction).
    """
    if not 1 <= k <= len(NDCG_DISCOUNTS):
        raise ValueError(
            f"k must be in 1..{len(NDCG_DISCOUNTS)} "
            "(extend NDCG_DISCOUNTS for larger cuts)"
        )
    w = [float(x) for x in NDCG_DISCOUNTS[:k]]

    rel_ranked = ranked.join(
        qrels.select(query_col, key_col, rel_col), on=[query_col, key_col]
    )
    dcg_rows = rel_ranked.groupBy(query_col).agg(
        *[
            F.max(
                F.when(
                    F.col(rank_col) == i + 1,
                    F.col(rel_col).cast("bigint"),
                )
            ).alias(f"g_{i}")
            for i in range(k)
        ]
    )
    dcg = None
    for i in range(k):
        term = F.coalesce(F.col(f"g_{i}").cast("double"), F.lit(0.0)) * F.lit(
            w[i]
        )
        dcg = term if dcg is None else dcg + term

    iw = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(key_col).asc()
    )
    ideal = (
        qrels.where(F.col(rel_col) > 0)
        .withColumn("_ir", F.row_number().over(iw))
        .where(F.col("_ir") <= k)
        .groupBy(query_col)
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("_ir") == i + 1,
                        F.col(rel_col).cast("bigint"),
                    )
                ).alias(f"ig_{i}")
                for i in range(k)
            ]
        )
    )
    idcg = None
    for i in range(k):
        term = F.coalesce(
            F.col(f"ig_{i}").cast("double"), F.lit(0.0)
        ) * F.lit(w[i])
        idcg = term if idcg is None else idcg + term

    queries = qrels.select(query_col).distinct()
    out = (
        queries.join(dcg_rows.select(query_col, dcg.alias("dcg")),
                     query_col, "left")
        .join(ideal.select(query_col, idcg.alias("idcg")),
              query_col, "left")
    )
    d = F.coalesce(F.col("dcg"), F.lit(0.0))
    return out.select(
        query_col,
        d.alias("dcg"),
        F.col("idcg"),
        F.when(F.col("idcg") > F.lit(0.0), d / F.col("idcg")).alias(
            "ndcg"
        ),
    )
