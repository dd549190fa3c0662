#!/usr/bin/env python
"""End-to-end hybrid-retrieval walkthrough: the RAG indexing + serving
+ evaluation loop, composed from the engine's retrieval primitives —

  1. corpus prep        exact dedup + quality/language gate
                        (operators/dedup.py, textops.py)
  2. dense leg          L2-normalize embeddings, cosine top-k pool
                        (similarity.normalize_embeddings — unit
                        vectors make cosine a plain dot product)
  3. sparse leg         BM25 top-k pool (textops.bm25_scores —
                        inverted-index scoring, FLOOR-quantized)
  4. fusion             reciprocal-rank fusion of the two pools
                        (retrieval.rrf_fuse — integer ranks only,
                        so the legs' incomparable scores never mix)
  5. evaluation         precision/recall/MRR + graded NDCG@10 against
                        term-containment qrels (retrieval.
                        retrieval_eval, ndcg_at_k)

Every stage is the scale-shaped plan the SCALE.md notes describe:
candidate pools come from TakeOrderedAndProject (never a global
window), the fuse joins ≤k rows per signal, and the eval shuffles
nothing wider than the (query, doc) key.

Run: python examples/retrieval_pipeline.py   (uses sf0.01 testdata)
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Window
from pyspark.sql import functions as F

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = "/root/testdata/sf0.01"
TERMS = ["join", "query", "spark", "stream"]


def main() -> None:
    from h3_indexer_spark.operators.dedup import exact_dedup
    from h3_indexer_spark.operators.retrieval import (
        ndcg_at_k,
        retrieval_eval,
        rrf_fuse,
    )
    from h3_indexer_spark.operators.similarity import normalize_embeddings
    from h3_indexer_spark.operators.textops import bm25_scores
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="retrieval_pipeline", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # -- 1. corpus prep: drop exact duplicates before indexing
    kept = exact_dedup(docs, "text", "doc_id")
    corpus = docs.join(
        kept.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    print(f"corpus: {docs.count()} docs -> {corpus.count()} after dedup")

    # -- 2. dense leg: unit-normalize, then rank by dot product with a
    #       fixed query vector (cosine == dot on unit vectors)
    unit = normalize_embeddings(emb).where(F.col("normalized").isNotNull())
    dim = len(emb.select("embedding").first()[0])
    qvec = [((i * 37) % 128 - 64) / 64.0 for i in range(dim)]
    qnorm = sum(v * v for v in qvec) ** 0.5
    qunit = [v / qnorm for v in qvec]
    dot = None
    for i, v in enumerate(qunit):
        term = F.element_at(F.col("normalized"), i + 1) * F.lit(v)
        dot = term if dot is None else dot + term
    dense_pool = (
        unit.select(F.col("vec_id").alias("doc_id"), dot.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("doc_id").asc())
        .limit(50)
    )
    dense = dense_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), F.col("doc_id").asc()))
        .alias("rank"),
    )

    # -- 3. sparse leg: BM25 against the fixed term set
    sparse = bm25_scores(corpus, TERMS, "text", "doc_id", k=50).select(
        "doc_id",
        F.row_number()
        .over(
            Window.orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        )
        .alias("rank"),
    )

    # -- 4. fuse
    fused = rrf_fuse({"dense": dense, "sparse": sparse}, "doc_id", topk=10)
    print("\nhybrid top-10 (rrf):")
    fused.show(10, truncate=False)

    # -- 5. evaluate the FUSED ranking against term-containment qrels
    terms = spark.createDataFrame([(t,) for t in sorted(TERMS)], "term string")
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), r"[^\w\s]", " ")),
            r"\s+",
        ),
        lambda t: F.length(t) > 0,
    )
    tf = F.size(
        F.filter(F.col("toks"), lambda t: t == F.col("term"))
    ).cast("bigint")
    graded = (
        corpus.select("doc_id", toks.alias("toks"))
        .crossJoin(F.broadcast(terms))
        .select(
            "term", "doc_id",
            F.least(tf, F.lit(3).cast("bigint")).alias("rel"),
        )
        .where(F.col("rel") > 0)
    )
    ranked = fused.select("doc_id").crossJoin(F.broadcast(terms)).join(
        fused.select(
            "doc_id",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("rrf_score").desc(), F.col("doc_id").asc()
                )
            )
            .alias("rank"),
        ),
        "doc_id",
    ).select("term", "doc_id", "rank")

    print("\nper-query eval (precision/recall/MRR @10):")
    retrieval_eval(
        ranked, graded.select("term", "doc_id"), query_col="term", k=10
    ).orderBy("term").show(truncate=False)

    print("NDCG@10 (graded relevance = min(tf, 3)):")
    ndcg_at_k(
        ranked, graded, query_col="term", rel_col="rel", k=10
    ).orderBy("term").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
