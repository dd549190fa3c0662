#!/usr/bin/env python
"""End-to-end corpus → training-set pipeline composing the engine's
LLM-data operators, the way a pretraining data team would chain them:

  1. cheap quality gates  (textops.quality_score, language_id)
  2. LM perplexity filter (textops.lm_score_stupid_backoff — the
                           CCNet-style "too weird / too memorized"
                           band filter)
  3. near-dup removal     (dedup.minhash_near_dups + dedup_resolve)
  4. benchmark decontamination (curation.decontaminate)
  5. deterministic split  (curation.assign_splits)
  6. model-ready features (features.feature_hash on the metadata,
                           textops.token_counts for packing budgets)

Every stage is a DataFrame → DataFrame operator, so the whole thing is
ONE lazy plan per output; nothing here collects to the driver. Run:

    python examples/corpus_to_training_set.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from h3_indexer_spark.operators.curation import (  # noqa: E402
    assign_splits,
    decontaminate,
)
from h3_indexer_spark.operators.dedup import (  # noqa: E402
    dedup_resolve,
    minhash_near_dups,
)
from h3_indexer_spark.operators.features import feature_hash  # noqa: E402
from h3_indexer_spark.operators.textops import (  # noqa: E402
    language_id,
    lm_score_stupid_backoff,
    quality_score,
    token_counts,
)
from h3_indexer_spark.session import get_spark_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark_session(app_name="corpus_to_training_set")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. cheap gates: quality >= 0.5 and a confident language call
    gated = language_id(quality_score(docs)).where(
        (F.col("quality") >= 0.5) & (F.col("lang_pred") != "und")
    )

    # 2. LM band filter: drop the extreme tails of mean log-prob
    # (gibberish below, memorized boilerplate above)
    lm = lm_score_stupid_backoff(
        gated, train=gated.where(F.col("lang") == "en")
    ).withColumn(
        "mean_logprob",
        F.col("logprob_q").cast("double")
        / F.lit(1e6)
        / F.greatest(F.col("n_scored"), F.lit(1)),
    )
    bounds = lm.agg(
        F.expr("percentile(mean_logprob, 0.02)").alias("lo"),
        F.expr("percentile(mean_logprob, 0.98)").alias("hi"),
    )
    # LEFT join: docs with <2 scorable tokens have no LM row — the
    # band filter has no opinion on them, so they pass through with a
    # null score rather than being silently dropped by an inner join
    kept_lm = (
        gated.join(lm.select("doc_id", "mean_logprob"), "doc_id", "left")
        .crossJoin(F.broadcast(bounds))
        .where(
            F.col("mean_logprob").isNull()
            | F.col("mean_logprob").between(F.col("lo"), F.col("hi"))
        )
        .drop("lo", "hi")
    )

    # 3. near-dup removal: MinHash-LSH candidates, exact-Jaccard
    # verified, resolved to canonical survivors
    pairs = minhash_near_dups(kept_lm, threshold=0.8)
    deduped = dedup_resolve(kept_lm, pairs)

    # 4. decontaminate against a benchmark slice (here: a synthetic
    # holdout built from the corpus tail, standing in for an eval set)
    bench_docs = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    clean = decontaminate(deduped, bench_docs, n=5)

    # 5. deterministic split + 6. model-ready columns
    final = assign_splits(
        clean, fractions={"train": 0.95, "val": 0.05}
    )
    final = token_counts(final)
    meta_features = feature_hash(
        final, ["lang", "source"], n_features=8, id_col="doc_id"
    )

    out = final.join(meta_features, "doc_id")
    counts = {
        "input": n0,
        "after_quality_lang": gated.count(),
        "after_lm_band": kept_lm.count(),
        "after_dedup": deduped.count(),
        "after_decontaminate": clean.count(),
    }
    print(counts)
    print(
        out.groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens_re").alias("tokens"),
        )
        .collect()
    )


if __name__ == "__main__":
    main()
