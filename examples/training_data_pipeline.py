#!/usr/bin/env python
"""End-to-end training-data pipeline over the fixture corpus — the
composition story in one runnable script: ingest → config-driven
curation (quality/language gates, PII scrub, exact dedup,
decontamination) → MinHash near-dedup with survivor resolution →
feature assembly (tokens, rare-word ratio, repetition) →
quality-weighted sampling → deterministic train/val/test splits →
sequence packing → Z-order-clustered Parquet, printing per-stage row counts and
the final layout's footer statistics.

Every stage is the same library operator the contract queries check
(h3_indexer_spark.operators.*, plans.curation_pipeline), run at
whatever scale $SPARK_GRAFT_SF_DIR points to — the point is that a 100
TB run is this exact script with a different input path and cluster
master.

Usage: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    from pyspark.sql import functions as F

    from h3_indexer_spark.operators.curation import pack_sequences
    from h3_indexer_spark.operators.dedup import (
        dedup_resolve,
        minhash_near_dups,
    )
    from h3_indexer_spark.operators.curation import repetition_stats
    from h3_indexer_spark.operators.textops import rare_word_stats
    from h3_indexer_spark.plans.curation_pipeline import run_curation
    from h3_indexer_spark.sources.writers import zorder_write

    counts: dict[str, int] = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts["ingested"] = docs.count()

    # benchmark half for decontamination, training half as corpus
    bench = docs.where(F.col("doc_id") < 50)
    train = docs.where(F.col("doc_id") >= 50)

    curated = run_curation(
        spark,
        train,
        [
            {"stage": "scrub_pii"},
            {"stage": "quality_score"},
            {"stage": "language_id"},
            {"stage": "token_counts"},
            {
                "stage": "filter",
                "predicate": "quality >= 0.3 AND n_tokens_ws >= 5",
            },
            {"stage": "exact_dedup", "text_col": "text"},
            {"stage": "decontaminate", "benchmark": bench, "n": 5},
        ],
    )
    counts["curated"] = curated.count()

    pairs = minhash_near_dups(
        curated.select("doc_id", "text"), threshold=0.7
    )
    survivors = dedup_resolve(
        curated.select("doc_id", "text"), pairs
    ).select("doc_id")
    deduped = curated.join(survivors, "doc_id", "semi")
    counts["near_deduped"] = deduped.count()

    feats = (
        deduped.join(
            rare_word_stats(deduped.select("doc_id", "text")), "doc_id"
        )
        .join(
            repetition_stats(deduped.select("doc_id", "text")), "doc_id"
        )
    )
    # quality-proportional downsampling, then deterministic splits —
    # both md5-band coins, so a re-run (or another engine) reproduces
    # the exact sample and split membership
    from h3_indexer_spark.operators.curation import (
        assign_splits,
        weighted_sample,
    )

    sampled = weighted_sample(
        feats, F.least(F.lit(1.0), F.col("quality") + F.lit(0.2))
    )
    counts["sampled"] = sampled.count()
    split = assign_splits(sampled)

    packed = pack_sequences(
        split.select("doc_id", "n_tokens_ws"),
        token_col="n_tokens_ws",
        budget=2048,
    )
    out = split.join(packed.select("doc_id", "pack_id"), "doc_id")
    counts["packed"] = out.count()
    counts["n_packs"] = out.select("pack_id").distinct().count()

    zorder_write(
        out.select(
            "doc_id", "pack_id", "split", "quality", "rare_ratio",
            "n_tokens_ws", "lang_pred", "text",
        ),
        out_dir,
        ["quality", "rare_ratio"],
        n_files=4,
    )
    counts["written"] = spark.read.parquet(out_dir).count()

    # corpus-shape report: where does the final corpus sit on the
    # Zipf rank-frequency line? Natural language reads near slope −1;
    # this synthetic fixture's flat vocabulary reads near 0 — the
    # report SURFACES that instead of gating on it (a pipeline
    # operator, not a fixture assumption)
    from h3_indexer_spark.operators.textops import zipf_fit

    z = zipf_fit(out.select("text"), top_n=100).collect()[0]
    print(
        f"    zipf shape: slope={z['slope']} r2={z['r2']} "
        f"over {z['n_ranks']} head ranks"
    )
    counts["zipf_head_ranks"] = int(z["n_ranks"])

    # lakehouse maintenance advisory: how would tonight's compaction
    # job bin the written corpus (per split, 64 KiB targets)?
    from h3_indexer_spark.operators.relational import compaction_plan

    # octet_length, not length: character counts under-report CJK /
    # emoji corpora by up to 4x and the advisory would pack 256 KiB
    # of real bytes into "64 KiB" bins
    inv = out.select(
        "split", "doc_id", F.octet_length("text").alias("bytes")
    )
    counts["compaction_bins"] = compaction_plan(
        inv, "split", "doc_id", "bytes", 65536
    ).count()
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="h3idx_ttp_") + "/corpus"
    )
    from h3_indexer_spark.session import get_spark_session

    spark = get_spark_session(app_name="training_data_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    for stage, n in run(spark, sf_dir, out_dir).items():
        print(f"{stage:>14}: {n:,}")
    print(f"output: {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
