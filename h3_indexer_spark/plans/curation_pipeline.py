"""Config-driven corpus-curation pipeline.

The reference's core design is a declarative job config driving a
staged pipeline (Validate → Index → Resolve; reference
src/main.py:101-155, data_model/job.py). This module applies the same
pattern to the LLM-data operators: a plain dict/list config names the
stages and their parameters, and the runner threads one DataFrame
through them — so a 100 TB curation run is a reviewable config
artifact, not ad-hoc notebook code, exactly like the geo pipeline.

Stages compose lazily: the whole configured pipeline is ONE Spark
plan, so Catalyst fuses the narrow stages (quality, lang-id, scrub,
clean-lines, token counts are a single codegen'd map) and only the
dedup/pack stages introduce shuffles.

Example::

    from h3_indexer_spark.plans.curation_pipeline import run_curation
    out = run_curation(spark, docs, [
        {"stage": "clean_lines", "min_words": 2,
         "require_terminal_punct": False},
        {"stage": "quality_score"},
        {"stage": "language_id"},
        {"stage": "filter", "predicate": "quality >= 0.5"},
        {"stage": "exact_dedup"},
        {"stage": "token_counts"},
    ])
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stage_clean_lines(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.curation import clean_lines

    out = clean_lines(df, **kw)
    # downstream stages read `text`; the cleaned text replaces it
    return out.withColumn("text", F.col("clean_text")).drop("clean_text")


def _stage_scrub_pii(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.curation import scrub_pii

    return scrub_pii(df, **kw)


def _stage_quality(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.textops import quality_score

    return quality_score(df, **kw)


def _stage_lang(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.textops import language_id

    return language_id(df, **kw)


def _stage_tokens(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.textops import token_counts

    return token_counts(df, **kw)


def _stage_filter(df: DataFrame, predicate: str) -> DataFrame:
    return df.where(predicate)


def _stage_exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    from h3_indexer_spark.operators.dedup import exact_dedup

    keep = exact_dedup(df, id_col=id_col, text_col=text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col)


def _stage_decontaminate(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.curation import decontaminate

    return decontaminate(df, **kw)


def _stage_dedup_spans_global(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.curation import dedup_spans_global

    return dedup_spans_global(df, **kw)


def _stage_stratified_sample(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.textops import stratified_sample_by_key

    return stratified_sample_by_key(df, **kw)


STAGES: dict[str, Callable[..., DataFrame]] = {
    "clean_lines": _stage_clean_lines,
    "scrub_pii": _stage_scrub_pii,
    "quality_score": _stage_quality,
    "language_id": _stage_lang,
    "token_counts": _stage_tokens,
    "filter": _stage_filter,
    "exact_dedup": _stage_exact_dedup,
    "decontaminate": _stage_decontaminate,
    "dedup_spans_global": _stage_dedup_spans_global,
    "stratified_sample": _stage_stratified_sample,
}


def run_curation(
    spark, df: DataFrame, stages: list[dict]
) -> DataFrame:
    """Thread ``df`` through the configured stages. Each entry is
    ``{"stage": <name>, **params}``; unknown names fail fast with the
    valid set (same validate-early posture as the geo Job config)."""
    for i, spec in enumerate(stages):
        spec = dict(spec)
        name = spec.pop("stage", None)
        if name not in STAGES:
            raise ValueError(
                f"stage {i}: unknown stage {name!r}; "
                f"valid: {sorted(STAGES)}"
            )
        df = STAGES[name](df, **spec)
    return df
