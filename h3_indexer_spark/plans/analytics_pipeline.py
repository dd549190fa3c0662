"""Config-driven behavioral-analytics pipeline.

The geo engine's core design is a declarative job config driving a
staged pipeline (reference src/main.py:101-155, data_model/job.py);
plans/curation_pipeline.py already applies it to corpus curation. This
module completes the pattern for the analytics surface: a plain dict
config names shared event-preparation stages and a set of REPORTS, and
the runner returns one lazily-composed DataFrame per report — so a
recurring product-metrics run is a reviewable config artifact, not
notebook code.

Shape difference from curation: curation threads ONE frame through a
chain (each stage's output feeds the next); analytics fans OUT — every
report aggregates the same prepared event stream into a differently
shaped result. The prepare chain is built once and shared, so each
report's plan contains the identical scan+filter subtree: filters
written in `prepare` push down to every report's parquet scan, and a
caller that materializes several reports in one job can persist the
prepared frame at that single well-defined boundary (the same
stage-boundary-only caching rule as plans/indexer.py).

Everything validates BEFORE any job runs: unknown stage/report names,
missing required params, and bad predicates fail fast with the valid
set — the validate-early posture of the geo Job config
(plans/validator.py).

Example::

    from h3_indexer_spark.plans.analytics_pipeline import run_analytics
    out = run_analytics(spark, events, {
        "prepare": [
            {"stage": "filter", "predicate": "value IS NOT NULL"},
            {"stage": "time_range", "min_ts": 0},
        ],
        "reports": [
            {"report": "funnel", "name": "checkout",
             "stages": ["view", "click", "purchase"]},
            {"report": "cohort_retention", "name": "weekly_retention"},
            {"report": "growth_accounting", "name": "growth"},
            {"report": "anomalies", "name": "value_outliers",
             "z_threshold": 2.0},
        ],
    })
    out["checkout"].show()
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# prepare stages: thread the event frame, stay narrow (filters only —
# they must push down through every report's plan)
# ---------------------------------------------------------------------------


def _prep_filter(df: DataFrame, predicate: str) -> DataFrame:
    return df.where(predicate)


def _prep_time_range(
    df: DataFrame,
    ts_col: str = "ts",
    min_ts: int | None = None,
    max_ts: int | None = None,
) -> DataFrame:
    if min_ts is None and max_ts is None:
        raise ValueError("time_range needs min_ts and/or max_ts")
    if min_ts is not None:
        df = df.where(F.col(ts_col) >= F.lit(min_ts))
    if max_ts is not None:
        df = df.where(F.col(ts_col) < F.lit(max_ts))
    return df


def _prep_sample_entities(
    df: DataFrame,
    mod: int,
    keep: int = 0,
    id_col: str = "user_id",
) -> DataFrame:
    """Deterministic entity-level sampling: keep entities whose stable
    hash lands in one residue class. Entity-level (not row-level) so
    sequential reports (funnel, paths, retention) still see complete
    histories for the kept entities; xxhash64 so the same config
    samples the same entities on every run and engine."""
    if not 0 < mod:
        raise ValueError(f"sample_entities: mod must be positive: {mod}")
    if not 0 <= keep < mod:
        raise ValueError(
            f"sample_entities: keep must be in [0, {mod}): {keep}"
        )
    return df.where(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == F.lit(keep)
    )


_PREPARE: dict[str, Callable[..., DataFrame]] = {
    "filter": _prep_filter,
    "time_range": _prep_time_range,
    "sample_entities": _prep_sample_entities,
}

# ---------------------------------------------------------------------------
# report stages: each consumes the prepared frame, returns its own
# aggregate. Thin adapters over operators/analytics.py + features.py —
# the pipeline adds composition, not semantics.
# ---------------------------------------------------------------------------


def _rep_funnel(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import funnel

    return funnel(df, **kw)


def _rep_cohort_retention(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import cohort_retention

    return cohort_retention(df, **kw)


def _rep_growth_accounting(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import growth_accounting

    return growth_accounting(df, **kw)


def _rep_active_users(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import rolling_active_users

    return rolling_active_users(df, **kw)


def _rep_frequent_items(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import frequent_items

    return frequent_items(df, **kw)


def _rep_transitions(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import event_transitions

    return event_transitions(df, **kw)


def _rep_top_paths(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import top_event_paths

    return top_event_paths(df, **kw)


def _rep_attribution(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import attribute_conversions

    return attribute_conversions(df, **kw)


def _rep_time_rollup(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import time_rollup

    return time_rollup(df, **kw)


def _rep_co_occurrence(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import co_occurrence

    return co_occurrence(df, **kw)


def _rep_inter_event_stats(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import inter_event_stats

    return inter_event_stats(df, **kw)


def _rep_chi_square(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import (
        chi_square_independence,
    )

    return chi_square_independence(df, **kw)


def _rep_twap(df: DataFrame, **kw) -> DataFrame:
    from h3_indexer_spark.operators.analytics import time_weighted_average

    return time_weighted_average(df, **kw)


def _rep_anomalies(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    z_threshold: float = 2.0,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Outlier flagging by composition (the q_anomalies shape):
    standardize within each group, keep |z| >= threshold."""
    from h3_indexer_spark.operators.features import standardize

    keep_cols = keep_cols or ["event_id", group_col, value_col]
    out = standardize(
        df.select(*dict.fromkeys([*keep_cols, group_col, value_col])),
        value_col,
        group_col=group_col,
        out_col="z",
    )
    return out.where(F.abs(F.col("z")) >= float(z_threshold)).select(
        *keep_cols, "z"
    )


_REPORTS: dict[str, Callable[..., DataFrame]] = {
    "funnel": _rep_funnel,
    "cohort_retention": _rep_cohort_retention,
    "growth_accounting": _rep_growth_accounting,
    "active_users": _rep_active_users,
    "frequent_items": _rep_frequent_items,
    "transitions": _rep_transitions,
    "top_paths": _rep_top_paths,
    "attribution": _rep_attribution,
    "time_rollup": _rep_time_rollup,
    "co_occurrence": _rep_co_occurrence,
    "inter_event_stats": _rep_inter_event_stats,
    "chi_square": _rep_chi_square,
    "twap": _rep_twap,
    "anomalies": _rep_anomalies,
}

# required (beyond the prepared frame) per report — validated up front
_REQUIRED: dict[str, set[str]] = {
    "funnel": {"stages"},
    "attribution": {"conversion_type", "touch_types"},
    "frequent_items": {"group_col", "item_col"},
    "chi_square": {"col_a", "col_b"},
}


def validate_config(config: dict) -> None:
    """Fail fast on every config error at once (the geo validator's
    posture: one pass, all errors reported, nothing executed)."""
    errors: list[str] = []
    if not isinstance(config, dict):
        raise ValueError(f"config must be a dict, got {type(config)}")
    for i, spec in enumerate(config.get("prepare", [])):
        if not isinstance(spec, dict):
            errors.append(
                f"prepare[{i}]: expected a dict, got {type(spec).__name__}"
            )
            continue
        name = spec.get("stage")
        if name not in _PREPARE:
            errors.append(
                f"prepare[{i}]: unknown stage {name!r}; "
                f"valid: {sorted(_PREPARE)}"
            )
    reports = config.get("reports", [])
    if not reports:
        errors.append("config.reports is empty — nothing to compute")
    seen: set[str] = set()
    for i, spec in enumerate(reports):
        if not isinstance(spec, dict):
            errors.append(
                f"reports[{i}]: expected a dict, got {type(spec).__name__}"
            )
            continue
        name = spec.get("report")
        out = spec.get("name", name)
        if name not in _REPORTS:
            errors.append(
                f"reports[{i}]: unknown report {name!r}; "
                f"valid: {sorted(_REPORTS)}"
            )
            continue
        if out in seen:
            errors.append(f"reports[{i}]: duplicate output name {out!r}")
        seen.add(out)
        missing = _REQUIRED.get(name, set()) - set(spec)
        if missing:
            errors.append(
                f"reports[{i}] ({name}): missing required params "
                f"{sorted(missing)}"
            )
    if errors:
        raise ValueError("invalid analytics config:\n  " + "\n  ".join(errors))


def prepare_events(events: DataFrame, config: dict) -> DataFrame:
    """Apply the shared prepare chain (already-validated config)."""
    for spec in config.get("prepare", []):
        spec = dict(spec)
        name = spec.pop("stage")
        events = _PREPARE[name](events, **spec)
    return events


def run_analytics(
    spark, events: DataFrame, config: dict
) -> dict[str, DataFrame]:
    """Build every configured report over the shared prepared event
    frame. Returns {output_name: DataFrame}. Construction is lazy with
    ONE exception: a grouped ``anomalies`` report triggers the scaler
    family's broadcast-cardinality probe (one small aggregation job)
    at build time — see features._stats_join. Each report's plan
    embeds the same pushed-down prepare subtree."""
    validate_config(config)
    prepared = prepare_events(events, config)
    out: dict[str, DataFrame] = {}
    for spec in config["reports"]:
        spec = dict(spec)
        name = spec.pop("report")
        out_name = spec.pop("name", name)
        out[out_name] = _REPORTS[name](prepared, **spec)
    return out
