"""Config-driven analytics pipeline (plans/analytics_pipeline.py):
config must be exactly equivalent to hand-composing the operators,
validation must fail fast before any job, and prepare filters must
push down into every report's scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from h3_indexer_spark.plans.analytics_pipeline import (
    run_analytics,
    validate_config,
)

CFG = {
    "prepare": [
        {"stage": "filter", "predicate": "value IS NOT NULL"},
    ],
    "reports": [
        {
            "report": "funnel",
            "name": "checkout",
            "stages": ["view", "click", "purchase"],
        },
        {"report": "cohort_retention", "name": "retention"},
        {"report": "growth_accounting", "name": "growth"},
        {
            "report": "anomalies",
            "name": "outliers",
            "z_threshold": 2.0,
        },
    ],
}


def _events(spark):
    from h3_indexer_spark.queries import _load_events

    from tests.conftest import SF_ORACLE

    return _load_events(spark, SF_ORACLE)


class TestAnalyticsPipeline:
    @pytest.mark.slow
    def test_config_equals_manual_composition(self, spark):
        from h3_indexer_spark.operators.analytics import (
            cohort_retention,
            funnel,
            growth_accounting,
        )
        from h3_indexer_spark.operators.features import standardize

        ev = _events(spark)
        got = run_analytics(spark, ev, CFG)
        assert set(got) == {"checkout", "retention", "growth", "outliers"}

        prepared = ev.where("value IS NOT NULL")
        pairs = [
            (got["checkout"], funnel(prepared, ["view", "click", "purchase"])),
            (got["retention"], cohort_retention(prepared)),
            (got["growth"], growth_accounting(prepared)),
        ]
        for g, m in pairs:
            assert sorted(g.columns) == sorted(m.columns)
            gr = sorted(map(tuple, g.collect()))
            mr = sorted(map(tuple, m.collect()))
            assert gr == mr and len(gr) > 0

        manual_out = standardize(
            prepared.select("event_id", "event_type", "value"),
            "value",
            group_col="event_type",
            out_col="z",
        ).where(F.abs(F.col("z")) >= 2.0)
        g = sorted((r.event_id, r.z) for r in got["outliers"].collect())
        m = sorted((r.event_id, r.z) for r in manual_out.collect())
        assert g == m and len(g) > 0

    def test_validation_collects_all_errors_before_any_job(self):
        with pytest.raises(ValueError) as exc:
            validate_config(
                {
                    "prepare": [{"stage": "bogus"}],
                    "reports": [
                        {"report": "nope"},
                        {"report": "funnel", "name": "f"},  # missing stages
                        {"report": "twap", "name": "f"},  # dup name
                    ],
                }
            )
        msg = str(exc.value)
        assert "unknown stage 'bogus'" in msg
        assert "unknown report 'nope'" in msg
        assert "missing required params ['stages']" in msg
        assert "duplicate output name 'f'" in msg

    def test_non_dict_entries_reported_not_crashed(self):
        with pytest.raises(ValueError) as exc:
            validate_config(
                {
                    "prepare": ["filter"],
                    "reports": ["funnel"],
                }
            )
        msg = str(exc.value)
        assert "prepare[0]: expected a dict, got str" in msg
        assert "reports[0]: expected a dict, got str" in msg

    def test_empty_reports_rejected(self):
        with pytest.raises(ValueError, match="reports is empty"):
            validate_config({"reports": []})

    def test_prepare_filter_pushes_down_to_report_scans(self, spark):
        """The shared prepare predicate must reach the parquet scan of
        every report plan — the property that makes one config drive N
        reports without N full scans' worth of unfiltered IO."""
        cfg = {
            "prepare": [
                {"stage": "filter", "predicate": "event_type = 'view'"},
            ],
            "reports": [
                {"report": "cohort_retention", "name": "r"},
                {"report": "inter_event_stats", "name": "gaps"},
            ],
        }
        out = run_analytics(spark, _events(spark), cfg)
        for name, df in out.items():
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            assert "EqualTo(event_type,view)" in plan, (name, plan)

    def test_sample_entities_is_deterministic_and_entitywise(self, spark):
        cfg = {
            "prepare": [
                {"stage": "sample_entities", "mod": 4, "keep": 1},
            ],
            "reports": [{"report": "inter_event_stats", "name": "gaps"}],
        }
        ev = _events(spark)
        a = run_analytics(spark, ev, cfg)["gaps"]
        b = run_analytics(spark, ev, cfg)["gaps"]
        ar = sorted(map(tuple, a.collect()))
        assert ar == sorted(map(tuple, b.collect()))
        assert 0 < len(ar)
        # entity-level: every kept user keeps their FULL history
        kept = {r.user_id for r in a.select("user_id").collect()}
        full = {
            r.user_id
            for r in _events(spark)
            .where(F.pmod(F.xxhash64("user_id"), F.lit(4)) == 1)
            .select("user_id")
            .distinct()
            .collect()
        }
        assert kept == full

    def test_sample_entities_validates_params(self, spark):
        df = _events(spark)
        for mod, keep in [(0, 0), (4, 4), (4, -1)]:
            with pytest.raises(ValueError):
                run_analytics(
                    spark,
                    df,
                    {
                        "prepare": [
                            {
                                "stage": "sample_entities",
                                "mod": mod,
                                "keep": keep,
                            }
                        ],
                        "reports": [{"report": "twap", "name": "t"}],
                    },
                )
