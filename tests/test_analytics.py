"""Semantic unit tests for operators/analytics.py and
features.standardize on small constructed inputs — the oracle tests in
test_oracle.py check engine-vs-SQL equivalence on the driver fixtures;
these pin the operator CONTRACTS (ordering constraints, gap handling,
degenerate groups, tie-breaks) on adversarial hand-built cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from h3_indexer_spark.operators.analytics import (
    DAY_NS,
    cohort_retention,
    frequent_items,
    funnel,
    gap_fill_daily,
)


@pytest.fixture(scope="module")
def spark():
    from h3_indexer_spark.session import get_spark_session

    s = get_spark_session(
        app_name="test_analytics", master="local[4]", shuffle_partitions=4
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, value double"
    )


class TestFunnel:
    def test_strict_ordering_required(self, spark):
        # user 1: full ordered chain; user 2: purchase BEFORE click —
        # stage 3 must not count; user 3: never clicked
        ev = _events(
            spark,
            [
                (1, 100, "view", 0.0),
                (1, 200, "click", 0.0),
                (1, 300, "purchase", 0.0),
                (2, 100, "view", 0.0),
                (2, 150, "purchase", 0.0),
                (2, 200, "click", 0.0),
                (3, 100, "view", 0.0),
            ],
        )
        out = {
            r.user_id: r
            for r in funnel(ev, ["view", "click", "purchase"]).collect()
        }
        assert out[1].t_0 == 100 and out[1].t_1 == 200 and out[1].t_2 == 300
        assert out[1].stages_reached == 3
        assert out[2].t_1 == 200 and out[2].t_2 is None
        assert out[2].stages_reached == 2
        assert out[3].t_1 is None and out[3].stages_reached == 1

    def test_same_timestamp_not_after(self, spark):
        # strict > : a click at exactly the view's timestamp is not a
        # post-view click
        ev = _events(
            spark, [(1, 100, "view", 0.0), (1, 100, "click", 0.0)]
        )
        row = funnel(ev, ["view", "click"]).collect()[0]
        assert row.t_1 is None

    def test_entities_without_stage0_excluded(self, spark):
        ev = _events(spark, [(9, 100, "click", 0.0)])
        assert funnel(ev, ["view", "click"]).count() == 0


class TestCohortRetention:
    def test_offsets_and_distinct_counts(self, spark):
        wk = 7 * DAY_NS
        ev = _events(
            spark,
            [
                # user 1 first-touch week 0, active weeks 0 and 2 (twice)
                (1, 0, "view", 0.0),
                (1, 2 * wk, "view", 0.0),
                (1, 2 * wk + 1, "view", 0.0),
                # user 2 same cohort week, only week 0
                (2, wk - 1, "view", 0.0),
                # user 3 cohort week 1
                (3, wk, "view", 0.0),
            ],
        )
        out = {
            (r.cohort_period, r.period_offset): r.n_active
            for r in cohort_retention(ev).collect()
        }
        assert out[(0, 0)] == 2  # users 1 and 2 in their first week
        assert out[(0, 2)] == 1  # user 1 returned; counted once
        assert out[(1, 0)] == 1
        assert (0, 1) not in out


class TestFrequentItems:
    def test_topk_with_deterministic_ties(self, spark):
        df = spark.createDataFrame(
            [("a", 1)] * 3 + [("a", 2)] * 3 + [("a", 3)] * 1,
            "grp string, item long",
        )
        rows = frequent_items(df, "grp", "item", k=2).collect()
        assert [(r.item, r.n_occurrences, r.rnk) for r in rows] == [
            (1, 3, 1),  # tie with item 2 broken by item asc
            (2, 3, 2),
        ]


class TestGapFill:
    def test_zero_fill_and_ffill(self, spark):
        ev = _events(
            spark,
            [
                (1, 0 * DAY_NS + 5, "view", 2.0),
                (1, 0 * DAY_NS + 6, "view", 3.0),
                # day 1, 2 silent
                (1, 3 * DAY_NS + 1, "view", 7.0),
            ],
        )
        rows = {
            r.day: r for r in gap_fill_daily(ev).collect()
        }
        assert sorted(rows) == [0, 1, 2, 3]
        assert rows[0].n_events == 2 and rows[0].sum_value_ffill == 5.0
        assert rows[1].n_events == 0 and rows[1].sum_value_ffill == 5.0
        assert rows[2].n_events == 0 and rows[2].sum_value_ffill == 5.0
        assert rows[3].n_events == 1 and rows[3].sum_value_ffill == 7.0


class TestStandardize:
    def test_zscore_values_and_degenerate_group(self, spark):
        from h3_indexer_spark.operators.features import standardize

        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 3.0), ("c", 5.0), ("c", 5.0)],
            "grp string, x double",
        )
        out = standardize(df, "x", group_col="grp", out_col="z")
        vals = sorted(
            (r.grp, r.x, r.z) for r in out.collect()
        )
        # group g: mean 2, sample std 1 -> z = -1, 0, 1
        assert [v[2] for v in vals if v[0] == "g"] == [-1.0, 0.0, 1.0]
        # constant group: variance 0 -> 0.0 by contract, not NaN
        assert [v[2] for v in vals if v[0] == "c"] == [0.0, 0.0]

    def test_broadcast_no_fact_shuffle(self, spark):
        """The moments join must broadcast — the fact side of
        standardize never shuffles (plan-locked, same posture as
        minmax_scale)."""
        from h3_indexer_spark.operators.features import standardize

        df = spark.range(1000).select(
            (F.col("id") % 7).alias("grp"), F.col("id").cast("double").alias("x")
        )
        plan = standardize(df, "x", group_col="grp")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestAttribution:
    def test_last_touch_semantics(self, spark):
        from h3_indexer_spark.operators.analytics import (
            attribute_conversions,
        )

        ev = spark.createDataFrame(
            [
                # user 1: view(10), click(20), purchase(30) -> click
                (1, 1, 10, "view", 0.0),
                (2, 1, 20, "click", 0.0),
                (3, 1, 30, "purchase", 0.0),
                # organic purchase, no prior touch
                (4, 2, 10, "purchase", 0.0),
                # touch AFTER the purchase must not attribute
                (5, 2, 20, "click", 0.0),
                # user 3: second purchase re-attributes to same click
                (6, 3, 10, "click", 0.0),
                (7, 3, 20, "purchase", 0.0),
                (8, 3, 30, "purchase", 0.0),
            ],
            "event_id long, user_id long, ts long, event_type string, "
            "value double",
        )
        out = {
            r.event_id: (r.touch_ts, r.touch_type, r.lag_ns)
            for r in attribute_conversions(
                ev, "purchase", ["click", "view"]
            ).collect()
        }
        assert out[3] == (20, "click", 10)
        assert out[4] == (None, None, None)
        assert out[7] == (10, "click", 10)
        assert out[8] == (10, "click", 20)

    def test_same_ts_tiebreak(self, spark):
        """A touch sharing the conversion's timestamp attributes only
        if its event_id orders first."""
        from h3_indexer_spark.operators.analytics import (
            attribute_conversions,
        )

        ev = spark.createDataFrame(
            [
                (1, 1, 50, "click", 0.0),
                (2, 1, 50, "purchase", 0.0),  # click id 1 precedes
                (9, 2, 50, "purchase", 0.0),  # click id 10 follows
                (10, 2, 50, "click", 0.0),
            ],
            "event_id long, user_id long, ts long, event_type string, "
            "value double",
        )
        out = {
            r.event_id: r.touch_ts
            for r in attribute_conversions(
                ev, "purchase", ["click", "view"]
            ).collect()
        }
        assert out[2] == 50 and out[9] is None


class TestRobustScale:
    def test_values_and_degenerate(self, spark):
        from h3_indexer_spark.operators.features import robust_scale

        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 5.0),
             ("c", 7.0), ("c", 7.0)],
            "grp string, x double",
        )
        out = robust_scale(df, "x", group_col="grp", out_col="r")
        vals = {(r.grp, r.x): r.r for r in out.collect()}
        # g: median 3, IQR = 4 - 2 = 2
        assert vals[("g", 3.0)] == 0.0
        assert vals[("g", 5.0)] == 1.0
        assert vals[("g", 1.0)] == -1.0
        # constant group -> 0.0 by contract
        assert vals[("c", 7.0)] == 0.0


class TestCoOccurrence:
    def test_support_and_lift(self, spark):
        from h3_indexer_spark.operators.analytics import co_occurrence

        df = spark.createDataFrame(
            [
                (1, "a"), (1, "b"),
                (2, "a"), (2, "b"),
                (3, "a"), (3, "c"),
                (4, "d"),
            ],
            "user_id long, event_type string",
        )
        out = {
            (r.item_a, r.item_b): (r.n_both, r.lift)
            for r in co_occurrence(df).collect()
        }
        # a&b: both=2, lift = 2*4/(3*2) = 4/3
        assert out[("a", "b")] == (2, 2 * 4 / (3 * 2))
        assert out[("a", "c")] == (1, 1 * 4 / (3 * 1))
        assert ("a", "d") not in out  # no shared entity


class TestTimeRollup:
    def test_grain_consistency(self, spark):
        """Each grain's buckets partition the events: counts at every
        grain sum to the total, and day sums equal their hours'."""
        from h3_indexer_spark.operators.analytics import (
            DAY_NS,
            HOUR_NS,
            time_rollup,
        )

        ev = spark.createDataFrame(
            [
                (1, 1 * HOUR_NS + 5, "view", 1.5),
                (2, 1 * HOUR_NS + 6, "view", 2.5),
                (3, 30 * HOUR_NS, "view", 4.0),   # day 1
                (4, 10 * DAY_NS, "view", 8.0),    # week 1
            ],
            "event_id long, ts long, event_type string, value double",
        )
        rows = time_rollup(ev).collect()
        by_grain = {}
        for r in rows:
            by_grain.setdefault(r.grain, []).append(r)
        for g in ("hour", "day", "week"):
            assert sum(r.n_events for r in by_grain[g]) == 4
            assert sum(r.sum_value for r in by_grain[g]) == 16.0
        hours = {r.bucket_start_ns: r for r in by_grain["hour"]}
        assert hours[1 * HOUR_NS].n_events == 2
        assert hours[1 * HOUR_NS].sum_value == 4.0
        days = {r.bucket_start_ns: r for r in by_grain["day"]}
        assert days[0].n_events == 2 and days[1 * DAY_NS].n_events == 1


class TestFrequentItemsScalable:
    def test_matches_exact_and_certifies(self, spark):
        """On a zipf-ish distribution the scale path must return the
        same top-k as the exact operator, with every row certified."""
        from h3_indexer_spark.operators.analytics import (
            frequent_items,
            frequent_items_scalable,
        )

        rows = []
        for g in ("x", "y"):
            for item in range(60):
                for _ in range(200 // (item + 1)):
                    rows.append((g, item))
        df = spark.createDataFrame(
            rows, "grp string, item long"
        ).repartition(8)
        exact = {
            (r.grp, r.rnk): (r.item, r.n_occurrences)
            for r in frequent_items(df, "grp", "item", k=3).collect()
        }
        got = frequent_items_scalable(
            df, "grp", "item", k=3, candidates_per_partition=16
        ).collect()
        assert {
            (r.grp, r.rnk): (r.item, r.n_occurrences) for r in got
        } == exact
        assert all(r.certified for r in got)

    def test_uncertified_when_candidates_too_few(self, spark):
        """With a starved candidate budget over a flat distribution
        the bound must trip: rows come back uncertified rather than
        silently approximate."""
        from h3_indexer_spark.operators.analytics import (
            frequent_items_scalable,
        )

        df = spark.createDataFrame(
            [("g", i % 500) for i in range(10_000)], "grp string, item long"
        ).repartition(16)
        got = frequent_items_scalable(
            df, "grp", "item", k=3, candidates_per_partition=2
        ).collect()
        assert got and not all(r.certified for r in got)


class TestRollingActiveUsers:
    def test_trailing_window_semantics(self, spark):
        from h3_indexer_spark.operators.analytics import (
            rolling_active_users,
        )

        ev = _events(
            spark,
            [
                (1, 0 * DAY_NS, "view", 0.0),
                (2, 0 * DAY_NS + 5, "view", 0.0),
                (1, 3 * DAY_NS, "view", 0.0),
                (3, 8 * DAY_NS, "view", 0.0),  # user 1's day-3 still in window
            ],
        )
        out = {
            r.day: (r.n_active_today, r.n_active_window)
            for r in rolling_active_users(ev).collect()
        }
        # only days with data are reported
        assert sorted(out) == [0, 3, 8]
        assert out[0] == (2, 2)
        # day 3 window covers days -3..3 -> users 1,2 (day 0) + 1 (day 3)
        assert out[3] == (1, 2)
        # day 8 window covers days 2..8 -> user 1 (day 3) + user 3
        assert out[8] == (1, 2)


class TestGrowthAccounting:
    def test_classification_and_identities(self, spark):
        from h3_indexer_spark.operators.analytics import (
            WEEK_NS,
            growth_accounting,
        )

        wk = WEEK_NS
        ev = _events(
            spark,
            [
                # u1: weeks 0,1 (new, then retained); absent wk2 (churn)
                (1, 0, "view", 0.0),
                (1, 1 * wk, "view", 0.0),
                # u2: week 0 only -> churned in week 1
                (2, 10, "view", 0.0),
                # u3: weeks 0 and 2 -> resurrected at 2
                (3, 20, "view", 0.0),
                (3, 2 * wk, "view", 0.0),
                # u4: first seen week 2
                (4, 2 * wk + 5, "view", 0.0),
            ],
        )
        out = {
            r.period: (r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
            for r in growth_accounting(ev).collect()
        }
        assert out[0] == (3, 0, 0, 0)
        assert out[1] == (0, 1, 0, 2)   # u1 retained; u2,u3 churned
        assert out[2] == (1, 0, 1, 1)   # u4 new, u3 resurrected, u1 churned
        # identity: retained(p) + churned(p) = actives(p-1)
        assert out[1][1] + out[1][3] == 3
        assert out[2][1] + out[2][3] == 1  # actives in week 1 = u1 only


class TestEventTransitions:
    def test_counts_and_probabilities(self, spark):
        from h3_indexer_spark.operators.analytics import event_transitions

        ev = spark.createDataFrame(
            [
                (1, 1, 10, "a", 0.0),
                (2, 1, 20, "b", 0.0),
                (3, 1, 30, "a", 0.0),
                (4, 1, 40, "c", 0.0),
                (5, 2, 10, "a", 0.0),
                (6, 2, 20, "b", 0.0),
                (7, 3, 10, "z", 0.0),  # singleton: no transition
            ],
            "event_id long, user_id long, ts long, event_type string, "
            "value double",
        )
        out = {
            (r.from_type, r.to_type): (r.n_transitions, r.p_transition)
            for r in event_transitions(ev).collect()
        }
        assert out[("a", "b")] == (2, 2 / 3)
        assert out[("a", "c")] == (1, 1 / 3)
        assert out[("b", "a")] == (1, 1.0)
        assert ("z", None) not in out and len(out) == 3


class TestChiSquareAndTwap:
    def test_chi_square_uniform_vs_skewed(self, spark):
        from h3_indexer_spark.operators.analytics import (
            chi_square_independence,
        )

        # perfectly independent 2x2 -> every contribution 0
        rows = []
        for a in ("x", "y"):
            for b in ("p", "q"):
                rows += [(a, b)] * 10
        df = spark.createDataFrame(rows, "a string, b string")
        out = chi_square_independence(df, "a", "b").collect()
        assert all(r.contribution == 0.0 for r in out)
        assert all(r.expected == 10.0 for r in out)
        # fully dependent: contributions positive
        df2 = spark.createDataFrame(
            [("x", "p")] * 10 + [("y", "q")] * 10, "a string, b string"
        )
        chi2 = sum(
            r.contribution
            for r in chi_square_independence(df2, "a", "b").collect()
        )
        assert chi2 == 20.0  # classic 2x2 perfect association: chi2 = n

    def test_twap_holds_values(self, spark):
        from h3_indexer_spark.operators.analytics import (
            time_weighted_average,
        )

        s = 10**9
        ev = spark.createDataFrame(
            [
                # value 10 held 3s, value 20 held 1s -> twap 12.5
                (1, 1, 0 * s, "view", 10.0),
                (2, 1, 3 * s, "view", 20.0),
                (3, 1, 4 * s, "view", 99.0),  # final obs: no duration
                (4, 2, 0 * s, "view", 7.0),   # singleton: null twap
            ],
            "event_id long, user_id long, ts long, event_type string, "
            "value double",
        )
        out = {r.user_id: (r.n_obs, r.twap) for r in
               time_weighted_average(ev).collect()}
        assert out[1] == (2, (10.0 * 3 + 20.0 * 1) / 4)
        assert out[2] == (0, None)
