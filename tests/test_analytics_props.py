"""Property-based tests: the analytics operators vs brute-force Python
references on randomized event streams. Hypothesis explores orderings,
ties, gaps, and degenerate users that hand-written cases miss; the
reference implementations are deliberately naive (per-user loops over
sorted lists) so a disagreement always indicts the distributed plan."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from h3_indexer_spark.operators.analytics import (
    DAY_NS,
    attribute_conversions,
    funnel,
    gap_fill_daily,
)

STAGES = ["view", "click", "purchase"]
TYPES = STAGES + ["signup", "error"]


@pytest.fixture(scope="module")
def spark():
    from h3_indexer_spark.session import get_spark_session

    s = get_spark_session(
        app_name="test_analytics_props",
        master="local[4]",
        shuffle_partitions=4,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # user_id
        st.integers(min_value=0, max_value=4 * DAY_NS),  # ts
        st.sampled_from(TYPES),
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, width=32
        ),
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, ty, float(v)) for i, (u, t, ty, v) in enumerate(rows)],
        "event_id long, user_id long, ts long, event_type string, "
        "value double",
    )


def _ref_funnel(rows):
    """Naive funnel: per user, earliest stage-k event strictly after
    the stage-(k-1) completion. Ties on ts don't matter for min()."""
    out = {}
    users = {u for u, *_ in rows}
    for u in users:
        evs = sorted((t, ty) for uu, t, ty, _ in rows if uu == u)
        times = []
        prev = None
        for stage in STAGES:
            cands = [
                t
                for t, ty in evs
                if ty == stage and (prev is None or t > prev)
            ]
            if not cands:
                break
            prev = min(cands)
            times.append(prev)
        if times:
            times += [None] * (len(STAGES) - len(times))
            out[u] = (times[0], times[1], times[2], sum(t is not None for t in times))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
@pytest.mark.slow
def test_funnel_matches_reference(spark, rows):
    got = {
        r.user_id: (r.t_0, r.t_1, r.t_2, r.stages_reached)
        for r in funnel(_df(spark, rows), STAGES).collect()
    }
    assert got == _ref_funnel(rows)


def _ref_attribution(rows):
    """Naive last-touch: per purchase, the latest (ts, event_id)-ordered
    click/view strictly before it in the total order."""
    out = {}
    indexed = [
        (i, u, t, ty) for i, (u, t, ty, _) in enumerate(rows)
    ]
    for i, u, t, ty in indexed:
        if ty != "purchase":
            continue
        touches = [
            (tt, jj)
            for jj, uu, tt, tty in indexed
            if uu == u and tty in ("click", "view") and (tt, jj) < (t, i)
        ]
        out[i] = max(touches)[0] if touches else None
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
@pytest.mark.slow
def test_attribution_matches_reference(spark, rows):
    got = {
        r.event_id: r.touch_ts
        for r in attribute_conversions(
            _df(spark, rows), "purchase", ["click", "view"]
        ).collect()
    }
    assert got == _ref_attribution(rows)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
@pytest.mark.slow
def test_gap_fill_invariants(spark, rows):
    """Structural invariants on random streams: per user the day column
    is a contiguous range, event counts are conserved, and the
    forward-fill never yields null."""
    res = gap_fill_daily(_df(spark, rows)).collect()
    by_user = {}
    for r in res:
        by_user.setdefault(r.user_id, []).append(r)
    users = {u for u, *_ in rows}
    assert set(by_user) == users
    for u, rs in by_user.items():
        days = sorted(r.day for r in rs)
        assert days == list(range(days[0], days[-1] + 1))
        n_events = sum(r.n_events for r in rs)
        assert n_events == sum(1 for uu, *_ in rows if uu == u)
        assert all(r.sum_value_ffill is not None for r in rs)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
@pytest.mark.slow
def test_co_occurrence_matches_reference(spark, rows):
    from itertools import combinations

    from h3_indexer_spark.operators.analytics import co_occurrence

    got = {
        (r.item_a, r.item_b): (r.n_both, r.lift)
        for r in co_occurrence(_df(spark, rows)).collect()
    }
    by_user: dict = {}
    for u, _, ty, _ in rows:
        by_user.setdefault(u, set()).add(ty)
    n_users = len(by_user)
    marg: dict = {}
    for items in by_user.values():
        for it in items:
            marg[it] = marg.get(it, 0) + 1
    want: dict = {}
    for items in by_user.values():
        for a, b in combinations(sorted(items), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert set(got) == set(want)
    for pair, n_both in want.items():
        g_n, g_lift = got[pair]
        assert g_n == n_both
        assert g_lift == n_both * float(n_users) / (
            marg[pair[0]] * marg[pair[1]]
        )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
@pytest.mark.slow
def test_time_rollup_matches_reference(spark, rows):
    from decimal import Decimal

    from h3_indexer_spark.operators.analytics import (
        HOUR_NS,
        WEEK_NS,
        time_rollup,
    )

    got = {
        (r.grain, r.bucket_start_ns): (r.n_events, r.sum_value)
        for r in time_rollup(_df(spark, rows)).collect()
    }
    want: dict = {}
    for _, t, _, v in rows:
        for grain, period in (
            ("hour", HOUR_NS), ("day", DAY_NS), ("week", WEEK_NS)
        ):
            key = (grain, (t // period) * period)
            n, sv = want.get(key, (0, Decimal(0)))
            want[key] = (
                n + 1,
                sv + Decimal(f"{float(v):.4f}").quantize(
                    Decimal("0.0001")
                ),
            )
    assert set(got) == set(want)
    for k, (n, sv) in want.items():
        assert got[k][0] == n
        assert got[k][1] == float(sv)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
@pytest.mark.slow
def test_growth_accounting_identities(spark, rows):
    """On random streams: new+retained+resurrected = that period's
    actives, retained(p)+churned(p) = actives(p-1), and a user's first
    period is always classified new."""
    from h3_indexer_spark.operators.analytics import (
        WEEK_NS,
        growth_accounting,
    )

    out = {
        r.period: r for r in growth_accounting(_df(spark, rows)).collect()
    }
    actives: dict = {}
    for u, t, *_ in rows:
        actives.setdefault(t // WEEK_NS, set()).add(u)
    assert set(out) == set(actives)
    for p, r in out.items():
        assert r.n_new + r.n_retained + r.n_resurrected == len(actives[p])
        prev = actives.get(p - 1, set())
        assert r.n_retained + r.n_churned == len(prev)


# ---------------------------------------------------------------------------
# Round-6 CDC algebra: merge and incremental-aggregate maintenance vs
# brute-force dict references under randomized change sets.
# ---------------------------------------------------------------------------

table_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=12),          # key
    st.tuples(
        st.sampled_from(["a", "b", "c"]),            # group
        st.integers(min_value=-500, max_value=500),  # value in 0.25 steps
    ),
    max_size=12,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=table_strategy, new=table_strategy)
@pytest.mark.slow
def test_incremental_agg_equals_recompute(spark, old, new):
    """For ANY pair of snapshots: state(old) + diff(old, new) must
    equal state(new) exactly — inserts, deletes, value changes, and
    group migrations all emerge from random dict pairs."""
    from h3_indexer_spark.operators.relational import (
        finalize_grouped_sum,
        grouped_sum_state,
        snapshot_diff,
        update_grouped_sum,
    )

    schema = "k bigint, g string, v double"

    def df_of(d):
        rows = [(k, g, v / 4.0) for k, (g, v) in d.items()]
        return spark.createDataFrame(rows, schema)

    old_df, new_df = df_of(old), df_of(new)
    diff = snapshot_diff(old_df, new_df, ["k"], ["g", "v"])
    got = {
        r["g"]: (r["n_rows"], r["sum_v"])
        for r in finalize_grouped_sum(
            update_grouped_sum(
                grouped_sum_state(old_df, "g", "v"), diff, "g", "v"
            )
        ).collect()
    }
    want = {
        r["g"]: (r["n_rows"], r["sum_v"])
        for r in finalize_grouped_sum(
            grouped_sum_state(new_df, "g", "v")
        ).collect()
    }
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=table_strategy, new=table_strategy)
@pytest.mark.slow
def test_merge_of_diff_reconstructs_new_snapshot(spark, old, new):
    """Applying snapshot_diff(old, new) to old via merge_by_key must
    reproduce new exactly, for ANY snapshot pair."""
    from h3_indexer_spark.operators.relational import (
        merge_by_key,
        snapshot_diff,
    )

    schema = "k bigint, g string, v double"
    rows_old = [(k, g, v / 4.0) for k, (g, v) in old.items()]
    rows_new = [(k, g, v / 4.0) for k, (g, v) in new.items()]
    old_df = spark.createDataFrame(rows_old or [], schema)
    new_df = spark.createDataFrame(rows_new or [], schema)
    diff = snapshot_diff(old_df, new_df, ["k"], ["g", "v"])
    src = diff.select(
        "k",
        F.coalesce("new_g", "old_g").alias("g"),
        F.coalesce("new_v", "old_v").alias("v"),
        (F.col("status") == "removed").alias("deleted"),
    )
    merged = {
        (r["k"], r["g"], r["v"])
        for r in merge_by_key(
            old_df, src, ["k"], delete_col="deleted"
        ).collect()
    }
    want = {(k, g, v / 4.0) for k, (g, v) in new.items()}
    assert merged == want
