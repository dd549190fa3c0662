"""Semantic tests for the as-of and range join operators."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "a", 10, 1.0), (2, "a", 20, 2.0), (3, "a", 5, 3.0),
         (4, "b", 15, 4.0), (5, "c", 50, 5.0)],
        "lid long, k string, ts long, lval double",
    )
    right = spark.createDataFrame(
        [(100, "a", 10, 10.0), (101, "a", 18, 18.0), (102, "b", 15, 15.0),
         (103, "b", 14, 14.0)],
        "rid long, k string, ts long, rval double",
    )
    return left, right


class TestAsofJoin:
    def test_backward_semantics(self, spark):
        from h3_indexer_spark.operators.temporal import asof_join

        left, right = _sides(spark)
        out = {
            r.lid: r.asof_rval
            for r in asof_join(
                left, right.select("k", "ts", "rid", "rval"),
                on=["k"], ts_col="ts", value_cols=["rval"], tiebreak="rid",
            ).collect()
        }
        assert out[1] == 10.0   # equal ts matches
        assert out[2] == 18.0   # latest at-or-before 20
        assert out[3] is None   # nothing at-or-before 5
        assert out[4] == 15.0   # tie at ts=15? no — 15 matches equal ts
        assert out[5] is None   # key c has no right rows

    def test_row_count_preserved(self, spark):
        from h3_indexer_spark.operators.temporal import asof_join

        left, right = _sides(spark)
        out = asof_join(
            left, right.select("k", "ts", "rval"),
            on=["k"], ts_col="ts", value_cols=["rval"],
        )
        assert out.count() == left.count()

    def test_tolerance(self, spark):
        from h3_indexer_spark.operators.temporal import asof_join

        left, right = _sides(spark)
        out = {
            r.lid: r.asof_rval
            for r in asof_join(
                left, right.select("k", "ts", "rval"),
                on=["k"], ts_col="ts", value_cols=["rval"], tolerance=1,
            ).collect()
        }
        assert out[1] == 10.0   # distance 0 <= 1
        assert out[2] is None   # distance 2 > 1

    def test_tiebreak_picks_greatest(self, spark):
        from h3_indexer_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "a", 10, 0.0)], "lid long, k string, ts long, lval double"
        )
        right = spark.createDataFrame(
            [(7, "a", 10, 7.0), (9, "a", 10, 9.0), (8, "a", 10, 8.0)],
            "rid long, k string, ts long, rval double",
        )
        out = asof_join(
            left, right.select("k", "ts", "rid", "rval"),
            on=["k"], ts_col="ts", value_cols=["rval"], tiebreak="rid",
        ).collect()
        assert out[0].asof_rval == 9.0


class TestRangeJoin:
    def test_containment_and_overlap(self, spark):
        from h3_indexer_spark.operators.temporal import range_join

        facts = spark.createDataFrame(
            [(1, 5.0), (2, 25.0), (3, 35.0), (4, 100.0)],
            "fid long, v double",
        )
        ivs = spark.createDataFrame(
            [(0, 0.0, 30.0), (1, 20.0, 40.0)], "iid int, lo double, hi double"
        )
        out = range_join(
            facts, ivs, value_col="v", lo_col="lo", hi_col="hi",
            bucket_width=10.0,
        ).select("fid", "iid").collect()
        got = {(r.fid, r.iid) for r in out}
        # 5→[0,30); 25→both; 35→[20,40); 100→none; hi is exclusive
        assert got == {(1, 0), (2, 0), (2, 1), (3, 1)}

    def test_boundary_exclusive(self, spark):
        from h3_indexer_spark.operators.temporal import range_join

        facts = spark.createDataFrame([(1, 30.0)], "fid long, v double")
        ivs = spark.createDataFrame(
            [(0, 0.0, 30.0), (1, 30.0, 60.0)], "iid int, lo double, hi double"
        )
        got = {
            (r.fid, r.iid)
            for r in range_join(
                facts, ivs, "v", "lo", "hi", bucket_width=7.0
            ).select("fid", "iid").collect()
        }
        assert got == {(1, 1)}


class TestAdviceFixes:
    """Round-2 ADVICE items: outer range joins must not degenerate to
    inner, and as-of NULL right values must not resurface stale rows."""

    def test_range_join_left_keeps_unmatched_facts(self, spark):
        from h3_indexer_spark.operators.temporal import range_join

        facts = spark.createDataFrame(
            [(1, 5.0), (2, 50.0), (3, 999.0)], "fid long, v double"
        )
        ivs = spark.createDataFrame(
            [(1, 0.0, 10.0)], "iid long, lo double, hi double"
        )
        rows = {
            r.fid: r.iid
            for r in range_join(
                facts, ivs, "v", "lo", "hi", bucket_width=10.0, how="left"
            ).collect()
        }
        assert rows == {1: 1, 2: None, 3: None}

    def test_range_join_left_multiple_intervals(self, spark):
        from h3_indexer_spark.operators.temporal import range_join

        facts = spark.createDataFrame(
            [(1, 5.0), (2, 25.0)], "fid long, v double"
        )
        ivs = spark.createDataFrame(
            [(1, 0.0, 10.0), (2, 3.0, 30.0)],
            "iid long, lo double, hi double",
        )
        got = {
            (r.fid, r.iid)
            for r in range_join(
                facts, ivs, "v", "lo", "hi", bucket_width=7.0, how="left"
            ).collect()
        }
        # fact 1 matches both intervals; fact 2 only the wide one —
        # and no fact row is lost
        assert got == {(1, 1), (1, 2), (2, 2)}

    def test_asof_null_right_value_not_replaced_by_stale(self, spark):
        from h3_indexer_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [("k", 10), ("k", 20)], "key string, ts long"
        )
        right = spark.createDataFrame(
            [("k", 5, 1.0), ("k", 15, None)],
            "key string, ts long, px double",
        )
        got = {
            r.ts: r.asof_px
            for r in asof_join(
                left, right, on=["key"], ts_col="ts", value_cols=["px"]
            ).collect()
        }
        # ts=10 matches the ts=5 row (px=1.0); ts=20 matches the ts=15
        # row whose px is NULL — the stale 1.0 must NOT resurface
        assert got == {10: 1.0, 20: None}

    def test_asof_tolerance_checks_matching_row_ts(self, spark):
        from h3_indexer_spark.operators.temporal import asof_join

        left = spark.createDataFrame([("k", 20)], "key string, ts long")
        right = spark.createDataFrame(
            [("k", 5, 1.0), ("k", 18, None)],
            "key string, ts long, px double",
        )
        got = asof_join(
            left, right, on=["key"], ts_col="ts",
            value_cols=["px"], tolerance=10,
        ).collect()[0]
        # the latest right row (ts=18, within tolerance) has px NULL;
        # the old px=1.0 (outside tolerance) must not be validated by
        # the newer row's timestamp
        assert got.asof_px is None


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        from h3_indexer_spark.operators.temporal import sessionize

        df = spark.createDataFrame(
            [("u", 0, 1), ("u", 100, 2), ("u", 5000, 3), ("u", 5100, 4),
             ("v", 50, 5)],
            "key string, ts long, eid long",
        )
        out = {
            (r.key, r.eid): r.session_id
            for r in sessionize(
                df, ["key"], "ts", gap=1000, order_cols=["eid"]
            ).collect()
        }
        assert out == {
            ("u", 1): 0, ("u", 2): 0, ("u", 3): 1, ("u", 4): 1,
            ("v", 5): 0,
        }

    def test_boundary_gap_stays_in_session(self, spark):
        from h3_indexer_spark.operators.temporal import sessionize

        df = spark.createDataFrame(
            [("u", 0, 1), ("u", 1000, 2), ("u", 2001, 3)],
            "key string, ts long, eid long",
        )
        out = {
            r.eid: r.session_id
            for r in sessionize(
                df, ["key"], "ts", gap=1000, order_cols=["eid"]
            ).collect()
        }
        # gap == 1000 keeps the session; gap 1001 breaks it
        assert out == {1: 0, 2: 0, 3: 1}


class TestIntervalOverlapJoin:
    def test_matches_bruteforce_including_multibucket_pairs(self, spark):
        """Pairs spanning several shared buckets must appear EXACTLY
        once (first-shared-bucket pinning), and the result must equal
        the brute-force overlap join."""
        from h3_indexer_spark.operators.temporal import interval_overlap_join

        left = spark.createDataFrame(
            [(1, 0.0, 25.0), (2, 5.0, 7.0), (3, 30.0, 40.0), (4, 50.0, 51.0)],
            ["lid", "l_lo", "l_hi"],
        )
        right = spark.createDataFrame(
            [(10, 4.0, 26.0), (11, 24.9, 31.0), (12, 45.0, 50.0)],
            ["rid", "r_lo", "r_hi"],
        )
        got = sorted(
            (r.lid, r.rid)
            for r in interval_overlap_join(
                left, right, "l_lo", "l_hi", "r_lo", "r_hi",
                bucket_width=3.0,
            ).collect()
        )
        rows_l = left.collect()
        rows_r = right.collect()
        want = sorted(
            (a.lid, b.rid)
            for a in rows_l
            for b in rows_r
            if a.l_lo < b.r_hi and b.r_lo < a.l_hi
        )
        assert got == want
        assert len(got) == len(set(got))  # no per-bucket duplicates
        # boundary check: [50, 51) does NOT overlap [45, 50) half-open
        assert (4, 12) not in got

    def test_property_random_intervals_match_bruteforce(self, spark):
        """Randomized: bucketed overlap join == brute force for
        arbitrary interval sets and an awkward bucket width."""
        import random

        rng = random.Random(1234)
        for trial in range(3):
            lrows = [
                (i, lo, lo + rng.uniform(0.01, 40.0))
                for i, lo in (
                    (i, rng.uniform(0, 100.0)) for i in range(60)
                )
            ]
            rrows = [
                (j, lo, lo + rng.uniform(0.01, 25.0))
                for j, lo in (
                    (j, rng.uniform(0, 100.0)) for j in range(40)
                )
            ]
            from h3_indexer_spark.operators.temporal import (
                interval_overlap_join,
            )

            left = spark.createDataFrame(lrows, ["lid", "l_lo", "l_hi"])
            right = spark.createDataFrame(rrows, ["rid", "r_lo", "r_hi"])
            got = sorted(
                (r.lid, r.rid)
                for r in interval_overlap_join(
                    left, right, "l_lo", "l_hi", "r_lo", "r_hi",
                    bucket_width=7.3,
                ).collect()
            )
            want = sorted(
                (a, b)
                for a, alo, ahi in lrows
                for b, blo, bhi in rrows
                if alo < bhi and blo < ahi
            )
            assert got == want, f"trial {trial}"
            assert len(want) > 0
