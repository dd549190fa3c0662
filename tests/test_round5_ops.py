"""Hand-computed unit tests for the round-5 operators: deterministic
dataset splitting, boilerplate-line removal, mode/MAD/OLS, event
entropy, and lag-1 autocorrelation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from h3_indexer_spark.operators.analytics import (
    event_type_entropy,
    lag1_autocorr,
)
from h3_indexer_spark.operators.curation import (
    assign_splits,
    boilerplate_lines,
    remove_boilerplate,
)
from h3_indexer_spark.operators.relational import (
    grouped_mad,
    grouped_mode,
    grouped_regression,
)


class TestAssignSplits:
    def test_fractions_validate(self, spark):
        df = spark.range(10).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError, match="> 1"):
            assign_splits(df, fractions={"a": 0.8, "b": 0.4})
        with pytest.raises(ValueError, match="non-empty"):
            assign_splits(df, fractions={})
        with pytest.raises(ValueError, match=">= 0"):
            assign_splits(df, fractions={"train": -0.1, "rest": 1.0})

    def test_membership_is_stable_under_growth(self, spark):
        """Adding documents must never move existing ones between
        splits — the property a random split lacks."""
        small = assign_splits(
            spark.range(500).withColumnRenamed("id", "doc_id")
        )
        big = assign_splits(
            spark.range(2000).withColumnRenamed("id", "doc_id")
        )
        s = {r.doc_id: r.split for r in small.collect()}
        b = {r.doc_id: r.split for r in big.collect()}
        assert all(b[k] == v for k, v in s.items())

    def test_proportions_roughly_match(self, spark):
        df = assign_splits(
            spark.range(20000).withColumnRenamed("id", "doc_id"),
            fractions={"train": 0.8, "val": 0.2},
        )
        n = {r.split: r["count"] for r in df.groupBy("split").count().collect()}
        assert abs(n["train"] / 20000 - 0.8) < 0.02
        assert set(n) == {"train", "val"}

    def test_salt_gives_independent_resplit(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in assign_splits(df).collect()}
        b = {
            r.doc_id: r.split
            for r in assign_splits(df, salt="v2").collect()
        }
        moved = sum(1 for k in a if a[k] != b[k])
        assert moved > 50  # ~9.5% expected to move between 90/5/5 splits


class TestBoilerplate:
    DOCS = [
        (1, "Real prose one.\nACCEPT ALL COOKIES\nMore prose."),
        (2, "Different text.\nACCEPT ALL COOKIES\nShare on FaceSpace"),
        (3, "Third document.\nACCEPT ALL COOKIES\nShare on FaceSpace"),
        (4, "Unique content only, nothing repeated here."),
    ]

    def test_detects_cross_doc_lines(self, spark):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        bp = {
            r.line: r.n_docs
            for r in boilerplate_lines(df, min_docs=2).collect()
        }
        assert bp == {
            "ACCEPT ALL COOKIES": 3,
            "Share on FaceSpace": 2,
        }

    def test_min_chars_excludes_short_lines(self, spark):
        df = spark.createDataFrame(
            [(1, "ok\nlong enough line"), (2, "ok\nlong enough line")],
            ["doc_id", "text"],
        )
        got = {r.line for r in boilerplate_lines(df, min_docs=2).collect()}
        assert got == {"long enough line"}

    def test_removal_preserves_order(self, spark):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        out = {
            r.doc_id: (r.clean_text, r.n_lines_removed)
            for r in remove_boilerplate(df, min_docs=2).collect()
        }
        assert out[1] == ("Real prose one.\nMore prose.", 1)
        assert out[2] == ("Different text.", 2)
        assert out[4] == (self.DOCS[3][1], 0)

    def test_delimiter_is_literal_not_regex(self, spark):
        """'|' is a regex alternation char — a raw F.split would
        explode every character; the contract is literal."""
        df = spark.createDataFrame(
            [(1, "alpha beta|repeated seg"), (2, "gamma delta|repeated seg")],
            ["doc_id", "text"],
        )
        got = {
            r.line
            for r in boilerplate_lines(
                df, min_docs=2, delimiter="|"
            ).collect()
        }
        assert got == {"repeated seg"}


class TestModeMadRegression:
    def test_mode_tiebreak_smallest_value(self, spark):
        df = spark.createDataFrame(
            [("a", 2.0), ("a", 2.0), ("a", 1.0), ("a", 1.0), ("a", 3.0),
             ("b", None), ("b", 5.0)],
            ["g", "v"],
        )
        got = {
            r.g: (r.mode, r.n_occurrences)
            for r in grouped_mode(df, ["g"], "v").collect()
        }
        assert got == {"a": (1.0, 2), "b": (5.0, 1)}

    def test_mad_hand_computed_and_robust(self, spark):
        # median 3, |devs| = [2,1,0,1,2] -> mad 1; outlier barely moves it
        df = spark.createDataFrame(
            [("a", float(v)) for v in [1, 2, 3, 4, 5]]
            + [("b", float(v)) for v in [1, 2, 3, 4, 1000]],
            ["g", "v"],
        )
        got = {r.g: (r.median, r.mad) for r in grouped_mad(df, ["g"], "v").collect()}
        assert got["a"] == (3.0, 1.0)
        assert got["b"] == (3.0, 1.0)  # outlier-insensitive

    def test_regression_recovers_exact_line(self, spark):
        df = spark.createDataFrame(
            [("a", float(x), 2.5 * x + 7.0) for x in range(10)]
            + [("deg", 1.0, 5.0), ("deg", 1.0, 6.0)],
            ["g", "x", "y"],
        )
        got = {r.g: r for r in grouped_regression(df, ["g"], "x", "y").collect()}
        assert got["a"].slope == pytest.approx(2.5, abs=1e-9)
        assert got["a"].intercept == pytest.approx(7.0, abs=1e-9)
        assert got["a"].r2 == pytest.approx(1.0, abs=1e-9)
        # zero x-variance -> all NULL
        assert got["deg"].slope is None
        assert got["deg"].intercept is None


class TestEntropyAutocorr:
    def test_entropy_uniform_and_degenerate(self, spark):
        rows = [(1, t) for t in ["a", "b", "c", "d"] * 5] + [(2, "a")] * 7
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        got = {r.user_id: r for r in event_type_entropy(df).collect()}
        assert got[1].entropy_nats == pytest.approx(math.log(4), abs=1e-12)
        assert got[1].n_types == 4 and got[1].n_events == 20
        assert got[2].entropy_nats == pytest.approx(0.0, abs=1e-12)

    def test_autocorr_alternating_and_monotone(self, spark):
        rows = []
        for i in range(20):  # user 1: alternating -> corr -1
            rows.append((i, 1, i, float(i % 2)))
        for i in range(20):  # user 2: linear -> corr +1
            rows.append((100 + i, 2, i, float(i)))
        df = spark.createDataFrame(
            rows, ["event_id", "user_id", "ts", "value"]
        )
        got = {r.user_id: r for r in lag1_autocorr(df).collect()}
        assert got[1].corr == pytest.approx(-1.0, abs=1e-9)
        assert got[2].corr == pytest.approx(1.0, abs=1e-9)
        assert got[1].n_rows == 19


class TestSnapshotDiff:
    def test_classifies_all_statuses(self, spark):
        from h3_indexer_spark.operators.relational import snapshot_diff

        old = spark.createDataFrame(
            [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"),
             (4, None, "D")],
            ["k", "price", "status_c"],
        )
        new = spark.createDataFrame(
            [(1, 10.0, "A"),          # unchanged
             (2, 25.0, "B"),          # changed (price)
             (4, None, "D"),          # unchanged (null == null, safe)
             (5, 50.0, "E")],         # added
            ["k", "price", "status_c"],
        )
        got = {
            r.k: r
            for r in snapshot_diff(
                old, new, ["k"], ["price", "status_c"]
            ).collect()
        }
        assert set(got) == {2, 3, 5}  # unchanged rows excluded
        assert got[2].status == "changed" and got[2].n_changed_cols == 1
        assert got[2].old_price == 20.0 and got[2].new_price == 25.0
        assert got[3].status == "removed"
        assert got[5].status == "added"

    def test_include_unchanged(self, spark):
        from h3_indexer_spark.operators.relational import snapshot_diff

        df = spark.createDataFrame([(1, 1.0)], ["k", "v"])
        out = snapshot_diff(df, df, ["k"], ["v"], include_unchanged=True)
        assert out.collect()[0].status == "unchanged"


class TestWeightedSample:
    def test_extreme_weights_and_determinism(self, spark):
        from h3_indexer_spark.operators.curation import weighted_sample

        df = (
            spark.range(4000)
            .withColumnRenamed("id", "doc_id")
            .withColumn("w", (F.col("doc_id") % 2).cast("double"))
        )
        kept = weighted_sample(df, "w")
        ids = {r.doc_id for r in kept.collect()}
        # weight 0 rows can never survive; weight 1 rows always do
        assert all(i % 2 == 1 for i in ids)
        assert len(ids) == 2000
        again = {r.doc_id for r in weighted_sample(df, "w").collect()}
        assert ids == again

    def test_keep_rate_tracks_weight(self, spark):
        from h3_indexer_spark.operators.curation import weighted_sample

        df = (
            spark.range(20000)
            .withColumnRenamed("id", "doc_id")
            .withColumn("w", F.lit(0.3))
        )
        n = weighted_sample(df, "w").count()
        assert abs(n / 20000 - 0.3) < 0.02


class TestRound5Properties:
    def test_snapshot_diff_reconstructs_new_table(self, spark):
        """Invariant: old + diff = new. Applying the diff to the old
        snapshot (drop removed, apply changed, add added) must
        reproduce the new snapshot exactly — the property that makes
        the diff a faithful CDC stream."""
        import random

        from h3_indexer_spark.operators.relational import snapshot_diff

        rng = random.Random(7)
        old_rows, new_rows = [], []
        for k in range(300):
            in_old = rng.random() < 0.8
            in_new = rng.random() < 0.8
            v_old = round(rng.uniform(0, 100), 2) if rng.random() < 0.9 else None
            v_new = (
                v_old
                if rng.random() < 0.5
                else (round(rng.uniform(0, 100), 2) if rng.random() < 0.9 else None)
            )
            s_old = rng.choice(["A", "B", None])
            s_new = s_old if rng.random() < 0.7 else rng.choice(["A", "B", None])
            if in_old:
                old_rows.append((k, v_old, s_old))
            if in_new:
                new_rows.append((k, v_new, s_new))
        schema = "k long, v double, s string"
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        diff = snapshot_diff(
            old, new, ["k"], ["v", "s"], include_unchanged=True
        ).collect()
        rebuilt = set()
        for r in diff:
            if r.status == "removed":
                continue
            rebuilt.add((r.k, r.new_v, r.new_s))
        assert rebuilt == {tuple(r) for r in new_rows}
        # and the status partition is total: every old/new key classified
        assert {r.k for r in diff} == {r[0] for r in old_rows} | {
            r[0] for r in new_rows
        }

    def test_weighted_sample_monotone_in_weight(self, spark):
        """For a fixed salt, raising every weight can only ADD rows
        (keep iff hash < floor(w·2^60) is monotone in w) — the
        property that makes threshold sweeps stable instead of
        reshuffling the kept set."""
        from h3_indexer_spark.operators.curation import weighted_sample

        df = (
            spark.range(5000)
            .withColumnRenamed("id", "doc_id")
            .withColumn(
                "w", (F.col("doc_id") % 100).cast("double") / 100.0
            )
        )
        lo = {
            r.doc_id
            for r in weighted_sample(df, F.col("w") * 0.5).collect()
        }
        hi = {r.doc_id for r in weighted_sample(df, "w").collect()}
        assert lo <= hi
        assert len(hi) > len(lo) > 0

    def test_entropy_invariant_under_type_relabeling(self, spark):
        """Shannon entropy depends only on the count multiset, not the
        labels — relabeling event types must not change any user's
        entropy."""
        from h3_indexer_spark.operators.analytics import event_type_entropy

        rows = [
            (u, t)
            for u in range(30)
            for t in ["a"] * (u % 4 + 1) + ["b"] * 2 + ["c"] * 1
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        relabeled = df.withColumn(
            "event_type", F.concat(F.lit("xx_"), F.col("event_type"))
        )
        a = {
            r.user_id: r.entropy_nats
            for r in event_type_entropy(df).collect()
        }
        b = {
            r.user_id: r.entropy_nats
            for r in event_type_entropy(relabeled).collect()
        }
        assert a == b
