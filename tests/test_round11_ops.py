"""Round-11 operator tests: the q_triangles pins_out release path
(VERDICT r10 #6), Fisher's exact test, the k-anonymity generalization
ladder, the macro/micro classification summary, and the
q_seq_patterns_full contract plumbing."""

from __future__ import annotations

import pytest


class TestTrianglesPinsOut:
    @pytest.mark.slow
    def test_pins_out_releases_executor_storage(self, spark):
        """VERDICT r10 #6: the pinned near-dup pair table is released
        through the miner's pins_out idiom — callers iterating over
        many datasets unpersist exactly this pin, never clearCache."""
        from h3_indexer_spark.queries import triangles_over_neardup_graph

        from tests.conftest import SF_SMALL

        pins = []
        out = triangles_over_neardup_graph(spark, SF_SMALL, pins_out=pins)
        out.count()  # materialize: the pin is lazy until an action
        assert len(pins) == 1
        assert pins[0].storageLevel.useMemory
        for p in pins:
            p.unpersist()
        assert not pins[0].storageLevel.useMemory

    def test_default_path_unchanged(self, spark):
        """q_triangles (the contract key) still routes through the
        same plan with no pins_out plumbing visible to the driver."""
        from h3_indexer_spark.queries import QUERIES

        from tests.conftest import SF_SMALL

        df = QUERIES["q_triangles"](spark, SF_SMALL)
        assert set(df.columns) == {"vertex", "n_triangles"}


class TestFisherExact:
    @staticmethod
    def _reference(n, r1, c1, k):
        """Exact rational two-sided Fisher p via math.comb + Fraction
        (an independent formulation: closed-form binomials, not the
        engine's multiplicative fold)."""
        from fractions import Fraction
        from math import comb

        ws = [
            comb(r1, kk) * comb(n - r1, c1 - kk)
            for kk in range(max(0, r1 + c1 - n), min(r1, c1) + 1)
        ]
        w_obs = comb(r1, k) * comb(n - r1, c1 - k)
        return Fraction(sum(w for w in ws if w <= w_obs), sum(ws))

    def _run(self, spark, cells):
        """cells: dict group -> (n11, n12, n21, n22); returns
        {group: row} from fisher_exact over the expanded rows."""
        from h3_indexer_spark.operators.analytics import fisher_exact

        rows = []
        for g, (n11, n12, n21, n22) in cells.items():
            rows += [(g, True, True)] * n11 + [(g, True, False)] * n12
            rows += [(g, False, True)] * n21 + [(g, False, False)] * n22
        df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
        return {
            r["g"]: r for r in fisher_exact(df, ["g"], "a", "b").collect()
        }

    def test_matches_exact_rational_reference(self, spark):
        from fractions import Fraction

        cells = {
            "tea": (3, 1, 1, 3),          # Fisher's tea test: p=17/35
            "indep": (5, 5, 5, 5),
            "assoc": (7, 1, 1, 7),
            "edge_all_a": (4, 0, 3, 0),   # c1 = n: degenerate margin
            "tiny": (1, 0, 0, 1),
        }
        out = self._run(spark, cells)
        for g, (n11, n12, n21, n22) in cells.items():
            r = out[g]
            n = n11 + n12 + n21 + n22
            want = self._reference(n, n11 + n12, n11 + n21, n11)
            got = Fraction(r["p_num"], r["p_den"])
            assert got == want, (g, got, want)
            assert r["p_value"] == round(float(want), 9)
            assert (r["n11"], r["n12"], r["n21"], r["n22"]) == (
                n11, n12, n21, n22,
            )
        assert out["tea"]["p_num"] == 34 and out["tea"]["p_den"] == 70

    def test_odds_ratio_and_zero_cell_null(self, spark):
        out = self._run(spark, {"x": (6, 2, 3, 4), "z": (4, 0, 3, 2)})
        assert out["x"]["odds_ratio"] == round((6 * 4) / (2 * 3), 9)
        assert out["z"]["odds_ratio"] is None  # zero n12 -> undefined

    def test_over_bound_group_reports_null_p(self, spark):
        from h3_indexer_spark.operators.analytics import (
            FISHER_MAX_N,
            fisher_exact,
        )

        rows = [("big", i % 2 == 0, i % 3 == 0) for i in range(61)]
        rows += [("ok", i % 2 == 0, i % 3 == 0) for i in range(60)]
        df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
        out = {
            r["g"]: r for r in fisher_exact(df, ["g"], "a", "b").collect()
        }
        assert FISHER_MAX_N == 60
        assert out["big"]["p_value"] is None  # n=61: past the exact domain
        assert out["big"]["n"] == 61          # counts still reported
        assert out["ok"]["p_value"] is not None

    def test_over_bound_extreme_margins_no_ansi_overflow(self, spark):
        """Regression (round-12): the n <= FISHER_MAX_N guard must
        wrap the weight CONSTRUCTION, not just the p readout. An
        n=100 group with an all-true a_col forces C(100, c1) weights
        (~1e29, far past BIGINT); before the fix the unconditional
        fold crashed the whole query with ARITHMETIC_OVERFLOW under
        ANSI mode (Spark 4 default) instead of reporting NULL p."""
        from h3_indexer_spark.operators.analytics import fisher_exact

        rows = [("huge", True, i < 50) for i in range(100)]
        rows += [("ok", i % 2 == 0, i % 3 == 0) for i in range(20)]
        df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
        out = {
            r["g"]: r for r in fisher_exact(df, ["g"], "a", "b").collect()
        }
        assert out["huge"]["p_value"] is None
        assert out["huge"]["p_num"] is None
        assert out["huge"]["n"] == 100  # counts still reported
        assert out["ok"]["p_value"] is not None

    def test_at_bound_no_bigint_overflow(self, spark):
        """n=60 with the worst-case balanced margins exercises the
        largest weights (C(60,30) ~ 1.18e17) and the largest fold
        intermediate (~7.1e18, just under 2^63): the exact rational
        must still come out right."""
        from fractions import Fraction

        out = self._run(spark, {"w": (15, 15, 15, 15)})
        want = self._reference(60, 30, 30, 15)
        assert Fraction(out["w"]["p_num"], out["w"]["p_den"]) == want

    def test_null_rows_excluded(self, spark):
        from h3_indexer_spark.operators.analytics import fisher_exact

        df = spark.createDataFrame(
            [("g", True, True), ("g", None, True), ("g", False, None)],
            "g string, a boolean, b boolean",
        )
        out = fisher_exact(df, ["g"], "a", "b").collect()
        assert out[0]["n"] == 1

    def test_rejects_empty_groups(self, spark):
        from h3_indexer_spark.operators.analytics import fisher_exact

        df = spark.createDataFrame([("g", True, True)],
                                   "g string, a boolean, b boolean")
        with pytest.raises(ValueError):
            fisher_exact(df, [], "a", "b")


class TestClassificationSummary:
    def _summary(self, spark, pairs):
        from h3_indexer_spark.operators.analytics import (
            classification_summary,
        )

        df = spark.createDataFrame(pairs, "label string, pred string")
        return {
            r["avg_mode"]: r
            for r in classification_summary(df, "label", "pred").collect()
        }

    def test_micro_equals_accuracy_identity(self, spark):
        pairs = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
                 ("c", "a"), ("c", "c")]
        out = self._summary(spark, pairs)
        acc = round(4 / 6, 9)
        m = out["micro"]
        assert (m["precision"], m["recall"], m["f1"]) == (acc, acc, acc)
        assert m["support"] == 6 and m["n_classes"] == 3

    def test_macro_and_weighted_match_hand_computation(self, spark):
        # per-class (sklearn-checked shape): a: tp=1 fp=1 fn=1;
        # b: tp=2 fp=1 fn=0; c: tp=1 fp=0 fn=1
        pairs = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
                 ("c", "a"), ("c", "c")]
        out = self._summary(spark, pairs)
        p = {"a": round(1 / 2, 9), "b": round(2 / 3, 9), "c": 1.0}
        r = {"a": round(1 / 2, 9), "b": 1.0, "c": round(1 / 2, 9)}
        f = {"a": round(2 / 4, 9), "b": round(4 / 5, 9),
             "c": round(2 / 3, 9)}
        w = {"a": 2, "b": 2, "c": 2}
        assert out["macro"]["precision"] == round(sum(p.values()) / 3, 9)
        assert out["macro"]["recall"] == round(sum(r.values()) / 3, 9)
        assert out["macro"]["f1"] == round(sum(f.values()) / 3, 9)
        assert out["weighted"]["precision"] == round(
            sum(w[c] * p[c] for c in p) / 6, 9
        )
        assert out["weighted"]["f1"] == round(
            sum(w[c] * f[c] for c in f) / 6, 9
        )

    def test_pred_only_class_contributes_zero_not_null(self, spark):
        # 'z' never appears as a label: recall/f1 undefined -> 0 in
        # the macro mean (sklearn zero_division=0), weight 0 in the
        # weighted mean
        pairs = [("a", "a"), ("a", "z")]
        out = self._summary(spark, pairs)
        assert out["macro"]["n_classes"] == 2
        # a: p=1, r=1/2, f=2/3; z: p=0 (tp=0/np=1), r->0, f->0
        assert out["macro"]["recall"] == round((0.5 + 0.0) / 2, 9)
        assert out["weighted"]["recall"] == round(0.5, 9)


class TestKAnonymityGeneralize:
    def test_first_clean_level_is_chosen(self, spark):
        from pyspark.sql import functions as F

        from h3_indexer_spark.operators.curation import (
            k_anonymity_generalize,
        )

        # 4 cities x 3 rows: city-level classes violate k=4, the
        # region level (2 regions x 6 rows) passes
        rows = [(c, c[0]) for c in
                ["aa", "ab", "ba", "bb"] for _ in range(3)]
        df = spark.createDataFrame(rows, "city string, region string")
        out = k_anonymity_generalize(
            df,
            [("city", [F.col("city")]), ("region", ["region"])],
            k=4,
        ).collect()
        assert [r["level"] for r in out] == [0, 1]
        assert out[0]["n_violations"] == 4 and out[0]["is_chosen"] == 0
        assert out[0]["rows_at_risk"] == 12
        assert out[1]["n_violations"] == 0 and out[1]["is_chosen"] == 1
        assert out[1]["min_class_size"] == 6

    def test_no_level_clean_means_no_chosen(self, spark):
        from h3_indexer_spark.operators.curation import (
            k_anonymity_generalize,
        )

        df = spark.createDataFrame(
            [("x", "u")], "city string, region string"
        )
        out = k_anonymity_generalize(
            df, [("city", ["city"]), ("region", ["region"])], k=2
        ).collect()
        assert all(r["is_chosen"] == 0 for r in out)

    def test_rejects_bad_args(self, spark):
        from h3_indexer_spark.operators.curation import (
            k_anonymity_generalize,
        )

        df = spark.createDataFrame([("x",)], "c string")
        with pytest.raises(ValueError):
            k_anonymity_generalize(df, [], k=2)
        with pytest.raises(ValueError):
            k_anonymity_generalize(df, [("a", ["c"])], k=1)
        with pytest.raises(ValueError):
            k_anonymity_generalize(df, [("a", [])], k=2)


class TestLDiversityReport:
    def test_histogram_and_null_conventions(self, spark):
        from h3_indexer_spark.operators.curation import l_diversity_report

        rows = (
            [("g1", "s1")] * 3                 # 1 distinct -> violation
            + [("g2", "s1"), ("g2", "s2")]     # 2 distinct -> violation
            + [("g3", "s1"), ("g3", "s2"), ("g3", "s3")]  # 3 -> diverse
            + [("g4", None), ("g4", None)]     # all-NULL -> 0 distinct
        )
        df = spark.createDataFrame(rows, "q string, s string")
        out = {
            r["n_distinct_sensitive"]: r
            for r in l_diversity_report(df, ["q"], "s", l_min=3).collect()
        }
        assert set(out) == {0, 1, 2}
        assert out[0]["n_groups"] == 1 and out[0]["n_rows"] == 2
        assert out[1]["n_groups"] == 1 and out[1]["n_rows"] == 3
        assert out[2]["n_groups"] == 1 and out[2]["n_rows"] == 2

    def test_diverse_dataset_yields_empty_report(self, spark):
        from h3_indexer_spark.operators.curation import l_diversity_report

        df = spark.createDataFrame(
            [("g", "s1"), ("g", "s2")], "q string, s string"
        )
        assert l_diversity_report(df, ["q"], "s", l_min=2).count() == 0

    def test_rejects_bad_args(self, spark):
        from h3_indexer_spark.operators.curation import l_diversity_report

        df = spark.createDataFrame([("g", "s")], "q string, s string")
        with pytest.raises(ValueError):
            l_diversity_report(df, [], "s", l_min=2)
        with pytest.raises(ValueError):
            l_diversity_report(df, ["q"], "s", l_min=1)


class TestFisherExactProperty:
    def test_random_tables_match_rational_reference(self, spark):
        """Property: for a batch of seed-derived random 2x2 tables
        spanning the whole exactness domain (n in [1, 60], arbitrary
        margins incl. degenerate zero rows/columns), the engine's
        p_num/p_den rational equals the math.comb + Fraction
        reference exactly — not approximately."""
        import random
        from fractions import Fraction

        rng = random.Random(1106)
        cells = {}
        for i in range(40):
            n = rng.randint(1, 60)
            n11 = rng.randint(0, n)
            n12 = rng.randint(0, n - n11)
            n21 = rng.randint(0, n - n11 - n12)
            n22 = n - n11 - n12 - n21
            cells[f"t{i}"] = (n11, n12, n21, n22)
        out = TestFisherExact()._run(spark, cells)
        for g, (n11, n12, n21, n22) in cells.items():
            n = n11 + n12 + n21 + n22
            want = TestFisherExact._reference(
                n, n11 + n12, n11 + n21, n11
            )
            got = Fraction(out[g]["p_num"], out[g]["p_den"])
            assert got == want, (g, cells[g], got, want)
            assert 0 < got <= 1


class TestRound11Properties:
    def test_ladder_monotone_under_true_coarsening(self, spark):
        """Property: along a TRUE coarsening chain (each level's key
        function factors through the previous level's), merging
        classes can only grow them, so n_violations and rows_at_risk
        are non-increasing level over level. (The contract ladder's
        1000 -> 2000 bucket step and the column drops are true
        coarsenings; this locks the invariant the chosen-level
        semantics lean on.)"""
        import random

        from pyspark.sql import functions as F

        from h3_indexer_spark.operators.curation import (
            k_anonymity_generalize,
        )

        rng = random.Random(1107)
        rows = [
            (rng.randint(0, 7), rng.randint(0, 39) * 100.0)
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows, "region int, bal double")

        def bucket(w):
            return (
                F.floor(F.col("bal") / F.lit(w)).cast("bigint").alias("b")
            )

        # 500 -> 1000 -> 4000 each divides the next: true coarsening;
        # then drop the bucket, then drop everything but a constant
        out = k_anonymity_generalize(
            df,
            [
                ("b500", [F.col("region"), bucket(500.0)]),
                ("b1000", [F.col("region"), bucket(1000.0)]),
                ("b4000", [F.col("region"), bucket(4000.0)]),
                ("region", [F.col("region")]),
                ("all", [F.lit(1).alias("one")]),
            ],
            k=6,
        ).collect()
        viols = [r["n_violations"] for r in out]
        risks = [r["rows_at_risk"] for r in out]
        assert viols == sorted(viols, reverse=True), viols
        assert risks == sorted(risks, reverse=True), risks
        # the coarsest level (everything in one class of 400 >= 6)
        # is always clean, so a chosen level exists
        assert out[-1]["n_violations"] == 0
        assert sum(r["is_chosen"] for r in out) == 1

    def test_summary_identities_on_random_draws(self, spark):
        """Property: on random (label, pred) draws — micro = accuracy
        exactly; with a PERFECT classifier every mean is 1.0; macro
        and weighted coincide when class supports are equal."""
        import random

        from h3_indexer_spark.operators.analytics import (
            classification_summary,
        )

        rng = random.Random(1108)
        classes = ["a", "b", "c", "d"]
        # equal supports: 25 rows per true class, random predictions
        pairs = [
            (c, rng.choice(classes)) for c in classes for _ in range(25)
        ]
        df = spark.createDataFrame(pairs, "label string, pred string")
        out = {
            r["avg_mode"]: r
            for r in classification_summary(df, "label", "pred").collect()
        }
        acc = round(
            sum(1 for lb, pr in pairs if lb == pr) / len(pairs), 9
        )
        assert out["micro"]["f1"] == acc
        # equal supports make weighted == macro (same mean, weights
        # cancel); both computed over ROUND-9 per-class inputs, so the
        # equality is exact up to the final ROUND-9 of sums whose
        # terms differ only by the constant 25x weight / 100 divisor
        assert abs(out["weighted"]["f1"] - out["macro"]["f1"]) < 2e-9
        perfect = spark.createDataFrame(
            [(c, c) for c in classes for _ in range(5)],
            "label string, pred string",
        )
        pout = {
            r["avg_mode"]: r
            for r in classification_summary(
                perfect, "label", "pred"
            ).collect()
        }
        for mode in ("macro", "micro", "weighted"):
            assert pout[mode]["precision"] == 1.0
            assert pout[mode]["f1"] == 1.0
