"""Round-12 operator tests: the t-closeness report (completing the
k/l/t privacy trio), the Cochran-Armitage trend test, and the
one-vs-rest ROC AUC family (per-class + macro/weighted/micro
summary)."""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

import pytest


class TestTClosenessReport:
    @staticmethod
    def _reference(data):
        """Exact rational ordered-EMD per class via Fraction — an
        independent formulation (per-category prefix sums in Python
        ints) of the engine's BIGINT fold."""
        glob = Counter(
            v for vs in data.values() for v in vs if v is not None
        )
        cats = sorted(glob)
        big_n = sum(glob.values())
        m = len(cats)
        out = {}
        for g, vals in data.items():
            c = Counter(v for v in vals if v is not None)
            n = sum(c.values())
            if n == 0:
                continue
            if m == 1:
                out[g] = (Fraction(0), n, len(vals))
                continue
            s = 0
            acc = 0
            for cat in cats:
                s += c.get(cat, 0) * big_n - glob[cat] * n
                acc += abs(s)
            out[g] = (Fraction(acc, n * big_n * (m - 1)), n, len(vals))
        return out

    def _run(self, spark, data, **kw):
        from h3_indexer_spark.operators.curation import t_closeness_report

        rows = [(g, v) for g, vs in data.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, s string")
        return t_closeness_report(df, ["g"], "s", **kw).collect()

    def test_matches_exact_rational_reference(self, spark):
        data = {
            "skew": ["x"] * 8 + ["y"] + ["z"],
            "flat": ["x"] * 3 + ["y"] * 4 + ["z"] * 3,
            "nullish": ["x"] * 2 + [None] * 3 + ["z"] * 2,
        }
        ref = self._reference(data)
        out = self._run(spark, data, t_max=0.0, n_buckets=20)
        # rebuild the histogram from the reference and compare
        want = Counter()
        for g, (emd, _n, sz) in ref.items():
            if emd > 0:
                b = min(int(emd * 20), 19)
                want[b] += sz
        got = {r["t_bucket"]: r["n_rows"] for r in out}
        assert got == dict(want)
        # the per-bucket min/max are ROUND-9 of exact rationals
        for r in out:
            emds = sorted(
                float(e)
                for e, _n, sz in ref.values()
                if e > 0 and min(int(e * 20), 19) == r["t_bucket"]
            )
            assert r["min_emd"] == round(emds[0], 9)
            assert r["max_emd"] == round(emds[-1], 9)

    def test_identical_class_has_zero_emd(self, spark):
        # one class IS the whole corpus -> its distribution equals
        # the global one exactly -> emd 0 -> never a violation
        data = {"only": ["a"] * 5 + ["b"] * 3 + ["c"] * 2}
        out = self._run(spark, data, t_max=0.0)
        assert out == []

    def test_single_category_degenerates_to_zero(self, spark):
        # m == 1: both distributions are the single point mass
        data = {"g1": ["a"] * 4, "g2": ["a"] * 6}
        assert self._run(spark, data, t_max=0.0) == []

    def test_all_null_sensitive_class_skipped(self, spark):
        data = {"g1": ["a", "b"], "allnull": [None, None, None]}
        out = self._run(spark, data, t_max=0.0)
        assert all(r["n_rows"] != 3 for r in out)

    def test_null_rows_count_toward_risk_size(self, spark):
        # class with NULLs: distribution over non-nulls, but n_rows
        # reports the FULL class size
        data = {
            "mix": ["a"] * 4 + [None] * 2,
            "other": ["b"] * 6,
        }
        out = self._run(spark, data, t_max=0.0)
        assert sum(r["n_rows"] for r in out) == 12

    def test_max_skew_reads_one(self, spark):
        # a class at one extreme of a two-category corpus where the
        # OTHER class is enormous: emd -> |class - global| close to 1
        data = {"lo": ["a"] * 5, "hi": ["b"] * 5}
        ref = self._reference(data)
        out = self._run(spark, data, t_max=0.4)
        assert len(out) == 1  # both classes in the same bucket
        assert out[0]["min_emd"] == round(float(ref["lo"][0]), 9) == 0.5

    def test_rejects_bad_args(self, spark):
        from h3_indexer_spark.operators.curation import t_closeness_report

        df = spark.createDataFrame([("g", "a")], "g string, s string")
        with pytest.raises(ValueError):
            t_closeness_report(df, [], "s")
        with pytest.raises(ValueError):
            t_closeness_report(df, ["g"], "s", t_max=1.0)
        with pytest.raises(ValueError):
            t_closeness_report(df, ["g"], "s", n_buckets=0)


class TestCochranArmitageTrend:
    def _run(self, spark, tables):
        """tables: dict group -> {score: (n, positives)}."""
        from h3_indexer_spark.operators.analytics import (
            cochran_armitage_trend,
        )

        rows = []
        for g, t in tables.items():
            for s, (n, r) in t.items():
                rows += [(g, True, s)] * r + [(g, False, s)] * (n - r)
        df = spark.createDataFrame(rows, "g string, y boolean, s int")
        return {
            r["g"]: r.asDict()
            for r in cochran_armitage_trend(df, ["g"], "y", "s").collect()
        }

    @staticmethod
    def _reference(t):
        n = sum(nn for nn, _ in t.values())
        r = sum(rr for _, rr in t.values())
        a = sum(s * rr for s, (_, rr) in t.items())
        b = sum(s * nn for s, (nn, _) in t.items())
        c = sum(s * s * nn for s, (nn, _) in t.items())
        d1 = n * a - r * b
        d2 = n * c - b * b
        if r == 0 or r == n or d2 == 0:
            return d1, d2, None
        return d1, d2, n * d1 * d1 / (r * (n - r) * d2)

    def test_matches_integer_reference(self, spark):
        tables = {
            "rising": {0: (10, 2), 1: (10, 5), 2: (10, 8)},
            "falling": {0: (8, 7), 1: (8, 4), 2: (8, 1)},
            "flat": {0: (6, 3), 1: (6, 3), 2: (6, 3)},
        }
        out = self._run(spark, tables)
        for g, t in tables.items():
            d1, d2, z2 = self._reference(t)
            assert out[g]["d1"] == d1 and out[g]["d2"] == d2
            assert out[g]["z2"] == (None if z2 is None else round(z2, 9))
            assert out[g]["trend_sign"] == (d1 > 0) - (d1 < 0)
        assert out["rising"]["trend_sign"] == 1
        assert out["falling"]["trend_sign"] == -1
        assert out["flat"]["z2"] == 0.0

    def test_degenerate_groups_null_z2(self, spark):
        out = self._run(
            spark,
            {
                "allpos": {0: (3, 3), 1: (3, 3)},   # R = N
                "allneg": {0: (3, 0), 1: (3, 0)},   # R = 0
                "onelevel": {2: (6, 3)},             # d2 = 0
            },
        )
        for g in ("allpos", "allneg", "onelevel"):
            assert out[g]["z2"] is None, g
        assert out["onelevel"]["m_levels"] == 1

    def test_score_shift_invariance(self, spark):
        # Cochran-Armitage is invariant to shifting all scores by a
        # constant (d1/d2 change, z2 does not)
        base = {0: (10, 2), 1: (10, 5), 2: (10, 8)}
        shifted = {s + 7: nr for s, nr in base.items()}
        out = self._run(spark, {"a": base, "b": shifted})
        assert out["a"]["z2"] == out["b"]["z2"] is not None

    def test_null_rows_excluded(self, spark):
        from h3_indexer_spark.operators.analytics import (
            cochran_armitage_trend,
        )

        df = spark.createDataFrame(
            [("g", True, 0), ("g", None, 1), ("g", False, None),
             ("g", False, 1)],
            "g string, y boolean, s int",
        )
        out = cochran_armitage_trend(df, ["g"], "y", "s").collect()
        assert out[0]["n"] == 2

    def test_rejects_empty_groups(self, spark):
        from h3_indexer_spark.operators.analytics import (
            cochran_armitage_trend,
        )

        df = spark.createDataFrame(
            [("g", True, 0)], "g string, y boolean, s int"
        )
        with pytest.raises(ValueError):
            cochran_armitage_trend(df, [], "y", "s")


class TestRocAucOvr:
    DATA = [
        ("a", 0.9, 1), ("a", 0.8, 1), ("a", 0.3, 0), ("a", 0.7, 0),
        ("b", 0.6, 1), ("b", 0.2, 0), ("b", 0.6, 0), ("b", 0.1, 1),
        ("c", 0.5, 0), ("c", 0.4, 0),
    ]

    @staticmethod
    def _auc(pairs):
        pos = [s for s, y in pairs if y]
        neg = [s for s, y in pairs if not y]
        if not pos or not neg:
            return None
        wins = sum(
            (p > q) + 0.5 * (p == q) for p in pos for q in neg
        )
        return wins / (len(pos) * len(neg))

    def test_per_class_matches_pairwise_reference(self, spark):
        from h3_indexer_spark.operators.analytics import roc_auc_ovr

        df = spark.createDataFrame(
            self.DATA, "cls string, score double, label int"
        )
        out = {
            r["class"]: r.asDict()
            for r in roc_auc_ovr(df, "cls", "score", "label").collect()
        }
        for cls in "abc":
            want = self._auc([(s, y) for c, s, y in self.DATA if c == cls])
            got = out[cls]["auc"]
            assert got == (None if want is None else round(want, 9)), cls

    def test_summary_modes_match_reference(self, spark):
        from h3_indexer_spark.operators.analytics import (
            roc_auc_ovr_summary,
        )

        df = spark.createDataFrame(
            self.DATA, "cls string, score double, label int"
        )
        out = {
            r["avg_mode"]: r.asDict()
            for r in roc_auc_ovr_summary(
                df, "cls", "score", "label"
            ).collect()
        }
        aucs = {}
        npos = {}
        for cls in "abc":
            pairs = [(s, y) for c, s, y in self.DATA if c == cls]
            aucs[cls] = self._auc(pairs)
            npos[cls] = sum(y for _, y in pairs)
        defined = [c for c in aucs if aucs[c] is not None]
        macro = sum(round(aucs[c], 9) for c in defined) / len(defined)
        wsum = sum(npos[c] * round(aucs[c], 9) for c in defined)
        weighted = wsum / sum(npos[c] for c in defined)
        micro = self._auc([(s, y) for _, s, y in self.DATA])
        assert out["macro"]["auc"] == round(macro, 9)
        assert out["weighted"]["auc"] == round(weighted, 9)
        assert out["micro"]["auc"] == round(micro, 9)
        assert out["macro"]["n_classes"] == 3
        assert out["macro"]["n_defined"] == 2
        # support semantics: defined-pos for macro/weighted, pooled
        # positives for micro
        assert out["macro"]["support"] == sum(npos[c] for c in defined)
        assert out["micro"]["support"] == sum(
            y for _, _, y in self.DATA
        )

    def test_perfect_scorer_identity(self, spark):
        """For a perfect per-class scorer every mode reads exactly
        1.0 — the family's built-in self-check."""
        from h3_indexer_spark.operators.analytics import (
            roc_auc_ovr_summary,
        )

        rows = []
        for i in range(12):
            true_cls = "xyz"[i % 3]
            for cls in "xyz":
                rows.append(
                    (cls, 1.0 if cls == true_cls else 0.0,
                     int(cls == true_cls))
                )
        df = spark.createDataFrame(
            rows, "cls string, score double, label int"
        )
        out = {
            r["avg_mode"]: r["auc"]
            for r in roc_auc_ovr_summary(
                df, "cls", "score", "label"
            ).collect()
        }
        assert out == {"macro": 1.0, "weighted": 1.0, "micro": 1.0}

    def test_no_defined_class_reports_null(self, spark):
        from h3_indexer_spark.operators.analytics import (
            roc_auc_ovr_summary,
        )

        df = spark.createDataFrame(
            [("a", 0.5, 1), ("b", 0.2, 1)],
            "cls string, score double, label int",
        )
        out = roc_auc_ovr_summary(df, "cls", "score", "label").collect()
        assert {r["avg_mode"]: r["auc"] for r in out} == {
            "macro": None, "weighted": None, "micro": None,
        }


class TestBasketExplodeMiners:
    """Round-12 optimization: the pair miners' basket-local explode
    front end (_capped_baskets) replaced the distinct + basket-keyed
    self-join. These lock the internals the refactor changed:
    duplicate (basket, item) input rows must still collapse (the
    former .distinct(), now collect_set), the mega-basket cap must
    count DISTINCT items (not input rows), and the eager
    log_exclusions path must keep the identical cap semantics."""

    def test_assoc_rules_duplicate_rows_collapse(self, spark):
        from h3_indexer_spark.operators.mining import association_rules

        # basket 1 carries x twice — supports/joints must count it once
        rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y"),
                (3, "x")]
        df = spark.createDataFrame(rows, "b long, i string")
        out = {
            (r["antecedent"], r["consequent"]): (
                r["n_joint"], r["n_antecedent"], r["confidence"], r["lift"]
            )
            for r in association_rules(
                df, "b", "i", min_support=2, k=10
            ).collect()
        }
        # joint {x,y} in baskets 1 and 2; sup x=3, y=2, N=3
        assert out[("x", "y")] == (2, 3, 2 / 3, (2 * 3) / (3 * 2))
        assert out[("y", "x")] == (2, 2, 1.0, (2 * 3) / (3 * 2))
        assert set(out) == {("x", "y"), ("y", "x")}

    def test_cap_counts_distinct_items_eager_log_path(self, spark):
        from h3_indexer_spark.operators.mining import item_cf_similarity

        # basket 1: 6 input rows but only 5 DISTINCT items -> survives
        # a cap of 5; basket 2: 6 distinct items -> excluded. Runs the
        # log_exclusions=True (eager localCheckpoint + census) path.
        rows = (
            [(1, f"i{k}") for k in range(5)] + [(1, "i0")]
            + [(2, f"j{k}") for k in range(6)]
            + [(3, "i0"), (3, "i1"), (4, "i0"), (4, "i1")]
        )
        df = spark.createDataFrame(rows, "b long, i string")
        out = item_cf_similarity(
            df, "b", "i", min_joint=2, max_basket_size=5,
            log_exclusions=True,
        ).collect()
        pairs = {(r["item_a"], r["item_b"]): r["n_joint"] for r in out}
        # basket 2 gone; (i0,i1) co-occurs in baskets 1, 3, 4
        assert pairs[("i0", "i1")] == 3
        assert all(not a.startswith("j") for a, _ in pairs)

    def test_item_cf_matches_bruteforce_pairs(self, spark):
        from itertools import combinations

        from h3_indexer_spark.operators.mining import item_cf_similarity

        baskets = {
            1: {"a", "b", "c"},
            2: {"b", "c", "d"},
            3: {"a", "c"},
            4: {"c", "d"},
            5: {"a"},
        }
        joint = Counter()
        for items in baskets.values():
            for x, y in combinations(sorted(items), 2):
                joint[(x, y)] += 1
        sup = Counter()
        for items in baskets.values():
            sup.update(items)
        rows = [(b, i) for b, items in baskets.items() for i in items]
        df = spark.createDataFrame(rows, "b long, i string")
        out = item_cf_similarity(df, "b", "i", min_joint=1, k=100).collect()
        got = {
            (r["item_a"], r["item_b"]): (r["n_joint"], r["n_a"], r["n_b"])
            for r in out
        }
        want = {
            p: (nj, sup[p[0]], sup[p[1]]) for p, nj in joint.items()
        }
        assert got == want
