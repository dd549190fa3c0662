"""Round-7 fixes and operators: vectorized k-ring disks, k-core
convergence guard, guaranteed-one-row A/B readouts, PQ empty-input
guard, and the slimmed point-in-polygon candidate shuffle."""

from __future__ import annotations

import numpy as np
import pytest


class TestCellDiskBatch:
    """cell_disk_batch must equal the per-point set expansion it
    replaced (ring i+1 = neighbors(ring <= i), set-deduped)."""

    @staticmethod
    def _disk_reference(cells, k):
        from h3_indexer_spark.functions.h3.coverage import (
            cell_neighbors_batch,
        )

        disks = [{int(c)} for c in cells]
        frontier = [list(d) for d in disks]
        for _ in range(k):
            flat = np.asarray(
                [c for f in frontier for c in f], dtype="int64"
            )
            if not len(flat):
                break
            nbrs = cell_neighbors_batch(flat)
            pos = 0
            new_frontier = []
            for i, f in enumerate(frontier):
                fresh = set()
                for _j in range(len(f)):
                    for x in nbrs[pos]:
                        if x and int(x) not in disks[i]:
                            fresh.add(int(x))
                    pos += 1
                disks[i] |= fresh
                new_frontier.append(list(fresh))
            frontier = new_frontier
        return [sorted(d) for d in disks]

    @pytest.mark.parametrize("k", [0, 1, 2, 3])
    def test_matches_set_expansion(self, k):
        from h3_indexer_spark.functions.h3.coverage import (
            cell_disk_batch,
        )
        from h3_indexer_spark.functions.h3.vectorized import (
            latlng_to_cell_batch,
        )

        rng = np.random.RandomState(7)
        lat = rng.uniform(-85, 85, 200)
        lng = rng.uniform(-180, 180, 200)
        for res in (3, 7):
            cells = np.asarray(
                latlng_to_cell_batch(lat, lng, res), dtype="int64"
            )
            got = cell_disk_batch(cells, k)
            want = self._disk_reference(cells, k)
            assert got.shape[0] == len(cells)
            for row, w in zip(got, want):
                vals = [int(v) for v in row if v != 0]
                assert vals == w
            # hexagon bound on the padded width
            assert got.shape[1] <= 1 + 3 * k * (k + 1)

    def test_includes_pentagon_neighborhoods(self):
        """Disks centered on the res-3 pentagons stay consistent with
        the reference expansion (fallback-probe path)."""
        from h3_indexer_spark.functions.h3 import core
        from h3_indexer_spark.functions.h3.coverage import (
            cell_disk_batch,
        )
        from h3_indexer_spark.functions.h3.vectorized import _PENTAGONS

        cells = []
        for bc in list(_PENTAGONS)[:4]:
            # mode 1, res 3, base cell bc, digits 1-3 = 0 (center
            # child chain -> a true pentagon cell), digits 4-15 = 7
            h = (
                (1 << 59) | (3 << 52) | (int(bc) << 45)
                | ((1 << 36) - 1)
            )
            assert core.get_resolution(h) == 3
            cells.append(h)
        cells = np.asarray(cells, dtype="int64")
        got = cell_disk_batch(cells, 2)
        want = self._disk_reference(cells, 2)
        for row, w in zip(got, want):
            assert [int(v) for v in row if v != 0] == w

    def test_empty_input(self):
        from h3_indexer_spark.functions.h3.coverage import (
            cell_disk_batch,
        )

        out = cell_disk_batch(np.asarray([], dtype="int64"), 1)
        assert out.shape[0] == 0


class TestKCoreConvergenceGuard:
    def test_path_graph_nonconvergence_raises(self, spark):
        """A 60-vertex path at k=2 peels one endpoint pair per round —
        with max_iter far below the ~n/2 rounds needed the call must
        RAISE, never return the partial (superset) peel."""
        from h3_indexer_spark.operators.graph import k_core

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(60)], "src long, dst long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            k_core(edges, 2, max_iter=3)

    def test_path_graph_converges_to_empty(self, spark):
        from h3_indexer_spark.operators.graph import k_core

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(20)], "src long, dst long"
        )
        assert k_core(edges, 2, max_iter=100).count() == 0

    def test_clique_plus_tail(self, spark):
        from h3_indexer_spark.operators.graph import k_core

        clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        tail = [(3, 10), (10, 11), (11, 12)]
        edges = spark.createDataFrame(
            clique + tail, "src long, dst long"
        )
        rows = {
            r["vertex"]: r["degree"]
            for r in k_core(edges, 3).collect()
        }
        assert rows == {0: 3, 1: 3, 2: 3, 3: 3}


class TestAbReadoutAlwaysOneRow:
    def test_ab_missing_arm_reports_zero_n(self, spark):
        from h3_indexer_spark.operators.analytics import ab_test_zscore

        df = spark.createDataFrame(
            [("control", 1.0), ("control", 2.0)], "arm string, m double"
        )
        rows = ab_test_zscore(df, "arm", "m", "control", "treatment").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_control"] == 2 and r["n_treatment"] == 0
        assert r["mean_treatment"] is None and r["z_score"] is None

    def test_ab_empty_input_reports_row(self, spark):
        from h3_indexer_spark.operators.analytics import ab_test_zscore

        df = spark.createDataFrame([], "arm string, m double")
        rows = ab_test_zscore(df, "arm", "m", "control", "treatment").collect()
        assert len(rows) == 1
        assert rows[0]["n_control"] == 0 and rows[0]["n_treatment"] == 0

    def test_cuped_missing_arm_reports_zero_n(self, spark):
        from h3_indexer_spark.operators.analytics import cuped_ab_test

        df = spark.createDataFrame(
            [("treatment", 1.0, 0.5), ("treatment", 2.0, 1.5)],
            "arm string, m double, x double",
        )
        rows = cuped_ab_test(
            df, "arm", "m", "x", "control", "treatment"
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_control"] == 0 and r["n_treatment"] == 2
        assert r["z_score"] is None

    def test_ab_both_arms_unchanged_values(self, spark):
        """The conditional-agg rewrite must reproduce the grouped
        formulation's numbers exactly (same decimal sums)."""
        from h3_indexer_spark.operators.analytics import ab_test_zscore

        rng = np.random.RandomState(3)
        rows = [
            ("control" if i % 2 else "treatment", float(rng.uniform(0, 9)))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "arm string, m double")
        r = ab_test_zscore(df, "arm", "m", "control", "treatment").collect()[0]
        c = np.round(np.asarray(
            [m for a, m in rows if a == "control"], dtype=np.float64
        ) * 1e4) / 1e4
        t = np.round(np.asarray(
            [m for a, m in rows if a == "treatment"], dtype=np.float64
        ) * 1e4) / 1e4
        assert r["n_control"] == len(c) and r["n_treatment"] == len(t)
        assert r["mean_control"] == pytest.approx(c.mean(), abs=1e-9)
        se = np.sqrt(t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c))
        assert r["z_score"] == pytest.approx(
            (t.mean() - c.mean()) / se, abs=1e-9
        )


class TestIvfPqRerank:
    """IVFADC+R: the exact re-rank must recover the brute-force top-k
    whenever the true top-k survives the ADC cut — asserted
    empirically at both SFs (the margin behind the SQL oracle)."""

    @pytest.mark.parametrize(
        "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_equals_brute_force_both_sfs(self, spark, sf_dir):
        from h3_indexer_spark.queries import (
            _query_vector,
            load,
            q_knn_ivfpq_rerank,
        )

        got = [
            (r["vec_id"], r["l2_dist"])
            for r in q_knn_ivfpq_rerank(spark, sf_dir).collect()
        ]
        emb = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in load(spark, sf_dir, "embeddings").collect()
        }
        q = np.asarray(_query_vector())
        exact = sorted(
            (float(((v - q) ** 2).sum()), i) for i, v in emb.items()
        )[:10]
        assert [i for _, i in exact] == [i for i, _ in got]
        for (d_exact, _), (_, d_got) in zip(exact, got):
            assert d_got == pytest.approx(d_exact, rel=1e-9)

    def test_adc_cut_retains_true_topk(self, spark):
        """recall@n_refine margin: the true top-10 must sit WELL inside
        the ADC top-100 (not at its boundary) so the oracle equality
        is robust, not a coin-flip."""
        from h3_indexer_spark.operators.pq import ivfpq_topk, pq_train
        from h3_indexer_spark.operators.similarity import (
            sampled_centroids,
        )
        from h3_indexer_spark.queries import _query_vector, load

        sf_dir = "/root/testdata/sf0.01"
        emb_df = load(spark, sf_dir, "embeddings")
        cents = sampled_centroids(emb_df, n_cells=16)
        books = pq_train(emb_df, m=16, nbits=6, sample=500)
        adc = ivfpq_topk(
            emb_df, _query_vector(), cents, books, n_probe=16, k=100
        )
        adc_ids = [r["vec_id"] for r in adc.collect()]
        emb = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb_df.collect()
        }
        q = np.asarray(_query_vector())
        exact = sorted(
            (float(((v - q) ** 2).sum()), i) for i, v in emb.items()
        )
        true10 = {i for _, i in exact[:10]}
        # every true top-10 id inside the ADC top-100, and inside its
        # first 60 (margin: boundary candidates are unstable)
        assert true10 <= set(adc_ids)
        assert true10 <= set(adc_ids[:60])


class TestBpe:
    @staticmethod
    def _py_bpe(word_counts: dict[str, int], n_merges: int):
        """Textbook BPE reference: greedy left-to-right merge of the
        most frequent adjacent pair (ties lexicographically-smallest
        pair), over a word-frequency table."""
        syms = {w: list(w) for w in word_counts}
        merges = []
        for _ in range(n_merges):
            census: dict[tuple[str, str], int] = {}
            for w, s in syms.items():
                for a, b in zip(s, s[1:]):
                    census[(a, b)] = census.get((a, b), 0) + word_counts[w]
            if not census:
                break
            best = min(census, key=lambda p: (-census[p], p))
            merges.append(best)
            a, b = best
            for w, s in syms.items():
                out: list[str] = []
                for x in s:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                syms[w] = out
        return merges

    def test_train_matches_python_reference(self, spark):
        from h3_indexer_spark.operators.textops import bpe_train

        texts = [
            "low lower lowest slow slower flow",
            "new newer newest stew strew",
            "low low low slow stew new new",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        wc: dict[str, int] = {}
        for t in texts:
            for w in t.split():
                if len(w) >= 2:
                    wc[w] = wc.get(w, 0) + 1
        assert bpe_train(df, "text", n_merges=6) == self._py_bpe(wc, 6)

    def test_census_tie_order(self, spark):
        from h3_indexer_spark.operators.textops import bpe_pair_counts

        df = spark.createDataFrame([("ab ab cd cd",)], "text string")
        rows = bpe_pair_counts(df, "text", k=10).collect()
        # text mode emits 2-char substrings; symbol mode (bpe_train)
        # emits space-joined symbol pairs
        assert [(r["pair"], r["n"]) for r in rows] == [
            ("ab", 2), ("cd", 2),
        ]


class TestBm25Margins:
    @pytest.mark.parametrize(
        "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_floor_quantization_margin(self, spark, sf_dir):
        """The FLOOR(score*1000) contract survives cross-engine ln()
        ulp only when no score sits near an integer boundary — assert
        every document's scaled score is > 1e-6 from its floor (ulp
        divergence is ~1e-12 relative)."""
        from h3_indexer_spark.operators.textops import bm25_scores
        from h3_indexer_spark.queries import _BM25_TERMS, load

        # rebuild the RAW score with the same expression but no floor
        import h3_indexer_spark.operators.textops as tx
        from pyspark.sql import functions as F

        docs = load(spark, sf_dir, "documents")
        scored = bm25_scores(docs, _BM25_TERMS, "text", "doc_id", k=50)
        # margin check on the quantized column's neighborhood: raw
        # scores recomputed in numpy from token counts
        import numpy as np

        toks = [
            (r["doc_id"], [w for w in __import__("re").sub(
                r"[^\w\s]", " ", (r["text"] or "")
            ).lower().split() if w])
            for r in docs.select("doc_id", "text").collect()
        ]
        terms = sorted(set(_BM25_TERMS))
        n = float(len(toks))
        dls = np.array([len(t) for _, t in toks], dtype=np.float64)
        avgdl = dls.sum() / n
        tf = np.array(
            [[t.count(w) for w in terms] for _, t in toks],
            dtype=np.float64,
        )
        dfs = (tf > 0).sum(axis=0).astype(np.float64)
        idf = np.log(1.0 + (n - dfs + 0.5) / (dfs + 0.5))
        denom = tf + 1.2 * (0.25 + 0.75 * dls[:, None] / avgdl)
        scores = (idf * tf * 2.2 / denom).sum(axis=1)
        scaled = scores * 1000.0
        frac = np.abs(scaled - np.round(scaled))
        # every score*1000 stays far from an integer boundary
        assert (frac[scores > 0] > 1e-6).all(), frac.min()
        expected_pos = int((np.floor(scaled) > 0).sum())
        assert expected_pos > 0
        assert scored.count() == min(50, expected_pos)


class TestHll:
    def test_merge_equals_sketch_of_union(self, spark):
        from h3_indexer_spark.operators.sketches import (
            hll_merge,
            hll_registers,
        )

        a = spark.range(0, 4000).selectExpr("id AS v")
        b = spark.range(3000, 9000).selectExpr("id AS v")
        u = a.unionByName(b)
        merged = {
            (r["bucket"], r["rho"])
            for r in hll_merge(
                hll_registers(a, "v"), hll_registers(b, "v")
            ).collect()
        }
        direct = {
            (r["bucket"], r["rho"])
            for r in hll_registers(u, "v").collect()
        }
        assert merged == direct

    def test_estimate_error_bound(self, spark):
        from h3_indexer_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        for n in (500, 20000):
            df = spark.range(0, n).selectExpr("id AS v")
            est = hll_estimate(hll_registers(df, "v", p=8), p=8)
            # 1.04/sqrt(256) ~ 6.5% std error; allow 4 sigma
            assert abs(est - n) / n < 0.26, (n, est)

    def test_rho_definition(self, spark):
        """rho must be 1 + leading zero count of the high 52 bits."""
        from h3_indexer_spark.operators.sketches import hll_registers

        df = spark.createDataFrame([(i,) for i in range(200)], "v long")
        rows = hll_registers(df, "v", p=8).collect()
        import hashlib

        expect: dict[int, int] = {}
        for i in range(200):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[17:32], 16)
            bucket, rem = h % 256, h >> 8
            rho = 53 if rem == 0 else 52 - rem.bit_length() + 1
            expect[bucket] = max(expect.get(bucket, 0), rho)
        assert {r["bucket"]: r["rho"] for r in rows} == expect


class TestGini:
    def test_matches_numpy(self, spark):
        from h3_indexer_spark.operators.analytics import gini_coefficient

        rng = np.random.RandomState(11)
        # quantized to 1e-4 like the DECIMAL(19,4) cast
        vals = np.round(rng.lognormal(3, 1, 2000), 4)
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "x double"
        )
        r = gini_coefficient(df, "x").collect()[0]
        xs = np.sort(vals)
        n = len(xs)
        g = 2.0 * (np.arange(1, n + 1) * xs).sum() / (n * xs.sum()) - (
            n + 1.0
        ) / n
        assert r["n"] == n
        assert r["gini"] == pytest.approx(g, abs=1e-12)
        assert 0.0 < r["gini"] < 1.0

    def test_uniform_is_zero(self, spark):
        from h3_indexer_spark.operators.analytics import gini_coefficient

        df = spark.createDataFrame([(5.0,)] * 100, "x double")
        assert gini_coefficient(df, "x").collect()[0][
            "gini"
        ] == pytest.approx(0.0, abs=1e-15)

    def test_tie_runs_even_and_odd(self, spark):
        """ADVICE r7: the rank-run weight now multiplies in
        DECIMAL(38,0) with the exact /2 split on whichever of c, c+1
        is even — lock both parities of the run length against the
        numpy rank formula."""
        from h3_indexer_spark.operators.analytics import gini_coefficient

        # runs: 1.0 ×3 (odd c), 2.0 ×4 (even c), 7.5 ×1
        vals = [1.0] * 3 + [2.0] * 4 + [7.5]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        r = gini_coefficient(df, "x").collect()[0]
        xs = np.sort(np.array(vals))
        n = len(xs)
        g = 2.0 * (np.arange(1, n + 1) * xs).sum() / (
            n * xs.sum()
        ) - (n + 1.0) / n
        assert r["gini"] == pytest.approx(g, abs=1e-14)


class TestSkyline:
    def test_matches_brute_force(self, spark):
        from h3_indexer_spark.operators.mining import skyline_2d

        rng = np.random.RandomState(5)
        rows = [
            (i, float(rng.randint(0, 50)), int(rng.randint(0, 50)))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "id long, price double, size int")
        got = {r["id"] for r in skyline_2d(df, "price", "size").collect()}
        want = {
            i
            for i, p, s in rows
            if not any(
                (p2 <= p and s2 >= s and (p2 < p or s2 > s))
                for _, p2, s2 in rows
            )
        }
        assert got == want

    def test_duplicates_all_survive(self, spark):
        from h3_indexer_spark.operators.mining import skyline_2d

        df = spark.createDataFrame(
            [(1, 1.0, 9), (2, 1.0, 9), (3, 2.0, 9), (4, 0.5, 1)],
            "id long, price double, size int",
        )
        got = {r["id"] for r in skyline_2d(df, "price", "size").collect()}
        # (3) dominated by (1)/(2) [cheaper, same size]; (4) survives
        # (strictly cheapest); the two duplicates both survive
        assert got == {1, 2, 4}


class TestAssociationRules:
    def test_counts_and_lift(self, spark):
        from h3_indexer_spark.operators.mining import association_rules

        rows = [
            (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"),
            (3, "c"), (1, "a"),  # duplicate item in basket 1 ignored
        ]
        df = spark.createDataFrame(rows, "b long, i string")
        out = {
            (r["antecedent"], r["consequent"]): r
            for r in association_rules(df, "b", "i", min_support=2).collect()
        }
        ab = out[("a", "b")]
        assert ab["n_joint"] == 2 and ab["n_antecedent"] == 3
        assert ab["confidence"] == pytest.approx(2 / 3)
        # lift = n_joint*N/(n_a*n_b) = 2*4/(3*2)
        assert ab["lift"] == pytest.approx(8 / 6)
        ba = out[("b", "a")]
        assert ba["confidence"] == pytest.approx(1.0)

    def test_max_basket_size_drops_megabasket(self, spark):
        from h3_indexer_spark.operators.mining import association_rules

        rows = [(1, f"i{k}") for k in range(20)] + [
            (2, "x"), (2, "y"), (3, "x"), (3, "y"),
        ]
        df = spark.createDataFrame(rows, "b long, i string")
        out = association_rules(
            df, "b", "i", min_support=2, max_basket_size=5
        ).collect()
        pairs = {(r["antecedent"], r["consequent"]) for r in out}
        assert pairs == {("x", "y"), ("y", "x")}

    def test_default_cap_is_on_and_logged(self, spark, caplog):
        """VERDICT r7 #3: the quadratic-pair guard defaults ON
        (10⁴-item cap) and a planted mega-basket is excluded WITH a
        logged exclusion count; None stays the explicit opt-out."""
        import inspect
        import logging

        from h3_indexer_spark.operators.mining import association_rules

        sig = inspect.signature(association_rules)
        assert sig.parameters["max_basket_size"].default == 10_000

        rows = [(1, f"i{k}") for k in range(12)] + [
            (2, "x"), (2, "y"), (3, "x"), (3, "y"),
        ]
        df = spark.createDataFrame(rows, "b long, i string")
        with caplog.at_level(
            logging.WARNING, logger="h3_indexer_spark.operators.mining"
        ):
            out = association_rules(
                df, "b", "i", min_support=2, max_basket_size=8
            ).collect()
        pairs = {(r["antecedent"], r["consequent"]) for r in out}
        assert pairs == {("x", "y"), ("y", "x")}
        assert any(
            "excluded 1 mega-basket" in r.message for r in caplog.records
        )
        # opt-out path: the mega-basket's pairs come back
        out2 = association_rules(
            df, "b", "i", min_support=1, k=200, max_basket_size=None
        ).collect()
        assert {(r["antecedent"], r["consequent"]) for r in out2} > pairs


class TestSurvival:
    def test_risk_table_semantics(self, spark):
        from h3_indexer_spark.operators.analytics import (
            survival_risk_table,
        )

        day = 86_400 * 10**9
        # users: u1 spans 3 days then churns; u2 spans 3 days, active
        # at end (censored); u3 single event long ago (lifetime 0,
        # churned); global max = t0+30d (u2's last event)
        rows = [
            ("u1", 0), ("u1", 3 * day),
            ("u2", 27 * day), ("u2", 30 * day),
            ("u3", 5 * day),
        ]
        df = spark.createDataFrame(rows, "user_id string, ts long")
        out = {
            r["lifetime_days"]: r
            for r in survival_risk_table(df).collect()
        }
        assert out[0]["n_events"] == 1          # u3 churned at 0
        assert out[0]["n_censored"] == 0
        assert out[0]["n_risk"] == 3            # everyone reaches 0
        assert out[3]["n_events"] == 1          # u1 churned at 3
        assert out[3]["n_censored"] == 1        # u2 censored at 3
        assert out[3]["n_risk"] == 2


class TestDbscan:
    @staticmethod
    def _py_dbscan(pts: dict[int, tuple[float, float]], eps_km, min_pts):
        import math

        def hav(p, q):
            c = 0.017453292519943295
            la1, lo1 = pts[p]
            la2, lo2 = pts[q]
            dlat = (la2 - la1) * c / 2.0
            dlng = (lo2 - lo1) * c / 2.0
            a = (
                math.sin(dlat) ** 2
                + math.cos(la1 * c) * math.cos(la2 * c)
                * math.sin(dlng) ** 2
            )
            return 2 * 6371.0088 * math.asin(min(1.0, math.sqrt(a)))

        ids = sorted(pts)
        nbrs = {
            i: [j for j in ids if hav(i, j) <= eps_km] for i in ids
        }
        core = {i for i in ids if len(nbrs[i]) >= min_pts}
        # union-find over core-core edges
        parent = {i: i for i in core}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in core:
            for j in nbrs[i]:
                if j in core and j != i:
                    a, b = find(i), find(j)
                    if a != b:
                        parent[max(a, b)] = min(a, b)
        label = {i: min(
            j for j in core if find(j) == find(i)
        ) for i in core}
        out = {}
        for i in ids:
            if i in core:
                out[i] = (label[i], 1)
            else:
                cands = [label[j] for j in nbrs[i] if j in core]
                out[i] = (min(cands) if cands else None, 0)
        return out

    def test_matches_python_reference(self, spark):
        from h3_indexer_spark.operators.clustering import dbscan

        rng = np.random.RandomState(17)
        # three dense blobs + sparse noise
        blobs = []
        for cx, cy in ((40.0, -100.0), (40.3, -100.2), (40.6, -99.8)):
            blobs += [
                (cx + rng.uniform(-0.01, 0.01),
                 cy + rng.uniform(-0.01, 0.01))
                for _ in range(25)
            ]
        noise = [
            (39.0 + rng.uniform(0, 3), -101.0 + rng.uniform(0, 3))
            for _ in range(40)
        ]
        pts = {i: p for i, p in enumerate(blobs + noise)}
        df = spark.createDataFrame(
            [(i, float(la), float(lo)) for i, (la, lo) in pts.items()],
            "id long, lat double, lng double",
        )
        got = {
            r["id"]: (r["cluster"], r["is_core"])
            for r in dbscan(df, 3.0, 5).collect()
        }
        want = self._py_dbscan(pts, 3.0, 5)
        assert got == want
        # sanity: the three blobs produced >= 3 distinct clusters
        assert len({c for c, _ in want.values() if c is not None}) >= 3

    def test_contract_fixture_runs(self, spark):
        from h3_indexer_spark.queries import q_dbscan

        rows = q_dbscan(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 150
        assert {r["is_core"] for r in rows} <= {0, 1}


class TestLmScore:
    @pytest.mark.parametrize(
        "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_floor_margins_and_reference(self, spark, sf_dir):
        """Recompute every token position's log10(p)*1e6 in Python and
        assert (a) the floor margins clear cross-library ulp by many
        orders and (b) the engine's per-doc integer sums match."""
        import re as _re

        from h3_indexer_spark.queries import load, q_lm_score

        docs = [
            (r["doc_id"], r["lang"], [
                w for w in _re.sub(
                    r"[^\w\s]", " ", (r["text"] or "")
                ).lower().split() if w
            ])
            for r in load(spark, sf_dir, "documents")
            .select("doc_id", "lang", "text").collect()
        ]
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for _, lang, toks in docs:
            if lang != "en":
                continue
            for w in toks:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        t = float(sum(uni.values()))
        import math

        want: dict[int, tuple[int, int]] = {}
        margins = []
        for doc_id, _, toks in docs:
            n, s = 0, 0
            for a, b in zip(toks, toks[1:]):
                if (a, b) in bi and a in uni:
                    p = bi[(a, b)] / uni[a]
                else:
                    p = 0.4 * (uni.get(b, 0) + 1.0) / t
                scaled = math.log10(p) * 1e6
                margins.append(abs(scaled - round(scaled)))
                n += 1
                s += math.floor(scaled)
            if n:
                want[doc_id] = (n, s)
        # log10 contributes ~1e-16 relative ulp; scaled values are
        # O(1e6), so divergence is ~1e-10 — demand 1e-6 clearance
        # for every position that isn't an exact power of 10
        tight = [m for m in margins if m > 0]
        assert min(tight) > 1e-6
        got = {
            r["doc_id"]: (r["n_scored"], r["logprob_q"])
            for r in q_lm_score(spark, sf_dir).collect()
        }
        assert got == want


class TestFeatureHash:
    def test_matches_reference_and_nulls(self, spark):
        import hashlib

        from h3_indexer_spark.operators.features import feature_hash

        rows = [(1, "A", "P1"), (2, "B", None), (3, None, "P2")]
        df = spark.createDataFrame(rows, "id long, s string, p string")
        out = {
            r["id"]: [r[f"fh_{b}"] for b in range(8)]
            for r in feature_hash(
                df, ["s", "p"], n_features=8, id_col="id"
            ).collect()
        }

        def h60(tok: str) -> int:
            return int(
                hashlib.md5(tok.encode()).hexdigest()[17:32], 16
            )

        for rid, s, p in rows:
            vec = [0] * 8
            for cname, v in (("s", s), ("p", p)):
                if v is None:
                    continue
                h = h60(f"{cname}:{v}")
                sign = 1 if (h >> 40) % 2 == 0 else -1
                vec[h % 8] += sign
            assert out[rid] == vec, (rid, out[rid], vec)


class TestSpatialKnn:
    @pytest.mark.parametrize(
        "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_rank_boundary_margins_and_brute_parity(self, spark, sf_dir):
        """The kNN contract survives cross-engine trig ulp only when
        (a) the k-th vs (k+1)-th candidate distances are either
        EXACTLY equal (id tiebreak, same in both engines) or separated
        far beyond ulp, and (b) the radius cut has the radius-join
        margin. Recompute everything in numpy and assert both, plus
        exact top-3 parity."""
        from h3_indexer_spark.queries import (
            _supplier_points,
            load,
            q_spatial_knn,
        )

        cust = {
            r["c_custkey"]: (
                40.0 + (r["c_custkey"] * 2654435761 % 100000) / 50000.0,
                -100.0 + (r["c_custkey"] * 40503 % 100000) / 50000.0,
            )
            for r in load(spark, sf_dir, "customer")
            .select("c_custkey").collect()
        }
        supp = {
            r["id"]: (r["lat"], r["lng"])
            for r in _supplier_points(spark, sf_dir).collect()
        }
        c = 0.017453292519943295

        def hav(p, q):
            import math

            la1, lo1 = p
            la2, lo2 = q
            a = (
                math.sin((la2 - la1) * c / 2.0) ** 2
                + math.cos(la1 * c) * math.cos(la2 * c)
                * math.sin((lo2 - lo1) * c / 2.0) ** 2
            )
            return 2 * 6371.0088 * math.asin(min(1.0, math.sqrt(a)))

        want = {}
        for cid, p in cust.items():
            cand = sorted(
                (hav(p, q), sid)
                for sid, q in supp.items()
                if hav(p, q) <= 30.0
            )
            # radius-cut margin (radius-join rule)
            for d, _ in cand[-1:]:
                assert abs(d - 30.0) > 1e-9
            # rank boundary margin: 3rd vs 4th must be an exact tie
            # (id break) or separated >> ulp
            if len(cand) > 3:
                gap = cand[3][0] - cand[2][0]
                assert gap == 0.0 or gap > 1e-9, (cid, gap)
            # floor-quantization margin for every kept distance;
            # d == 0.0 (coincident points) is EXACT in both engines,
            # so the boundary is safe there by construction
            for d, sid in cand[:3]:
                frac = abs(d * 1000.0 - round(d * 1000.0))
                assert d == 0.0 or frac > 1e-7, (cid, sid, d)
                want[(cid, sid)] = int(d * 1000.0)
        got = {
            (r["l_id"], r["r_id"]): r["dist_m"]
            for r in q_spatial_knn(spark, sf_dir).collect()
        }
        assert got == want


class TestPqTrainEmptyInput:
    def test_raises_clear_error(self, spark):
        from h3_indexer_spark.operators.pq import pq_train

        df = spark.createDataFrame(
            [(1, None)], "id long, emb array<double>"
        )
        with pytest.raises(ValueError, match="no vectors"):
            pq_train(
                df, m=2, nbits=2, sample=16,
                vec_col="emb", id_col="id",
            )


class TestHllGrouped:
    def test_rollup_equals_resketch(self, spark):
        """Rolling per-group registers up to the global grouping by
        groupBy-max must equal sketching the whole column directly —
        the pre-aggregation algebra the cube feed relies on."""
        from pyspark.sql import functions as F

        from h3_indexer_spark.operators.sketches import (
            hll_registers,
            hll_registers_grouped,
        )

        df = spark.range(0, 5000).selectExpr(
            "id AS v", "CAST(id % 7 AS STRING) AS g"
        )
        rolled = {
            (r["bucket"], r["rho"])
            for r in hll_registers_grouped(df, "g", "v")
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
            .collect()
        }
        direct = {
            (r["bucket"], r["rho"])
            for r in hll_registers(df, "v").collect()
        }
        assert rolled == direct


class TestBfsHops:
    """bfs_hops must equal a Python BFS reference (min hop per node,
    capped), keep sources at hop 0 even when isolated, and stop at
    max_hops."""

    @staticmethod
    def _reference(edges, sources, max_hops):
        from collections import deque

        adj = {}
        for a, b in edges:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        dist = {s: 0 for s in set(sources)}
        dq = deque(dist)
        while dq:
            v = dq.popleft()
            if dist[v] >= max_hops:
                continue
            for u in adj.get(v, ()):
                if u not in dist:
                    dist[u] = dist[v] + 1
                    dq.append(u)
        return dist

    def test_matches_python_bfs(self, spark):
        from h3_indexer_spark.operators.graph import bfs_hops

        rng = np.random.RandomState(11)
        edges = [
            (int(rng.randint(0, 60)), int(rng.randint(0, 60)))
            for _ in range(120)
        ]
        sources = [0, 7, 59]
        for max_hops in (0, 1, 2, 4):
            got = {
                r["node"]: r["hops"]
                for r in bfs_hops(
                    spark.createDataFrame(edges, "src long, dst long"),
                    spark.createDataFrame(
                        [(s,) for s in sources], "node long"
                    ),
                    max_hops=max_hops,
                ).collect()
            }
            assert got == self._reference(edges, sources, max_hops)

    def test_isolated_source_and_chain_cap(self, spark):
        from h3_indexer_spark.operators.graph import bfs_hops

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        sources = spark.createDataFrame([(1,), (99,)], "node long")
        got = {
            r["node"]: r["hops"]
            for r in bfs_hops(edges, sources, max_hops=2).collect()
        }
        # 99 is not in the graph but is still a source at hop 0; the
        # chain is cut at 2 hops (4 and 5 unreachable within the cap).
        assert got == {1: 0, 99: 0, 2: 1, 3: 2}

    def test_negative_max_hops_raises(self, spark):
        from h3_indexer_spark.operators.graph import bfs_hops

        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        s = spark.createDataFrame([(1,)], "node long")
        with pytest.raises(ValueError):
            bfs_hops(e, s, max_hops=-1)


class TestRrfFuse:
    def test_two_signal_scores_and_nulls(self, spark):
        from h3_indexer_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
        )
        b = spark.createDataFrame(
            [(20, 1), (40, 2)], "doc_id long, rank long"
        )
        rows = {
            r["doc_id"]: r
            for r in rrf_fuse({"a": a, "b": b}, "doc_id").collect()
        }
        assert set(rows) == {10, 20, 30, 40}
        # fixed name-sorted fold order: a's contribution first
        assert rows[20]["rrf_score"] == 1.0 / 62.0 + 1.0 / 61.0
        assert rows[10]["rrf_score"] == 1.0 / 61.0
        assert rows[10]["rank_b"] is None
        assert rows[40]["rank_a"] is None and rows[40]["rank_b"] == 2

    def test_topk_cut_and_tiebreak(self, spark):
        from h3_indexer_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(i, i) for i in range(1, 8)], "doc_id long, rank long"
        )
        out = rrf_fuse({"only": a}, "doc_id", topk=3).collect()
        assert [r["doc_id"] for r in out] == [1, 2, 3]

    def test_empty_signals_raise(self, spark):
        from h3_indexer_spark.operators.retrieval import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse({}, "doc_id")


class TestRetrievalEval:
    def _fixture(self, spark):
        # query 'x': relevant {1,2,3}; ranking returns 2 at rank 1,
        # 9 at rank 2, 3 at rank 12 (outside k=10).
        # query 'y': relevant {5}; ranking never returns it.
        ranked = spark.createDataFrame(
            [("x", 2, 1), ("x", 9, 2), ("x", 3, 12),
             ("y", 2, 1), ("y", 9, 2)],
            "term string, doc_id long, rank long",
        )
        qrels = spark.createDataFrame(
            [("x", 1), ("x", 2), ("x", 3), ("y", 5)],
            "term string, doc_id long",
        )
        return ranked, qrels

    def test_metrics(self, spark):
        from h3_indexer_spark.operators.retrieval import retrieval_eval

        ranked, qrels = self._fixture(spark)
        rows = {
            r["term"]: r
            for r in retrieval_eval(
                ranked, qrels, query_col="term", k=10
            ).collect()
        }
        x = rows["x"]
        assert x["n_rel"] == 3 and x["hits_at_k"] == 1
        assert x["precision_at_k"] == 0.1
        assert x["recall_at_k"] == 1.0 / 3.0
        assert x["first_rank"] == 1 and x["rr"] == 1.0
        y = rows["y"]
        assert y["n_rel"] == 1 and y["hits_at_k"] == 0
        assert y["precision_at_k"] == 0.0 and y["recall_at_k"] == 0.0
        assert y["first_rank"] is None and y["rr"] == 0.0

    def test_first_rank_uses_full_list_not_k(self, spark):
        """A relevant doc at rank 12 still sets first_rank/rr when the
        top-10 has no relevant doc."""
        from h3_indexer_spark.operators.retrieval import retrieval_eval

        ranked = spark.createDataFrame(
            [("x", 3, 12)], "term string, doc_id long, rank long"
        )
        qrels = spark.createDataFrame(
            [("x", 3)], "term string, doc_id long"
        )
        r = retrieval_eval(ranked, qrels, query_col="term", k=10).collect()[0]
        assert r["hits_at_k"] == 0 and r["first_rank"] == 12
        assert r["rr"] == 1.0 / 12.0

    def test_bad_k_raises(self, spark):
        from h3_indexer_spark.operators.retrieval import retrieval_eval

        ranked, qrels = self._fixture(spark)
        with pytest.raises(ValueError):
            retrieval_eval(ranked, qrels, query_col="term", k=0)


class TestCollocations:
    def test_lift_matches_python(self, spark):
        from collections import Counter

        from h3_indexer_spark.operators.textops import collocations

        texts = [
            "the big dog chased the big cat",
            "a big dog and a big dog ran",
            "the cat saw the big dog",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        rows = collocations(df, "text", min_count=2, k=10).collect()

        toks = [t.split() for t in texts]
        uni = Counter(w for ws in toks for w in ws)
        bi = Counter(
            (ws[i], ws[i + 1]) for ws in toks for i in range(len(ws) - 1)
        )
        n_uni = sum(uni.values())
        n_bi = sum(bi.values())
        assert rows, "expected at least one collocation"
        for r in rows:
            w1, w2 = r["bigram"].split(" ")
            c_xy = bi[(w1, w2)]
            assert r["c_xy"] == c_xy >= 2
            assert r["c_w1"] == uni[w1] and r["c_w2"] == uni[w2]
            expect = (
                (float(c_xy) * float(n_uni)) * float(n_uni)
            ) / ((float(n_bi) * float(uni[w1])) * float(uni[w2]))
            assert r["lift"] == expect
        # 'big dog' (3 of 17 bigrams) must outrank 'the big' (2)
        lifts = {r["bigram"]: r["lift"] for r in rows}
        assert lifts["big dog"] > lifts["the big"]

    def test_min_count_filter(self, spark):
        from h3_indexer_spark.operators.textops import collocations

        df = spark.createDataFrame(
            [("x y x y",), ("z w",)], "text string"
        )
        rows = collocations(df, "text", min_count=2, k=10).collect()
        assert [r["bigram"] for r in rows] == ["x y"]

    def test_bad_min_count_raises(self, spark):
        from h3_indexer_spark.operators.textops import collocations

        df = spark.createDataFrame([("a b",)], "text string")
        with pytest.raises(ValueError):
            collocations(df, min_count=0)


class TestBenford:
    def test_digit_extraction_and_fracs(self, spark):
        import math

        from h3_indexer_spark.operators.analytics import (
            BENFORD_EXPECTED,
            benford_profile,
        )

        vals = [1.00, 1.23, 19.99, 23.45, 234.5, 0.001, 900.0, 95.5]
        # 0.001*100 = 0.1 < 1 → excluded; digits: 1,1,1,2,2,9,9
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = {r["digit"]: r for r in benford_profile(df, "v").collect()}
        assert set(rows) == {1, 2, 9}
        assert rows[1]["n"] == 3 and rows[2]["n"] == 2 and rows[9]["n"] == 2
        assert rows[1]["frac"] == 3.0 / 7.0
        for d, r in rows.items():
            assert r["expected"] == float(BENFORD_EXPECTED[d - 1])
            assert abs(r["expected"] - math.log10(1 + 1 / d)) < 1e-12
            assert r["abs_dev"] == abs(r["frac"] - r["expected"])

    def test_uniform_digits_deviate_and_sum_to_one(self, spark):
        from h3_indexer_spark.operators.analytics import benford_profile

        df = spark.createDataFrame(
            [(float(d) * 10.0,) for d in range(1, 10)] * 5, "v double"
        )
        rows = benford_profile(df, "v").collect()
        assert [r["digit"] for r in rows] == list(range(1, 10))
        assert sum(r["n"] for r in rows) == 45
        assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-12
        # uniform digits over-represent 9 vs Benford
        assert rows[-1]["frac"] > rows[-1]["expected"]


class TestGroupConcat:
    def test_sorted_join_and_count(self, spark):
        from h3_indexer_spark.operators.relational import group_concat

        df = spark.createDataFrame(
            [(1, "b"), (1, "a"), (1, "c"), (2, "z")],
            "g int, v string",
        )
        rows = {r["g"]: r for r in group_concat(df, "g", "v").collect()}
        assert rows[1]["concat"] == "a,b,c" and rows[1]["n_items"] == 3
        assert rows[2]["concat"] == "z" and rows[2]["n_items"] == 1

    def test_order_is_value_not_arrival(self, spark):
        """Reversed input order must not change the output — the whole
        point vs a bare collect_list."""
        from h3_indexer_spark.operators.relational import group_concat

        fwd = [(1, f"v{i:02d}") for i in range(20)]
        rev = list(reversed(fwd))
        a = group_concat(
            spark.createDataFrame(fwd, "g int, v string"), "g", "v"
        ).collect()[0]["concat"]
        b = group_concat(
            spark.createDataFrame(rev, "g int, v string")
            .repartition(7), "g", "v"
        ).collect()[0]["concat"]
        assert a == b == ",".join(f"v{i:02d}" for i in range(20))

    def test_multi_group_keys(self, spark):
        from h3_indexer_spark.operators.relational import group_concat

        df = spark.createDataFrame(
            [(1, "x", "b"), (1, "x", "a"), (1, "y", "c")],
            "g int, h string, v string",
        )
        rows = {
            (r["g"], r["h"]): r["concat"]
            for r in group_concat(df, ["g", "h"], "v").collect()
        }
        assert rows == {(1, "x"): "a,b", (1, "y"): "c"}


class TestCalibrationBins:
    def test_bins_and_rates(self, spark):
        from h3_indexer_spark.operators.analytics import calibration_bins

        rows_in = [
            (0.05, 0), (0.08, 1),           # bin 0
            (0.55, 1), (0.58, 1), (0.52, 0),  # bin 5
            (1.0, 1),                        # clamps to bin 9
        ]
        df = spark.createDataFrame(rows_in, "score double, label int")
        rows = {r["bin"]: r for r in calibration_bins(df, "score", "label").collect()}
        assert set(rows) == {0, 5, 9}
        assert rows[0]["n"] == 2 and rows[0]["positives"] == 1
        assert rows[0]["pos_rate"] == 0.5
        assert rows[0]["mean_score"] == pytest.approx(0.065, abs=1e-9)
        assert rows[5]["n"] == 3 and rows[5]["positives"] == 2
        assert rows[9]["n"] == 1 and rows[9]["pos_rate"] == 1.0

    def test_null_scores_excluded_and_bad_bins_raise(self, spark):
        from h3_indexer_spark.operators.analytics import calibration_bins

        df = spark.createDataFrame(
            [(None, 1), (0.2, 0)], "score double, label int"
        )
        rows = calibration_bins(df, "score", "label").collect()
        assert len(rows) == 1 and rows[0]["bin"] == 2
        with pytest.raises(ValueError):
            calibration_bins(df, "score", "label", n_bins=0)


class TestMajorityLabel:
    def test_vote_tiebreak_and_abstentions(self, spark):
        from h3_indexer_spark.operators.labeling import majority_label

        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"),
             (2, "b"), (2, "a"),            # tie → smallest label wins
             (3, None), (3, "c"),
             (4, None)],                     # all-abstain → dropped
            "item int, label string",
        )
        rows = {r["item"]: r for r in majority_label(df, "item", "label").collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1]["top_label"] == "a" and rows[1]["top_count"] == 2
        assert rows[1]["n_votes"] == 3
        assert rows[1]["agreement"] == 2.0 / 3.0
        assert rows[2]["top_label"] == "a" and rows[2]["agreement"] == 0.5
        assert rows[3]["top_label"] == "c" and rows[3]["n_votes"] == 1


class TestCohensKappa:
    def test_known_kappa(self, spark):
        from h3_indexer_spark.operators.labeling import cohens_kappa

        # classic 2x2: a=20 agree-yes, d=15 agree-no, b=10, c=5 → n=50
        rows_in = (
            [("y", "y")] * 20 + [("n", "n")] * 15
            + [("y", "n")] * 10 + [("n", "y")] * 5
        )
        df = spark.createDataFrame(rows_in, "a string, b string")
        r = cohens_kappa(df, "a", "b").collect()[0]
        assert r["n_items"] == 50 and r["n_agree"] == 35
        assert r["po"] == 0.7
        # marginals: a: y=30,n=20; b: y=25,n=25 → pe=(30*25+20*25)/2500=0.5
        assert r["pe"] == 0.5
        assert r["kappa"] == pytest.approx(0.4, abs=1e-12)

    def test_constant_raters_null_kappa_and_null_drop(self, spark):
        from h3_indexer_spark.operators.labeling import cohens_kappa

        df = spark.createDataFrame(
            [("x", "x"), ("x", "x"), ("x", None)], "a string, b string"
        )
        r = cohens_kappa(df, "a", "b").collect()[0]
        assert r["n_items"] == 2 and r["po"] == 1.0 and r["pe"] == 1.0
        assert r["kappa"] is None


class TestNormalizeEmbeddings:
    def test_unit_norm_and_zero_vector(self, spark):
        import math

        from h3_indexer_spark.operators.similarity import (
            normalize_embeddings,
        )

        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
            "vec_id int, embedding array<double>",
        )
        rows = {r["vec_id"]: r for r in normalize_embeddings(df).collect()}
        assert rows[1]["l2_norm"] == 5.0
        assert rows[1]["normalized"] == [0.6, 0.8]
        assert rows[2]["normalized"] is None and rows[2]["l2_norm"] == 0.0
        got = math.sqrt(sum(x * x for x in rows[1]["normalized"]))
        assert got == pytest.approx(1.0, abs=1e-15)


class TestNdcg:
    @staticmethod
    def _py_ndcg(ranked, qrels, k=10):
        import math

        rel = {(q, d): r for q, d, r in qrels}
        out = {}
        for q in {q for q, _, _ in qrels}:
            dcg = sum(
                rel.get((q, d), 0) / math.log2(rk + 1)
                for qq, d, rk in ranked
                if qq == q and rk <= k
            )
            ideal = sorted(
                (r for qq, _, r in qrels if qq == q and r > 0),
                reverse=True,
            )[:k]
            idcg = sum(
                r / math.log2(i + 2) for i, r in enumerate(ideal)
            )
            out[q] = (dcg, idcg, dcg / idcg if idcg > 0 else None)
        return out

    def test_matches_python_reference(self, spark):
        from h3_indexer_spark.operators.retrieval import ndcg_at_k

        rng = np.random.RandomState(5)
        queries = ["a", "b", "c"]
        ranked = [
            (q, int(d), rk + 1)
            for q in queries
            for rk, d in enumerate(rng.permutation(40)[:15])
        ]
        qrels = [
            (q, d, int(rng.randint(1, 4)))
            for q in queries
            for d in range(0, 40, 3)
        ]
        got = {
            r["term"]: (r["dcg"], r["idcg"], r["ndcg"])
            for r in ndcg_at_k(
                spark.createDataFrame(
                    ranked, "term string, doc_id long, rank long"
                ),
                spark.createDataFrame(
                    qrels, "term string, doc_id long, rel long"
                ),
                query_col="term", rel_col="rel", k=10,
            ).collect()
        }
        ref = self._py_ndcg(ranked, qrels, k=10)
        assert set(got) == set(ref)
        for q in ref:
            for a, b in zip(got[q], ref[q]):
                assert a == pytest.approx(b, abs=1e-9)

    def test_no_relevant_returned_and_bad_k(self, spark):
        from h3_indexer_spark.operators.retrieval import ndcg_at_k

        ranked = spark.createDataFrame(
            [("a", 1, 1)], "term string, doc_id long, rank long"
        )
        qrels = spark.createDataFrame(
            [("a", 9, 2)], "term string, doc_id long, rel long"
        )
        r = ndcg_at_k(ranked, qrels, query_col="term", rel_col="rel").collect()[0]
        assert r["dcg"] == 0.0 and r["idcg"] == 2.0 and r["ndcg"] == 0.0
        with pytest.raises(ValueError):
            ndcg_at_k(ranked, qrels, query_col="term", rel_col="rel", k=11)


class TestRocAuc:
    @staticmethod
    def _py_auc(pairs):
        # midrank Mann-Whitney reference
        pos = sorted(s for s, y in pairs if y == 1)
        neg = sorted(s for s, y in pairs if y == 0)
        if not pos or not neg:
            return None
        wins = ties = 0
        for p in pos:
            import bisect

            wins += bisect.bisect_left(neg, p)
            ties += bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)
        return (wins + 0.5 * ties) / (len(pos) * len(neg))

    def test_matches_reference_with_ties(self, spark):
        from h3_indexer_spark.operators.analytics import roc_auc

        rng = np.random.RandomState(9)
        # heavy ties: scores quantized to 8 levels
        pairs = [
            (float(rng.randint(0, 8)) / 8.0, int(rng.rand() < 0.4))
            for _ in range(600)
        ]
        df = spark.createDataFrame(pairs, "score double, label int")
        r = roc_auc(df, "score", "label").collect()[0]
        assert r["auc"] == pytest.approx(self._py_auc(pairs), abs=1e-12)
        assert r["n_pos"] == sum(y for _, y in pairs)

    def test_perfect_and_degenerate(self, spark):
        from h3_indexer_spark.operators.analytics import roc_auc

        df = spark.createDataFrame(
            [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)],
            "score double, label int",
        )
        assert roc_auc(df, "score", "label").collect()[0]["auc"] == 1.0
        one_class = spark.createDataFrame(
            [(0.5, 1), (0.7, 1)], "score double, label int"
        )
        assert roc_auc(one_class, "score", "label").collect()[0]["auc"] is None


class TestKsTwoSample:
    @staticmethod
    def _py_ks(a, b):
        vals = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        sa, sb = sorted(a), sorted(b)
        import bisect

        return max(
            abs(bisect.bisect_right(sa, v) * nb - bisect.bisect_right(sb, v) * na)
            for v in vals
        ) / (na * nb)

    def test_matches_reference(self, spark):
        from h3_indexer_spark.operators.analytics import ks_two_sample

        rng = np.random.RandomState(13)
        a = [float(x) for x in np.round(rng.normal(0, 1, 300), 2)]
        b = [float(x) for x in np.round(rng.normal(0.3, 1.2, 250), 2)]
        rows = [(v, "a") for v in a] + [(v, "b") for v in b]
        df = spark.createDataFrame(rows, "value double, grp string")
        r = ks_two_sample(df, "value", "grp", "a", "b").collect()[0]
        assert r["n_a"] == 300 and r["n_b"] == 250
        assert r["d_stat"] == pytest.approx(self._py_ks(a, b), abs=1e-15)

    def test_identical_distributions_and_empty_group(self, spark):
        from h3_indexer_spark.operators.analytics import ks_two_sample

        same = [(float(i % 10), "a") for i in range(100)] + [
            (float(i % 10), "b") for i in range(100)
        ]
        df = spark.createDataFrame(same, "value double, grp string")
        assert ks_two_sample(df, "value", "grp", "a", "b").collect()[0][
            "d_stat"
        ] == 0.0
        only_a = spark.createDataFrame(
            [(1.0, "a")], "value double, grp string"
        )
        r = ks_two_sample(only_a, "value", "grp", "a", "b").collect()[0]
        assert r["d_stat"] is None and r["n_b"] == 0


class TestRound7ContinuationInvariants:
    """Cross-cutting invariants for the continuation batch."""

    def test_auc_invariant_under_monotone_transform(self, spark):
        """AUC consumes only the rank order, so any strictly monotone
        score transform must reproduce the statistic bit-for-bit."""
        from h3_indexer_spark.operators.analytics import roc_auc

        rng = np.random.RandomState(21)
        pairs = [
            (float(rng.randint(0, 50)) / 10.0, int(rng.rand() < 0.3))
            for _ in range(400)
        ]
        df = spark.createDataFrame(pairs, "score double, label int")
        base = roc_auc(df, "score", "label").collect()[0]["auc"]
        import math

        warped = spark.createDataFrame(
            [(math.exp(s) * 7.0 + 1.0, y) for s, y in pairs],
            "score double, label int",
        )
        assert roc_auc(warped, "score", "label").collect()[0]["auc"] == base

    def test_ks_symmetric_in_group_order(self, spark):
        from h3_indexer_spark.operators.analytics import ks_two_sample

        rng = np.random.RandomState(22)
        rows = [
            (float(np.round(rng.normal(i % 2, 1.0), 2)), "ab"[i % 2])
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "value double, grp string")
        d1 = ks_two_sample(df, "value", "grp", "a", "b").collect()[0]
        d2 = ks_two_sample(df, "value", "grp", "b", "a").collect()[0]
        assert d1["d_stat"] == d2["d_stat"]
        assert d1["n_a"] == d2["n_b"] and d1["n_b"] == d2["n_a"]

    def test_rrf_two_signal_name_invariance(self, spark):
        """IEEE addition of two terms is commutative, so renaming the
        two signals must not change any fused score."""
        from h3_indexer_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(i, (i * 7) % 13 + 1) for i in range(13)],
            "doc_id long, rank long",
        )
        b = spark.createDataFrame(
            [(i, (i * 5) % 11 + 1) for i in range(11)],
            "doc_id long, rank long",
        )
        s1 = {
            r["doc_id"]: r["rrf_score"]
            for r in rrf_fuse({"aaa": a, "zzz": b}, "doc_id").collect()
        }
        s2 = {
            r["doc_id"]: r["rrf_score"]
            for r in rrf_fuse({"zzz": a, "aaa": b}, "doc_id").collect()
        }
        assert s1 == s2

    def test_collocation_counts_conserve_totals(self, spark):
        from h3_indexer_spark.operators.textops import collocations

        texts = ["a b a b a b", "b a b a", "c c c"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        rows = collocations(df, "text", min_count=1, k=100).collect()
        # every doc of n tokens contributes n-1 bigrams
        expect_bi = sum(len(t.split()) - 1 for t in texts)
        assert sum(r["c_xy"] for r in rows) == expect_bi

    def test_benford_partition_of_filtered_rows(self, spark):
        from h3_indexer_spark.operators.analytics import benford_profile

        rng = np.random.RandomState(23)
        vals = [float(v) for v in rng.uniform(0.001, 5000, 500)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = benford_profile(df, "v").collect()
        kept = sum(1 for v in vals if v * 100.0 >= 1.0)
        assert sum(r["n"] for r in rows) == kept
        assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-12

    def test_bfs_monotone_in_hop_cap(self, spark):
        """Raising max_hops only ADDS vertices; distances of already
        reached vertices never change."""
        from h3_indexer_spark.operators.graph import bfs_hops

        rng = np.random.RandomState(24)
        edges = spark.createDataFrame(
            [(int(rng.randint(0, 40)), int(rng.randint(0, 40)))
             for _ in range(70)],
            "src long, dst long",
        ).localCheckpoint()
        srcs = spark.createDataFrame([(0,), (39,)], "node long")
        d2 = {r["node"]: r["hops"]
              for r in bfs_hops(edges, srcs, max_hops=2).collect()}
        d4 = {r["node"]: r["hops"]
              for r in bfs_hops(edges, srcs, max_hops=4).collect()}
        assert set(d2) <= set(d4)
        assert all(d4[n] == h for n, h in d2.items())


class TestSeasonalNaiveWape:
    def test_matches_python_reference_with_gaps(self, spark):
        from collections import defaultdict

        from h3_indexer_spark.operators.analytics import (
            seasonal_naive_wape,
        )

        rng = np.random.RandomState(31)
        rows = []
        for g in ("a", "b"):
            for b in range(60):
                if b % 13 == 7:  # gaps: lag windows would mis-align here
                    continue
                for _ in range(rng.randint(1, 4)):
                    rows.append(
                        (g, b, float(np.round(rng.uniform(-5, 20), 4)))
                    )
        df = spark.createDataFrame(rows, "g string, bucket long, v double")
        got = {
            r["g"]: r
            for r in seasonal_naive_wape(df, "g", "bucket", "v", 7).collect()
        }

        rolled = defaultdict(float)
        for g, b, v in rows:
            rolled[(g, b)] = round(rolled[(g, b)] + v, 6)
        for g in ("a", "b"):
            buckets = sorted(b for gg, b in rolled if gg == g)
            sae = saa = 0.0
            scored = 0
            for b in buckets:
                if (g, b - 7) in rolled:
                    scored += 1
                    sae += abs(rolled[(g, b - 7)] - rolled[(g, b)])
                    saa += abs(rolled[(g, b)])
            r = got[g]
            assert r["n_buckets"] == len(buckets)
            assert r["n_scored"] == scored
            assert r["sum_abs_err"] == pytest.approx(sae, abs=1e-6)
            assert r["wape"] == pytest.approx(sae / saa, abs=1e-9)

    def test_perfect_seasonal_signal_has_zero_wape(self, spark):
        from h3_indexer_spark.operators.analytics import (
            seasonal_naive_wape,
        )

        rows = [("g", b, float(b % 5 + 1)) for b in range(40)]
        df = spark.createDataFrame(rows, "g string, bucket long, v double")
        r = seasonal_naive_wape(df, "g", "bucket", "v", 5).collect()[0]
        assert r["wape"] == 0.0 and r["n_scored"] == 35
        with pytest.raises(ValueError):
            seasonal_naive_wape(df, "g", "bucket", "v", 0)


class TestReadability:
    def test_counts_and_score(self, spark):
        from h3_indexer_spark.operators.textops import readability_scores

        df = spark.createDataFrame(
            [(1, "The cat sat. The dog ran!"),
             (2, "word"),
             (3, "   ")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in readability_scores(df).collect()}
        assert set(rows) == {1, 2}  # whitespace-only doc excluded
        r1 = rows[1]
        assert r1["n_words"] == 6 and r1["n_sentences"] == 2
        # vowel groups: e,a,a,e,o,a -> 6
        assert r1["n_syllables"] == 6
        expect = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
        assert r1["flesch"] == expect
        # fragment: sentence count clamps to 1
        assert rows[2]["n_sentences"] == 1


class TestLabelPropagation:
    @staticmethod
    def _reference(edges, rounds):
        from collections import Counter, defaultdict

        adj = defaultdict(set)
        for a, b in edges:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        labels = {v: v for v in adj}
        for _ in range(rounds):
            new = {}
            for v in adj:
                counts = Counter(labels[u] for u in adj[v])
                top = max(counts.values())
                new[v] = min(l for l, c in counts.items() if c == top)
            if new == labels:
                break
            labels = new
        return labels

    @pytest.mark.parametrize("rounds", [0, 1, 3, 5])
    def test_matches_python_reference(self, spark, rounds):
        from h3_indexer_spark.operators.graph import label_propagation

        rng = np.random.RandomState(41)
        # two planted cliques + sparse noise edges
        edges = (
            [(a, b) for a in range(8) for b in range(a + 1, 8)]
            + [(a, b) for a in range(20, 27) for b in range(a + 1, 27)]
            + [(int(rng.randint(0, 30)), int(rng.randint(0, 30)))
               for _ in range(15)]
        )
        got = {
            r["vertex"]: r["label"]
            for r in label_propagation(
                spark.createDataFrame(edges, "src long, dst long"),
                max_rounds=rounds,
            ).collect()
        }
        assert got == self._reference(edges, rounds)

    def test_two_cliques_separate(self, spark):
        from h3_indexer_spark.operators.graph import label_propagation

        edges = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [
            (a, b) for a in range(10, 15) for b in range(a + 1, 15)
        ] + [(4, 10)]  # one bridge
        got = {
            r["vertex"]: r["label"]
            for r in label_propagation(
                spark.createDataFrame(edges, "src long, dst long"),
                max_rounds=5,
            ).collect()
        }
        labs_a = {got[v] for v in range(5)}
        labs_b = {got[v] for v in range(10, 15)}
        assert labs_a.isdisjoint(labs_b)

    def test_bad_rounds_raise(self, spark):
        from h3_indexer_spark.operators.graph import label_propagation

        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            label_propagation(e, max_rounds=-1)

    def test_string_vertex_ids_tiebreak_deterministically(self, spark):
        """String ids are first-class (majority_label / dedup kernels
        contract): the smallest-label tiebreak must be the LEXICAL
        min, not a silent double-cast NULL. Star around 'm' with
        leaves 'a','z': both neighbor labels tie at 1 vote, so 'm'
        must adopt 'a'."""
        from h3_indexer_spark.operators.graph import label_propagation

        edges = [("m", "a"), ("m", "z")]
        got = {
            r["vertex"]: r["label"]
            for r in label_propagation(
                spark.createDataFrame(edges, "src string, dst string"),
                max_rounds=1,
            ).collect()
        }
        assert got["m"] == "a"
        assert got["a"] == "m" and got["z"] == "m"


class TestMutualInformationCells:
    def test_matches_python_reference_and_independence(self, spark):
        import math
        from collections import Counter

        from h3_indexer_spark.operators.analytics import (
            mutual_information_cells,
        )

        rng = np.random.RandomState(51)
        # dependent pair: y tracks x 70% of the time
        rows = []
        for _ in range(400):
            x = "abc"[rng.randint(0, 3)]
            y = x.upper() if rng.rand() < 0.7 else "ABC"[rng.randint(0, 3)]
            rows.append((x, y))
        df = spark.createDataFrame(rows, "x string, y string")
        got = {
            (r["x"], r["y"]): r
            for r in mutual_information_cells(df, "x", "y").collect()
        }
        cxy = Counter(rows)
        cx = Counter(x for x, _ in rows)
        cy = Counter(y for _, y in rows)
        n = len(rows)
        mi = 0.0
        for (x, y), nxy in cxy.items():
            r = got[(x, y)]
            assert r["n_xy"] == nxy and r["n_x"] == cx[x] and r["n_y"] == cy[y]
            term = (nxy / n) * math.log(nxy * n / (cx[x] * cy[y]))
            assert r["mi_term"] == pytest.approx(term, abs=1e-9)
            mi += term
        assert mi > 0.1  # dependence detected
        # independent uniform pair -> MI ~ 0
        ind = spark.createDataFrame(
            [("ab"[i % 2], "CD"[(i // 2) % 2]) for i in range(400)],
            "x string, y string",
        )
        total = sum(
            r["mi_term"]
            for r in mutual_information_cells(ind, "x", "y").collect()
        )
        assert abs(total) < 1e-9

    def test_null_categories_excluded(self, spark):
        from h3_indexer_spark.operators.analytics import (
            mutual_information_cells,
        )

        df = spark.createDataFrame(
            [("a", "B"), ("a", None), (None, "B")], "x string, y string"
        )
        rows = mutual_information_cells(df, "x", "y").collect()
        assert len(rows) == 1 and rows[0]["n"] == 1


class TestJsDivergence:
    def test_matches_python_and_bounds(self, spark):
        import math

        from h3_indexer_spark.operators.analytics import js_divergence_bins

        rng = np.random.RandomState(61)
        a = [(float(v),) for v in rng.uniform(0, 100, 400)]
        b = [(float(v),) for v in rng.uniform(30, 130, 300)]
        breaks = [20.0, 40.0, 60.0, 80.0]
        da = spark.createDataFrame(a, "v double")
        db = spark.createDataFrame(b, "v double")
        rows = js_divergence_bins(da, db, "v", breaks).collect()

        def binof(x):
            for i, e in enumerate(breaks):
                if x < e:
                    return i
            return len(breaks)

        from collections import Counter

        ca = Counter(binof(v) for (v,) in a)
        cb = Counter(binof(v) for (v,) in b)
        total = 0.0
        for r in rows:
            pa, pb = ca[r["bucket"]] / 400, cb[r["bucket"]] / 300
            m = (pa + pb) / 2
            want = (0.5 * pa * math.log(pa / m) if pa > 0 else 0.0) + (
                0.5 * pb * math.log(pb / m) if pb > 0 else 0.0
            )
            assert r["jsd_term"] == pytest.approx(want, abs=1e-8)
            total += r["jsd_term"]
        assert 0.0 < total <= math.log(2) + 1e-9

    def test_identical_inputs_zero_and_empty_bucket_finite(self, spark):
        from h3_indexer_spark.operators.analytics import js_divergence_bins

        d = spark.createDataFrame([(float(i % 50),) for i in range(200)], "v double")
        rows = js_divergence_bins(d, d, "v", [25.0]).collect()
        assert all(r["jsd_term"] == 0.0 for r in rows)
        # disjoint supports: every term finite (PSI would NULL here)
        lo = spark.createDataFrame([(1.0,)] * 50, "v double")
        hi = spark.createDataFrame([(99.0,)] * 50, "v double")
        rows = js_divergence_bins(lo, hi, "v", [50.0]).collect()
        assert all(r["jsd_term"] is not None for r in rows)
        import math

        assert sum(r["jsd_term"] for r in rows) == pytest.approx(
            math.log(2), abs=1e-9
        )
        with pytest.raises(ValueError):
            js_divergence_bins(lo, hi, "v", [])


class TestLorenzDeciles:
    def test_shares_and_monotone_cumulative(self, spark):
        from h3_indexer_spark.operators.analytics import lorenz_deciles

        rng = np.random.RandomState(62)
        rows_in = [
            (i, float(np.round(rng.lognormal(3, 1), 2)))
            for i in range(500)
        ]
        df = spark.createDataFrame(rows_in, "id long, v double")
        rows = lorenz_deciles(df, "v", "id").collect()
        assert [r["decile"] for r in rows] == list(range(1, 11))
        assert sum(r["n"] for r in rows) == 500
        total = sum(v for _, v in rows_in)
        assert sum(r["sum_value"] for r in rows) == pytest.approx(
            total, abs=1e-6
        )
        assert rows[-1]["cum_share"] == pytest.approx(1.0, abs=1e-12)
        # Lorenz curve is convex: shares non-decreasing by decile
        shares = [r["share"] for r in rows]
        assert all(
            shares[i] <= shares[i + 1] + 1e-12 for i in range(9)
        )
        cums = [r["cum_share"] for r in rows]
        assert all(cums[i] < cums[i + 1] for i in range(9))
