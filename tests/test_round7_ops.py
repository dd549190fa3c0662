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
