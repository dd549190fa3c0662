"""H3 kernel validation: published goldens + structural invariants.

Golden sources:
- the classic SF example published in the H3 documentation
- the reference's own published outputs:
  /root/reference/README.md:280-341 (cell ids, parents, areas) and
  examples/h3_pop_railroad_example.ipynb.
"""

from __future__ import annotations

import math
import random

import pytest

from h3_indexer_spark.functions import geodesy
from h3_indexer_spark.functions.h3 import core, coverage


class TestGoldens:
    def test_sf_point(self):
        c = core.latlng_to_cell(37.7752702151959257, -122.418307270836565, 9)
        assert core.h3_to_string(c) == "8928308280fffff"

    def test_sf_center(self):
        c = core.string_to_h3("8928308280fffff")
        lat, lng = core.cell_to_latlng(c)
        assert abs(lat - 37.77670234943567) < 1e-9
        assert abs(lng - -122.41845932318311) < 1e-9

    def test_parent_golden(self):
        # reference README.md:282 — r3 parent of 840e4d3ffffffff
        h = core.string_to_h3("840e4d3ffffffff")
        assert core.h3_to_string(core.cell_to_parent(h, 3)) == "830e4dfffffffff"

    @pytest.mark.parametrize(
        "cell,golden_km2",
        [
            # reference README.md:282-283 (res 4)
            ("840e4d3ffffffff", 2004.4344472440796),
            ("840e4d7ffffffff", 2011.5201608518523),
            # reference README.md:308-309 (res 6)
            ("86446cae7ffffff", 40.55609958082783),
            ("86446ca57ffffff", 40.58272492454886),
            # reference README.md:336-337 (res 6)
            ("8644697b7ffffff", 40.12018482559633),
            ("86446945fffffff", 40.145249906240224),
        ],
    )
    def test_area_goldens(self, cell, golden_km2):
        h = core.string_to_h3(cell)
        boundary = core.cell_to_boundary(h)
        ring = [(lng, lat) for lat, lng in boundary]
        area = geodesy.spheroid_polygon_area_km2(ring)
        assert abs(area - golden_km2) / golden_km2 < 1e-7


class TestInvariants:
    def test_roundtrip_global(self):
        random.seed(42)
        for res in [0, 1, 2, 3, 5, 6, 9, 12, 15]:
            for _ in range(150):
                lat = math.degrees(math.asin(random.uniform(-1, 1)))
                lng = random.uniform(-180, 180)
                c = core.latlng_to_cell(lat, lng, res)
                assert c != 0
                assert core.is_valid_cell(c)
                clat, clng = core.cell_to_latlng(c)
                assert core.latlng_to_cell(clat, clng, res) == c

    def test_parent_contains_child_center(self):
        """Aperture-7 subdivision does NOT nest children inside parents
        geometrically, so a deep descendant's center may fall outside
        the ancestor hexagon — but only for a small boundary fraction."""
        random.seed(1)
        mismatches = 0
        for _ in range(200):
            lat = math.degrees(math.asin(random.uniform(-1, 1)))
            lng = random.uniform(-180, 180)
            child = core.latlng_to_cell(lat, lng, 9)
            parent = core.cell_to_parent(child, 9 - 1)
            clat, clng = core.cell_to_latlng(child)
            if core.latlng_to_cell(clat, clng, 8) != parent:
                mismatches += 1
        # direct children centers are always well inside the parent
        assert mismatches == 0

    def test_children_roundtrip(self):
        h = core.latlng_to_cell(40.0, -100.0, 4)
        kids = core.cell_to_children(h, 6)
        assert len(kids) == 49
        for k in kids:
            assert core.cell_to_parent(k, 4) == h

    def test_pentagon_count(self):
        pents = [
            bc
            for bc in range(122)
            if core._set_base_cell(
                core._set_resolution(core._set_mode(core.H3_INIT, 1), 0), bc
            )
            and bc in core.PENTAGON_BASE_CELLS
        ]
        assert len(pents) == 12

    def test_res0_area_covers_earth(self):
        total = 0.0
        for bc in range(122):
            h = core._set_base_cell(
                core._set_resolution(core._set_mode(core.H3_INIT, 1), 0), bc
            )
            boundary = core.cell_to_boundary(h)
            ring = [(lng, lat) for lat, lng in boundary]
            total += geodesy.spheroid_polygon_area_km2(ring)
        earth = 4.0 * math.pi * (geodesy.AUTHALIC_RADIUS_M / 1000.0) ** 2
        assert abs(total - earth) / earth < 1e-4

    def test_boundary_vertex_counts(self):
        hexagon = core.latlng_to_cell(40.0, -100.0, 6)
        assert len(core.cell_to_boundary(hexagon)) == 6
        # north pentagon at res 0 (famous Norway pentagon)
        pent = core.latlng_to_cell(64.7, 10.5, 0)
        assert core.is_pentagon(pent)
        assert len(core.cell_to_boundary(pent)) == 5


class TestCoverage:
    def test_neighbors_count(self):
        h = core.latlng_to_cell(35.0, -100.0, 6)
        nbs = coverage.cell_neighbors(h)
        assert len(nbs) == 6
        assert h not in nbs
        # symmetry: each neighbor lists h back
        for nb in nbs:
            assert h in coverage.cell_neighbors(nb)

    def test_pentagon_neighbors(self):
        pent = core.latlng_to_cell(64.7, 10.5, 2)
        assert core.is_pentagon(pent)
        assert len(coverage.cell_neighbors(pent)) == 5

    def test_line_cells_connected(self):
        cells = coverage.line_cells([(-100.0, 35.0), (-99.0, 35.5)], 6)
        assert len(cells) >= 5
        start = core.latlng_to_cell(35.0, -100.0, 6)
        end = core.latlng_to_cell(35.5, -99.0, 6)
        assert start in cells and end in cells

    def test_polyfill_small_square(self):
        ring = [
            (-100.0, 35.0),
            (-99.8, 35.0),
            (-99.8, 35.2),
            (-100.0, 35.2),
        ]
        cells = coverage.polyfill(ring, 6)
        assert len(cells) >= 4
        # every cell center inside must be present; sample the centroid
        c = core.latlng_to_cell(35.1, -99.9, 6)
        assert c in cells

    def test_polyfill_interior_only(self):
        ring = [
            (-100.0, 35.0),
            (-99.5, 35.0),
            (-99.5, 35.5),
            (-100.0, 35.5),
        ]
        with_b = set(coverage.polyfill(ring, 6, include_boundary_cells=True))
        without_b = set(coverage.polyfill(ring, 6, include_boundary_cells=False))
        assert without_b <= with_b
        for cell in without_b:
            lat, lng = core.cell_to_latlng(cell)
            assert coverage._point_in_ring(lng, lat, ring)


class TestVectorizedKernel:
    """The numpy batch kernel must agree with the scalar path exactly
    (same float op order) — including pentagon fallback rows."""

    def test_batch_matches_scalar_global(self):
        import numpy as np

        from h3_indexer_spark.functions.h3 import core
        from h3_indexer_spark.functions.h3.vectorized import (
            latlng_to_cell_batch,
        )

        rng = np.random.default_rng(123)
        lat = rng.uniform(-89.5, 89.5, 4000)
        lng = rng.uniform(-180.0, 180.0, 4000)
        for res in (3, 5, 8):
            batch = latlng_to_cell_batch(lat, lng, res)
            for ix in range(0, 4000, 7):
                assert batch[ix] == core.latlng_to_cell(
                    float(lat[ix]), float(lng[ix]), res
                )
            assert (batch == 0).sum() == 0

    def test_batch_pentagon_neighborhood(self):
        import numpy as np

        from h3_indexer_spark.functions.h3 import core
        from h3_indexer_spark.functions.h3.vectorized import (
            latlng_to_cell_batch,
        )

        # points clustered around a res-0 pentagon center (base cell 4)
        base_pent = core._set_base_cell(
            core._set_resolution(
                core._set_mode(core.H3_INIT, core._MODE_CELL), 0
            ),
            4,
        )
        clat, clng = core.cell_to_latlng(base_pent)
        rng = np.random.default_rng(7)
        lat = np.clip(clat + rng.uniform(-3, 3, 500), -89.9, 89.9)
        lng = clng + rng.uniform(-3, 3, 500)
        batch = latlng_to_cell_batch(lat, lng, 6)
        for ix in range(500):
            assert batch[ix] == core.latlng_to_cell(
                float(lat[ix]), float(lng[ix]), 6
            )

    def test_batch_area_matches_scalar(self):
        import numpy as np

        from h3_indexer_spark.functions.h3 import core
        from h3_indexer_spark.functions.h3.vectorized import (
            cell_area_km2_batch,
            latlng_to_cell_batch,
        )
        from h3_indexer_spark.functions.udfs import _cell_area_km2

        rng = np.random.default_rng(11)
        lat = rng.uniform(-85.0, 85.0, 3000)
        lng = rng.uniform(-180.0, 180.0, 3000)
        # tolerance widens with res: the spherical-excess cancellation
        # amplifies ulp-level libm differences at fine resolutions (the
        # scalar path has the same intrinsic noise vs ground truth)
        for res, tol in ((4, 1e-8), (7, 1e-6), (9, 1e-4)):
            cells = np.unique(latlng_to_cell_batch(lat, lng, res))
            areas = cell_area_km2_batch(cells)
            assert (areas > 0).all()
            for ix in range(0, len(cells), 17):
                sa = _cell_area_km2(int(cells[ix]))
                assert abs(areas[ix] - sa) / sa < tol, (
                    res, core.h3_to_string(int(cells[ix]))
                )

    def test_batch_center_matches_scalar(self):
        import numpy as np

        from h3_indexer_spark.functions.h3 import core
        from h3_indexer_spark.functions.h3.vectorized import (
            cell_to_latlng_batch,
            latlng_to_cell_batch,
        )

        rng = np.random.default_rng(42)
        lat = rng.uniform(-85.0, 85.0, 2000)
        lng = rng.uniform(-180.0, 180.0, 2000)
        for res in (3, 6, 9):
            cells = np.unique(latlng_to_cell_batch(lat, lng, res))
            blat, blng = cell_to_latlng_batch(cells)
            for ix in range(len(cells)):
                slat, slng = core.cell_to_latlng(int(cells[ix]))
                assert abs(blat[ix] - slat) < 1e-9, hex(int(cells[ix]))
                assert abs(blng[ix] - slng) < 1e-9, hex(int(cells[ix]))

    def test_polyfill_complete_vs_dense_sampling(self):
        """Interior cells found by polyfill must exactly equal the set
        derived independently: cells hit by a dense point grid whose
        scalar center passes the even-odd test."""
        import numpy as np

        from h3_indexer_spark.functions.h3 import core, coverage
        from h3_indexer_spark.functions.h3.vectorized import (
            latlng_to_cell_batch,
        )

        rings = [
            # convex quad
            [(-100.0, 35.0), (-99.6, 35.1), (-99.5, 35.6), (-100.1, 35.4)],
            # concave polygon (notched)
            [(10.0, 50.0), (10.6, 50.0), (10.6, 50.5), (10.3, 50.2),
             (10.0, 50.5)],
        ]
        for ring in rings:
            for res in (5, 6):
                got = set(
                    coverage.polyfill(
                        ring, res, include_boundary_cells=False
                    )
                )
                lats = [p[1] for p in ring]
                lngs = [p[0] for p in ring]
                step = 0.15 * coverage._EDGE_KM[res] / coverage._EARTH_KM * (
                    180.0 / math.pi
                )
                gl = np.arange(min(lats) - step, max(lats) + step, step)
                gg = np.arange(min(lngs) - step, max(lngs) + step, step)
                la, ln = np.meshgrid(gl, gg, indexing="ij")
                cand = np.unique(
                    latlng_to_cell_batch(la.ravel(), ln.ravel(), res)
                )
                want = set()
                for c in cand:
                    clat, clng = core.cell_to_latlng(int(c))
                    if coverage._point_in_ring(clng, clat, ring):
                        want.add(int(c))
                assert got == want, (ring, res, got ^ want)
