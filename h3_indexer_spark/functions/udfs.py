"""Arrow-vectorized UDF layer bridging the pure-Python kernels into
Spark (SURVEY.md §2.7). The reference used row-at-a-time ``@udf``s
(U1-U3); everything here is batch-oriented (pandas UDF / mapInPandas)
with worker-local memoization of per-cell geometry — the batch-level
equivalent of the reference's distinct-then-join-back optimization
(h3_indexer.py:116-127) without the extra shuffle.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from h3_indexer_spark.config.vector import AllocationMethod, GeometryType
from h3_indexer_spark.constants import (
    GEOM_WKT,
    H3_AREA_KM2,
    H3_INDEX,
    RATIO,
)
from h3_indexer_spark.functions import geodesy, geometry
from h3_indexer_spark.functions.h3 import core, coverage


# --- memoized per-cell geometry (worker-local "distinct" optimization) ----


@lru_cache(maxsize=262144)
def _cell_boundary_ring(cell: int) -> tuple:
    """Hex boundary as an (lng, lat) ring, cached per worker."""
    return tuple((lng, lat) for lat, lng in core.cell_to_boundary(cell))


@lru_cache(maxsize=262144)
def _cell_area_km2(cell: int) -> float:
    return geodesy.spheroid_polygon_area_km2(list(_cell_boundary_ring(cell)))


_AREA_CACHE: dict[int, float] = {}
_AREA_CACHE_MAX = 2_000_000


def areas_for_cells(cells: list[int]) -> list[float]:
    """Areas for many cells: vectorized batch compute of cache misses
    (cell_area_km2_batch — agrees with the scalar path to the
    spherical-excess noise floor), then a dict lookup. The cache is
    bounded so a long-lived worker at fine resolutions cannot grow
    without limit."""
    import numpy as np

    from h3_indexer_spark.functions.h3.vectorized import cell_area_km2_batch

    miss = [c for c in dict.fromkeys(cells) if c not in _AREA_CACHE]
    if miss:
        if len(_AREA_CACHE) + len(miss) > _AREA_CACHE_MAX:
            _AREA_CACHE.clear()
        vals = cell_area_km2_batch(np.asarray(miss, dtype=np.int64))
        _AREA_CACHE.update(zip(miss, vals.tolist()))
    return [_AREA_CACHE[c] for c in cells]


@lru_cache(maxsize=262144)
def _cell_wkt(cell: int) -> str:
    ring = list(_cell_boundary_ring(cell))
    ring.append(ring[0])
    return geometry.to_wkt("polygon", [ring])


# --- scalar pandas UDFs (U2/U3 parity surface) ----------------------------


@F.pandas_udf(StringType())
def h3_to_wkt_udf(h3_index: pd.Series) -> pd.Series:
    """U3 parity (reference spark_udfs.py:48-67): hex cell boundary as
    a WKT polygon."""
    return h3_index.map(
        lambda s: _cell_wkt(core.string_to_h3(s)) if s else None
    )


@F.pandas_udf(DoubleType())
def h3_area_km2_udf(h3_index: pd.Series) -> pd.Series:
    """Spheroid cell area (reference geospatial.py:128-135 used
    ST_AreaSpheroid over the hex geometry). Vectorized batch compute."""
    mask = h3_index.notna()
    out = pd.Series([None] * len(h3_index), dtype="float64")
    if mask.any():
        ints = [core.string_to_h3(s) for s in h3_index[mask]]
        out[mask] = areas_for_cells(ints)
    return out


def make_latlng_to_cell_udf(res: int):
    @F.pandas_udf(StringType())
    def latlng_to_cell_udf(lat: pd.Series, lng: pd.Series) -> pd.Series:
        from h3_indexer_spark.functions.h3.vectorized import (
            latlng_to_cell_batch,
        )

        mask = lat.notna() & lng.notna()
        out = pd.Series([None] * len(lat), dtype="object")
        if mask.any():
            cells = latlng_to_cell_batch(
                lat[mask].to_numpy(dtype="float64"),
                lng[mask].to_numpy(dtype="float64"),
                res,
            )
            out[mask] = [core.h3_to_string(int(c)) for c in cells]
        return out

    return latlng_to_cell_udf


@F.pandas_udf(StringType())
def canonical_wkt_udf(geom: pd.Series) -> pd.Series:
    """G1/G2/G9: sniff encoding (WKT/WKB-hex/GeoJSON/binary), repair,
    re-encode as canonical WKT; null for unparseable/irreparable rows
    (reference geospatial.py:55-166 semantics)."""

    def conv(v):
        if v is None:
            return None
        try:
            parts = geometry.parse_any_parts(v)
            repaired = [geometry.repair(k, r) for k, r in parts]
            kept = [p for p in repaired if p is not None]
            if not kept:
                return None
            return geometry.parts_to_wkt(kept)
        except Exception:
            return None

    return geom.map(conv)


# --- the indexing kernel: feature → (cell, ratio, metric) rows ------------


def _index_point(rings, res: int, cell: int | None = None):
    if cell is None:
        (lng, lat) = rings[0][0]
        cell = core.latlng_to_cell(lat, lng, res)
    return [(cell, 1.0)], 1.0


def _expand_with_neighbors(cells: list[int]) -> list[int]:
    """Sampling-based coverage can miss a cell clipped at a tiny corner
    (the classic grid-path corner cut); every such cell is adjacent to a
    sampled one, so the sampled set ∪ its neighbors is a complete
    candidate superset. Extras are filtered by a zero clip ratio."""
    seen = dict.fromkeys(cells)
    for c in cells:
        for nb in coverage.cell_neighbors(c):
            seen.setdefault(nb)
    return list(seen)


def _index_lines(lines, res: int, method: AllocationMethod, sampled=None):
    """LINE allocation over one or more linestrings (a MULTILINESTRING
    feature allocates across the union of its members): ratio =
    clipped_length(cell) / total_length over ALL parts."""
    if sampled is None:
        sampled = [c for line in lines for c in coverage.line_cells(line, res)]
        sampled = list(dict.fromkeys(sampled))
    total_len = sum(geodesy.planar_line_length(line) for line in lines)
    sampled_set = set(sampled)
    out = []
    for cell in _expand_with_neighbors(sampled):
        is_sampled = cell in sampled_set
        if method == AllocationMethod.PASS_THROUGH:
            if is_sampled:
                out.append((cell, 1.0))
            continue
        hexagon = list(_cell_boundary_ring(cell))
        clipped = 0.0
        for line in lines:
            pieces = geometry.clip_line_convex(line, hexagon)
            clipped += sum(geodesy.planar_line_length(p) for p in pieces)
        ratio = clipped / total_len if total_len > 0 else 0.0
        if ratio > 0.0 or is_sampled:
            out.append((cell, ratio))
    metric = (
        sum(geodesy.spheroid_line_length_m(line) for line in lines) / 1000.0
    )  # total_length_km
    return out, metric


def _index_line(rings, res: int, method: AllocationMethod, sampled=None):
    return _index_lines([rings[0]], res, method, sampled)


def _split_outer_holes(rings):
    outer = rings[0]
    holes = rings[1:]
    if outer[0] == outer[-1]:
        outer = outer[:-1]
    holes = [h[:-1] if h and h[0] == h[-1] else h for h in holes]
    return outer, holes


def _index_polygons(
    polys, res: int, method: AllocationMethod, boundaries=None
):
    """POLYGON allocation over one or more polygons (a MULTIPOLYGON
    feature allocates across the union of its members, assumed
    disjoint): ratio = kept_area(cell) / total_area over ALL parts."""
    parts = [_split_outer_holes(rings) for rings in polys]
    metric = sum(
        geodesy.spheroid_polygon_area_m2(outer)
        - sum(geodesy.spheroid_polygon_area_m2(h) for h in holes)
        for outer, holes in parts
    ) / 1.0e6  # total_area_km2
    if method == AllocationMethod.CENTROID:
        verts = [p for outer, _ in parts for p in outer]
        cx = sum(x for x, _ in verts) / len(verts)
        cy = sum(y for _, y in verts) / len(verts)
        cell = core.latlng_to_cell(cy, cx, res)
        return [(cell, 1.0)], metric
    total_area = sum(
        geodesy.planar_polygon_area(outer)
        - sum(geodesy.planar_polygon_area(h) for h in holes)
        for outer, holes in parts
    )
    if boundaries is None:
        boundaries = [None] * len(parts)
    cells: dict[int, None] = {}
    for (outer, holes), boundary in zip(parts, boundaries):
        for c in coverage.polyfill(
            outer, res, holes=holes or None, boundary_cells=boundary
        ):
            cells.setdefault(c)
    sampled = set(cells)
    out = []
    for cell in _expand_with_neighbors(list(cells)):
        hexagon = list(_cell_boundary_ring(cell))
        area = 0.0
        for outer, holes in parts:
            kept = geometry.clip_polygon_convex(outer, hexagon)
            part_area = (
                abs(geometry._signed_area(kept)) if len(kept) >= 3 else 0.0
            )
            for hole in holes:
                kh = geometry.clip_polygon_convex(hole, hexagon)
                if len(kh) >= 3:
                    part_area -= abs(geometry._signed_area(kh))
            area += part_area
        ratio = area / total_area if total_area > 0 else 0.0
        if ratio > 0.0 or cell in sampled:
            out.append((cell, ratio))
    return out, metric


def _index_polygon(rings, res: int, method: AllocationMethod, boundary=None):
    return _index_polygons(
        [rings], res, method, [boundary] if boundary is not None else None
    )


def make_index_map_fn(
    uid_col: str,
    geometry_type: str,
    method: AllocationMethod,
    res: int,
    metric_col: str,
):
    """Build a mapInPandas function: (uid, geom_wkt) batches →
    exploded (uid, h3_index, ratio, metric, h3_area_km2) rows.

    This is the whole Index stage kernel in ONE narrow pass — where the
    reference round-trips through explode + distinct + two joins
    (h3_indexer.py:106-127), we compute coverage, ratio, and cell
    geometry together per feature, with per-cell results memoized on
    the worker. No shuffle until the final repartition-for-write.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from h3_indexer_spark.functions.h3.vectorized import (
            latlng_to_cell_batch,
        )

        for pdf in batches:
            # fast path: a pure-POINT batch parses with one vectorized
            # regex extract and indexes with one batch call — no
            # per-row python at all (the common 100 TB ingest shape)
            if geometry_type == GeometryType.POINT:
                ext = pdf[GEOM_WKT].str.extract(
                    r"^\s*POINT\s*\(\s*(-?[\d.eE+-]+)\s+(-?[\d.eE+-]+)"
                    r"\s*\)\s*$"
                )
                lngs = pd.to_numeric(ext[0], errors="coerce")
                lats = pd.to_numeric(ext[1], errors="coerce")
                ok = lngs.notna() & lats.notna()
                if ok.all():
                    cell_arr = latlng_to_cell_batch(
                        lats.to_numpy(), lngs.to_numpy(), res
                    )
                    keep = cell_arr != 0
                    cell_ints = [int(c) for c in cell_arr[keep]]
                    yield pd.DataFrame(
                        {
                            uid_col: pdf[uid_col][keep].reset_index(
                                drop=True
                            ),
                            H3_INDEX: pd.Series(
                                [core.h3_to_string(c) for c in cell_ints],
                                dtype="object",
                            ),
                            RATIO: 1.0,
                            metric_col: 1.0,
                            H3_AREA_KM2: pd.Series(
                                areas_for_cells(cell_ints), dtype="float64"
                            ),
                        }
                    )
                    continue

            # phase 1: parse + generate every sample point of the batch,
            # then index ALL samples in one vectorized call. Features
            # may be MULTI* — each member becomes a part; allocation
            # ratios are computed across the union of a feature's parts.
            feats = []  # (uid, [(kind, rings, lo, hi), ...])
            lat_parts, lng_parts = [], []
            offset = 0
            for uid, wkt in zip(pdf[uid_col], pdf[GEOM_WKT]):
                if wkt is None:
                    continue
                try:
                    parts = geometry.parse_wkt_parts(wkt)
                except geometry.GeometryError:
                    continue
                plist = []
                for kind, rings in parts:
                    if kind == "point":
                        (lng, lat) = rings[0][0]
                        lat_parts.append(np.asarray([lat]))
                        lng_parts.append(np.asarray([lng]))
                        n = 1
                    elif kind == "line":
                        la, ln = coverage.line_sample_points(rings[0], res)
                        lat_parts.append(la)
                        lng_parts.append(ln)
                        n = len(la)
                    elif method == AllocationMethod.CENTROID:
                        n = 0  # centroid cell computed scalar in phase 2
                    else:
                        ring = rings[0]
                        closed = (
                            ring if ring[0] == ring[-1] else ring + [ring[0]]
                        )
                        la, ln = coverage.line_sample_points(closed, res)
                        lat_parts.append(la)
                        lng_parts.append(ln)
                        n = len(la)
                    plist.append((kind, rings, offset, offset + n))
                    offset += n
                feats.append((uid, plist))
            sample_cells = (
                latlng_to_cell_batch(
                    np.concatenate(lat_parts), np.concatenate(lng_parts), res
                )
                if lat_parts
                else np.empty(0, dtype=np.int64)
            )

            # phase 2: per-feature geometry work on the precomputed cells
            uids, cells, ratios, metrics = [], [], [], []
            for uid, plist in feats:
                kinds = {k for k, _, _, _ in plist}
                if len(kinds) != 1:
                    continue  # mixed-kind collections are not allocatable
                kind = next(iter(kinds))
                if kind == "point":
                    seen = dict.fromkeys(
                        int(sample_cells[lo]) for _, _, lo, _ in plist
                    )
                    pairs, metric = [(c, 1.0) for c in seen], 1.0
                elif kind == "line":
                    sampled = list(
                        dict.fromkeys(
                            c
                            for _, _, lo, hi in plist
                            for c in coverage.dedupe_cells(
                                sample_cells[lo:hi]
                            )
                        )
                    )
                    pairs, metric = _index_lines(
                        [rings[0] for _, rings, _, _ in plist],
                        res,
                        method,
                        sampled=sampled,
                    )
                else:
                    pairs, metric = _index_polygons(
                        [rings for _, rings, _, _ in plist],
                        res,
                        method,
                        boundaries=[
                            (
                                coverage.dedupe_cells(sample_cells[lo:hi])
                                if hi > lo
                                else None
                            )
                            for _, _, lo, hi in plist
                        ],
                    )
                for cell, ratio in pairs:
                    if cell == 0:
                        continue
                    uids.append(uid)
                    cells.append(cell)
                    ratios.append(ratio)
                    metrics.append(metric)
            areas = areas_for_cells(cells)
            yield pd.DataFrame(
                {
                    uid_col: pd.Series(uids, dtype=pdf[uid_col].dtype),
                    H3_INDEX: pd.Series(
                        [core.h3_to_string(c) for c in cells], dtype="object"
                    ),
                    RATIO: pd.Series(ratios, dtype="float64"),
                    metric_col: pd.Series(metrics, dtype="float64"),
                    H3_AREA_KM2: pd.Series(areas, dtype="float64"),
                }
            )

    return fn
