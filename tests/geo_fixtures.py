"""Deterministic geospatial fixture tables (FIXTURES.md Part B).

Written as plain parquet with WKT geometry columns (seed 42, CONUS-ish
domain lon [-105,-95] lat [30,40]). Generated once into
``tests/_geo_fixtures/`` and reused.
"""

from __future__ import annotations

import math
import random
from pathlib import Path

import pandas as pd

FIXTURE_DIR = Path(__file__).resolve().parent / "_geo_fixtures"

LON0, LON1 = -105.0, -95.0
LAT0, LAT1 = 30.0, 40.0
N = 300  # compact but multi-cell at res 6


def _rng():
    return random.Random(42)


def gen_points_latlon(n: int = N) -> pd.DataFrame:
    r = _rng()
    return pd.DataFrame(
        {
            "pixel_id": range(n),
            "latitude": [r.uniform(LAT0, LAT1) for _ in range(n)],
            "longitude": [r.uniform(LON0, LON1) for _ in range(n)],
            "population": [r.lognormvariate(3.0, 1.0) for _ in range(n)],
            "reading": [r.uniform(-50.0, 50.0) for _ in range(n)],
        }
    )


def gen_points_wkt(n: int = N) -> pd.DataFrame:
    r = _rng()
    rows = []
    for i in range(n):
        x = r.uniform(LON0, LON1)
        y = r.uniform(LAT0, LAT1)
        u = r.random()
        if u < 0.02:
            geom = None
        elif u < 0.03:
            geom = "POINT (not a number)"
        else:
            geom = f"POINT ({x} {y})"
        rows.append((i, geom, r.uniform(0.0, 100.0)))
    return pd.DataFrame(rows, columns=["point_id", "geometry", "value"])


def gen_lines(n: int = N) -> pd.DataFrame:
    r = _rng()
    rows = []
    for i in range(n):
        x = r.uniform(LON0 + 1, LON1 - 1)
        y = r.uniform(LAT0 + 1, LAT1 - 1)
        pts = [(x, y)]
        for _ in range(r.randint(1, 5)):
            ang = r.uniform(0, 2 * math.pi)
            step = r.uniform(0.05, 0.8)
            x += step * math.cos(ang)
            y += step * math.sin(ang)
            pts.append((x, y))
        wkt = "LINESTRING (" + ", ".join(f"{a} {b}" for a, b in pts) + ")"
        rows.append(
            (f"route_{i:06d}", wkt, r.lognormvariate(2.0, 1.0), r.randint(0, 10000))
        )
    return pd.DataFrame(
        rows, columns=["route_id", "geometry", "emissions", "traffic"]
    )


def gen_polygons(n: int = N) -> pd.DataFrame:
    r = _rng()
    rows = []
    for i in range(n):
        cx = r.uniform(LON0 + 1, LON1 - 1)
        cy = r.uniform(LAT0 + 1, LAT1 - 1)
        radius = r.uniform(0.03, 0.5)
        k = r.randint(5, 9)
        pts = []
        for v in range(k):
            ang = 2 * math.pi * v / k
            rad = radius * r.uniform(0.7, 1.0)
            pts.append((cx + rad * math.cos(ang), cy + rad * math.sin(ang)))
        pts.append(pts[0])
        wkt = "POLYGON ((" + ", ".join(f"{a} {b}" for a, b in pts) + "))"
        rows.append(
            (
                f"{48000 + i:09d}",
                wkt,
                r.lognormvariate(5.0, 1.5),
                r.uniform(0.0, 10.0),
            )
        )
    return pd.DataFrame(
        rows, columns=["geoid", "geometry", "population", "area_attr"]
    )


def gen_points_bad_pk() -> pd.DataFrame:
    df = gen_points_latlon(50)
    df.loc[10, "pixel_id"] = df.loc[5, "pixel_id"]
    df["label"] = "cat"
    return df


def ensure_fixtures() -> Path:
    FIXTURE_DIR.mkdir(exist_ok=True)
    gens = {
        "geo_points_latlon": gen_points_latlon,
        "geo_points_wkt": gen_points_wkt,
        "geo_lines": gen_lines,
        "geo_polygons": gen_polygons,
        "geo_points_bad_pk": gen_points_bad_pk,
    }
    for name, fn in gens.items():
        path = FIXTURE_DIR / f"{name}.parquet"
        if not path.exists():
            fn().to_parquet(path, index=False)
    return FIXTURE_DIR
