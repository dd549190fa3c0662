"""Vectorized (numpy) batch implementation of ``latlng_to_cell``.

Bit-compatible with the scalar kernel in ``core.py`` — every floating
op is performed in the same order on float64, so borderline points
resolve to the same cell. Rows that land on a pentagon base cell (12
of 122; the digit-rotation special cases there are branchy and rare)
fall back to the scalar path.

This is the hot function of the whole geo engine: every sampled point
of every line/polygon boundary and every POINT feature goes through
it. The scalar path costs ~65 µs/point; this path amortizes to well
under 1 µs/point at batch sizes the Arrow reader produces.
"""

from __future__ import annotations

import math

import numpy as np

from h3_indexer_spark.functions.h3 import core
from h3_indexer_spark.functions.h3.tables import (
    FACE_AXES_AZ_RADS_CII,
    FACE_CENTER_GEO,
    INV_RES0_U_GNOMONIC,
    M_AP7_ROT_RADS,
    M_SIN60,
    M_SQRT7,
    NUM_ICOSA_FACES,
    PENTAGON_BASE_CELLS,
)

_TWO_PI = 2.0 * math.pi

# --- static arrays --------------------------------------------------------

_FACE_VEC3 = np.asarray(
    [core._geo_to_vec3(lat, lng) for lat, lng in FACE_CENTER_GEO],
    dtype=np.float64,
)  # (20, 3)
_FACE_LAT = np.asarray([g[0] for g in FACE_CENTER_GEO], dtype=np.float64)
_FACE_LNG = np.asarray([g[1] for g in FACE_CENTER_GEO], dtype=np.float64)
_FACE_AX0 = np.asarray(
    [FACE_AXES_AZ_RADS_CII[f][0] for f in range(NUM_ICOSA_FACES)],
    dtype=np.float64,
)

# digit of a normalized unit ijk: index by i*4 + j*2 + k
_UNIT_DIGIT = np.full(8, core.INVALID_DIGIT, dtype=np.int64)
for _d, (_i, _j, _k) in enumerate(core.UNIT_VECS):
    _UNIT_DIGIT[_i * 4 + _j * 2 + _k] = _d

_ROT_CCW_ARR = np.zeros(8, dtype=np.int64)
for _src, _dst in core._ROT_CCW.items():
    _ROT_CCW_ARR[_src] = _dst

_PENTAGONS = np.asarray(sorted(PENTAGON_BASE_CELLS), dtype=np.int64)

_PATCH_BC = None
_PATCH_ROT = None


def _patch_tables():
    """face_patch dict → dense (face, i, j, k) int lookup arrays."""
    global _PATCH_BC, _PATCH_ROT
    if _PATCH_BC is None:
        bc = np.full((NUM_ICOSA_FACES, 3, 3, 3), -1, dtype=np.int64)
        rot = np.zeros((NUM_ICOSA_FACES, 3, 3, 3), dtype=np.int64)
        for (f, i, j, k), (b, r) in core._derived().face_patch.items():
            bc[f, i, j, k] = b
            rot[f, i, j, k] = r
        _PATCH_BC, _PATCH_ROT = bc, rot
    return _PATCH_BC, _PATCH_ROT


# --- vector helpers (same op order as core.py scalars) --------------------


def _pos_angle_v(a: np.ndarray) -> np.ndarray:
    a = np.where(a < 0.0, a + _TWO_PI, a)
    return np.where(a >= _TWO_PI, a - _TWO_PI, a)


def _lround_v(x: np.ndarray) -> np.ndarray:
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


def _normalize_v(i, j, k):
    neg = i < 0
    j = j - np.where(neg, i, 0)
    k = k - np.where(neg, i, 0)
    i = np.where(neg, 0, i)
    neg = j < 0
    i = i - np.where(neg, j, 0)
    k = k - np.where(neg, j, 0)
    j = np.where(neg, 0, j)
    neg = k < 0
    i = i - np.where(neg, k, 0)
    j = j - np.where(neg, k, 0)
    k = np.where(neg, 0, k)
    m = np.minimum(np.minimum(i, j), k)
    m = np.where(m > 0, m, 0)
    return i - m, j - m, k - m


def _up_ap7_v(i, j, k):
    a = i - k
    b = j - k
    return _normalize_v(
        _lround_v((3 * a - b) / 7.0),
        _lround_v((a + 2 * b) / 7.0),
        np.zeros_like(i),
    )


def _up_ap7r_v(i, j, k):
    a = i - k
    b = j - k
    return _normalize_v(
        _lround_v((2 * a + b) / 7.0),
        _lround_v((3 * b - a) / 7.0),
        np.zeros_like(i),
    )


def _down_ap7_v(i, j, k):
    return _normalize_v(3 * i + j, 3 * j + k, i + 3 * k)


def _down_ap7r_v(i, j, k):
    return _normalize_v(3 * i + k, i + 3 * j, j + 3 * k)


def _hex2d_to_ijk_v(x: np.ndarray, y: np.ndarray):
    """Vector transcription of core._hex2d_to_ijk (branch tree →
    masks; same comparisons, same arithmetic)."""
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / M_SIN60
    x1 = a1 + x2 / 2.0
    m1 = x1.astype(np.int64)  # truncation of non-negative == floor
    m2 = x2.astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    # i/j start as m1/m2 and get +1 under the same conditions as scalar
    i = m1.copy()
    j = m2.copy()

    c_lo = r1 < 0.5
    c_lo_lo = r1 < (1.0 / 3.0)
    c_hi_lo = r1 < (2.0 / 3.0)

    # r1 < 1/3
    b1 = c_lo & c_lo_lo
    j = np.where(b1 & ~(r2 < (1.0 + r1) / 2.0), m2 + 1, j)
    # 1/3 <= r1 < 1/2
    b2 = c_lo & ~c_lo_lo
    j = np.where(b2 & ~(r2 < (1.0 - r1)), m2 + 1, j)
    i = np.where(b2 & ((1.0 - r1) <= r2) & (r2 < 2.0 * r1), m1 + 1, i)
    # 1/2 <= r1 < 2/3
    b3 = ~c_lo & c_hi_lo
    j = np.where(b3 & ~(r2 < (1.0 - r1)), m2 + 1, j)
    i = np.where(
        b3 & ~(((2.0 * r1 - 1.0) < r2) & (r2 < (1.0 - r1))), m1 + 1, i
    )
    # r1 >= 2/3
    b4 = ~c_lo & ~c_hi_lo
    i = np.where(b4, m1 + 1, i)
    j = np.where(b4 & ~(r2 < r1 / 2.0), m2 + 1, j)

    # fold across axes
    xneg = x < 0.0
    jeven = (j % 2) == 0
    axisi_e = j // 2
    axisi_o = (j + 1) // 2
    i = np.where(
        xneg & jeven,
        i - 2 * (i - axisi_e),
        np.where(xneg, i - (2 * (i - axisi_o) + 1), i),
    )
    k = np.zeros_like(i)
    yneg = y < 0.0
    i = np.where(yneg, i - (2 * j + 1) // 2, i)
    j = np.where(yneg, -j, j)
    return _normalize_v(i, j, k)


# --- the batch kernel -----------------------------------------------------


def latlng_to_cell_batch(
    lat_deg: np.ndarray, lng_deg: np.ndarray, res: int
) -> np.ndarray:
    """H3 cell ids (int64) for arrays of lat/lng degrees."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    n = lat.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)

    # closest icosahedron face (same squared-distance arithmetic)
    cl = np.cos(lat)
    v = np.stack((cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)), axis=1)
    d = _FACE_VEC3[None, :, :] - v[:, None, :]
    sqd_all = d[:, :, 0] ** 2 + d[:, :, 1] ** 2 + d[:, :, 2] ** 2
    face = np.argmin(sqd_all, axis=1)
    sqd = sqd_all[np.arange(n), face]

    # gnomonic hex2d on that face
    r = np.arccos(1.0 - sqd / 2.0)
    tiny = r < core.EPSILON
    fc_lat = _FACE_LAT[face]
    fc_lng = _FACE_LNG[face]
    az = np.arctan2(
        np.cos(lat) * np.sin(lng - fc_lng),
        np.cos(fc_lat) * np.sin(lat)
        - np.sin(fc_lat) * np.cos(lat) * np.cos(lng - fc_lng),
    )
    theta = _pos_angle_v(_FACE_AX0[face] - _pos_angle_v(az))
    if core.is_class_iii(res):
        theta = _pos_angle_v(theta - M_AP7_ROT_RADS)
    rr = np.tan(r) * INV_RES0_U_GNOMONIC
    for _ in range(res):
        rr = rr * M_SQRT7
    x = np.where(tiny, 0.0, rr * np.cos(theta))
    y = np.where(tiny, 0.0, rr * np.sin(theta))

    i, j, k = _hex2d_to_ijk_v(x, y)

    # digits from res down to 1, then the res-0 base-cell patch lookup
    h = np.full(
        n,
        core._set_resolution(
            core._set_mode(core.H3_INIT, core._MODE_CELL), res
        ),
        dtype=np.int64,
    )
    for rr_ in range(res - 1, -1, -1):
        li, lj, lk = i, j, k
        if core.is_class_iii(rr_ + 1):
            i, j, k = _up_ap7_v(i, j, k)
            ci, cj, ck = _down_ap7_v(i, j, k)
        else:
            i, j, k = _up_ap7r_v(i, j, k)
            ci, cj, ck = _down_ap7r_v(i, j, k)
        di, dj, dk = _normalize_v(li - ci, lj - cj, lk - ck)
        digit = _UNIT_DIGIT[di * 4 + dj * 2 + dk]
        shift = 3 * (core.MAX_H3_RES - (rr_ + 1))
        h = (h & ~np.int64(0x7 << shift)) | (digit << shift)

    patch_bc, patch_rot = _patch_tables()
    in_range = (i <= 2) & (j <= 2) & (k <= 2)
    ic = np.clip(i, 0, 2)
    jc = np.clip(j, 0, 2)
    kc = np.clip(k, 0, 2)
    bc = patch_bc[face, ic, jc, kc]
    rots = patch_rot[face, ic, jc, kc]
    valid = in_range & (bc >= 0)

    h = (h & ~np.int64(0x7F << 45)) | (np.where(valid, bc, 0) << 45)

    # hexagon rotations (pentagons fall back below)
    max_rots = int(rots.max()) if n else 0
    for step in range(max_rots):
        m = rots > step
        if not m.any():
            break
        hm = h[m]
        for rr_ in range(1, res + 1):
            shift = 3 * (core.MAX_H3_RES - rr_)
            dig = (hm >> shift) & 0x7
            hm = (hm & ~np.int64(0x7 << shift)) | (
                _ROT_CCW_ARR[dig] << shift
            )
        h[m] = hm

    out = np.where(valid, h, 0)

    # pentagon / invalid rows: scalar fallback (rare)
    fallback = np.isin(bc, _PENTAGONS) | ~valid
    if fallback.any():
        idx = np.nonzero(fallback)[0]
        latd = np.asarray(lat_deg, dtype=np.float64)
        lngd = np.asarray(lng_deg, dtype=np.float64)
        for ix in idx:
            out[ix] = core.latlng_to_cell(
                float(latd[ix]), float(lngd[ix]), res
            )
    return out
