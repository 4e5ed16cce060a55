"""Coordinate reference system transforms (the ``update_crs`` analog).

The reference reprojects coordinates/geometries through OSR, with a
rotated-pole special case
(``/root/reference/src/ocgis/variable/crs.py``, ``variable/geom.py:
1131-1182``, ``spatial/spatial_subset.py:264-277``).  No pyproj exists
in this container, so the engine implements the needed transforms as
pure-numpy kernels — exactly the transforms the reference's test
fixtures exercise (lon/lat <-> spherical/web Mercator, rotated pole),
run as vectorized ``map_batches`` stages.

Web-Mercator forward is closed-form, so it is DuckDB-oracle-checkable;
rotated-pole round-trips are pytest-verified to 1e-9 degrees.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

WEB_MERCATOR_R = 6378137.0


def to_web_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> EPSG:3857 (spherical/web Mercator), vectorized."""
    x = np.radians(lon) * WEB_MERCATOR_R
    y = np.log(np.tan((90.0 + lat) * (np.pi / 360.0))) * WEB_MERCATOR_R
    return x, y


def from_web_mercator(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.degrees(x / WEB_MERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEB_MERCATOR_R)) - np.pi / 2.0)
    return lon, lat


def web_mercator_sql(lon_expr: str, lat_expr: str) -> tuple[str, str]:
    """DuckDB twins of :func:`to_web_mercator` (same op order)."""
    r = repr(WEB_MERCATOR_R)
    x = f"radians({lon_expr}) * {r}"
    y = f"ln(tan(({lat_expr} + 90.0) * pi() / 360.0)) * {r}"
    return x, y


def rotated_pole_transform(
    lon: np.ndarray, lat: np.ndarray, pole_lon: float, pole_lat: float,
    inverse: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Rotated-pole <-> true lon/lat (CF ``rotated_latitude_longitude``,
    the reference's ``CFRotatedPole`` special case).

    Standard spherical rotation: the grid's north pole sits at
    (pole_lon, pole_lat) in true coordinates; ``pole_lat=90,
    pole_lon=0`` is the identity."""
    theta = np.radians(90.0 - pole_lat)  # tilt from the true pole
    phi = np.radians(pole_lon)
    lam = np.radians(lon)
    p = np.radians(lat)
    x = np.cos(p) * np.cos(lam)
    y = np.cos(p) * np.sin(lam)
    z = np.sin(p)
    if not inverse:
        # true -> rotated: undo the pole rotation
        x, y = np.cos(phi) * x + np.sin(phi) * y, -np.sin(phi) * x + np.cos(phi) * y
        x, z = np.cos(theta) * x + np.sin(theta) * z, -np.sin(theta) * x + np.cos(theta) * z
    else:
        x, z = np.cos(theta) * x - np.sin(theta) * z, np.sin(theta) * x + np.cos(theta) * z
        x, y = np.cos(phi) * x - np.sin(phi) * y, np.sin(phi) * x + np.cos(phi) * y
    out_lat = np.degrees(np.arcsin(np.clip(z, -1.0, 1.0)))
    out_lon = np.degrees(np.arctan2(y, x))
    return out_lon, out_lat


class CrsTransformStage:
    """Actor-pool CRS transform: holds the transform spec once per
    worker (the pyproj.Transformer slot in a full deployment).

    ``name`` accepts the named registry entry, an ``epsg:<code>``
    string (EPSG_PARAMS), a raw proj.4 string, or WKT1 — the full
    ``crs_from_params`` surface, built ONCE per worker in
    ``__init__``."""

    TRANSFORMS = {
        "web_mercator": lambda lon, lat: to_web_mercator(lon, lat),
    }

    def __init__(self, name: str = "web_mercator", out_x: str = "x", out_y: str = "y"):
        if name in self.TRANSFORMS:
            self.fn = self.TRANSFORMS[name]
        elif name.lower().startswith("epsg:"):
            self.fn = crs_from_params(EPSG_PARAMS[int(name[5:])])[0]
        else:
            self.fn = crs_from_params(name)[0]
        self.out_x = out_x
        self.out_y = out_y

    def __call__(self, t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        x, y = self.fn(lon, lat)
        t = t.append_column(self.out_x, pa.array(x))
        return t.append_column(self.out_y, pa.array(y))


def update_crs(ds, name: str = "web_mercator", concurrency=None):
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        CrsTransformStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"name": name},
    )


# -------------------------------------------------------------- ellipsoidal

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_E = float(np.sqrt(WGS84_E2))


def _lcc_consts(lat1: float, lat2: float, lat0: float,
                a: float = WGS84_A, e2: float = WGS84_E2):
    """EPSG 9802 (Lambert Conformal Conic 2SP) projection constants."""
    e = float(np.sqrt(e2))

    def m(phi):
        return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)

    def t(phi):
        return np.tan(np.pi / 4.0 - phi / 2.0) / (
            ((1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))) ** (e / 2.0)
        )

    p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
    if abs(lat1 - lat2) < 1e-12:
        n = float(np.sin(p1))
    else:
        n = float((np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2))))
    F = float(m(p1) / (n * t(p1) ** n))
    rho0 = float(a * F * t(p0) ** n)
    return n, F, rho0


def lcc_forward(lon, lat, lon0: float = -96.0, lat0: float = 40.0,
                lat1: float = 33.0, lat2: float = 45.0,
                fe: float = 0.0, fn: float = 0.0,
                a: float = WGS84_A, e2: float = WGS84_E2):
    """Ellipsoidal Lambert Conformal Conic 2SP forward (EPSG 9802) —
    the projection of the reference's regional-model fixtures
    (``variable/crs.py`` CFLambertConformal).  Vectorized numpy; a
    DuckDB twin with identical operation order is
    :func:`lcc_sql`."""
    n, F, rho0 = _lcc_consts(lat1, lat2, lat0, a, e2)
    e = float(np.sqrt(e2))
    p = np.radians(np.asarray(lat, dtype=np.float64))
    t = np.tan(np.pi / 4.0 - p / 2.0) / (
        ((1.0 - e * np.sin(p)) / (1.0 + e * np.sin(p))) ** (e / 2.0)
    )
    rho = a * F * t ** n
    th = n * (np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0))
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_inverse(x, y, lon0: float = -96.0, lat0: float = 40.0,
                lat1: float = 33.0, lat2: float = 45.0,
                fe: float = 0.0, fn: float = 0.0, iters: int = 8,
                a: float = WGS84_A, e2: float = WGS84_E2):
    n, F, rho0 = _lcc_consts(lat1, lat2, lat0, a, e2)
    e = float(np.sqrt(e2))
    xs = np.asarray(x, dtype=np.float64) - fe
    ys = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xs, ys)
    th = np.arctan2(np.sign(n) * xs, np.sign(n) * ys)
    t = (rho / (a * F)) ** (1.0 / n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):  # fixed-point (EPSG 9802 inverse)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))) ** (e / 2.0)
        )
    return np.degrees(th / n + np.radians(lon0)), np.degrees(phi)


def lcc_sql(lon_expr: str, lat_expr: str, lon0: float = -96.0, lat0: float = 40.0,
            lat1: float = 33.0, lat2: float = 45.0) -> tuple[str, str]:
    """DuckDB twins of :func:`lcc_forward` (constants precomputed with
    the same numpy ops; per-row expressions in identical order).
    Constants are CAST AS DOUBLE — DuckDB types long decimal literals
    as DECIMAL(18) and overflows on multiplication otherwise."""
    n, F, rho0 = _lcc_consts(lat1, lat2, lat0)

    def d(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    e, a = d(WGS84_E), d(WGS84_A)
    p = f"radians({lat_expr})"
    t = (f"(tan(pi() / 4.0 - {p} / 2.0) / "
         f"pow((1.0 - {e} * sin({p})) / (1.0 + {e} * sin({p})), {e} / 2.0))")
    rho = f"({a} * {d(F)} * pow({t}, {d(n)}))"
    th = f"({d(n)} * (radians({lon_expr}) - radians({d(lon0)})))"
    return f"{rho} * sin({th})", f"{d(rho0)} - {rho} * cos({th})"


def tm_forward(lon, lat, lon0: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0,
               a: float = WGS84_A, e2_: float = WGS84_E2):
    """Ellipsoidal Transverse Mercator forward (Snyder 8-12..8-15,
    4th-order series — sub-mm inside a UTM zone).  UTM = this with
    ``lon0 = zone*6 - 183``."""
    e2 = e2_
    ep2 = e2 / (1.0 - e2)
    p = np.radians(np.asarray(lat, dtype=np.float64))
    dl = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0)
    sin_p, cos_p, tan_p = np.sin(p), np.cos(p), np.tan(p)
    N = a / np.sqrt(1.0 - e2 * sin_p ** 2)
    T = tan_p ** 2
    C = ep2 * cos_p ** 2
    A = cos_p * dl
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * p
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * p)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * p)
        - (35 * e2**3 / 3072) * np.sin(6 * p)
    )
    x = k0 * N * (A + (1 - T + C) * A**3 / 6
                  + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120)
    y = k0 * (M + N * tan_p * (A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
              + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
    return fe + x, fn + y


def utm_forward(lon, lat, zone: int, south: bool = False):
    return tm_forward(lon, lat, lon0=zone * 6.0 - 183.0,
                      fn=10000000.0 if south else 0.0)


def tm_inverse(x, y, lon0: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0,
               a: float = WGS84_A, e2_: float = WGS84_E2):
    """Snyder 8-17..8-25 inverse series."""
    e2 = e2_
    ep2 = e2 / (1.0 - e2)
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    M = (np.asarray(y, dtype=np.float64) - fn) / k0
    mu = M / (a * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    p1 = (mu + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
          + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
          + (151 * e1**3 / 96) * np.sin(6 * mu)
          + (1097 * e1**4 / 512) * np.sin(8 * mu))
    sin1, cos1, tan1 = np.sin(p1), np.cos(p1), np.tan(p1)
    C1 = ep2 * cos1 ** 2
    T1 = tan1 ** 2
    N1 = a / np.sqrt(1 - e2 * sin1 ** 2)
    R1 = a * (1 - e2) / (1 - e2 * sin1 ** 2) ** 1.5
    D = (np.asarray(x, dtype=np.float64) - fe) / (N1 * k0)
    lat = p1 - (N1 * tan1 / R1) * (
        D**2 / 2 - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * ep2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * ep2 - 3 * C1**2) * D**6 / 720
    )
    lon = np.radians(lon0) + (
        D - (1 + 2 * T1 + C1) * D**3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * ep2 + 24 * T1**2) * D**5 / 120
    ) / cos1
    return np.degrees(lon), np.degrees(lat)


def _aea_q(sinp: np.ndarray | float, e2: float = WGS84_E2):
    """Snyder 3-12: the authalic-latitude q function (ellipsoidal
    equal-area kernel).  Exact identity: the ellipsoid's surface area
    between two parallels over Δλ is a²·Δλ·(q2−q1)/2 — the equal-area
    test in tests/test_crs.py leans on this."""
    if e2 == 0.0:
        # spherical limit of Snyder 3-12: q -> 2 sin(phi)
        return 2.0 * np.asarray(sinp, dtype=np.float64)
    e = float(np.sqrt(e2))
    return (1.0 - e2) * (
        sinp / (1.0 - e2 * sinp ** 2)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sinp) / (1.0 + e * sinp)))


def _aea_consts(lat1: float, lat2: float, lat0: float,
                a: float = WGS84_A, e2: float = WGS84_E2):
    """EPSG 9822 (Albers Equal Area conic) projection constants."""
    def m(phi):
        return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)

    p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
    m1, m2 = float(m(p1)), float(m(p2))
    q1, q2 = float(_aea_q(np.sin(p1), e2)), float(_aea_q(np.sin(p2), e2))
    if abs(lat1 - lat2) < 1e-12:
        n = float(np.sin(p1))
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * float(np.sqrt(C - n * float(_aea_q(np.sin(p0), e2)))) / n
    return n, C, rho0


def aea_forward(lon, lat, lon0: float = -96.0, lat0: float = 23.0,
                lat1: float = 29.5, lat2: float = 45.5,
                fe: float = 0.0, fn: float = 0.0,
                a: float = WGS84_A, e2: float = WGS84_E2):
    """Ellipsoidal Albers Equal Area conic forward (EPSG 9822, Snyder
    14-1..14-4) — THE projection for area-preserving continental
    analyses (defaults = EPSG:5070 CONUS Albers parameters); the
    natural output CRS for ``area_weighted_aggregate`` results.
    Reference analog: the proj4-backed ``variable/crs.py`` family."""
    n, C, rho0 = _aea_consts(lat1, lat2, lat0, a, e2)
    p = np.radians(np.asarray(lat, dtype=np.float64))
    q = _aea_q(np.sin(p), e2)
    rho = a * np.sqrt(C - n * q) / n
    th = n * (np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0))
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def aea_inverse(x, y, lon0: float = -96.0, lat0: float = 23.0,
                lat1: float = 29.5, lat2: float = 45.5,
                fe: float = 0.0, fn: float = 0.0, iters: int = 10,
                a: float = WGS84_A, e2: float = WGS84_E2):
    """Snyder 14-19 + 3-16 fixed-point iteration (sub-1e-9-degree
    round-trips over CONUS at 10 iterations)."""
    n, C, rho0 = _aea_consts(lat1, lat2, lat0, a, e2)
    xs = np.asarray(x, dtype=np.float64) - fe
    ys = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xs, ys)
    th = np.arctan2(np.sign(n) * xs, np.sign(n) * ys)
    q = (C - (rho * n / a) ** 2) / n
    phi = _phi_from_q(q, e2, iters)
    return np.degrees(th / n + np.radians(lon0)), np.degrees(phi)


def _phi_from_q(q, e2: float = WGS84_E2, iters: int = 10):
    """Snyder 3-16: latitude from the authalic q by fixed point —
    shared by the AEA and LAEA inverses."""
    phi = np.arcsin(np.clip(np.asarray(q, dtype=np.float64) / 2.0, -1.0, 1.0))
    if e2 == 0.0:
        return phi  # spherical: q = 2 sin(phi) exactly, no iteration
    e = float(np.sqrt(e2))
    for _ in range(iters):
        sinp = np.sin(phi)
        phi = phi + (1.0 - e2 * sinp ** 2) ** 2 / (2.0 * np.cos(phi)) * (
            q / (1.0 - e2)
            - sinp / (1.0 - e2 * sinp ** 2)
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * sinp) / (1.0 + e * sinp)))
    return phi


CrsTransformStage.TRANSFORMS["lcc_conus"] = lambda lon, lat: lcc_forward(lon, lat)
CrsTransformStage.TRANSFORMS["utm33n"] = lambda lon, lat: utm_forward(lon, lat, 33)
CrsTransformStage.TRANSFORMS["albers_conus"] = lambda lon, lat: aea_forward(lon, lat)


def utm_inverse(x, y, zone: int, south: bool = False):
    return tm_inverse(x, y, lon0=zone * 6.0 - 183.0,
                      fn=10000000.0 if south else 0.0)


def _ident(a, b):
    return np.asarray(a, np.float64), np.asarray(b, np.float64)


#: name -> (forward: lonlat -> crs, inverse: crs -> lonlat) — the
#: ``CoordinateReferenceSystem`` family analog (reference
#: ``variable/crs.py``; pyproj-free, the supported projections are the
#: ones the reference's test fixtures exercise).
CRS_PAIRS: dict = {
    "lonlat": (_ident, _ident),
    "web_mercator": (to_web_mercator, from_web_mercator),
    "lcc_conus": (lambda lon, lat: lcc_forward(lon, lat),
                  lambda x, y: lcc_inverse(x, y)),
    "utm33n": (lambda lon, lat: utm_forward(lon, lat, 33),
               lambda x, y: utm_inverse(x, y, 33)),
    "rotated_pole_na": (
        lambda lon, lat: rotated_pole_transform(lon, lat, -97.0, 42.5),
        lambda rl, rp: rotated_pole_transform(rl, rp, -97.0, 42.5,
                                              inverse=True)),
    "albers_conus": (lambda lon, lat: aea_forward(lon, lat),
                     lambda x, y: aea_inverse(x, y)),
}


# ------------------------------------------------ LAEA / sinusoidal

def laea_forward(lon, lat, lon0: float, lat0: float,
                 fe: float = 0.0, fn: float = 0.0,
                 a: float = WGS84_A, e2: float = WGS84_E2):
    """Ellipsoidal Lambert Azimuthal Equal Area, oblique aspect
    (Snyder 24-2..24-8, 3-11, 3-12) — EPSG 9820, the projection of
    the pan-European EPSG:3035 grid."""
    qp = float(_aea_q(1.0, e2))
    p = np.radians(np.asarray(lat, dtype=np.float64))
    dl = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0)
    beta = np.arcsin(np.clip(_aea_q(np.sin(p), e2) / qp, -1.0, 1.0))
    p0 = np.radians(lat0)
    beta0 = float(np.arcsin(np.clip(float(_aea_q(np.sin(p0), e2)) / qp, -1.0, 1.0)))
    rq = a * float(np.sqrt(qp / 2.0))
    m0 = float(np.cos(p0) / np.sqrt(1.0 - e2 * np.sin(p0) ** 2))
    d = a * m0 / (rq * np.cos(beta0))
    b = rq * np.sqrt(2.0 / (1.0 + np.sin(beta0) * np.sin(beta)
                            + np.cos(beta0) * np.cos(beta) * np.cos(dl)))
    x = b * d * np.cos(beta) * np.sin(dl)
    y = (b / d) * (np.cos(beta0) * np.sin(beta)
                   - np.sin(beta0) * np.cos(beta) * np.cos(dl))
    return fe + x, fn + y


def laea_inverse(x, y, lon0: float, lat0: float,
                 fe: float = 0.0, fn: float = 0.0,
                 a: float = WGS84_A, e2: float = WGS84_E2,
                 iters: int = 10):
    """Snyder 24-16..24-19 + 3-16 (shared :func:`_phi_from_q`)."""
    qp = float(_aea_q(1.0, e2))
    p0 = np.radians(lat0)
    beta0 = float(np.arcsin(np.clip(float(_aea_q(np.sin(p0), e2)) / qp, -1.0, 1.0)))
    rq = a * float(np.sqrt(qp / 2.0))
    m0 = float(np.cos(p0) / np.sqrt(1.0 - e2 * np.sin(p0) ** 2))
    d = a * m0 / (rq * np.cos(beta0))
    xs = (np.asarray(x, dtype=np.float64) - fe) / d
    ys = (np.asarray(y, dtype=np.float64) - fn) * d
    rho = np.hypot(xs, ys)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        q = qp * (np.cos(ce) * np.sin(beta0)
                  + ys * np.sin(ce) * np.cos(beta0) / rho)
        lam = np.arctan2(xs * np.sin(ce),
                         rho * np.cos(beta0) * np.cos(ce)
                         - ys * np.sin(beta0) * np.sin(ce))
    center = rho == 0.0  # projection center: q and lambda are exact
    q = np.where(center, qp * np.sin(beta0), q)
    lam = np.where(center, 0.0, lam)
    phi = _phi_from_q(q, e2, iters)
    return np.degrees(lam + np.radians(lon0)), np.degrees(phi)


def sinu_forward(lon, lat, lon0: float = 0.0, R: float = WGS84_A,
                 fe: float = 0.0, fn: float = 0.0):
    """Spherical sinusoidal (Sanson-Flamsteed) forward — the MODIS
    grid projection (sphere R=6371007.181, ESRI:54008/SR-ORG:6974)."""
    p = np.radians(np.asarray(lat, dtype=np.float64))
    dl = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0)
    return fe + R * dl * np.cos(p), fn + R * p


def sinu_inverse(x, y, lon0: float = 0.0, R: float = WGS84_A,
                 fe: float = 0.0, fn: float = 0.0):
    p = (np.asarray(y, dtype=np.float64) - fn) / R
    with np.errstate(invalid="ignore", divide="ignore"):
        dl = (np.asarray(x, dtype=np.float64) - fe) / (R * np.cos(p))
    dl = np.where(np.abs(np.cos(p)) < 1e-14, 0.0, dl)  # at the poles
    return np.degrees(dl + np.radians(lon0)), np.degrees(p)


# ----------------------------- polar stereographic / oblique Mercator

def _conformal_t(phi: np.ndarray | float, e: float):
    """Snyder 15-9: the conformal colatitude function
    ``t = tan(pi/4 - phi/2) / [(1 - e sin phi)/(1 + e sin phi)]^(e/2)``
    (shared by polar stereographic and Hotine oblique Mercator)."""
    sp = np.sin(phi)
    return (np.tan(np.pi / 4.0 - np.asarray(phi, np.float64) / 2.0)
            / ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))


def _wrap_lon_deg(lon: np.ndarray) -> np.ndarray:
    """Wrap degrees longitude to [-180, 180) (the polar inverse's
    ``atan2`` plus a lon_0 offset can leave the principal branch)."""
    return (np.asarray(lon, np.float64) + 180.0) % 360.0 - 180.0


def _phi_from_t(t: np.ndarray, e: float, iters: int = 10) -> np.ndarray:
    """Invert :func:`_conformal_t` by fixed point (Snyder 7-9 /
    15-13): ``phi = pi/2 - 2 atan(t ((1-e sin phi)/(1+e sin phi))^(e/2))``."""
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    if e == 0.0:
        return phi
    for _ in range(iters):
        sp = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))
    return phi


def ps_forward(lon, lat, lon0: float = 0.0, lat_ts: float | None = None,
               k0: float = 1.0, south: bool = False,
               fe: float = 0.0, fn: float = 0.0,
               a: float = WGS84_A, e2: float = WGS84_E2):
    """Ellipsoidal polar stereographic (Snyder 21-30..21-35; EPSG 9810
    variant A via ``k0``, 9829 variant B via ``lat_ts``) — the
    ``CFPolarStereographic`` analog (reference
    ``variable/crs.py:1100-1115``: grid_mapping ``polar_stereographic``
    with ``standard_parallel``/``scale_factor``).

    The south aspect is the north equations at ``(-phi, -dlam)`` with
    both outputs negated (EPSG 9829's ``E = rho sin dl, N = rho cos
    dl`` follows)."""
    e = float(np.sqrt(e2))
    phi = np.radians(np.asarray(lat, np.float64))
    dl = np.radians(np.asarray(lon, np.float64)) - np.radians(lon0)
    if south:
        phi, dl = -phi, -dl
    t = _conformal_t(phi, e)
    if lat_ts is None or abs(lat_ts) >= 90.0 - 1e-12:
        rho = (2.0 * a * k0 * t
               / np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)))
    else:
        pc = np.radians(abs(lat_ts))
        mc = np.cos(pc) / np.sqrt(1.0 - e2 * np.sin(pc) ** 2)
        rho = a * mc * t / float(_conformal_t(pc, e))
    x, y = rho * np.sin(dl), -rho * np.cos(dl)
    if south:
        x, y = -x, -y
    return fe + x, fn + y


def ps_inverse(x, y, lon0: float = 0.0, lat_ts: float | None = None,
               k0: float = 1.0, south: bool = False,
               fe: float = 0.0, fn: float = 0.0,
               a: float = WGS84_A, e2: float = WGS84_E2):
    """Snyder 21-39/21-40 + the iterated 7-9 latitude recovery."""
    e = float(np.sqrt(e2))
    xs = np.asarray(x, np.float64) - fe
    ys = np.asarray(y, np.float64) - fn
    if south:
        xs, ys = -xs, -ys
    rho = np.hypot(xs, ys)
    if lat_ts is None or abs(lat_ts) >= 90.0 - 1e-12:
        t = (rho * np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
             / (2.0 * a * k0))
    else:
        pc = np.radians(abs(lat_ts))
        mc = np.cos(pc) / np.sqrt(1.0 - e2 * np.sin(pc) ** 2)
        t = rho * float(_conformal_t(pc, e)) / (a * mc)
    phi = _phi_from_t(t, e)
    dl = np.arctan2(xs, -ys)
    if south:
        phi, dl = -phi, -dl
    return _wrap_lon_deg(np.degrees(dl + np.radians(lon0))), np.degrees(phi)


def oblique_stere_forward(lon, lat, lon0: float, lat0: float,
                          k0: float = 1.0, R: float = WGS84_A,
                          fe: float = 0.0, fn: float = 0.0):
    """SPHERICAL oblique/equatorial stereographic (Snyder 1987
    eq. 21-2..21-4): k = 2 k0 / (1 + sin p0 sin p + cos p0 cos p
    cos dl); x = R k cos p sin dl; y = R k (cos p0 sin p - sin p0
    cos p cos dl).  Closes crs_from_params' former polar-aspects-only
    ``stere`` gap; the ellipsoidal oblique form (EPSG 9809, Roussilhe)
    remains out of scope — the reference's CF grid mappings only carry
    the polar variant, and the spherical form is what the oblique CF
    ``stereographic`` mapping means on a sphere."""
    p0 = np.radians(lat0)
    p = np.radians(np.asarray(lat, dtype=np.float64))
    dl = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    denom = 1.0 + np.sin(p0) * np.sin(p) + np.cos(p0) * np.cos(p) * np.cos(dl)
    k = 2.0 * k0 / np.maximum(denom, 1e-12)   # antipode guard
    x = R * k * np.cos(p) * np.sin(dl)
    y = R * k * (np.cos(p0) * np.sin(p) - np.sin(p0) * np.cos(p) * np.cos(dl))
    return fe + x, fn + y


def oblique_stere_inverse(x, y, lon0: float, lat0: float,
                          k0: float = 1.0, R: float = WGS84_A,
                          fe: float = 0.0, fn: float = 0.0):
    """Snyder eq. 20-14..20-17 with c = 2 atan(rho / (2 R k0))."""
    p0 = np.radians(lat0)
    xx = (np.asarray(x, np.float64) - fe)
    yy = (np.asarray(y, np.float64) - fn)
    rho = np.hypot(xx, yy)
    c = 2.0 * np.arctan2(rho, 2.0 * R * k0)
    sin_c, cos_c = np.sin(c), np.cos(c)
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = np.arcsin(np.clip(
            cos_c * np.sin(p0) + yy * sin_c * np.cos(p0) / np.where(rho == 0, 1.0, rho),
            -1.0, 1.0))
        lam = np.arctan2(xx * sin_c,
                         rho * np.cos(p0) * cos_c - yy * np.sin(p0) * sin_c)
    phi = np.where(rho == 0, p0, phi)
    lam = np.where(rho == 0, 0.0, lam)
    return _wrap_lon_deg(np.degrees(lam) + lon0), np.degrees(phi)


def omerc_consts(lat0: float, lonc: float, alpha: float,
                 k0: float = 1.0, gamma: float | None = None,
                 a: float = WGS84_A, e2: float = WGS84_E2) -> dict:
    """Hotine oblique Mercator constants (Snyder 9-11..9-19) — the
    ``CFNarccapObliqueMercator`` analog (reference
    ``variable/crs.py:1117-1132``: proj ``omerc`` with ``lonc``,
    ``lat_0``, ``alpha``, ``k_0``; ``gamma`` is the rectified grid
    angle, defaulting to ``alpha`` as in proj)."""
    e = float(np.sqrt(e2))
    p0 = np.radians(lat0)
    sp0 = np.sin(p0)
    B = float(np.sqrt(1.0 + e2 * np.cos(p0) ** 4 / (1.0 - e2)))
    A = a * B * k0 * float(np.sqrt(1.0 - e2)) / (1.0 - e2 * sp0 ** 2)
    t0 = float(_conformal_t(p0, e))
    D = B * float(np.sqrt(1.0 - e2)) / (np.cos(p0) * np.sqrt(1.0 - e2 * sp0 ** 2))
    D2 = max(D * D, 1.0)
    F = D + np.copysign(np.sqrt(D2 - 1.0), lat0)
    E = F * t0 ** B
    G = (F - 1.0 / F) / 2.0
    g0 = float(np.arcsin(np.clip(np.sin(np.radians(alpha)) / D, -1.0, 1.0)))
    lam0 = np.radians(lonc) - float(np.arcsin(np.clip(G * np.tan(g0), -1.0, 1.0))) / B
    grot = np.radians(alpha if gamma is None else gamma)
    return {"A": A, "B": B, "E": E, "g0": g0, "lam0": lam0, "grot": grot,
            "e": e}


def omerc_forward(lon, lat, lat0: float, lonc: float, alpha: float,
                  k0: float = 1.0, gamma: float | None = None,
                  fe: float = 0.0, fn: float = 0.0,
                  a: float = WGS84_A, e2: float = WGS84_E2):
    """Hotine oblique Mercator forward (Snyder 9-25..9-34 + the
    ``gamma`` rectification 9-35/9-36)."""
    c = omerc_consts(lat0, lonc, alpha, k0, gamma, a, e2)
    A, B, E, g0 = c["A"], c["B"], c["E"], c["g0"]
    phi = np.radians(np.asarray(lat, np.float64))
    dl = np.radians(np.asarray(lon, np.float64)) - c["lam0"]
    t = _conformal_t(phi, c["e"])
    Q = E / t ** B
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * dl)
    U = (-V * np.cos(g0) + S * np.sin(g0)) / T
    v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = A * np.arctan2(S * np.cos(g0) + V * np.sin(g0), np.cos(B * dl)) / B
    cg, sg = np.cos(c["grot"]), np.sin(c["grot"])
    return fe + v * cg + u * sg, fn + u * cg - v * sg


def omerc_inverse(x, y, lat0: float, lonc: float, alpha: float,
                  k0: float = 1.0, gamma: float | None = None,
                  fe: float = 0.0, fn: float = 0.0,
                  a: float = WGS84_A, e2: float = WGS84_E2):
    """Snyder 9-42..9-47 + the iterated 7-9 latitude recovery."""
    c = omerc_consts(lat0, lonc, alpha, k0, gamma, a, e2)
    A, B, E, g0 = c["A"], c["B"], c["E"], c["g0"]
    cg, sg = np.cos(c["grot"]), np.sin(c["grot"])
    xs = np.asarray(x, np.float64) - fe
    ys = np.asarray(y, np.float64) - fn
    v = xs * cg - ys * sg
    u = ys * cg + xs * sg
    Q = np.exp(-B * v / A)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * u / A)
    U = (V * np.cos(g0) + S * np.sin(g0)) / T
    t = (E / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / B)
    phi = _phi_from_t(t, c["e"])
    lam = c["lam0"] - np.arctan2(S * np.cos(g0) - V * np.sin(g0),
                                 np.cos(B * u / A)) / B
    return _wrap_lon_deg(np.degrees(lam)), np.degrees(phi)


# --------------------------------------- generic proj-param entry point

#: named ellipsoids (+ellps / +datum): (a, 1/f); rf=0 means a sphere
ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "sphere": (6370997.0, 0.0),
}


# ---------------------------------------------------------------- mollweide

def moll_forward(lon, lat, lon0: float = 0.0, R: float = WGS84_A,
                 fe: float = 0.0, fn: float = 0.0):
    """Spherical Mollweide (homolographic) forward — Snyder (1987)
    eq. 31-1..31-8: solve 2t + sin 2t = pi sin(phi) by Newton, then
    x = (2 sqrt(2) / pi) R dlam cos t, y = sqrt(2) R sin t.  proj's
    ``moll`` is likewise spherical (uses a as the sphere radius)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dl = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    rhs = np.pi * np.sin(phi)
    t = phi.copy()
    for _ in range(12):
        f = 2.0 * t + np.sin(2.0 * t) - rhs
        df = 2.0 + 2.0 * np.cos(2.0 * t)
        # poles: df -> 0 but f -> 0 too; guard the division
        t = t - f / np.maximum(df, 1e-12)
    x = (2.0 * np.sqrt(2.0) / np.pi) * R * dl * np.cos(t)
    y = np.sqrt(2.0) * R * np.sin(t)
    return fe + x, fn + y


def moll_inverse(x, y, lon0: float = 0.0, R: float = WGS84_A,
                 fe: float = 0.0, fn: float = 0.0):
    t = np.arcsin(np.clip((np.asarray(y, np.float64) - fn)
                          / (np.sqrt(2.0) * R), -1.0, 1.0))
    phi = np.arcsin(np.clip((2.0 * t + np.sin(2.0 * t)) / np.pi, -1.0, 1.0))
    cos_t = np.cos(t)
    with np.errstate(invalid="ignore", divide="ignore"):
        dl = (np.asarray(x, np.float64) - fe) * np.pi \
            / (2.0 * np.sqrt(2.0) * R * cos_t)
    dl = np.where(cos_t < 1e-12, 0.0, dl)   # poles: lon indeterminate
    return _wrap_lon_deg(np.degrees(dl) + lon0), np.degrees(phi)


# ---------------------------------------------------------------- robinson

# Robinson's published 5-degree table (Robinson 1974; Snyder 1990,
# "An Album of Map Projections" p. 82-83): X = parallel length scale,
# Y = distance of parallel from equator / 0.5072
_ROBIN_LAT = np.arange(0.0, 91.0, 5.0)
_ROBIN_X = np.array([
    1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427,
    0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732,
    0.6213, 0.5722, 0.5322])
_ROBIN_Y = np.array([
    0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340,
    0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936,
    0.9394, 0.9761, 1.0000])


def robin_forward(lon, lat, lon0: float = 0.0, R: float = WGS84_A,
                  fe: float = 0.0, fn: float = 0.0):
    """Robinson forward from the published coefficient table:
    x = 0.8487 R X(|phi|) dlam, y = 1.3523 R Y(|phi|) sign(phi).
    Table lookup is piecewise-LINEAR between the 5-degree nodes —
    proj fits a quintic through the same table, so coordinates differ
    from proj by < ~0.1% between nodes (exact at the nodes); the
    inverse inverts the same interpolant, so round-trips are exact."""
    la = np.abs(np.asarray(lat, dtype=np.float64))
    X = np.interp(la, _ROBIN_LAT, _ROBIN_X)
    Y = np.interp(la, _ROBIN_LAT, _ROBIN_Y)
    dl = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    x = 0.8487 * R * X * dl
    y = 1.3523 * R * Y * np.sign(np.asarray(lat, dtype=np.float64))
    return fe + x, fn + y


def robin_inverse(x, y, lon0: float = 0.0, R: float = WGS84_A,
                  fe: float = 0.0, fn: float = 0.0):
    yy = (np.asarray(y, np.float64) - fn) / (1.3523 * R)
    la = np.interp(np.abs(yy), _ROBIN_Y, _ROBIN_LAT)
    X = np.interp(la, _ROBIN_LAT, _ROBIN_X)
    dl = (np.asarray(x, np.float64) - fe) / (0.8487 * R * X)
    return _wrap_lon_deg(np.degrees(dl) + lon0), la * np.sign(yy)


def moll_sql(lon_expr: str, lat_expr: str,
             R: float = WGS84_A) -> tuple[str, str]:
    """DuckDB twins of :func:`moll_forward` (lon_0=0): the SAME 12
    fixed Newton steps via ``list_reduce`` (the engine iterates arrays
    a fixed 12 times; an SQL closed form would diverge in the last
    ulp), guarded division identical to the numpy ``maximum``."""
    t = (f"list_reduce(list_prepend(radians({lat_expr}), "
         f"list_transform(range(12), i -> 0.0)), "
         f"(t, i) -> t - (2*t + sin(2*t) - pi()*sin(radians({lat_expr})))"
         f" / greatest(2 + 2*cos(2*t), 1e-12))")
    return (f"(2*sqrt(2)/pi()) * {R!r} * radians({lon_expr}) * cos({t})",
            f"sqrt(2) * {R!r} * sin({t})")


def robin_sql(lon_expr: str, lat_expr: str,
              R: float = WGS84_A) -> tuple[str, str]:
    """DuckDB twins of :func:`robin_forward` (lon_0=0): the published
    5-degree table as list literals, piecewise-linear interpolation in
    ``np.interp``'s operation order, node 18 clamped like the engine."""
    XL = "[" + ",".join(repr(float(v)) for v in _ROBIN_X) + "]"
    YL = "[" + ",".join(repr(float(v)) for v in _ROBIN_Y) + "]"
    i_ = f"least(CAST(floor(abs({lat_expr})/5) AS BIGINT), 17)"
    fr = f"(abs({lat_expr}) - 5*{i_})"
    Xv = (f"(list_extract({XL}, {i_}+1) + (list_extract({XL}, {i_}+2) "
          f"- list_extract({XL}, {i_}+1))/5.0 * {fr})")
    Yv = (f"(list_extract({YL}, {i_}+1) + (list_extract({YL}, {i_}+2) "
          f"- list_extract({YL}, {i_}+1))/5.0 * {fr})")
    return (f"0.8487 * {R!r} * {Xv} * radians({lon_expr})",
            f"1.3523 * {R!r} * {Yv} * sign({lat_expr})")


# ---------------------------------------------------------------- proj strings

# WKT1 PROJCS projection name -> proj family + parameter mapping
# (OGC 01-009 / EPSG dataset naming; the subset crs_from_params backs)
_WKT_PROJ = {
    "transverse_mercator": "tmerc",
    "lambert_conformal_conic_2sp": "lcc",
    "lambert_conformal_conic": "lcc",
    "albers_conic_equal_area": "aea",
    "albers": "aea",
    "lambert_azimuthal_equal_area": "laea",
    "sinusoidal": "sinu",
    "mollweide": "moll",
    "robinson": "robin",
    "polar_stereographic": "stere",
    "mercator_auxiliary_sphere": "webmerc",
    "popular_visualisation_pseudo_mercator": "webmerc",
    "hotine_oblique_mercator": "omerc",
}
_WKT_PARAM = {
    "central_meridian": "lon_0",
    "longitude_of_center": "lon_0",
    "longitude_of_origin": "lon_0",
    "latitude_of_origin": "lat_0",
    "latitude_of_center": "lat_0",
    "standard_parallel_1": "lat_1",
    "standard_parallel_2": "lat_2",
    "scale_factor": "k",
    "false_easting": "x_0",
    "false_northing": "y_0",
    "azimuth": "alpha",
    "rectified_grid_angle": "gamma",
    "longitude_of_point_1": "lonc",  # rare variant
}


def parse_wkt(wkt: str) -> dict:
    """Minimal WKT1 ``PROJCS``/``GEOGCS`` -> proj params dict — the
    custom-WKT arm of the arbitrary-CRS escape hatch (the reference
    feeds WKT to OSR, ``variable/crs.py:160-240``).

    Handles the OGC 01-009 shape: ``PROJECTION["name"]``,
    ``PARAMETER["name", value]``, ``SPHEROID["name", a, rf]``,
    ``UNIT["name", to_meter]`` (the projected CRS's last UNIT).  A
    bare GEOGCS yields ``{"proj": "longlat"}``.  Unknown projection
    names raise with the supported list (never a silent wrong map)."""
    def d(v: str) -> float:
        return float(v.strip().strip('"'))

    # rest items must START as value tokens (sign/digit/dot/quote) so a
    # nested keyword (DATUM["x", SPHEROID[...) is never consumed as a
    # parameter of its parent
    kw = re.findall(
        r'([A-Z_]+)\s*\[\s*"([^"]*)"\s*((?:\s*,\s*[-+0-9."][^,\[\]]*)*)',
        wkt)
    out: dict = {}
    spheroid = None
    units = []
    for key, name, rest in kw:
        vals = [v for v in rest.split(",") if v.strip()]
        if key == "PROJECTION":
            pname = name.strip().lower()
            if pname not in _WKT_PROJ:
                raise KeyError(
                    f"unsupported WKT PROJECTION {name!r}; supported: "
                    f"{sorted(set(_WKT_PROJ))}")
            out["proj"] = _WKT_PROJ[pname]
        elif key == "PARAMETER":
            pname = name.strip().lower()
            if pname in _WKT_PARAM and vals:
                out[_WKT_PARAM[pname]] = d(vals[0])
        elif key == "SPHEROID" and len(vals) >= 2:
            spheroid = (d(vals[0]), d(vals[1]))
        elif key == "UNIT" and vals:
            units.append(d(vals[0]))
    if "proj" not in out:
        out["proj"] = "longlat"
    if spheroid is not None:
        out["a"] = spheroid[0]
        out["rf"] = spheroid[1]
        out.setdefault("ellps", "WGS84")  # a/rf override the named base
    # WKT's stere carries lat_0=+-90 as latitude_of_origin and the
    # true-scale parallel as standard_parallel_1
    if out.get("proj") == "stere" and "lat_1" in out:
        out["lat_ts"] = out.pop("lat_1")
    # the LAST angular/linear UNIT in a PROJCS is the projected unit
    if len(units) > 1 and units[-1] not in (1.0,):
        out["to_meter"] = units[-1]
    return out


def parse_proj_string(proj4: str) -> dict:
    """proj.4 string -> params dict — the arbitrary-CRS escape hatch
    (the reference accepts any proj4 string via OSR,
    ``variable/crs.py:160-240``).  ``+key=value`` terms become entries
    (numeric where possible), bare ``+flag`` terms become True;
    ``no_defs``/``wktext``/``type=crs`` are dropped as metadata."""
    out: dict = {}
    for term in proj4.split():
        term = term.lstrip("+")
        if not term or term in ("no_defs", "wktext") or term == "type=crs":
            continue
        if "=" in term:
            k, v = term.split("=", 1)
            try:
                out[k] = int(v) if v.lstrip("+-").isdigit() else float(v)
            except ValueError:
                out[k] = v
        else:
            out[term] = True
    return out


def _ellipsoid(params: dict) -> tuple[float, float]:
    """(a, e2) from proj-style params: +a/+rf beat +ellps; +R means a
    sphere of that radius."""
    if "R" in params:
        return float(params["R"]), 0.0
    name = params.get("ellps", "WGS84")
    if name not in ELLIPSOIDS:
        # silently substituting WGS84 for e.g. clrk66 (legacy NAD27
        # proj strings) would be hundreds of meters off with no signal
        raise KeyError(f"unknown ellps {name!r}; have "
                       f"{sorted(ELLIPSOIDS)} (or pass a/rf or R)")
    a, rf = ELLIPSOIDS[name]
    a = float(params.get("a", a))
    rf = float(params.get("rf", rf))
    if rf == 0.0:
        return a, 0.0
    f = 1.0 / rf
    return a, f * (2.0 - f)


def _finish_unit(fwd0, inv0, to_m: float):
    """Apply the native-unit conversion (``+to_meter``) to a
    forward/inverse pair — shared by crs_from_params' early-return
    branches and its tail."""
    if to_m == 1.0:
        return fwd0, inv0

    def fwd(lon, lat):
        x, y = fwd0(lon, lat)
        return x / to_m, y / to_m

    def inv(x, y):
        return inv0(np.asarray(x, np.float64) * to_m,
                    np.asarray(y, np.float64) * to_m)

    return fwd, inv


def crs_from_params(params: dict):
    """proj-style parameter dict -> (forward, inverse) pair — the
    generic constructor the reference gets from proj4/EPSG
    (``/root/reference/src/ocgis/variable/crs.py:160-240`` accepts any
    proj4 string / EPSG code).  Supported ``proj`` families: longlat,
    webmerc, lcc (2SP), tmerc, utm, aea, laea, sinu, stere (polar
    aspects), omerc (Hotine/NARCCAP), ob_tran (rotated pole) — the
    full reference CF grid-mapping family
    (``variable/crs.py:1031-1146``).  ``x_0``/``y_0`` are false easting/northing in
    METERS; ``to_meter`` converts the native unit (e.g. US survey feet
    1200/3937) so outputs are in the CRS's own unit, matching proj.

    Unknown keys are ignored (proj compatibility); an unknown ``proj``
    raises with the supported list.  A raw proj.4 STRING is accepted
    too (``parse_proj_string``) — the arbitrary-CRS escape hatch."""
    if isinstance(params, str):
        stripped = params.lstrip()
        params = (parse_wkt(params)
                  if stripped[:6].upper() in ("PROJCS", "GEOGCS")
                  else parse_proj_string(params))
    proj = params.get("proj", "longlat")
    a, e2 = _ellipsoid(params)
    fe = float(params.get("x_0", 0.0))
    fn = float(params.get("y_0", 0.0))
    to_m = float(params.get("to_meter", 1.0))
    g = lambda k, d=0.0: float(params.get(k, d))  # noqa: E731

    if proj in ("longlat", "latlong"):
        fwd0, inv0 = _ident, _ident
    elif proj == "webmerc":
        # honor false easting/northing (dropped silently before —
        # to_web_mercator has no fe/fn slots)
        def fwd0(lon, lat, _f=to_web_mercator):
            x, y = _f(lon, lat)
            return x + fe, y + fn

        def inv0(x, y, _f=from_web_mercator):
            return _f(np.asarray(x, np.float64) - fe,
                      np.asarray(y, np.float64) - fn)
    elif proj == "merc":
        raise KeyError(
            "proj 'merc' (ellipsoidal Mercator) is not implemented — "
            "it silently differs from spherical web mercator by ~0.3% "
            "in y (tens of km); use proj 'webmerc' for EPSG:3857 "
            "semantics or an implemented family")
    elif proj == "lcc":
        lat1, lat2 = g("lat_1"), g("lat_2", params.get("lat_1", 0.0))
        lat0, lon0 = g("lat_0"), g("lon_0")
        fwd0 = lambda lon, lat: lcc_forward(lon, lat, lon0, lat0, lat1, lat2,
                                            fe, fn, a, e2)  # noqa: E731
        inv0 = lambda x, y: lcc_inverse(x, y, lon0, lat0, lat1, lat2,
                                        fe, fn, a=a, e2=e2)  # noqa: E731
    elif proj == "tmerc":
        lon0, k0 = g("lon_0"), g("k", params.get("k_0", 1.0))
        fwd0 = lambda lon, lat: tm_forward(lon, lat, lon0, k0, fe, fn, a, e2)  # noqa: E731
        inv0 = lambda x, y: tm_inverse(x, y, lon0, k0, fe, fn, a, e2)  # noqa: E731
    elif proj == "utm":
        zone = int(params["zone"])
        south = bool(params.get("south", False))
        lon0 = zone * 6.0 - 183.0
        fn_utm = 10000000.0 if south else 0.0
        fwd0 = lambda lon, lat: tm_forward(lon, lat, lon0, 0.9996, 500000.0,
                                           fn_utm, a, e2)  # noqa: E731
        inv0 = lambda x, y: tm_inverse(x, y, lon0, 0.9996, 500000.0,
                                       fn_utm, a, e2)  # noqa: E731
    elif proj == "aea":
        lat1, lat2 = g("lat_1"), g("lat_2", params.get("lat_1", 0.0))
        lat0, lon0 = g("lat_0"), g("lon_0")
        fwd0 = lambda lon, lat: aea_forward(lon, lat, lon0, lat0, lat1, lat2,
                                            fe, fn, a, e2)  # noqa: E731
        inv0 = lambda x, y: aea_inverse(x, y, lon0, lat0, lat1, lat2,
                                        fe, fn, a=a, e2=e2)  # noqa: E731
    elif proj == "laea":
        lat0, lon0 = g("lat_0"), g("lon_0")
        fwd0 = lambda lon, lat: laea_forward(lon, lat, lon0, lat0, fe, fn,
                                             a, e2)  # noqa: E731
        inv0 = lambda x, y: laea_inverse(x, y, lon0, lat0, fe, fn, a, e2)  # noqa: E731
    elif proj == "sinu":
        lon0 = g("lon_0")
        fwd0 = lambda lon, lat: sinu_forward(lon, lat, lon0, a, fe, fn)  # noqa: E731
        inv0 = lambda x, y: sinu_inverse(x, y, lon0, a, fe, fn)  # noqa: E731
    elif proj == "moll":
        lon0 = g("lon_0")
        fwd0 = lambda lon, lat: moll_forward(lon, lat, lon0, a, fe, fn)  # noqa: E731
        inv0 = lambda x, y: moll_inverse(x, y, lon0, a, fe, fn)  # noqa: E731
    elif proj == "robin":
        lon0 = g("lon_0")
        fwd0 = lambda lon, lat: robin_forward(lon, lat, lon0, a, fe, fn)  # noqa: E731
        inv0 = lambda x, y: robin_inverse(x, y, lon0, a, fe, fn)  # noqa: E731
    elif proj == "stere":
        lat0 = g("lat_0", 90.0)
        if abs(lat0) < 90.0 - 1e-9:
            # oblique/equatorial aspect: spherical form (sphere of
            # radius a); ellipsoidal EPSG 9809 out of scope
            k0o = float(params.get("k", params.get("k_0", 1.0)))
            lon0o = g("lon_0")
            fwd0 = lambda lon, lat: oblique_stere_forward(
                lon, lat, lon0o, lat0, k0o, a, fe, fn)  # noqa: E731
            inv0 = lambda x, y: oblique_stere_inverse(
                x, y, lon0o, lat0, k0o, a, fe, fn)  # noqa: E731
            return _finish_unit(fwd0, inv0, to_m)
        south = lat0 < 0.0
        lat_ts = params.get("lat_ts")
        lat_ts = None if lat_ts is None else float(lat_ts)
        k0 = float(params.get("k", params.get("k_0", 1.0)))
        fwd0 = lambda lon, lat: ps_forward(lon, lat, g("lon_0"), lat_ts, k0,
                                           south, fe, fn, a, e2)  # noqa: E731
        inv0 = lambda x, y: ps_inverse(x, y, g("lon_0"), lat_ts, k0,
                                       south, fe, fn, a, e2)  # noqa: E731
    elif proj == "omerc":
        lat0, lonc = g("lat_0"), g("lonc")
        alpha = float(params.get("alpha", 360.0))  # NARCCAP default
        gamma = params.get("gamma")
        gamma = None if gamma is None else float(gamma)
        k0 = float(params.get("k", params.get("k_0", 1.0)))
        fwd0 = lambda lon, lat: omerc_forward(lon, lat, lat0, lonc, alpha,
                                              k0, gamma, fe, fn, a, e2)  # noqa: E731
        inv0 = lambda x, y: omerc_inverse(x, y, lat0, lonc, alpha,
                                          k0, gamma, fe, fn, a, e2)  # noqa: E731
    elif proj == "ob_tran":
        plon = g("o_lon_p", params.get("pole_lon", 0.0))
        plat = g("o_lat_p", params.get("pole_lat", 90.0))
        fwd0 = lambda lon, lat: rotated_pole_transform(lon, lat, plon, plat)  # noqa: E731
        inv0 = lambda rl, rp: rotated_pole_transform(rl, rp, plon, plat,
                                                     inverse=True)  # noqa: E731
    else:
        raise KeyError(
            f"unsupported proj {proj!r}; supported: longlat webmerc "
            "lcc tmerc utm aea laea sinu moll robin stere omerc ob_tran")

    return _finish_unit(fwd0, inv0, to_m)


US_FT = 1200.0 / 3937.0  # US survey foot

#: EPSG code -> proj params (the subset a webtext-geo deployment hits;
#: the registry is data, crs_from_params is the single code path —
#: new codes are one dict entry, not a new projection implementation)
EPSG_PARAMS: dict[int, dict] = {
    4326: {"proj": "longlat"},
    3857: {"proj": "webmerc"},
    5070: {"proj": "aea", "lat_0": 23.0, "lon_0": -96.0, "lat_1": 29.5,
           "lat_2": 45.5, "ellps": "GRS80"},                    # CONUS Albers
    2230: {"proj": "lcc", "lat_1": 33.883333333333333,
           "lat_2": 32.783333333333333, "lat_0": 32.166666666666666,
           "lon_0": -116.25, "x_0": 2000000.0001016,
           "y_0": 500000.0001016002, "ellps": "GRS80",
           "to_meter": US_FT},               # NAD83 / California zone 6 ftUS
    3035: {"proj": "laea", "lat_0": 52.0, "lon_0": 10.0, "x_0": 4321000.0,
           "y_0": 3210000.0, "ellps": "GRS80"},              # ETRS89 Europe
    3347: {"proj": "lcc", "lat_1": 49.0, "lat_2": 77.0, "lat_0": 63.390675,
           "lon_0": -91.866666666666667, "x_0": 6200000.0,
           "y_0": 3000000.0, "ellps": "GRS80"},       # Statistics Canada LCC
    2154: {"proj": "lcc", "lat_1": 49.0, "lat_2": 44.0, "lat_0": 46.5,
           "lon_0": 3.0, "x_0": 700000.0, "y_0": 6600000.0,
           "ellps": "GRS80"},                          # RGF93 / Lambert-93
    25832: {"proj": "utm", "zone": 32, "ellps": "GRS80"},  # ETRS89 UTM 32N
    32615: {"proj": "utm", "zone": 15},                     # WGS84 UTM 15N
    32733: {"proj": "utm", "zone": 33, "south": True},      # WGS84 UTM 33S
    54008: {"proj": "sinu", "lon_0": 0.0, "R": 6371007.181},  # ESRI sinu (MODIS)
    3413: {"proj": "stere", "lat_0": 90.0, "lat_ts": 70.0,
           "lon_0": -45.0},                     # NSIDC Sea Ice Polar Stereo N
    3031: {"proj": "stere", "lat_0": -90.0, "lat_ts": -71.0,
           "lon_0": 0.0},                        # Antarctic Polar Stereographic
    5041: {"proj": "stere", "lat_0": 90.0, "k_0": 0.994, "lon_0": 0.0,
           "x_0": 2000000.0, "y_0": 2000000.0},  # UPS North (scale-factor form)
    3375: {"proj": "omerc", "lat_0": 4.0, "lonc": 102.25,
           "alpha": 323.0257964666666, "gamma": 323.1301023611111,
           "k_0": 0.99984, "x_0": 804671.0,
           "ellps": "GRS80"},                    # GDM2000 / Peninsular RSO
}


def crs_from_epsg(code: int):
    try:
        return crs_from_params(EPSG_PARAMS[int(code)])
    except KeyError:
        raise KeyError(f"EPSG:{code} not in the registry; have "
                       f"{sorted(EPSG_PARAMS)} (add a params dict to "
                       "EPSG_PARAMS or pass proj params directly)") from None


def resolve_crs(spec):
    """Any CRS spec -> (forward, inverse): a registered name, an
    ``"epsg:NNNN"`` string, an int EPSG code, or a proj-param dict."""
    if isinstance(spec, dict):
        return crs_from_params(spec)
    if isinstance(spec, int):
        return crs_from_epsg(spec)
    if isinstance(spec, str) and spec.lower().startswith("epsg:"):
        return crs_from_epsg(int(spec.split(":", 1)[1]))
    try:
        return CRS_PAIRS[spec]
    except (KeyError, TypeError):
        raise KeyError(f"unknown CRS {spec!r}; have {sorted(CRS_PAIRS)}, "
                       "'epsg:<code>', or a proj-param dict") from None


def compose_transform(src, dst):
    """Generic CRS-to-CRS transform: ``inverse(src) -> lon/lat ->
    forward(dst)`` — the ``update_crs(other_crs)`` generality the
    reference gets from proj4 (``variable/crs.py:CoordinateReference
    System.transform``), composed from the registered analytic pairs.
    ``src``/``dst`` accept anything :func:`resolve_crs` does."""
    src_pair, dst_pair = resolve_crs(src), resolve_crs(dst)
    src_inv, dst_fwd = src_pair[1], dst_pair[0]

    def fn(x, y):
        lon, lat = src_inv(x, y)
        return dst_fwd(lon, lat)

    return fn


def update_crs_between(ds, src: str, dst: str, in_x: str = "lon",
                       in_y: str = "lat", out_x: str = "x",
                       out_y: str = "y"):
    """Distributed generic CRS transform over (in_x, in_y) columns —
    elastic stateless tasks (the kernel is pure trig, no per-worker
    state worth an actor pool)."""
    import pyarrow as _pa

    fn = compose_transform(src, dst)

    def xf(t: _pa.Table) -> _pa.Table:
        x, y = fn(t[in_x].to_numpy(zero_copy_only=False),
                  t[in_y].to_numpy(zero_copy_only=False))
        drop = [c for c in (out_x, out_y) if c in t.column_names]
        if drop:
            t = t.drop_columns(drop)
        return t.append_column(out_x, _pa.array(x)).append_column(
            out_y, _pa.array(y))

    return ds.map_batches(xf, batch_format="pyarrow", zero_copy_batch=True)
