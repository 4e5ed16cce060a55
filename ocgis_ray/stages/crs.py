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
    worker (the pyproj.Transformer slot in a full deployment)."""

    TRANSFORMS = {
        "web_mercator": lambda lon, lat: to_web_mercator(lon, lat),
    }

    def __init__(self, name: str = "web_mercator", out_x: str = "x", out_y: str = "y"):
        self.fn = self.TRANSFORMS[name]
        self.out_x = out_x
        self.out_y = out_y

    def __call__(self, t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        x, y = self.fn(lon, lat)
        t = t.append_column(self.out_x, pa.array(x))
        return t.append_column(self.out_y, pa.array(y))


def update_crs(ds, name: str = "web_mercator", concurrency: int | None = 2):
    return ds.map_batches(
        CrsTransformStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"name": name},
    )
