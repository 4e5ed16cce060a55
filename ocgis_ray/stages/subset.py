"""Spatial subset fast paths: bbox window, radius search, nearest.

The reference's optimized bbox subset skips exact geometry work
entirely (``/root/reference/src/ocgis/spatial/grid.py:635-674``, flag
``optimized_bbox_subset`` ``ops/parms/definition.py:927``); point-
buffer radius search is ``ops/engine.py:515-531`` (selection point
buffered by ``search_radius_mult * resolution``); ``select_nearest``
is ``variable/geom.py:803-821``.

All are pure vectorized filters over zero-copy Arrow batches — the
engine's cheapest subset path (no covering, no index, no shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocgis_ray.geometry import haversine_km


def bbox_filter(ds, x0: float, y0: float, x1: float, y1: float,
                lon_col: str = "lon", lat_col: str = "lat"):
    """Keep rows inside the inclusive bbox (the optimized-bbox path)."""

    def f(t: pa.Table) -> pa.Table:
        lon, lat = t[lon_col], t[lat_col]
        m = pc.and_(
            pc.and_(pc.greater_equal(lon, pa.scalar(x0)), pc.less_equal(lon, pa.scalar(x1))),
            pc.and_(pc.greater_equal(lat, pa.scalar(y0)), pc.less_equal(lat, pa.scalar(y1))),
        )
        return t.filter(m)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def radius_filter(ds, center_lon: float, center_lat: float, radius_km: float,
                  lon_col: str = "lon", lat_col: str = "lat",
                  out_dist: str | None = None):
    """Keep rows within ``radius_km`` of the center (buffered-point
    subset).  Two-stage: a degree-bbox prefilter (cheap compare) then
    the exact haversine on survivors — the same hint-mask/exact split
    as the polygon join."""
    # conservative degree buffer: 1 deg lat ~ 110.574 km; lon shrinks by cos(lat)
    dlat = radius_km / 110.574 * 1.05
    coslat = max(0.01, float(np.cos(np.radians(center_lat))))
    dlon = radius_km / (111.320 * coslat) * 1.05
    # near a pole the cos-lat clamp under-buffers, and near +-180 the
    # window must wrap: in both regimes drop the lon prefilter (lat
    # alone still prunes; the exact haversine decides)
    lon_window = dlon < 180.0 and abs(center_lat) + dlat < 89.0
    wraps = lon_window and (center_lon - dlon < -180.0
                            or center_lon + dlon > 180.0)

    def f(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        hint = (lat >= center_lat - dlat) & (lat <= center_lat + dlat)
        if lon_window and not wraps:
            hint &= (lon >= center_lon - dlon) & (lon <= center_lon + dlon)
        elif wraps:
            lo = (center_lon - dlon + 540.0) % 360.0 - 180.0
            hi = (center_lon + dlon + 540.0) % 360.0 - 180.0
            hint &= (lon >= lo) | (lon <= hi)
        if not hint.any():
            return t.slice(0, 0) if out_dist is None else t.slice(0, 0).append_column(
                out_dist, pa.array([], pa.float64()))
        idx = np.nonzero(hint)[0]
        d = haversine_km(lon[idx], lat[idx], center_lon, center_lat)
        keep = idx[d <= radius_km]
        out = t.take(pa.array(keep))
        if out_dist is not None:
            out = out.append_column(out_dist, pa.array(d[d <= radius_km]))
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
