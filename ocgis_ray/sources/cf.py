"""CF-netCDF ingest: dimension-map roles -> long-form Arrow cells.

The reference's request pipeline starts from a CF file and a dimension
map assigning roles (time/y/x/bounds/data;
``/root/reference/src/ocgis/driver/nc.py:60-120`` builds it from CF
attribute conventions).  This module reimplements the ROLE DETECTION
from the public CF conventions document and melts the grid into the
engine's native shape — one Arrow row per (time, y, x) cell with
coordinate bounds — which is exactly the parquet "cells" layout every
downstream operator (bbox subset, polygon aggregate, regrid) already
consumes.

Role rules (CF 1.x, sections 4.1-4.4 + 7.1):

- **time**: a 1-D coordinate variable whose ``units`` matches
  ``"<unit> since <epoch>"``; decoded with its ``calendar`` via
  :func:`ocgis_ray.stages.temporal.cf_time_decode`.
- **y / x**: ``units`` of ``degrees_north`` / ``degrees_east`` (or
  ``axis: Y/X``, or standard names), falling back to dimension names
  ``lat*``/``lon*``/``y``/``x``.
- **bounds**: the coordinate's ``bounds`` attribute names the bounds
  variable; the reference's fixtures also use the bare
  ``bounds_<name>`` / ``<name>_bnds`` naming, handled as fallback.
  Missing bounds are interpolated from midpoints (the reference's
  ``set_extrapolated_bounds`` behavior).
- **data**: every variable dimensioned over (time?, y, x) that is not
  a coordinate or bounds variable; ``missing_value``/``_FillValue``
  become Arrow nulls (the reference's masked array).

Synthesizing the reference's 4x4 quadrant fixture
(``test/test_simple/make_test_data.py:35-120`` semantics) lives here
too so tests and the CLI share one deterministic source.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ocgis_ray.sources.netcdf3 import NcVar, read_netcdf3, write_netcdf3

_TIME_UNITS_RE = re.compile(r"^\s*\w+\s+since\s+", re.I)


def _att_str(attrs: dict, key: str) -> str:
    v = attrs.get(key, "")
    return v if isinstance(v, str) else ""


def cf_dimension_map(variables: dict) -> dict:
    """-> roles: {"time": name|None, "y": name, "x": name,
    "y_bounds": name|None, "x_bounds": name|None, "data": [names]}."""
    roles: dict = {"time": None, "y": None, "x": None,
                   "y_bounds": None, "x_bounds": None, "data": []}
    coords = {nm for nm, v in variables.items()
              if len(v.dims) == 1 and v.dims[0] == nm}
    for nm, v in variables.items():
        if len(v.dims) != 1:
            continue
        units = _att_str(v.attrs, "units").lower()
        axis = _att_str(v.attrs, "axis").upper()
        std = _att_str(v.attrs, "standard_name").lower()
        if _TIME_UNITS_RE.match(units):
            roles["time"] = nm
        elif units == "degrees_north" or axis == "Y" or std == "latitude" \
                or nm.lower().startswith(("lat", "y")):
            roles["y"] = roles["y"] or nm
        elif units == "degrees_east" or axis == "X" or std == "longitude" \
                or nm.lower().startswith(("lon", "x")):
            roles["x"] = roles["x"] or nm
    if roles["y"] is None or roles["x"] is None:
        raise ValueError("cf_dimension_map: no y/x coordinate variables "
                         f"found among {sorted(variables)}")

    bounds_vars = set()
    for axis_key in ("y", "x"):
        c = variables[roles[axis_key]]
        cand = _att_str(c.attrs, "bounds") or None
        if cand is None:
            for pat in (f"bounds_{roles[axis_key]}", f"{roles[axis_key]}_bnds",
                        f"{roles[axis_key]}_bounds"):
                if pat in variables:
                    cand = pat
                    break
        if cand is not None and cand in variables:
            roles[f"{axis_key}_bounds"] = cand
            bounds_vars.add(cand)
    # time bounds are metadata only at this layer but must not be data
    if roles["time"] is not None:
        tb = _att_str(variables[roles["time"]].attrs, "bounds")
        for pat in (tb, f"bounds_{roles['time']}", f"{roles['time']}_bnds"):
            if pat and pat in variables:
                bounds_vars.add(pat)

    grid_dims = (variables[roles["y"]].dims[0], variables[roles["x"]].dims[0])
    tdim = variables[roles["time"]].dims[0] if roles["time"] else None
    for nm, v in variables.items():
        if nm in coords or nm in bounds_vars or nm in roles.values():
            continue
        d = tuple(v.dims)
        if d[-2:] == grid_dims and (len(d) == 2
                                    or (len(d) == 3 and d[0] == tdim)):
            roles["data"].append(nm)
    if not roles["data"]:
        raise ValueError("cf_dimension_map: no data variables over the "
                         f"grid dims {grid_dims}")
    return roles


def _bounds_or_extrapolate(coord: np.ndarray, bnds) -> tuple[np.ndarray, np.ndarray]:
    if bnds is not None:
        b = np.asarray(bnds, dtype=np.float64)
        return b.min(axis=1), b.max(axis=1)
    c = np.asarray(coord, dtype=np.float64)
    mid = (c[:-1] + c[1:]) / 2.0
    lo = np.concatenate([[c[0] - (mid[0] - c[0])] if len(c) > 1 else [c[0] - 0.5], mid])
    hi = np.concatenate([mid, [c[-1] + (c[-1] - mid[-1])] if len(c) > 1 else [c[-1] + 0.5]])
    return np.minimum(lo, hi), np.maximum(lo, hi)


def cf_to_table(path: str) -> pa.Table:
    """CF-netCDF file -> long-form cells Table: one row per
    (time, y, x) with row/col indices, centers, bounds and one float64
    column (nullable via missing_value/_FillValue) per data variable."""
    from ocgis_ray.stages.temporal import cf_time_decode

    _, _, variables = read_netcdf3(path)
    roles = cf_dimension_map(variables)
    yv, xv = variables[roles["y"]], variables[roles["x"]]
    lat = np.asarray(yv.data, dtype=np.float64)
    lon = np.asarray(xv.data, dtype=np.float64)
    lat_lo, lat_hi = _bounds_or_extrapolate(
        lat, variables[roles["y_bounds"]].data if roles["y_bounds"] else None)
    lon_lo, lon_hi = _bounds_or_extrapolate(
        lon, variables[roles["x_bounds"]].data if roles["x_bounds"] else None)

    ny, nx = len(lat), len(lon)
    if roles["time"] is not None:
        tv = variables[roles["time"]]
        dec = cf_time_decode(np.asarray(tv.data, dtype=np.float64),
                             _att_str(tv.attrs, "units"),
                             _att_str(tv.attrs, "calendar") or "standard")
        nt = len(tv.data)
    else:
        dec, nt = None, 1

    rows = np.tile(np.repeat(np.arange(ny, dtype=np.int64), nx), nt)
    cols_ = np.tile(np.arange(nx, dtype=np.int64), ny * nt)
    tidx = np.repeat(np.arange(nt, dtype=np.int64), ny * nx)
    cells = {
        "time_idx": pa.array(tidx),
        "row": pa.array(rows), "col": pa.array(cols_),
        "lat": pa.array(lat[rows]), "lon": pa.array(lon[cols_]),
        "lat_min": pa.array(lat_lo[rows]), "lat_max": pa.array(lat_hi[rows]),
        "lon_min": pa.array(lon_lo[cols_]), "lon_max": pa.array(lon_hi[cols_]),
    }
    if dec is not None:
        if "timestamp" in dec:
            cells["time"] = pa.array(dec["timestamp"][tidx])
        for k in ("year", "month", "day"):
            cells[f"time_{k}"] = pa.array(np.asarray(dec[k])[tidx])
    for nm in roles["data"]:
        v = variables[nm]
        a = np.asarray(v.data, dtype=np.float64).reshape(nt, ny, nx) \
            if len(v.dims) == 3 else \
            np.broadcast_to(np.asarray(v.data, dtype=np.float64), (nt, ny, nx))
        flat = np.ascontiguousarray(a).reshape(-1)
        mask = None
        for key in ("missing_value", "_FillValue"):
            if key in v.attrs:
                fill = float(np.asarray(v.attrs[key]).ravel()[0])
                m = flat == fill
                mask = m if mask is None else (mask | m)
        cells[nm] = pa.array(flat, mask=mask)
    return pa.table(cells)


def make_quadrant_fixture(path: str, mask_n: int = 0) -> None:
    """Deterministic CF fixture with the reference quadrant-grid
    semantics (``test/test_simple/make_test_data.py:35-120``): 4x4
    one-degree grid, upper-left cell centered at (-105, 40), variable
    ``foo`` constant in time with quadrant values 1/2/3/4 (mean 2.5),
    daily time 2000-03-01..2000-04-30 12:00 as ``days since
    2000-01-01`` (proleptic_gregorian), coordinate bounds variables.

    ``mask_n`` masks that many deterministic cells with the 1e20 fill
    (the reference seeds numpy for the same purpose)."""
    lon = np.arange(-105.0, -101.0)   # ascending cols
    lat = np.arange(37.0, 41.0)       # ascending rows
    nt_start = np.datetime64("2000-03-01T12:00:00")
    nt_end = np.datetime64("2000-04-30T12:00:00")
    days = ((nt_end - nt_start) // np.timedelta64(1, "D")).astype(int) + 1
    epoch = np.datetime64("2000-01-01T00:00:00")
    tvals = ((nt_start - epoch) / np.timedelta64(1, "D")
             + np.arange(days)).astype(np.float64)
    quad = np.array([[1, 1, 2, 2],
                     [1, 1, 2, 2],
                     [3, 3, 4, 4],
                     [3, 3, 4, 4]], dtype=np.float64)
    val = np.broadcast_to(quad, (days, 4, 4)).copy()
    if mask_n:
        rng = np.random.RandomState(1)
        for _ in range(mask_n):
            val[:, rng.randint(0, 4), rng.randint(0, 4)] = 1e20
    write_netcdf3(path, {"time": days, "lat": 4, "lon": 4, "bnds": 2}, {
        "time": NcVar(["time"], {
            "units": "days since 2000-01-01 00:00:00",
            "calendar": "proleptic_gregorian"}, tvals),
        "latitude": NcVar(["lat"], {
            "units": "degrees_north",
            "bounds": "bounds_latitude"}, lat),
        "longitude": NcVar(["lon"], {
            "units": "degrees_east",
            "bounds": "bounds_longitude"}, lon),
        "bounds_latitude": NcVar(["lat", "bnds"], {},
                                 np.stack([lat - 0.5, lat + 0.5], axis=1)),
        "bounds_longitude": NcVar(["lon", "bnds"], {},
                                  np.stack([lon - 0.5, lon + 0.5], axis=1)),
        "foo": NcVar(["time", "lat", "lon"],
                     {"units": "K", "missing_value": np.float64(1e20)}, val),
    }, {"Conventions": "CF-1.6", "title": "quadrant fixture"})
