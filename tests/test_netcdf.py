"""NetCDF-3 classic I/O (sources/netcdf3.py) and CF ingest
(sources/cf.py + tools/nc_to_parquet.py) — the reference's
CF-netCDF driver semantics re-targeted to parquet."""

import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from ocgis_ray.sources.netcdf3 import NcVar, read_netcdf3, write_netcdf3
from ocgis_ray.sources.cf import (cf_dimension_map, cf_to_table,
                                  make_quadrant_fixture)


def _fixture_vars():
    lat = np.arange(37.0, 41.0)
    lon = np.arange(-108.0, -104.0)
    return {
        "time": NcVar(["time"], {"units": "days since 2000-01-01 00:00:00",
                                 "calendar": "proleptic_gregorian"},
                      np.array([60.5, 61.5])),
        "latitude": NcVar(["lat"], {"units": "degrees_north"}, lat),
        "longitude": NcVar(["lon"], {"units": "degrees_east"}, lon),
        "foo": NcVar(["time", "lat", "lon"], {"units": "K"},
                     np.arange(32, dtype=np.float64).reshape(2, 4, 4)),
    }


def test_netcdf3_roundtrip(tmp_path):
    p = str(tmp_path / "rt.nc")
    dims = {"time": 2, "lat": 4, "lon": 4}
    v = _fixture_vars()
    write_netcdf3(p, dims, v, {"title": "t", "n": np.int32(7)})
    d, g, vv = read_netcdf3(p)
    assert d == dims
    assert g["title"] == "t" and g["n"][0] == 7
    assert np.array_equal(vv["foo"].data, v["foo"].data)
    assert vv["foo"].dims == ["time", "lat", "lon"]
    assert vv["foo"].attrs["units"] == "K"
    # int16/int32/float32 survive
    write_netcdf3(p, {"n": 3}, {
        "a": NcVar(["n"], {}, np.array([1, 2, 3], np.int16)),
        "b": NcVar(["n"], {}, np.array([1, 2, 3], np.int32)),
        "c": NcVar(["n"], {}, np.array([1.5, 2.5, 3.5], np.float32)),
    })
    _, _, vv = read_netcdf3(p)
    assert vv["a"].data.dtype == np.int16
    assert vv["c"].data[1] == np.float32(2.5)


def test_netcdf3_deterministic_and_rejects_hdf5(tmp_path):
    a, b = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    make_quadrant_fixture(a)
    make_quadrant_fixture(b)
    assert open(a, "rb").read() == open(b, "rb").read()
    h5 = str(tmp_path / "x.nc")
    with open(h5, "wb") as f:
        f.write(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a NetCDF classic"):
        read_netcdf3(h5)


def test_cf_dimension_map_roles():
    roles = cf_dimension_map(_fixture_vars())
    assert roles["time"] == "time"
    assert roles["y"] == "latitude" and roles["x"] == "longitude"
    assert roles["data"] == ["foo"]
    # axis-attr fallback, no units
    v = {
        "t": NcVar(["t"], {"units": "hours since 1990-01-01 00:00:00"},
                   np.array([0.0])),
        "yy": NcVar(["yy"], {"axis": "Y"}, np.array([0.0, 1.0])),
        "xx": NcVar(["xx"], {"axis": "X"}, np.array([0.0, 1.0])),
        "v": NcVar(["t", "yy", "xx"], {},
                   np.zeros((1, 2, 2))),
    }
    roles = cf_dimension_map(v)
    assert roles["y"] == "yy" and roles["x"] == "xx" and roles["data"] == ["v"]
    with pytest.raises(ValueError, match="no y/x"):
        cf_dimension_map({"v": NcVar(["a", "b"], {}, np.zeros((2, 2)))})


def test_quadrant_fixture_table(tmp_path):
    p = str(tmp_path / "quad.nc")
    make_quadrant_fixture(p)
    t = cf_to_table(p)
    assert t.num_rows == 61 * 16
    df = t.to_pandas()
    # the reference expectation: whole-grid mean of foo == 2.5
    # (test_simple.py:545-550 call shape)
    assert df["foo"].mean() == 2.5
    # quadrant means == quadrant values (upper-left cell at (-105, 40)
    # carries 1 -> the NW quadrant is the TOP rows of the value array)
    nw = df[(df.lon < -103) & (df.lat < 39)]
    assert nw["foo"].mean() == 1.0 and len(nw) == 61 * 4
    se = df[(df.lon > -103) & (df.lat > 39)]
    assert se["foo"].mean() == 4.0
    # CF time decode: first day is 2000-03-01 12:00
    assert str(df["time"].min()) == "2000-03-01 12:00:00"
    assert str(df["time"].max()) == "2000-04-30 12:00:00"
    # bounds from the bounds variables
    r = df[(df.row == 0) & (df.col == 0) & (df.time_idx == 0)].iloc[0]
    assert (r.lat_min, r.lat_max, r.lon_min, r.lon_max) == \
        (36.5, 37.5, -105.5, -104.5)


def test_quadrant_masked_cells(tmp_path):
    p = str(tmp_path / "quadm.nc")
    make_quadrant_fixture(p, mask_n=2)
    df = cf_to_table(p).to_pandas()
    assert df["foo"].isna().sum() > 0
    # masked cells excluded; remaining values still in {1,2,3,4}
    assert set(df["foo"].dropna().unique()) <= {1.0, 2.0, 3.0, 4.0}


def test_polygon_aggregate_call_shape(tmp_path, ray_session):
    """The converted cells drive the engine's spatial join + aggregate
    exactly like a pages table: whole-grid polygon mean == 2.5, west
    half mean == 2.0 (quadrants 1 and 3)."""
    import ray.data as rd

    from ocgis_ray import grid
    from ocgis_ray.geometry import Polygon
    from ocgis_ray.stages.spatial_join import spatial_join

    p = str(tmp_path / "quad.nc")
    make_quadrant_fixture(p)
    t = cf_to_table(p)
    lon = t["lon"].to_numpy()
    lat = t["lat"].to_numpy()
    t = t.append_column("cell_r7", pa.array(grid.encode(lon, lat, 7)))
    ds = rd.from_arrow(t)

    def rect(ugid, x0, y0, x1, y1):
        return Polygon(ugid, f"r{ugid}", np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]))

    polys = [rect(1, -106.0, 36.0, -101.0, 41.0),   # whole grid
             rect(2, -106.0, 36.0, -103.5, 41.0)]   # west half (edge
             # between cell centers: keep_touches would otherwise
             # include the -103 column)
    joined = spatial_join(ds, polys, how="inner", res=7,
                          concurrency=2).to_pandas()
    m = joined.groupby("ugid")["foo"].mean()
    assert m[1] == 2.5
    assert m[2] == 2.0


def test_cli_roundtrip(tmp_path):
    nc = str(tmp_path / "f.nc")
    out = str(tmp_path / "f.parquet")
    r = subprocess.run([sys.executable, "tools/nc_to_parquet.py",
                        "--fixture", nc], capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "tools/nc_to_parquet.py", nc, out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == 61 * 16
    assert "foo" in t.column_names and "lat_min" in t.column_names
