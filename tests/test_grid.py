"""Quadgrid cell index unit tests (+ SQL parity)."""

import duckdb
import numpy as np

from ocgis_ray import grid


def test_encode_known_points():
    # res 7: cell size 2.8125 deg; lon=-180,lat=-90 -> ix=0, iy=0
    c = grid.encode(np.array([-180.0]), np.array([-90.0]), 7)
    assert c[0] == 0
    c = grid.encode(np.array([0.0]), np.array([0.0]), 7)
    ix, iy = grid.split(c)
    assert ix[0] == 64 and iy[0] == 32


def test_encode_matches_sql_on_random_points():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 179.999, 5000)
    lat = rng.uniform(-89.999, 89.999, 5000)
    for res in (7, 8, 9):
        mine = grid.encode(lon, lat, res)
        con = duckdb.connect()
        con.execute("CREATE TABLE t (lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", list(zip(lon.tolist(), lat.tolist())))
        sql = con.execute(f"SELECT {grid.encode_sql('lon', 'lat', res)} FROM t").fetchnumpy()
        theirs = next(iter(sql.values()))
        assert (mine == theirs).all()


def test_parent_hierarchy():
    lon = np.array([12.34, -77.1])
    lat = np.array([45.6, -33.3])
    c9 = grid.encode(lon, lat, 9)
    c7 = grid.encode(lon, lat, 7)
    assert (grid.parent(c9, 9, 7) == c7).all()


def test_bounds_roundtrip():
    lon = np.array([12.34])
    lat = np.array([45.6])
    c = grid.encode(lon, lat, 8)
    x0, y0, x1, y1 = grid.bounds(c, 8)
    assert x0[0] <= lon[0] < x1[0]
    assert y0[0] <= lat[0] < y1[0]
    assert np.isclose(x1[0] - x0[0], grid.cell_size(8))


def test_disk_and_ring():
    c = grid.encode(np.array([0.0]), np.array([0.0]), 7)[0]
    d1 = grid.disk(int(c), 7, 1)
    assert len(d1) == 9
    r1 = grid.ring(int(c), 7, 1)
    assert len(r1) == 8
    assert int(c) not in r1
    # pole clamp: near the north pole, the disk truncates
    cp = grid.encode(np.array([0.0]), np.array([89.9]), 7)[0]
    dp = grid.disk(int(cp), 7, 1)
    assert len(dp) == 6  # top row clipped


def test_disk_wraps_longitude():
    c = grid.encode(np.array([-179.9]), np.array([0.0]), 7)[0]
    d = grid.disk(int(c), 7, 1)
    assert len(d) == 9
    ix, _ = grid.split(d)
    n = 1 << 7
    assert 0 in ix and (n - 1) in ix  # both sides of the antimeridian


def test_cells_in_bbox_covers():
    cells = grid.cells_in_bbox(-1.0, -1.0, 1.0, 1.0, 7)
    # bbox straddles the origin: 2x2 cells at least
    assert len(cells) == 4
    c = grid.encode(np.array([0.5]), np.array([0.5]), 7)
    assert c[0] in cells
