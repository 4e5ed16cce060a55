"""Polygon -> cell covering classification."""

import numpy as np

from ocgis_ray import grid
from ocgis_ray.cover import build_cell_index, cover_polygon
from ocgis_ray.geometry import Polygon


def rect(x0, y0, x1, y1, ugid=1):
    return Polygon(ugid, "r", np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]))


def test_cover_rect_full_vs_boundary():
    # rect spanning exactly 4x4 cells at res 7 (cell size 2.8125), offset
    # by half a cell so there's a 2x2 full interior and a boundary ring
    cs = grid.cell_size(7)
    x0 = -180.0 + 10 * cs + cs / 2
    y0 = -90.0 + 10 * cs + cs / 2
    p = rect(x0, y0, x0 + 3 * cs, y0 + 3 * cs)
    cov = cover_polygon(p, 7)
    assert len(cov.full) == 4      # 2x2 interior
    assert len(cov.boundary) == 12  # ring around it
    # every full cell's corners are strictly inside
    bx0, by0, bx1, by1 = grid.bounds(cov.full, 7)
    for xs, ys in [(bx0, by0), (bx1, by1), (bx0, by1), (bx1, by0)]:
        assert p.contains(xs, ys).all()
    # boundary clip areas are positive and < cell area
    assert (cov.boundary_clip_area > 0).all()
    assert (cov.boundary_clip_area < cs * cs).all()


def test_cover_aligned_rect_all_full():
    cs = grid.cell_size(7)
    x0 = -180.0 + 20 * cs
    y0 = -90.0 + 20 * cs
    p = rect(x0, y0, x0 + 2 * cs, y0 + 2 * cs)
    cov = cover_polygon(p, 7)
    # exactly cell-aligned: the 2x2 interior is full; edge-touching
    # neighbors may appear as zero-area boundary but must not
    assert len(cov.full) == 4
    assert len(cov.boundary) == 0


def test_cover_triangle():
    tri = Polygon(3, "t", np.array([[0.0, 0.0], [20.0, 0.0], [0.0, 20.0]]))
    cov = cover_polygon(tri, 7)
    cs = grid.cell_size(7)
    # total covering area equals triangle area
    total = len(cov.full) * cs * cs + cov.boundary_clip_area.sum()
    assert abs(total - 200.0) < 1e-9


def test_build_cell_index_multipart():
    a = rect(0, 0, 10, 10, ugid=5)
    b = rect(20, 0, 30, 10, ugid=5)  # same ugid, disjoint part
    idx_full, idx_bnd, covs = build_cell_index([a, b], 7)
    ugids = {u for us in idx_full.values() for u in us} | {
        u for us in idx_bnd.values() for u in us
    }
    assert ugids == {5}
