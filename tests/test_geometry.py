"""Geometry kernels: point-in-polygon, clip, haversine.

Assertion style ported from the reference's analytic fixtures
(test/test_simple: exact areas, exact quadrant membership)."""

import numpy as np
import pytest

from ocgis_ray.geometry import (
    Polygon,
    clip_poly_rect,
    haversine_km,
    rect_clip_area_sqlparity,
    shoelace_area,
)


def rect(x0, y0, x1, y1, ugid=1):
    return Polygon(ugid, "r", np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]))


def test_convex_contains_and_touches():
    p = rect(0, 0, 10, 10)
    px = np.array([5.0, 0.0, 10.0, 10.1, -0.1])
    py = np.array([5.0, 5.0, 10.0, 5.0, 5.0])
    inside_incl = p.contains(px, py, keep_touches=True)
    assert inside_incl.tolist() == [True, True, True, False, False]
    inside_excl = p.contains(px, py, keep_touches=False)
    assert inside_excl.tolist() == [True, False, False, False, False]


def test_nonconvex_raycast():
    l_shape = Polygon(
        1, "L",
        np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 1.0], [1.0, 1.0], [1.0, 4.0], [0.0, 4.0]]),
    )
    assert not l_shape.convex
    px = np.array([0.5, 3.0, 3.0, 0.5])
    py = np.array([0.5, 0.5, 3.0, 3.0])
    assert l_shape.contains(px, py).tolist() == [True, True, False, True]


def test_vertex_order_normalized():
    cw = Polygon(1, "cw", np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=float))
    assert cw.contains(np.array([0.5]), np.array([0.5]))[0]


def test_clip_areas_quadrant_fixture():
    # the reference's 4x4 quadrant grid: unit cells, clip against a
    # 2x2 selection polygon centered on a cell corner -> four 1x1
    # intersections of area 1.0, union area 4.0 (test_simple.py:562-575
    # analog with our cell layout)
    sel = rect(-1.0, -1.0, 1.0, 1.0)
    total = 0.0
    for cx in (-1.0, 0.0):
        for cy in (-1.0, 0.0):
            a = sel.clip_area_rect(cx, cy, cx + 1.0, cy + 1.0)
            assert a == pytest.approx(1.0)
            total += a
    assert total == pytest.approx(sel.area())


def test_clip_partial_and_disjoint():
    sel = rect(0.0, 0.0, 2.0, 2.0)
    assert sel.clip_area_rect(1.0, 1.0, 3.0, 3.0) == pytest.approx(1.0)
    assert sel.clip_area_rect(5.0, 5.0, 6.0, 6.0) == 0.0


def test_clip_triangle_analytic():
    tri = Polygon(1, "t", np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]]))
    # square [0,1]^2 fully inside (x+y <= 4 everywhere)
    assert tri.clip_area_rect(0.0, 0.0, 1.0, 1.0) == pytest.approx(1.0)
    # square [2,3]x[1,2]: hypotenuse x+y=4 bisects it -> area 0.5
    assert tri.clip_area_rect(2.0, 1.0, 3.0, 2.0) == pytest.approx(0.5)
    # square [1,2]^2 touches the hypotenuse only at (2,2) -> area 0
    tri2 = Polygon(2, "t2", np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]]))
    assert tri2.clip_area_rect(1.0, 1.0, 2.0, 2.0) == pytest.approx(0.0)


def test_rect_clip_sqlparity_matches_shoelace():
    rng = np.random.RandomState(5)
    for _ in range(200):
        a = np.sort(rng.uniform(-10, 10, 2))
        b = np.sort(rng.uniform(-10, 10, 2))
        c = np.sort(rng.uniform(-10, 10, 2))
        d = np.sort(rng.uniform(-10, 10, 2))
        q = rect(a[0], b[0], a[1], b[1])
        sqlv = rect_clip_area_sqlparity(
            np.array([c[0]]), np.array([d[0]]), np.array([c[1]]), np.array([d[1]]),
            a[0], b[0], a[1], b[1],
        )[0]
        shv = q.clip_area_rect(c[0], d[0], c[1], d[1])
        assert sqlv == pytest.approx(shv, abs=1e-12)


def test_haversine_known():
    # London -> Paris ~ 343 km
    d = haversine_km(np.array([-0.1276]), np.array([51.5072]),
                     np.array([2.3522]), np.array([48.8566]))
    assert 340 < d[0] < 346
    assert haversine_km(np.array([10.0]), np.array([20.0]),
                        np.array([10.0]), np.array([20.0]))[0] == 0.0


def test_shoelace_and_clip_poly_rect():
    tri = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    assert shoelace_area(tri) == pytest.approx(8.0)
    clipped = clip_poly_rect(tri, -1.0, -1.0, 5.0, 5.0)
    assert shoelace_area(clipped) == pytest.approx(8.0)
    assert clip_poly_rect(tri, 10.0, 10.0, 11.0, 11.0) is None


def test_holes_and_keep_touches_nonconvex():
    """interior rings + boundary-aware keep_touches in the raycast
    path (reference touch rule: spatial/grid.py:627-631; interior-ring
    handling: variable/geom.py:333-637)."""
    from ocgis_ray.geometry import Polygon

    donut = Polygon(
        1, "donut",
        np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),
        holes=[np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0]])],
    )
    assert not donut.convex
    px = np.array([5.0, 1.0, 3.0, 0.0, 5.0, 20.0])
    py = np.array([5.0, 1.0, 5.0, 5.0, 0.0, 5.0])
    # hole center / interior / on-hole-edge / on-outer-edge / on-outer-edge / outside
    assert donut.contains(px, py, keep_touches=True).tolist() == \
        [False, True, True, True, True, False]
    assert donut.contains(px, py, keep_touches=False).tolist() == \
        [False, True, False, False, False, False]
    assert donut.area() == pytest.approx(84.0)
    assert donut.clip_area_rect(0, 0, 5, 5) == pytest.approx(21.0)


def test_evenodd_sql_parity_holes():
    import duckdb

    from ocgis_ray.geometry import Polygon

    L = Polygon(
        4, "L",
        np.array([[10.0, 10.0], [20.0, 10.0], [20.0, 14.0], [14.0, 14.0],
                  [14.0, 20.0], [10.0, 20.0]]),
        holes=[np.array([[11.0, 11.0], [13.0, 11.0], [13.0, 13.0], [11.0, 13.0]])],
    )
    rng = np.random.RandomState(0)
    tx = rng.uniform(8, 22, 2000)
    ty = rng.uniform(8, 22, 2000)
    mine = L.contains(tx, ty, True)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (SELECT unnest(?) x, unnest(?) y)",
                [tx.tolist(), ty.tolist()])
    theirs = con.execute(
        f"SELECT {L.evenodd_pip_sql('x', 'y')} FROM pts").df().iloc[:, 0].to_numpy()
    assert (mine == theirs).all()
    assert 0 < mine.sum() < len(mine)


def test_antimeridian_autosplit():
    """raw +-180-crossing ring: auto-unwrap + canonical split; covering
    equals the union of hand-split halves (spatial/wrap.py analog)."""
    from ocgis_ray.cover import cover_polygon
    from ocgis_ray.geometry import Polygon

    cross = Polygon(2, "fiji", np.array(
        [[175.0, -20.0], [-177.0, -20.0], [-177.0, -15.0], [175.0, -15.0]]))
    assert cross.crosses_am and len(cross.parts) == 2
    qx = np.array([178.0, -179.0, 170.0, 0.0])
    qy = np.array([-17.0, -17.0, -17.0, 0.0])
    assert cross.contains(qx, qy).tolist() == [True, True, False, False]
    west = Polygon(3, "w", np.array(
        [[175.0, -20.0], [180.0, -20.0], [180.0, -15.0], [175.0, -15.0]]))
    east = Polygon(3, "e", np.array(
        [[-180.0, -20.0], [-177.0, -20.0], [-177.0, -15.0], [-180.0, -15.0]]))
    cov = cover_polygon(cross, 7)
    union = np.unique(np.concatenate(
        [cover_polygon(west, 7).cells, cover_polygon(east, 7).cells]))
    assert np.array_equal(np.sort(cov.cells), union)
    assert cross.area() == pytest.approx(west.area() + east.area())


def test_clip_poly_convex_general():
    """SH against an arbitrary convex clip ring: triangle x diamond
    with an analytically known intersection area."""
    from ocgis_ray.geometry import clip_poly_convex, shoelace_area

    # unit square clipped by the diamond |x-0.5|+|y-0.5| <= 0.5:
    # intersection IS the diamond, area 0.5
    square = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    diamond = np.array([[0.5, 0.0], [1.0, 0.5], [0.5, 1.0], [0.0, 0.5]])
    c = clip_poly_convex(square, diamond)
    assert shoelace_area(c) == pytest.approx(0.5)
    # rect twin: general kernel equals the rect kernel on rects
    from ocgis_ray.geometry import clip_poly_rect

    tri = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    rect = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
    a1 = shoelace_area(clip_poly_convex(tri, rect))
    a2 = shoelace_area(clip_poly_rect(tri, 1.0, 1.0, 3.0, 3.0))
    assert a1 == pytest.approx(a2)
    # disjoint -> None
    assert clip_poly_convex(tri, rect + 100.0) is None


def test_intersection_and_union_area():
    from ocgis_ray.geometry import Polygon, intersection_area, union_area

    a = Polygon(1, "a", np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]))
    b = Polygon(2, "b", np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]]))
    c = Polygon(3, "c", np.array([[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0]]))
    assert intersection_area(a, b) == pytest.approx(1.0)
    # inclusion-exclusion: 4 + 4 - 1 = 7, plus disjoint unit square
    assert union_area([a, b, c]) == pytest.approx(8.0)
    # holes subtract from the clip
    donut = Polygon(4, "d", np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]),
                    holes=[np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])])
    clipb = Polygon(5, "cb", np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]))
    assert intersection_area(donut, clipb) == pytest.approx(4.0 - 1.0)


def test_dissolve_multipart_semantics():
    """dissolved selections join as one ugid (point-in-union == point-
    in-any-part; no geometric union needed)."""
    from ocgis_ray.sources.cabinet import dissolve, layer

    polys = dissolve(layer("quadrants"), ugid=99)
    assert {p.ugid for p in polys} == {99}
    from ocgis_ray.geometry import union_area

    # quadrants are disjoint 2x2-degree rects: union = sum = 16
    assert union_area(polys) == pytest.approx(16.0)


def test_general_polygon_intersection_area():
    """arbitrary simple-polygon intersection via ear-clipping
    triangulation + convex clips (closes the reference's
    geom.intersection generality gap, variable/geom.py:718-764)."""
    from ocgis_ray.geometry import (Polygon, intersection_area,
                                    shoelace_area, triangulate_ring)

    L = np.array([[10.0, 10.0], [20.0, 10.0], [20.0, 14.0], [14.0, 14.0],
                  [14.0, 20.0], [10.0, 20.0]])
    tris = triangulate_ring(L)
    assert sum(shoelace_area(t) for t in tris) == pytest.approx(shoelace_area(L))
    A = Polygon(1, "a", L)
    B = Polygon(2, "b", L + np.array([2.0, 2.0]))
    # analytic: overlap of the two L-shapes = 28 sq deg
    assert intersection_area(A, B) == pytest.approx(28.0)
    # holes on BOTH sides: 8x8 core minus two fully-contained 2x2 holes
    D1 = Polygon(5, "d1", np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]]),
                 holes=[np.array([[2.0, 2], [4, 2], [4, 4], [2, 4]])])
    D2 = Polygon(6, "d2", np.array([[1.0, 1], [9, 1], [9, 9], [1, 9]]),
                 holes=[np.array([[5.0, 5], [7, 5], [7, 7], [5, 7]])])
    assert intersection_area(D1, D2) == pytest.approx(56.0)


def test_union_area_nonconvex_triple():
    from ocgis_ray.geometry import Polygon, union_area

    L = np.array([[0.0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]])
    a = Polygon(1, "a", L)                      # area 12
    b = Polygon(2, "b", L + np.array([1.0, 0]))  # overlapping L
    c = Polygon(3, "c", L + np.array([50.0, 0]))  # disjoint
    u = union_area([a, b, c])
    # grid-truth for a∪b plus the disjoint 12
    xs = np.linspace(-1, 6, 351)
    ys = np.linspace(-1, 5, 301)
    X, Y = np.meshgrid(xs, ys)
    m = a.contains(X.ravel(), Y.ravel()) | b.contains(X.ravel(), Y.ravel())
    approx = m.mean() * 7 * 6 + 12.0
    assert abs(u - approx) < 0.2


def test_coverage_sweep_exact_depths():
    """coverage_areas: exact per-depth measure for 4 mutually
    overlapping rects (beyond the inclusion-exclusion fast path)."""
    from ocgis_ray.geometry import (Polygon, coverage_areas,
                                    intersection_area_n, union_area,
                                    union_area_n)

    def rect(u, x0, y0, x1, y1, holes=()):
        return Polygon(u, f"r{u}", np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float),
            holes=list(holes))

    a = rect(1, 0, 0, 2, 2)
    b = rect(2, 1, 1, 3, 3)
    c = rect(3, 0.5, 0.5, 2.5, 2.5)
    d = rect(4, 1.5, -0.5, 3.5, 1.8)
    cov = coverage_areas([a, b, c, d])
    # dyadic coordinates: every strip trapezoid is exact in float64
    assert cov.tolist() == [5.75, 2.75, 1.25, 0.4]
    assert union_area_n([a, b, c, d]) == pytest.approx(10.15)
    # union_area now routes >3-overlap inputs through the sweep
    assert union_area([a, b, c, d]) == pytest.approx(10.15)
    assert intersection_area_n([a, b, c]) == pytest.approx(1.0)  # [1,2]^2
    # holes flip parity like outer rings
    h = rect(5, 0, 0, 4, 4,
             holes=[np.array([[1.0, 1], [3, 1], [3, 3], [1, 3]])])
    assert union_area_n([h]) == pytest.approx(12.0)
    # a rect inside the hole fills part of it back in
    assert union_area_n([h, rect(6, 1.5, 1.5, 2.5, 2.5)]) == pytest.approx(13.0)


def test_coverage_sweep_conservation_random():
    """integral of depth == sum of areas (each polygon counted once per
    covering depth) for random triangle soups — the sweep's built-in
    self-check, plus pairwise agreement with the clip kernel."""
    from ocgis_ray.geometry import (Polygon, coverage_areas,
                                    intersection_area, union_area_n)

    rng = np.random.default_rng(7)
    for trial in range(5):
        polys = []
        for i in range(6):
            v = rng.uniform(0, 10, (3, 2))
            while abs(np.cross(v[1] - v[0], v[2] - v[0])) < 1e-2:
                v = rng.uniform(0, 10, (3, 2))
            polys.append(Polygon(i, "t", v))
        cov = coverage_areas(polys)
        total = sum(p.area() for p in polys)
        assert sum((i + 1) * v for i, v in enumerate(cov)) == pytest.approx(
            total, rel=1e-9)
        # pairwise: |a|+|b| - |a union b| == |a intersect b| (clip kernel)
        a, b = polys[0], polys[1]
        assert a.area() + b.area() - union_area_n([a, b]) == pytest.approx(
            intersection_area(a, b), abs=1e-9)


def test_coverage_sweep_antimeridian():
    """an antimeridian-crossing ring enters the sweep as its canonical
    parts; union with a disjoint rect is additive."""
    from ocgis_ray.geometry import Polygon, union_area_n

    am = Polygon(1, "am", np.array(
        [[170.0, -5], [-170.0, -5], [-170.0, 5], [170.0, 5]]))
    assert am.crosses_am and len(am.parts) == 2
    r = Polygon(2, "r", np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]]))
    assert union_area_n([am, r]) == pytest.approx(20 * 10 + 100.0)
    # overlapping the eastern part: union loses the overlap once
    r2 = Polygon(3, "r2", np.array(
        [[175.0, 0], [180.0, 0], [180.0, 10], [175.0, 10]]))
    assert union_area_n([am, r2]) == pytest.approx(200.0 + 50.0 - 5 * 5)


def test_union_faces_geometry():
    """union as GEOMETRY (vertical-decomposition faces): exact area,
    exact membership, zero face overlap, valid WKT."""
    from ocgis_ray.geometry import (Polygon, coverage_areas,
                                    shoelace_area, union_area_n,
                                    union_faces, union_geometry_wkt)

    def rect(u, x0, y0, x1, y1, holes=()):
        return Polygon(u, f"r{u}", np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float),
            holes=list(holes))

    a, b = rect(1, 0, 0, 2, 2), rect(2, 1, 1, 3, 3)
    fs = union_faces([a, b])
    assert sum(shoelace_area(f) for f in fs) == pytest.approx(7.0)
    assert union_geometry_wkt([a, b]).startswith("MULTIPOLYGON ((")
    # hole survives as an uncovered gap; a plug fills part of it
    h = rect(5, 0, 0, 4, 4,
             holes=[np.array([[1.0, 1], [3, 1], [3, 3], [1, 3]])])
    fs = union_faces([h, rect(6, 1.5, 1.5, 2.5, 2.5)])
    assert sum(shoelace_area(f) for f in fs) == pytest.approx(13.0)
    # triangle soup: faces tile the union exactly and never overlap
    rng = np.random.default_rng(3)
    polys = []
    for i in range(7):
        v = rng.uniform(0, 10, (3, 2))
        while abs(np.cross(v[1] - v[0], v[2] - v[0])) < 1e-2:
            v = rng.uniform(0, 10, (3, 2))
        polys.append(Polygon(i, "t", v))
    fs = union_faces(polys)
    assert sum(shoelace_area(f) for f in fs) == pytest.approx(
        union_area_n(polys), rel=1e-12)
    face_polys = [Polygon(100 + i, "f", f) for i, f in enumerate(fs)]
    assert coverage_areas(face_polys)[1:].sum() < 1e-12  # disjoint
    pts = rng.uniform(-1, 11, (2000, 2))
    in_union = np.zeros(len(pts), bool)
    for p in polys:
        in_union |= p.contains(pts[:, 0], pts[:, 1])
    in_faces = np.zeros(len(pts), bool)
    for p in face_polys:
        in_faces |= p.contains(pts[:, 0], pts[:, 1])
    assert (in_union == in_faces).all()
    assert union_faces([]) == [] and union_geometry_wkt([]) == \
        "MULTIPOLYGON EMPTY"


def test_boolean_overlay_faces_and_areas():
    """full boolean overlay via membership bitmasks: difference, xor,
    intersection — exact areas cross-checked against the clip kernel,
    difference faces match pointwise membership."""
    from ocgis_ray.geometry import (Polygon, boolean_area,
                                    difference_faces, intersection_area,
                                    shoelace_area,
                                    symmetric_difference_area)

    def rect(u, x0, y0, x1, y1):
        return Polygon(u, f"r{u}", np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float))

    a, b = rect(1, 0, 0, 2, 2), rect(2, 1, 1, 3, 3)
    assert sum(shoelace_area(f) for f in difference_faces(a, b)) == \
        pytest.approx(3.0)
    assert symmetric_difference_area(a, b) == pytest.approx(6.0)
    assert boolean_area([a, b], lambda m: m == 3) == pytest.approx(1.0)
    # non-convex subject against the general kernel
    L = Polygon(3, "L", np.array(
        [[0.0, 0], [4, 0], [4, 1], [1, 1], [1, 3], [0, 3]]))
    r = rect(4, 0.5, 0.5, 2, 2)
    assert boolean_area([L, r], lambda m: m == 3) == pytest.approx(
        intersection_area(L, r))
    fs = difference_faces(L, r)
    assert sum(shoelace_area(f) for f in fs) == pytest.approx(
        L.area() - intersection_area(L, r))
    pts = np.random.default_rng(1).uniform(-0.5, 4.5, (1500, 2))
    in_diff = np.zeros(len(pts), bool)
    for i, f in enumerate(fs):
        in_diff |= Polygon(100 + i, "f", f).contains(pts[:, 0], pts[:, 1])
    truth = L.contains(pts[:, 0], pts[:, 1]) & \
        ~r.contains(pts[:, 0], pts[:, 1])
    assert (in_diff == truth).all()
