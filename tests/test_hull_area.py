"""Spherical polygon area + per-group convex hull aggregate."""

import numpy as np
import pandas as pd
import ray.data as rd

from ocgis_ray.geometry import (EARTH_RADIUS_KM, Polygon, convex_hull,
                                hull_by_group, spherical_polygon_area_km2,
                                spherical_ring_area_km2)


def test_hemisphere_area():
    """Equatorial 'hemisphere' ring: lat 0 band up to the pole via a
    polygon hugging lat=0 covers half the sphere as the cap integral;
    instead test a known band: the ring lat=0 with lons 0,90,180,270
    traversing the equator encloses (by the trapezoid form) exactly a
    hemisphere."""
    ring = np.array([[0.0, 0.0], [90.0, 0.0], [180.0, 0.0], [270.0, 0.0]])
    a = spherical_ring_area_km2(ring)
    hemi = 2.0 * np.pi * EARTH_RADIUS_KM ** 2
    assert abs(a - hemi) / hemi < 1e-12


def test_small_square_matches_planar_approx():
    # 1-degree square at the equator ~ (111.19 km)^2
    ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    a = spherical_ring_area_km2(ring)
    side = np.pi / 180.0 * EARTH_RADIUS_KM
    assert abs(a - side * side) / (side * side) < 0.01
    # cosine-latitude shrink at 60N
    ring60 = ring + [0.0, 60.0]
    a60 = spherical_ring_area_km2(ring60)
    assert abs(a60 / a - np.cos(np.radians(60.5))) < 0.01


def test_orientation_and_wrap_invariance():
    ring = np.array([[179, 10], [-179, 10], [-179, 12], [179, 12]],
                    dtype=float)  # crosses the antimeridian
    a1 = spherical_ring_area_km2(ring)
    a2 = spherical_ring_area_km2(ring[::-1])
    assert abs(a1 - a2) < 1e-9
    # ~2x2 deg at lat 11
    approx = (2 * 111.19 * np.cos(np.radians(11))) * (2 * 111.19)
    assert abs(a1 - approx) / approx < 0.01


def test_polygon_with_hole():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float)[::-1]
    p = Polygon(ugid=1, name="sq", verts=outer, holes=[hole])
    a = spherical_polygon_area_km2(p)
    full = spherical_ring_area_km2(outer)
    inner = spherical_ring_area_km2(hole)
    assert abs(a - (full - inner)) < 1e-9


def test_convex_hull_matches_known():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (200, 2))
    corners = np.array([[-2, -2], [2, -2], [2, 2], [-2, 2]], dtype=float)
    x = np.concatenate([pts[:, 0], corners[:, 0]])
    y = np.concatenate([pts[:, 1], corners[:, 1]])
    h = convex_hull(x, y)
    assert sorted(map(tuple, h)) == sorted(map(tuple, corners))
    # degenerate inputs
    assert len(convex_hull(np.array([0.0]), np.array([0.0]))) == 1
    col = convex_hull(np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 2.0]))
    assert len(col) == 2  # collinear -> the two extremes


def test_hull_of_hulls_invariant():
    """The per-batch local-hull combiner is exact: hull(hull(A) ∪
    hull(B)) == hull(A ∪ B)."""
    rng = np.random.RandomState(4)
    a = rng.uniform(0, 5, (300, 2))
    b = rng.uniform(3, 9, (300, 2))
    both = np.vstack([a, b])
    direct = convex_hull(both[:, 0], both[:, 1])
    ha = convex_hull(a[:, 0], a[:, 1])
    hb = convex_hull(b[:, 0], b[:, 1])
    merged = np.vstack([ha, hb])
    two_level = convex_hull(merged[:, 0], merged[:, 1])
    assert sorted(map(tuple, direct)) == sorted(map(tuple, two_level))


def test_hull_by_group_dataset(ray_session):
    rng = np.random.RandomState(7)
    n = 3000
    dom = rng.randint(0, 3, n)
    centers = np.array([[0, 0], [50, 20], [-100, -40]], dtype=float)
    lon = centers[dom, 0] + rng.uniform(-5, 5, n)
    lat = centers[dom, 1] + rng.uniform(-2, 2, n)
    ds = rd.from_pandas(pd.DataFrame(
        {"domain": dom.astype(np.int64), "lon": lon, "lat": lat}))
    out = hull_by_group(ds, "domain").to_pandas().sort_values(
        "domain").reset_index(drop=True)
    assert len(out) == 3
    for i in range(3):
        mask = dom == i
        want = convex_hull(lon[mask], lat[mask])
        row = out[out.domain == i].iloc[0]
        assert row["hull_n"] == len(want)
        from ocgis_ray.geometry import shoelace_area

        assert abs(row["hull_area"] - shoelace_area(want)) < 1e-9
        assert row["hull_wkt"].startswith("POLYGON ((")
        assert row["hull_area_km2"] > 0
