"""Douglas-Peucker ring/polygon simplification: subset + tolerance
guarantees vs a plain recursive reference."""

import numpy as np

from ocgis_ray.geometry import (Polygon, simplify_layer, simplify_polygon,
                                simplify_ring)


def seg_dist(p, a, b):
    ab = b - a
    denom = float(ab @ ab)
    if denom == 0:
        return float(np.hypot(*(p - a)))
    t = np.clip(float((p - a) @ ab) / denom, 0.0, 1.0)
    return float(np.hypot(*(p - (a + t * ab))))


def dp_reference(chain, tol):
    """Classic recursive DP over an open chain -> kept indices."""
    if len(chain) < 3:
        return list(range(len(chain)))
    d = [seg_dist(chain[i], chain[0], chain[-1])
         for i in range(1, len(chain) - 1)]
    k = int(np.argmax(d))
    if d[k] <= tol:
        return [0, len(chain) - 1]
    left = dp_reference(chain[: k + 2], tol)
    right = dp_reference(chain[k + 1:], tol)
    return left + [k + 1 + i for i in right[1:]]


def ring_deviation(orig, simp):
    """Max distance from any original vertex to the simplified ring."""
    closed = np.vstack([simp, simp[:1]])
    worst = 0.0
    for p in orig:
        d = min(seg_dist(p, closed[i], closed[i + 1])
                for i in range(len(simp)))
        worst = max(worst, d)
    return worst


def noisy_circle(n=120, seed=0):
    rng = np.random.RandomState(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = 10.0 + rng.uniform(-0.3, 0.3, n)
    return np.c_[r * np.cos(th), r * np.sin(th)]


def test_kept_vertices_are_subset_and_within_tol():
    ring = noisy_circle()
    for tol in (0.1, 0.5, 2.0):
        simp = simplify_ring(ring, tol)
        # subset (each simplified vertex appears in the original)
        orig_set = {tuple(v) for v in ring}
        assert all(tuple(v) in orig_set for v in simp)
        assert len(simp) >= 3
        assert ring_deviation(ring, simp) <= tol + 1e-9
        if tol >= 0.5:
            assert len(simp) < len(ring)  # it actually simplifies


def test_matches_recursive_reference_on_chains():
    rng = np.random.RandomState(3)
    for _ in range(20):
        chain = np.cumsum(rng.uniform(-1, 1, (30, 2)), axis=0)
        tol = float(rng.uniform(0.2, 2.0))
        from ocgis_ray.geometry import _dp_chain

        got = list(np.nonzero(_dp_chain(chain, tol))[0])
        want = dp_reference(chain, tol)
        assert got == want


def test_collinear_points_removed_at_zero_tol():
    sq = np.array([[0, 0], [1, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    simp = simplify_ring(sq, 0.0)
    assert len(simp) == 4
    assert not any((v == [1.0, 0.0]).all() for v in simp)


def test_small_rings_unchanged():
    tri = np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
    assert np.array_equal(simplify_ring(tri, 5.0), tri)


def test_polygon_and_holes_and_layer():
    ring = noisy_circle(80, seed=1)
    hole = (noisy_circle(40, seed=2) * 0.3)[::-1]
    p = Polygon(ugid=7, name="blob", verts=ring, holes=[hole])
    s = simplify_polygon(p, 0.4)
    assert s.ugid == 7 and s.name == "blob"
    assert len(s.verts) < len(p.verts)
    assert len(s.holes) == 1 and 3 <= len(s.holes[0]) <= len(hole)
    # area changes by at most ~tol * perimeter (loose sanity bound)
    from ocgis_ray.geometry import shoelace_area

    per = float(np.hypot(*np.diff(np.vstack([ring, ring[:1]]),
                                  axis=0).T).sum())
    assert abs(shoelace_area(s.verts) - shoelace_area(p.verts)) <= 0.4 * per
    layer = simplify_layer([p, p], 0.4)
    assert len(layer) == 2 and all(isinstance(q, Polygon) for q in layer)


def test_join_parity_on_coarse_layer(ray_session):
    """A simplified build layer still joins interior points exactly
    (points far from the boundary are unaffected by tol)."""
    import pandas as pd
    import ray.data as rd

    from ocgis_ray import grid
    from ocgis_ray.stages.spatial_join import spatial_join

    ring = noisy_circle(100, seed=4)
    p = Polygon(ugid=1, name="c", verts=ring)
    sp = simplify_polygon(p, 0.2)
    rng = np.random.RandomState(9)
    # points well inside (r<9) or well outside (r>11) the noisy band
    r = np.where(rng.rand(500) < 0.5, rng.uniform(0, 8.5, 500),
                 rng.uniform(11.5, 20, 500))
    th = rng.uniform(0, 2 * np.pi, 500)
    lon, lat = r * np.cos(th), r * np.sin(th)
    pts = pd.DataFrame({"page_id": np.arange(500, dtype=np.int64),
                        "lon": lon, "lat": lat,
                        "cell_r7": grid.encode(lon, lat, 7)})
    ds = rd.from_pandas(pts)
    a = spatial_join(ds, [p], how="semi").to_pandas()
    b = spatial_join(ds, [sp], how="semi").to_pandas()
    assert len(a) > 0
    assert sorted(a["page_id"]) == sorted(b["page_id"])
