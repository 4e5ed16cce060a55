"""Exact-field fixture tests — the reference's analytic-assertion
style (``test/base.py:1326-1393`` ``create_exact_field``: value
``2 + cos^2(lat) + cos(2*lon)`` checked against closed forms in
``test_ocgis/test_regrid/test_base.py``), re-expressed over the
engine's cell grid: every regrid/aggregate path is asserted against
the ANALYTIC value or integral, not a recomputation of itself."""

import numpy as np
import pandas as pd
import pytest

K = np.pi / 180.0  # degrees -> radians


def f(lon, lat):
    return 2.0 + np.cos(K * lat) ** 2 + np.cos(2.0 * K * lon)


def f_mean_rect(a, b, c, d):
    """Analytic area-mean of f over [a,b]x[c,d] degrees (flat measure,
    matching the engine's deg^2 cell areas)."""
    w, h = b - a, d - c
    int_lon_cos = (np.sin(2.0 * K * b) - np.sin(2.0 * K * a)) / (2.0 * K)
    int_lat_cos2 = (h / 2.0
                    + (np.sin(2.0 * K * d) - np.sin(2.0 * K * c)) / (4.0 * K))
    total = 2.0 * w * h + int_lat_cos2 * w + int_lon_cos * h
    return total / (w * h)


def cell_field(cells, res):
    """Exact-field value at each cell CENTER."""
    from ocgis_ray import grid

    cs = grid.cell_size(res)
    ix, iy = grid.split(np.asarray(cells, np.int64))
    lon_c = (ix.astype(np.float64) + 0.5) * cs - 180.0
    lat_c = (iy.astype(np.float64) + 0.5) * cs - 90.0
    return f(lon_c, lat_c)


def test_bilinear_regrid_matches_analytic_field(ray_session):
    """Bilinear interpolation of the exact field sampled at cell
    centers reproduces the analytic value to O(cell_size^2)."""
    import ray.data as rd

    from ocgis_ray.stages.regrid import apply_weights, bilinear_weights

    res = 7  # 2.8125 deg cells; curvature error ~1e-2
    rng = np.random.RandomState(11)
    targets = pd.DataFrame({
        "target_id": np.arange(24, dtype=np.int64),
        "lon": rng.uniform(-170.0, 170.0, 24),
        "lat": rng.uniform(-80.0, 80.0, 24),
    })
    w = bilinear_weights(targets, res)
    cells = pd.DataFrame({"cell": np.unique(w["src"].to_numpy())})
    cells["v"] = cell_field(cells["cell"].to_numpy(), res)
    out = apply_weights(rd.from_pandas(cells), w, src_col="cell",
                        value_col="v").to_pandas().set_index("dst")
    for _, t in targets.iterrows():
        expect = f(t["lon"], t["lat"])
        got = out.loc[int(t["target_id"]), "wsum"]
        assert got == pytest.approx(expect, abs=0.02), (t["lon"], t["lat"])


def test_conservative_regrid_matches_analytic_integral():
    """Conservative (dstarea) regrid of the exact field to a rectangle
    equals the ANALYTIC area-mean to midpoint-rule accuracy — the
    reference's regrid-against-closed-form test shape."""
    from ocgis_ray.geometry import Polygon
    from ocgis_ray.stages.regrid import conservative_weights

    res = 6  # 5.625 deg cells
    rect = Polygon(1, "rect", np.array([
        [-100.0, 30.0], [-60.0, 30.0], [-60.0, 55.0], [-100.0, 55.0]]))
    w = conservative_weights([rect], res)
    vals = cell_field(w["src"].to_numpy(), res)
    got = float(np.sum(w["w"].to_numpy() * vals))
    expect = f_mean_rect(-100.0, -60.0, 30.0, 55.0)
    assert got == pytest.approx(expect, abs=5e-3)
    # weights themselves sum to 1 (dstarea normalization)
    assert float(w["w"].sum()) == pytest.approx(1.0, abs=1e-12)


def test_idw_approaches_field_value(ray_session):
    """kNN/IDW interpolation over dense exact-field samples lands near
    the analytic value (IDW is not exact for smooth fields; the bound
    is the local field variation across the k nearest samples)."""
    import ray.data as rd

    from ocgis_ray.stages.regrid import idw_interpolate

    rng = np.random.RandomState(3)
    n = 4000
    lon = rng.uniform(-20.0, 20.0, n)
    lat = rng.uniform(20.0, 60.0, n)
    pts = pd.DataFrame({"page_id": np.arange(n, dtype=np.int64),
                        "lon": lon, "lat": lat,
                        "n_chars": f(lon, lat)})
    targets = pd.DataFrame({"target_id": np.array([0, 1], np.int64),
                            "lon": [0.0, 10.0], "lat": [40.0, 50.0]})
    out = idw_interpolate(rd.from_pandas(pts), targets,
                          k=8).to_pandas().set_index("target_id")
    for _, t in targets.iterrows():
        expect = f(t["lon"], t["lat"])
        assert out.loc[int(t["target_id"]), "idw_value"] == pytest.approx(
            expect, abs=0.05)
