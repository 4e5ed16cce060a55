"""CRS transforms, subset fast paths, reshape, regrid replacement."""

import numpy as np
import pandas as pd
import pytest

from ocgis_ray.geometry import haversine_km
from ocgis_ray.stages.crs import (
    from_web_mercator,
    rotated_pole_transform,
    to_web_mercator,
)


def test_web_mercator_roundtrip():
    rng = np.random.RandomState(2)
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-84, 84, 1000)
    x, y = to_web_mercator(lon, lat)
    lon2, lat2 = from_web_mercator(x, y)
    np.testing.assert_allclose(lon, lon2, atol=1e-9)
    np.testing.assert_allclose(lat, lat2, atol=1e-9)
    # known point: (0,0) -> (0,0)
    x0, y0 = to_web_mercator(np.array([0.0]), np.array([0.0]))
    assert abs(x0[0]) < 1e-9 and abs(y0[0]) < 1e-6


def test_rotated_pole_roundtrip():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-85, 85, 500)
    rl, rp = rotated_pole_transform(lon, lat, pole_lon=-162.0, pole_lat=39.25)
    lon2, lat2 = rotated_pole_transform(rl, rp, pole_lon=-162.0, pole_lat=39.25,
                                        inverse=True)
    # compare on the sphere (lon wraps at +-180)
    d = haversine_km(lon, lat, lon2, lat2)
    assert d.max() < 1e-6


def test_rotated_pole_identity_pole():
    # pole at the true north pole with pole_lon=0 => identity rotation
    lon = np.array([10.0, -50.0])
    lat = np.array([20.0, 60.0])
    rl, rp = rotated_pole_transform(lon, lat, pole_lon=0.0, pole_lat=90.0)
    d = haversine_km(lon, lat, rl, rp)
    assert d.max() < 1e-6


def test_radius_filter_exact(ray_session, sf_dir):
    import ray.data as rd

    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.subset import radius_filter

    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    got = radius_filter(ds, 0.1, 51.5, 300.0).to_pandas()
    pdf = ds.to_pandas()
    d = haversine_km(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 0.1, 51.5)
    expect = set(pdf.loc[d <= 300.0, "page_id"])
    assert set(got["page_id"]) == expect
    assert len(expect) > 0


def test_melt_roundtrip(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.reshape import melt

    df = pd.DataFrame({"id": [1, 2], "a": [1.0, 2.0], "b": [3.0, 4.0]})
    out = melt(rd.from_pandas(df), ["id"], ["a", "b"]).to_pandas()
    assert len(out) == 4
    assert set(out["variable"]) == {"a", "b"}
    assert out.loc[(out["id"] == 2) & (out["variable"] == "b"), "value"].iloc[0] == 4.0


def test_request_size(ray_session, sf_dir):
    import ray.data as rd

    from ocgis_ray.stages.reshape import request_size

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    info = request_size(ds)
    assert info["rows"] == 500
    assert info["columns"] == ["doc_id", "lang"]
    assert info["bytes"] > 0


def test_cells_to_polygons_roundtrip():
    from ocgis_ray import grid
    from ocgis_ray.stages.regrid import cells_to_polygons

    lon = np.array([10.3, -77.7])
    lat = np.array([45.1, 38.2])
    cells = grid.encode(lon, lat, 7)
    t = cells_to_polygons(cells, 7)
    x0 = t["x0"].to_numpy()
    x1 = t["x1"].to_numpy()
    y0 = t["y0"].to_numpy()
    y1 = t["y1"].to_numpy()
    assert ((x0 <= lon) & (lon < x1)).all()
    assert ((y0 <= lat) & (lat < y1)).all()
    assert t["wkt"][0].as_py().startswith("POLYGON((")


def test_idw_matches_numpy(ray_session, sf_dir):
    from ocgis_ray.parity import sql_round
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.regrid import idw_interpolate

    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    targets = pd.DataFrame({"target_id": [0, 1], "lon": [-122.0, 100.0],
                            "lat": [37.5, 40.0]})
    out = idw_interpolate(ds, targets, k=5).to_pandas().set_index("target_id")

    pdf = ds.to_pandas()
    for _, trow in targets.iterrows():
        d = haversine_km(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                         trow["lon"], trow["lat"])
        order = np.argsort(d)[:5]
        w = 1.0 / d[order] ** 2
        v = pdf["n_chars"].to_numpy(dtype=np.float64)[order]
        expect = float(sql_round(np.sum(w * v) / np.sum(w), 4))
        assert out.loc[int(trow["target_id"]), "idw_value"] == pytest.approx(expect, abs=2e-4)


def test_apply_weights(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.regrid import apply_weights

    df = pd.DataFrame({"cell_r7": [1, 1, 2, 3], "n_chars": [10, 20, 30, 40]})
    weights = pd.DataFrame({"src": [1, 2], "dst": [100, 100], "w": [0.5, 1.0]})
    out = apply_weights(rd.from_pandas(df), weights).to_pandas()
    assert len(out) == 1
    assert out["wsum"].iloc[0] == pytest.approx(0.5 * 30 + 1.0 * 30)


def test_convolve_1d(ray_session):
    import ray.data as rd

    from ocgis_ray.stages import calc

    df = pd.DataFrame({
        "user_id": [1] * 4 + [2] * 3,
        "event_id": range(7),
        "ts": pd.date_range("2024-01-01", periods=7, freq="h"),
        "value": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0],
    })
    out = calc.convolve_1d(rd.from_pandas(df), "user_id", "ts", "value",
                           kernel=[0.25, 0.5, 0.25], tiebreak_col="event_id"
                           ).to_pandas().set_index("event_id")
    # interior point of user 1: 0.25*1 + 0.5*2 + 0.25*3 = 2.0
    assert out.loc[1, "convolved"] == pytest.approx(2.0)
    # edge (same-mode zero pad): 0.5*1 + 0.25*2 = 1.0
    assert out.loc[0, "convolved"] == pytest.approx(1.0)
    # user 2 interior: 0.25*10 + 0.5*20 + 0.25*30 = 20.0
    assert out.loc[5, "convolved"] == pytest.approx(20.0)


def test_lcc_roundtrip_and_known_points():
    """Ellipsoidal LCC 2SP (EPSG 9802): forward/inverse closure to
    1e-9 deg; origin maps to (0, 0)."""
    from ocgis_ray.stages.crs import lcc_forward, lcc_inverse

    rng = np.random.RandomState(1)
    lon = rng.uniform(-120, -70, 500)
    lat = rng.uniform(25, 50, 500)
    x, y = lcc_forward(lon, lat)
    lo, la = lcc_inverse(x, y)
    assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-9
    x0, y0 = lcc_forward(np.array([-96.0]), np.array([40.0]))
    assert abs(x0[0]) < 1e-6 and abs(y0[0]) < 1e-6


def test_utm_roundtrip_and_central_meridian():
    """Snyder-series transverse Mercator: UTM zone 33 central meridian
    maps to easting 500000 exactly; round-trips to 1e-7 deg."""
    from ocgis_ray.stages.crs import tm_inverse, utm_forward

    e, n = utm_forward(np.array([15.0]), np.array([0.0]), 33)
    assert e[0] == 500000.0 and n[0] == 0.0
    # Vienna-ish known point (16E, 48N, zone 33): E~574595, N~5316784
    e2, n2 = utm_forward(np.array([16.0]), np.array([48.0]), 33)
    assert abs(e2[0] - 574595) < 5 and abs(n2[0] - 5316784) < 5
    rng = np.random.RandomState(2)
    lon = rng.uniform(12, 18, 500)
    lat = rng.uniform(-80, 80, 500)
    x, y = utm_forward(lon, lat, 33)
    lo, la = tm_inverse(x, y, 15.0)
    assert np.abs(lo - lon).max() < 1e-7 and np.abs(la - lat).max() < 1e-7


def test_update_crs_registry_transforms(ray_session, sf_dir):
    """the TRANSFORMS registry routes lcc/utm through the same actor
    stage (general-CRS seam, variable/crs.py analog)."""
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.crs import update_crs
    from ocgis_ray.stages.geocode import geocode

    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"])).limit(200)
    out = update_crs(ds, name="lcc_conus").to_pandas()
    assert {"x", "y"} <= set(out.columns) and np.isfinite(out["x"]).all()


def test_rect_union_terms_vs_sweep():
    """inclusion-exclusion union measure == coverage sweep, and the
    dissolved per-cell weight mass integrates to the union area."""
    from ocgis_ray import grid
    from ocgis_ray.cover import cover_polygon
    from ocgis_ray.geometry import (Polygon, rect_clip_area_sqlparity,
                                    union_area_n)
    from ocgis_ray.sources import cabinet
    from ocgis_ray.stages.regrid import _axis_rect, rect_union_terms

    polys = [p for p in cabinet.layer("world_regions") if _axis_rect(p)]
    rects = [_axis_rect(p) for p in polys]
    terms = rect_union_terms(rects)
    # a) terms measure == exact sweep (bay_area sits inside bay_wide,
    #    so the pair correction actually fires)
    big = max(r[2] for r in rects) + 1
    lo = min(r[0] for r in rects) - 1
    total = sum(s * (x1 - x0) * (y1 - y0) for s, x0, y0, x1, y1 in terms)
    assert total == pytest.approx(union_area_n(polys), rel=1e-12)
    assert len(terms) > len(rects)  # at least one overlap correction
    # b) per-cell dissolved weights integrate to the union area
    res = 7
    cells = np.unique(np.concatenate(
        [np.concatenate([c.full, c.boundary])
         for c in (cover_polygon(p, res) for p in polys)]))
    x0, y0, x1, y1 = grid.bounds(cells, res)
    w = np.zeros(cells.shape[0])
    for s, rx0, ry0, rx1, ry1 in terms:
        w += s * rect_clip_area_sqlparity(x0, y0, x1, y1, rx0, ry0, rx1, ry1)
    assert (w >= -1e-12).all()
    assert w.sum() == pytest.approx(union_area_n(polys), rel=1e-9)


def test_area_weighted_dissolve(ray_session, sf_dir):
    """dissolve=True == the reference's agg_selection=True: one row,
    rows in any rect counted once, weights = clip vs the union."""
    from ocgis_ray.sources import cabinet
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.regrid import _axis_rect, area_weighted_aggregate

    polys = [p for p in cabinet.layer("world_regions") if _axis_rect(p)]
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    out = area_weighted_aggregate(ds, polys, value_col="n_chars", res=7,
                                  dissolve=True).to_pandas()
    assert len(out) == 1 and int(out["ugid"].iloc[0]) == 0
    per = area_weighted_aggregate(ds, polys, value_col="n_chars",
                                  res=7).to_pandas()
    # bay_area (1) overlaps bay_wide (9): dissolved row count is the
    # DISTINCT page count, strictly less than the per-ugid sum
    assert int(out["n_rows"].iloc[0]) < int(per["n_rows"].sum())
    assert int(out["n_rows"].iloc[0]) > 0


def test_dissolved_weights_general_layer():
    """general (non-rect) dissolve path: per-cell weight mass
    integrates to the exact union area (coverage sweep conservation),
    with genuinely overlapping non-convex members."""
    from ocgis_ray.geometry import Polygon, union_area_n
    from ocgis_ray.stages.regrid import _dissolved_cell_weights

    diamond = Polygon(1, "d", np.array(
        [[-122.6, 37.7], [-122.0, 37.1], [-121.4, 37.7], [-122.0, 38.3]]))
    rect = Polygon(2, "r", np.array(
        [[-122.4, 37.5], [-121.6, 37.5], [-121.6, 38.1], [-122.4, 38.1]]))
    lshape = Polygon(3, "l", np.array(
        [[-121.5, 37.0], [-120.5, 37.0], [-120.5, 37.4],
         [-121.1, 37.4], [-121.1, 38.0], [-121.5, 38.0]]))
    polys = [diamond, rect, lshape]
    w = _dissolved_cell_weights(polys, res=7, ugid_out=0)
    total = sum(w.values())
    # cover boundary clips are approximate only through the same
    # kernels the per-ugid path uses; the union mass must match the
    # exact sweep measure
    assert total == pytest.approx(union_area_n(polys), rel=1e-6)
    # overlap cells exist and none went negative
    assert all(v >= -1e-12 for v in w.values())


def test_area_weighted_dissolve_general(ray_session, sf_dir):
    """dissolve=True over the FULL world_regions layer (includes the
    non-rect diamond + triangle): single row, positive mass."""
    from ocgis_ray.sources import cabinet
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.regrid import area_weighted_aggregate

    polys = cabinet.layer("world_regions")
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    out = area_weighted_aggregate(ds, polys, value_col="n_chars", res=7,
                                  dissolve=True).to_pandas()
    assert len(out) == 1 and int(out["ugid"].iloc[0]) == 0
    assert int(out["n_rows"].iloc[0]) > 0
    assert np.isfinite(out["awm"].iloc[0]) and out["awm"].iloc[0] > 0


def test_compose_transform_roundtrips():
    """generic CRS-to-CRS compose (inverse(src) -> lonlat ->
    forward(dst)): roundtrips through every registered pair."""
    from ocgis_ray.stages.crs import CRS_PAIRS, compose_transform

    na = (np.array([-122.0, -96.0, -80.0, -110.0]),
          np.array([37.5, 40.0, 45.0, 33.0]))
    eu = (np.array([9.0, 12.0, 15.1, 20.5]),  # inside UTM zone 33
          np.array([44.0, 48.0, 52.0, 58.0]))
    pts = {"utm33n": eu}
    for name, (fwd, inv) in CRS_PAIRS.items():
        lon, lat = pts.get(name, na)
        x, y = fwd(lon, lat)
        back = compose_transform(name, "lonlat")(x, y)
        assert np.allclose(back[0], lon, atol=1e-6), name
        assert np.allclose(back[1], lat, atol=1e-6), name
        # compose src->dst == inverse then forward, for a second CRS
        x2, y2 = compose_transform(name, "web_mercator")(x, y)
        from ocgis_ray.stages.crs import to_web_mercator
        ex, ey = to_web_mercator(*inv(x, y))
        assert np.allclose(x2, ex) and np.allclose(y2, ey), name
    with pytest.raises(KeyError):
        compose_transform("lonlat", "nope")


def test_update_crs_between(ray_session, sf_dir):
    """distributed generic transform: lcc_conus -> web_mercator over a
    pages sample equals the driver-side compose."""
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.crs import (compose_transform, lcc_forward,
                                      update_crs_between)
    from ocgis_ray.stages.geocode import geocode

    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"])).limit(500)
    # make LCC coords first, then transform them to web mercator
    import pyarrow as pa

    def to_lcc(t):
        x, y = lcc_forward(t["lon"].to_numpy(zero_copy_only=False),
                           t["lat"].to_numpy(zero_copy_only=False))
        return t.append_column("lx", pa.array(x)).append_column(
            "ly", pa.array(y))

    lcc = ds.map_batches(to_lcc, batch_format="pyarrow", zero_copy_batch=True)
    out = update_crs_between(lcc, "lcc_conus", "web_mercator",
                             in_x="lx", in_y="ly").to_pandas()
    fn = compose_transform("lcc_conus", "web_mercator")
    ex, ey = fn(out["lx"].to_numpy(), out["ly"].to_numpy())
    assert np.allclose(out["x"].to_numpy(), ex)
    assert np.allclose(out["y"].to_numpy(), ey)


def test_crs_from_epsg_known_points():
    """Generic EPSG entry: published defining constants reproduce —
    each CRS's natural origin maps EXACTLY to its false origin in the
    CRS's own unit (EPSG:2230 in US survey FEET), and UTM's central
    meridian/equator maps to (500000, 0)."""
    from ocgis_ray.stages.crs import crs_from_epsg

    fwd, _ = crs_from_epsg(2230)  # NAD83 / California zone 6 (ftUS)
    x, y = fwd(np.array([-116.25]), np.array([32.166666666666666]))
    assert abs(x[0] - 6561666.667) < 1e-3
    assert abs(y[0] - 1640416.667) < 1e-3

    fwd, _ = crs_from_epsg(3035)  # ETRS89-LAEA Europe
    x, y = fwd(np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6
    assert abs(y[0] - 3210000.0) < 1e-6

    fwd, _ = crs_from_epsg(2154)  # RGF93 / Lambert-93
    x, y = fwd(np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700000.0) < 1e-6   # natural origin -> false origin
    assert abs(y[0] - 6600000.0) < 1e-6

    fwd, _ = crs_from_epsg(32615)  # WGS84 UTM 15N
    x, y = fwd(np.array([-93.0]), np.array([0.0]))
    assert abs(x[0] - 500000.0) < 1e-6 and abs(y[0]) < 1e-6

    fwd, _ = crs_from_epsg(54008)  # sinusoidal (MODIS sphere)
    x, y = fwd(np.array([20.0]), np.array([40.0]))
    assert abs(y[0] - 6371007.181 * np.radians(40.0)) < 1e-6


def test_crs_from_epsg_roundtrips():
    """Every registry entry round-trips its service area to <1e-8 deg
    (~1 mm; the TM inverse is a truncated Snyder series) through the
    generic constructor (no per-code code path)."""
    from ocgis_ray.stages.crs import EPSG_PARAMS, crs_from_epsg

    probe = {
        4326: ([-120.0, 30.0], [35.0, -20.0]),
        2154: ([2.35, -1.55], [48.85, 47.22]),
        25832: ([9.0, 11.5], [48.0, 54.0]),
        3857: ([-120.0, 30.0], [35.0, -20.0]),
        5070: ([-120.0, -80.0], [30.0, 45.0]),
        2230: ([-117.2, -116.0], [32.7, 33.5]),
        3035: ([2.35, 24.9], [48.85, 60.2]),
        3347: ([-106.3, -75.7], [52.1, 45.4]),
        32615: ([-95.0, -91.0], [10.0, 45.0]),
        32733: ([14.0, 16.5], [-30.0, -5.0]),
        54008: ([-60.0, 130.0], [-45.0, 70.0]),
        3413: ([-45.0, 100.0], [70.0, 85.0]),
        3031: ([0.0, -130.0], [-71.0, -85.0]),
        5041: ([20.0, -170.0], [84.0, 61.0]),
        3375: ([100.0, 104.0], [2.0, 6.5]),
    }
    assert set(probe) == set(EPSG_PARAMS)
    for code, (lons, lats) in probe.items():
        fwd, inv = crs_from_epsg(code)
        lon, lat = inv(*fwd(np.asarray(lons), np.asarray(lats)))
        assert np.abs(lon - lons).max() < 1e-8, code
        assert np.abs(lat - lats).max() < 1e-8, code


def test_crs_laea_equal_area_property():
    """LAEA preserves area: a small projected quad's area equals the
    exact ellipsoidal patch area (authalic q identity) to 1e-6."""
    from ocgis_ray.stages.crs import _aea_q, crs_from_epsg

    fwd, _ = crs_from_epsg(3035)
    rf = 298.257222101
    f = 1.0 / rf
    e2 = f * (2.0 - f)
    a = 6378137.0
    for lon0, lat0 in [(11.0, 48.0), (-5.0, 58.0), (25.0, 40.0)]:
        d = 0.01
        lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
        lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
        X, Y = fwd(lons, lats)
        area_proj = 0.5 * abs(sum(
            X[i] * Y[(i + 1) % 4] - X[(i + 1) % 4] * Y[i] for i in range(4)))
        q1 = _aea_q(np.sin(np.radians(lat0)), e2)
        q2 = _aea_q(np.sin(np.radians(lat0 + d)), e2)
        area_true = a * a * np.radians(d) * (q2 - q1) / 2.0
        assert abs(area_proj / area_true - 1.0) < 1e-6


def test_update_crs_between_epsg_specs(ray_session, sf_dir):
    """update_crs_between accepts EPSG strings and proj-param dicts
    (the arbitrary-EPSG user path), distributed over a Dataset."""
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.crs import crs_from_epsg, update_crs_between
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.subset import bbox_filter

    ds = geocode(pages_dataset(sf_dir).drop_columns(["html", "text"]))
    ca = bbox_filter(ds, -124.0, 32.0, -114.0, 42.0).limit(200)
    out = update_crs_between(ca, "epsg:4326", "epsg:2230").to_pandas()
    assert len(out) > 0
    fwd, _ = crs_from_epsg(2230)
    ex, ey = fwd(out["lon"].to_numpy(), out["lat"].to_numpy())
    assert np.allclose(out["x"].to_numpy(), ex)
    assert np.allclose(out["y"].to_numpy(), ey)

    # param-dict spec: custom sphere sinusoidal
    out2 = update_crs_between(
        ca, {"proj": "longlat"}, {"proj": "sinu", "R": 6371007.181},
    ).to_pandas()
    assert np.allclose(out2["y"].to_numpy(),
                       6371007.181 * np.radians(out2["lat"].to_numpy()))


def test_radius_filter_antimeridian_wrap(ray_session):
    """a radius window straddling +-180 must keep in-radius points on
    the far side (the unwrapped prefilter dropped them)."""
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.subset import radius_filter

    df = pd.DataFrame({
        "page_id": [1, 2, 3],
        "lon": [179.9, -179.9, 170.0],
        "lat": [0.0, 0.0, 0.0],
    })
    out = radius_filter(rd.from_pandas(df), 179.9, 0.0, 50.0).to_pandas()
    assert sorted(out["page_id"].tolist()) == [1, 2]


def test_conservative_weights_rect_uniform():
    """A rect aligned to cell edges covers n cells with uniform
    weights 1/n; denom equals the shoelace area."""
    from ocgis_ray import grid
    from ocgis_ray.geometry import Polygon
    from ocgis_ray.stages.regrid import conservative_weights

    res = 7
    cs = grid.cell_size(res)
    r = Polygon(9, "rect", np.array([
        [0.0, 0.0], [4 * cs, 0.0], [4 * cs, 2 * cs], [0.0, 2 * cs]]))
    w = conservative_weights([r], res)
    assert len(w) == 8 and (w["dst"] == 9).all()
    np.testing.assert_allclose(w["w"], 1.0 / 8, rtol=1e-12)
    raw = conservative_weights([r], res, normalize="none")
    assert raw["w"].sum() == pytest.approx(r.area(), rel=1e-12)


def test_conservative_weights_sum_to_one_general():
    """Per-destination weight sums are 1 for arbitrary (non-convex)
    polygons; a triangle's partial cells carry fractional weights."""
    from ocgis_ray.geometry import Polygon
    from ocgis_ray.stages.regrid import conservative_weights

    tri = Polygon(1, "tri", np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]))
    ell = Polygon(2, "ell", np.array([
        [20.0, 0.0], [30.0, 0.0], [30.0, 4.0], [24.0, 4.0],
        [24.0, 10.0], [20.0, 10.0]]))
    w = conservative_weights([tri, ell], res=6)
    sums = w.groupby("dst")["w"].sum()
    np.testing.assert_allclose(sums, 1.0, rtol=1e-12)
    assert ((w["w"] > 0) & (w["w"] <= 1.0 + 1e-12)).all()
    # fractional boundary cells exist for the hypotenuse
    assert (w.loc[w["dst"] == 1, "w"] < w.loc[w["dst"] == 1, "w"].max()
            ).any()


def test_conservative_regrid_constant_field(ray_session):
    """generate -> smm loop: a constant per-cell source field regrids
    to the constant on every destination (first-order conservation)."""
    import ray.data as rd

    from ocgis_ray.geometry import Polygon
    from ocgis_ray.stages.regrid import apply_weights, conservative_weights

    res = 6
    tri = Polygon(1, "tri", np.array([[0.0, 0.0], [9.0, 0.0], [0.0, 9.0]]))
    rect = Polygon(2, "rect", np.array([
        [-20.0, -5.0], [-8.0, -5.0], [-8.0, 3.0], [-20.0, 3.0]]))
    w = conservative_weights([tri, rect], res)
    field = pd.DataFrame({"cell_r6": np.unique(w["src"].to_numpy()),
                          "value": 7.25})
    out = apply_weights(rd.from_pandas(field), w, src_col="cell_r6",
                        value_col="value").to_pandas().sort_values("dst")
    assert out["dst"].tolist() == [1, 2]
    np.testing.assert_allclose(out["wsum"], 7.25, rtol=1e-12)


def test_conservative_weights_empty_and_bad_norm():
    from ocgis_ray.stages.regrid import conservative_weights

    with pytest.raises(ValueError):
        conservative_weights([], res=7, normalize="fracarea")
    w = conservative_weights([], res=7)
    assert len(w) == 0 and list(w.columns) == ["src", "dst", "w"]


def test_area_weighted_with_dissolved_single_scan(ray_session, sf_dir):
    """with_dissolved=True (one inner_semi scan) equals the union of
    the separate per-ugid and dissolved calls, row for row."""
    from ocgis_ray.sources import cabinet
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.regrid import _axis_rect, area_weighted_aggregate

    polys = [p for p in cabinet.layer("world_regions") if _axis_rect(p)]

    def geo():
        return geocode(pages_dataset(sf_dir).drop_columns(["html"]))

    combo = area_weighted_aggregate(geo(), polys, with_dissolved=True) \
        .to_pandas().sort_values("ugid").reset_index(drop=True)
    per = area_weighted_aggregate(geo(), polys).to_pandas()
    dis = area_weighted_aggregate(geo(), polys, dissolve=True).to_pandas()
    import pandas as pd
    exp = pd.concat([per, dis]).sort_values("ugid").reset_index(drop=True)
    pd.testing.assert_frame_equal(combo[sorted(combo.columns)],
                                  exp[sorted(exp.columns)])


def test_area_weighted_dissolve_arg_validation(ray_session, sf_dir):
    from ocgis_ray.geometry import Polygon
    from ocgis_ray.stages.regrid import area_weighted_aggregate

    p0 = Polygon(0, "zero", np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]))
    with pytest.raises(ValueError, match="collides"):
        area_weighted_aggregate(None, [p0], with_dissolved=True)
    with pytest.raises(ValueError, match="pick one"):
        area_weighted_aggregate(None, [p0], dissolve=True,
                                with_dissolved=True)


def test_albers_equal_area():
    """Ellipsoidal Albers (EPSG 9822, CONUS 5070 parameters):
    round-trip closure; origin at (0,0); the EXACT equal-area identity
    (ellipsoid band area = a^2 * dlam * (q2-q1)/2) holds for projected
    quads; distances are true on both standard parallels."""
    from ocgis_ray.stages.crs import (WGS84_A, WGS84_E2, _aea_q,
                                      aea_forward, aea_inverse)

    rng = np.random.RandomState(5)
    lon = rng.uniform(-125, -65, 500)
    lat = rng.uniform(23, 52, 500)
    x, y = aea_forward(lon, lat)
    lo, la = aea_inverse(x, y)
    assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-9
    x0, y0 = aea_forward(np.array([-96.0]), np.array([23.0]))
    assert abs(x0[0]) < 1e-6 and abs(y0[0]) < 1e-6

    # equal-area: a small projected quad's shoelace area equals the
    # ellipsoidal band area (exact up to straight-edge approximation)
    lon_q = np.array([-100.0, -99.9, -99.9, -100.0])
    lat_q = np.array([38.0, 38.0, 38.1, 38.1])
    qx, qy = aea_forward(lon_q, lat_q)
    proj_area = 0.5 * abs(np.dot(qx, np.roll(qy, -1)) - np.dot(qy, np.roll(qx, -1)))
    dlam = np.radians(0.1)
    band = WGS84_A ** 2 * dlam * (
        _aea_q(np.sin(np.radians(38.1))) - _aea_q(np.sin(np.radians(38.0)))) / 2.0
    assert abs(proj_area - band) / band < 1e-5

    # scale true along both standard parallels: projected distance of
    # a 0.01-deg lon step == a * m(phi) * dlam
    for sp in (29.5, 45.5):
        p = np.radians(sp)
        m = np.cos(p) / np.sqrt(1.0 - WGS84_E2 * np.sin(p) ** 2)
        ax, ay = aea_forward(np.array([-96.0, -95.99]), np.array([sp, sp]))
        d = np.hypot(ax[1] - ax[0], ay[1] - ay[0])
        want = WGS84_A * m * np.radians(0.01)
        assert abs(d - want) / want < 1e-6, sp


def test_crs_from_params_sphere_and_strictness():
    """Review-pass regressions: spherical aea/laea work (the authalic
    q has a 1/(2e) term that divided by zero), webmerc honors false
    easting, and wrong-but-plausible params fail loudly ('merc',
    unknown ellps) instead of silently transforming wrong."""
    from ocgis_ray.stages.crs import crs_from_params

    fwd, inv = crs_from_params({"proj": "laea", "lat_0": 52.0,
                                "lon_0": 10.0, "R": 6371007.181})
    lon, lat = inv(*fwd(np.array([2.35]), np.array([48.85])))
    assert abs(lon[0] - 2.35) < 1e-9 and abs(lat[0] - 48.85) < 1e-9

    fwd, inv = crs_from_params({"proj": "aea", "lat_0": 23.0,
                                "lon_0": -96.0, "lat_1": 29.5,
                                "lat_2": 45.5, "ellps": "sphere"})
    lon, lat = inv(*fwd(np.array([-100.0]), np.array([38.0])))
    assert abs(lon[0] + 100.0) < 1e-9 and abs(lat[0] - 38.0) < 1e-9

    fwd, inv = crs_from_params({"proj": "webmerc", "x_0": 500000.0})
    x, y = fwd(np.array([0.0]), np.array([0.0]))
    assert x[0] == 500000.0 and abs(y[0]) < 1e-6
    lon, lat = inv(x, y)
    assert abs(lon[0]) < 1e-9 and abs(lat[0]) < 1e-9

    with pytest.raises(KeyError, match="merc"):
        crs_from_params({"proj": "merc"})
    with pytest.raises(KeyError, match="ellps"):
        crs_from_params({"proj": "aea", "lat_1": 29.5, "lat_2": 45.5,
                         "ellps": "clrk66"})


def test_polar_stereographic_snyder_example():
    """Snyder p. 315 numerical example: International ellipsoid, south
    polar aspect, lat_ts=-71, lon_0=-100, point (150E, 75S) ->
    (-1540033.6, -560526.4)."""
    from ocgis_ray.stages.crs import ps_forward, ps_inverse

    a, e2 = 6378388.0, 0.00672267
    x, y = ps_forward(np.array([150.0]), np.array([-75.0]), lon0=-100.0,
                      lat_ts=-71.0, south=True, a=a, e2=e2)
    assert abs(x[0] - -1540033.6) < 0.1
    assert abs(y[0] - -560526.4) < 0.1
    lon, lat = ps_inverse(x, y, lon0=-100.0, lat_ts=-71.0, south=True,
                          a=a, e2=e2)
    assert abs(lon[0] - 150.0) < 1e-9 and abs(lat[0] - -75.0) < 1e-9


def test_polar_stereographic_scale_invariants():
    """k = 1 exactly at the standard parallel (lat_ts form, EPSG 3413)
    and k = k0 at the pole (scale-factor form, EPSG 5041), measured by
    finite differences along a parallel."""
    from ocgis_ray.stages.crs import WGS84_A, WGS84_E2, crs_from_epsg

    def k_along_parallel(fwd, lon0, lat, d=1e-6):
        x, y = fwd(np.array([lon0, lon0 + d]), np.array([lat, lat]))
        proj_len = float(np.hypot(x[1] - x[0], y[1] - y[0]))
        m = np.cos(np.radians(lat)) / np.sqrt(
            1.0 - WGS84_E2 * np.sin(np.radians(lat)) ** 2)
        return proj_len / (WGS84_A * m * np.radians(d))

    fwd, _ = crs_from_epsg(3413)
    assert abs(k_along_parallel(fwd, 30.0, 70.0) - 1.0) < 1e-6
    # k0 form: k = rho / (a m) analytically (a finite-difference probe
    # at 89.999 deg drowns in the 2e6 m false easting), within 1e-9 of
    # k0 at 89.999 deg (theoretical deviation ~ colat^2/4 ~ 8e-11)
    fwd, _ = crs_from_epsg(5041)
    x, y = fwd(np.array([10.0]), np.array([89.999]))
    rho = float(np.hypot(x[0] - 2000000.0, y[0] - 2000000.0))
    m = np.cos(np.radians(89.999)) / np.sqrt(
        1.0 - WGS84_E2 * np.sin(np.radians(89.999)) ** 2)
    assert abs(rho / (WGS84_A * m) - 0.994) < 1e-9


def test_omerc_narccap_params_and_central_scale():
    """The CFNarccapObliqueMercator parameterization (proj omerc,
    alpha default 360 per reference variable/crs.py:1117-1132) builds
    through crs_from_params, round-trips, and holds k = k0 at the
    projection center."""
    from ocgis_ray.stages.crs import WGS84_A, WGS84_E2, crs_from_params

    params = {"proj": "omerc", "lat_0": 47.5, "lonc": -97.0, "k_0": 1.0}
    fwd, inv = crs_from_params(params)  # alpha defaults to 360
    lons = np.array([-103.0, -97.0, -90.0])
    lats = np.array([42.0, 47.5, 52.0])
    lo, la = inv(*fwd(lons, lats))
    assert np.abs(lo - lons).max() < 1e-8
    assert np.abs(la - lats).max() < 1e-8
    # local scale at the center point via a tiny eastward step
    d = 1e-6
    x, y = fwd(np.array([-97.0, -97.0 + d]), np.array([47.5, 47.5]))
    m = np.cos(np.radians(47.5)) / np.sqrt(
        1.0 - WGS84_E2 * np.sin(np.radians(47.5)) ** 2)
    k = float(np.hypot(x[1] - x[0], y[1] - y[0])) / (WGS84_A * m * np.radians(d))
    assert abs(k - 1.0) < 1e-6


def test_bilinear_weights_reproduce_linear_fields(ray_session):
    """Bilinear weights: per-target sum == 1; a field LINEAR in
    lon/lat regrids exactly (the defining property of bilinear);
    constants regrid exactly through apply_weights."""
    import ray.data as rd

    from ocgis_ray import grid
    from ocgis_ray.stages.regrid import apply_weights, bilinear_weights

    res = 5
    targets = pd.DataFrame({
        "target_id": np.arange(4, dtype=np.int64),
        "lon": [12.31, -77.62, 151.2, 0.05],
        "lat": [45.07, 38.91, -33.87, 51.48],
    })
    w = bilinear_weights(targets, res)
    sums = w.groupby("dst")["w"].sum()
    assert np.allclose(sums.to_numpy(), 1.0, atol=1e-12)

    # source field on the stencil cells: value = 3*lon_c - 2*lat_c + 7
    cs = grid.cell_size(res)
    ix, iy = grid.split(w["src"].to_numpy())
    lon_c = (ix.astype(np.float64) + 0.5) * cs - 180.0
    lat_c = (iy.astype(np.float64) + 0.5) * cs - 90.0
    cells = pd.DataFrame({"cell": w["src"].to_numpy(),
                          "v": 3.0 * lon_c - 2.0 * lat_c + 7.0}
                         ).drop_duplicates("cell")
    out = apply_weights(rd.from_pandas(cells), w, src_col="cell",
                        value_col="v").to_pandas().set_index("dst")
    for _, t in targets.iterrows():
        expect = 3.0 * t["lon"] - 2.0 * t["lat"] + 7.0
        assert out.loc[int(t["target_id"]), "wsum"] == pytest.approx(
            expect, abs=1e-9)


def test_bilinear_pole_clamp_and_wrap():
    """A target above the last center row clamps to it (weights still
    sum to 1, 2-point stencil); a target straddling the antimeridian
    wraps its east stencil column to ix=0."""
    from ocgis_ray import grid
    from ocgis_ray.stages.regrid import bilinear_weights

    res = 4
    cs = grid.cell_size(res)
    t = pd.DataFrame({"target_id": np.array([0, 1], np.int64),
                      "lon": [10.0, 180.0 - cs / 4.0],
                      "lat": [90.0 - cs / 4.0, 0.3]})
    w = bilinear_weights(t, res)
    assert np.allclose(w.groupby("dst")["w"].sum().to_numpy(), 1.0)
    polar = w[w["dst"] == 0]
    iy = grid.split(polar["src"].to_numpy())[1]
    assert (iy == int(180.0 / cs) - 1).all()      # clamped to top row
    assert len(polar) == 2                         # collapsed stencil
    wrap = w[w["dst"] == 1]
    ix = grid.split(wrap["src"].to_numpy())[0]
    assert 0 in set(ix)                            # wrapped column


def test_nearest_stod_matches_containment():
    from ocgis_ray import grid
    from ocgis_ray.stages.regrid import nearest_stod_weights

    t = pd.DataFrame({"target_id": np.array([0, 1], np.int64),
                      "lon": [10.2, -123.9], "lat": [47.9, -5.2]})
    w = nearest_stod_weights(t, 6)
    assert (w["w"] == 1.0).all()
    assert (w["src"].to_numpy()
            == grid.encode(t["lon"].to_numpy(), t["lat"].to_numpy(), 6)).all()


def test_patch_weights_quadratic_exact_and_beats_bilinear(ray_session):
    """Patch recovery (ESMF patch analog, regrid/base.py:24-119):
    per-target weight sum == 1; a field QUADRATIC in lon/lat regrids
    exactly (where bilinear has O(h^2) error); on a smooth sin/cos
    field the patch max error is strictly below bilinear's — the
    higher-order criterion."""
    import ray.data as rd

    from ocgis_ray import grid
    from ocgis_ray.stages.regrid import (apply_weights, bilinear_weights,
                                         patch_weights)

    res = 7
    cs = grid.cell_size(res)
    rng = np.random.RandomState(3)
    n = 300
    targets = pd.DataFrame({
        "target_id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-170, 170, n),
        "lat": rng.uniform(-80, 80, n),
    })
    pw = patch_weights(targets, res)
    bw = bilinear_weights(targets, res)
    assert np.allclose(pw.groupby("dst")["w"].sum().to_numpy(), 1.0,
                       atol=1e-12)

    def field_q(lon, lat):
        return 0.3 * lon * lon + 0.1 * lat * lat - 0.2 * lon * lat \
            + lon + 2.0 * lat + 5.0

    def field_s(lon, lat):
        return np.sin(np.radians(lon * 3)) * np.cos(np.radians(lat * 2))

    def regrid_err(w, field):
        ix, iy = grid.split(w["src"].to_numpy())
        lon_c = (ix.astype(np.float64) + 0.5) * cs - 180.0
        lat_c = (iy.astype(np.float64) + 0.5) * cs - 90.0
        cells = pd.DataFrame({"cell": w["src"].to_numpy(),
                              "v": field(lon_c, lat_c)}
                             ).drop_duplicates("cell")
        out = apply_weights(rd.from_pandas(cells), w, src_col="cell",
                            value_col="v").to_pandas().set_index("dst")
        got = out.loc[targets["target_id"], out.columns[0]].to_numpy()
        want = field(targets["lon"].to_numpy(), targets["lat"].to_numpy())
        return np.abs(got - want).max()

    assert regrid_err(pw, field_q) < 1e-9          # quadratic: exact
    assert regrid_err(bw, field_q) > 1e-3          # bilinear: not
    assert regrid_err(pw, field_s) < regrid_err(bw, field_s)


def test_patch_weights_pole_clamp_and_wrap():
    """Above the last center row the patch stencil clamps (weights
    still sum to 1, combined duplicates); an antimeridian target wraps
    its east columns to ix 0/1."""
    from ocgis_ray import grid
    from ocgis_ray.stages.regrid import patch_weights

    res = 4
    cs = grid.cell_size(res)
    t = pd.DataFrame({
        "target_id": np.array([1, 2], dtype=np.int64),
        "lon": [0.0, 180.0 - 0.01 * cs],
        "lat": [90.0 - 0.01 * cs, 0.0],
    })
    w = patch_weights(t, res)
    assert np.allclose(w.groupby("dst")["w"].sum().to_numpy(), 1.0)
    nx = int(round(360.0 / cs))
    ix, _ = grid.split(w[w["dst"] == 2]["src"].to_numpy())
    assert 0 in ix and nx - 1 in ix  # wrapped stencil columns


def test_mollweide_robinson_and_proj_string():
    """Arbitrary-CRS escape hatch (variable/crs.py:160-240 accepts any
    proj4 string): crs_from_params takes a raw proj.4 string;
    Mollweide matches Snyder's closed form at known points and
    round-trips; Robinson hits the published table nodes exactly and
    round-trips through the same interpolant."""
    from ocgis_ray.stages.crs import (crs_from_params, moll_forward,
                                      parse_proj_string, robin_forward)

    p = parse_proj_string(
        "+proj=robin +lon_0=-30 +x_0=100 +ellps=WGS84 +no_defs +south")
    assert p == {"proj": "robin", "lon_0": -30, "x_0": 100,
                 "ellps": "WGS84", "south": True}

    a = 6378137.0
    # Mollweide: equator at dlam=180 -> x = 2*sqrt(2)*R; pole -> y =
    # sqrt(2)*R, x = 0
    fwd, inv = crs_from_params("+proj=moll +ellps=WGS84")
    x, y = fwd(np.array([180.0, 0.0]), np.array([0.0, 90.0]))
    assert abs(x[0] - 2.0 * np.sqrt(2.0) * a) < 1.0
    assert abs(y[1] - np.sqrt(2.0) * a) < 1.0 and abs(x[1]) < 1e-6
    # Robinson: published node (lat 50): X=0.8679, Y=0.6176
    fwd_r, inv_r = crs_from_params("+proj=robin")
    x, y = fwd_r(np.array([90.0]), np.array([50.0]))
    assert abs(x[0] - 0.8487 * a * 0.8679 * np.pi / 2.0) < 1.0
    assert abs(y[0] - 1.3523 * a * 0.6176) < 1.0

    rng = np.random.RandomState(5)
    lon = rng.uniform(-179.0, 179.0, 400)
    lat = rng.uniform(-89.0, 89.0, 400)
    for s in ("+proj=moll +lon_0=10", "+proj=robin +lon_0=-30",
              "+proj=moll +x_0=3000 +y_0=-2000"):
        f, i = crs_from_params(s)
        lo2, la2 = i(*f(lon, lat))
        assert np.abs(lo2 - lon).max() < 1e-6
        assert np.abs(la2 - lat).max() < 1e-6
    # unknown proj still raises with the updated list
    with pytest.raises(KeyError, match="moll robin"):
        crs_from_params("+proj=cass")


def test_wkt1_parsing_matches_proj_families():
    """WKT1 PROJCS strings (the reference's OSR input) route through
    crs_from_params: UTM-shaped Transverse_Mercator equals the utm
    family, Polar_Stereographic maps standard_parallel_1 -> lat_ts and
    equals EPSG:3413, Mollweide picks up the SPHEROID nested inside
    DATUM (regression: the rest-group must not swallow nested
    keywords), and unknown projections raise."""
    from ocgis_ray.stages.crs import EPSG_PARAMS, crs_from_params, parse_wkt

    utm = ('PROJCS["n", GEOGCS["WGS 84", DATUM["WGS_1984", '
           'SPHEROID["WGS 84",6378137,298.257223563]], '
           'PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]], '
           'PROJECTION["Transverse_Mercator"], '
           'PARAMETER["latitude_of_origin",0], '
           'PARAMETER["central_meridian",-93], '
           'PARAMETER["scale_factor",0.9996], '
           'PARAMETER["false_easting",500000], '
           'PARAMETER["false_northing",0], UNIT["metre",1], '
           'AUTHORITY["EPSG","32615"]]')
    assert parse_wkt(utm)["a"] == 6378137.0
    lon = np.array([-93.5, -92.1])
    lat = np.array([38.2, 45.0])
    f1, i1 = crs_from_params(utm)
    f2, _ = crs_from_params({"proj": "utm", "zone": 15})
    assert np.allclose(f1(lon, lat), f2(lon, lat))
    lo, la = i1(*f1(lon, lat))
    assert np.abs(lo - lon).max() < 1e-9

    ps = ('PROJCS["ps", GEOGCS["WGS 84", DATUM["WGS_1984", '
          'SPHEROID["WGS 84",6378137,298.257223563]], '
          'UNIT["degree",0.0174532925199433]], '
          'PROJECTION["Polar_Stereographic"], '
          'PARAMETER["latitude_of_origin",90], '
          'PARAMETER["standard_parallel_1",70], '
          'PARAMETER["central_meridian",-45], UNIT["metre",1]]')
    f3, _ = crs_from_params(ps)
    f4, _ = crs_from_params(EPSG_PARAMS[3413])
    assert np.allclose(f3(lon, lat), f4(lon, lat))

    moll = ('PROJCS["World_Mollweide", GEOGCS["g", DATUM["d", '
            'SPHEROID["s",6378137.0,298.257223563]], '
            'UNIT["Degree",0.0174532925199433]], '
            'PROJECTION["Mollweide"], '
            'PARAMETER["Central_Meridian",0.0], UNIT["Meter",1.0]]')
    f5, _ = crs_from_params(moll)
    x, _ = f5(np.array([180.0]), np.array([0.0]))
    assert abs(x[0] - 2.0 * np.sqrt(2.0) * 6378137.0) < 1.0

    assert parse_wkt('GEOGCS["WGS 84", DATUM["d", SPHEROID["s",'
                     '6378137,298.257223563]]]')["proj"] == "longlat"
    with pytest.raises(KeyError, match="unsupported WKT PROJECTION"):
        parse_wkt('PROJCS["x", PROJECTION["Cassini_Soldner"]]')


def test_oblique_stereographic():
    """Non-polar stere no longer raises: spherical oblique aspect
    (Snyder 21-2..21-4) — center maps to origin, equatorial aspect
    gives x = 2R tan(dl/2) on the equator, round-trips everywhere
    away from the antipode, and the polar path is unchanged."""
    from ocgis_ray.stages.crs import crs_from_params

    f, i = crs_from_params("+proj=stere +lat_0=40 +lon_0=-100 +R=6370997")
    rng = np.random.RandomState(2)
    lon = rng.uniform(-175.0, -20.0, 300)
    lat = rng.uniform(-35.0, 85.0, 300)
    lo, la = i(*f(lon, lat))
    assert np.abs(lo - lon).max() < 1e-8
    assert np.abs(la - lat).max() < 1e-8
    x, y = f(np.array([-100.0]), np.array([40.0]))
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    fe, _ = crs_from_params("+proj=stere +lat_0=0 +lon_0=0 +R=1")
    x, y = fe(np.array([90.0]), np.array([0.0]))
    assert abs(x[0] - 2.0) < 1e-12 and abs(y[0]) < 1e-12


def test_update_crs_accepts_epsg_proj_and_wkt(ray_session):
    """update_crs/CrsTransformStage take the full crs_from_params
    surface: named registry, epsg:<code>, proj.4 strings, WKT1."""
    import ray.data as rd

    from ocgis_ray.stages.crs import (EPSG_PARAMS, crs_from_params,
                                      update_crs)

    df = pd.DataFrame({"lon": [10.0, -50.0], "lat": [45.0, -20.0]})
    for name, params in [("epsg:3035", EPSG_PARAMS[3035]),
                         ("+proj=robin", "+proj=robin")]:
        out = update_crs(rd.from_pandas(df), name=name,
                         concurrency=1).to_pandas()
        f, _ = crs_from_params(params)
        x, y = f(df["lon"].to_numpy(), df["lat"].to_numpy())
        assert np.allclose(out["x"].to_numpy(), x)
        assert np.allclose(out["y"].to_numpy(), y)
