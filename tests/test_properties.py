"""Property-based tests (hypothesis) for grid + geometry invariants.

The reference's suite is example-based only (SURVEY §5); these
properties pin the invariants the engine's correctness rests on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocgis_ray import grid
from ocgis_ray.geometry import Polygon, rect_clip_area_sqlparity, shoelace_area

lons = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
res_st = st.integers(min_value=1, max_value=12)


@settings(max_examples=200, deadline=None)
@given(lons, lats, res_st)
def test_encode_bounds_contains_point(lon, lat, res):
    # containment up to float absorption: a point within ~1 ulp of a
    # cell edge may land in the neighbor (the +180.0 shift absorbs
    # magnitudes < 2^-45 deg); what matters for correctness is that
    # engine and SQL twin make the IDENTICAL choice (test_grid parity)
    c = grid.encode(np.array([lon]), np.array([lat]), res)
    x0, y0, x1, y1 = grid.bounds(c, res)
    eps = 1e-9
    assert x0[0] - eps <= lon < x1[0] + eps
    assert y0[0] - eps <= lat < y1[0] + eps


@settings(max_examples=200, deadline=None)
@given(lons, lats, st.integers(min_value=2, max_value=12), st.integers(min_value=0, max_value=6))
def test_parent_nesting(lon, lat, res, up):
    up = min(up, res - 1)
    c = grid.encode(np.array([lon]), np.array([lat]), res)
    p_direct = grid.encode(np.array([lon]), np.array([lat]), res - up)
    assert grid.parent(c, res, res - up)[0] == p_direct[0]


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=3), lons, lats)
def test_disk_contains_ring(k, lon, lat):
    c = int(grid.encode(np.array([lon]), np.array([lat]), 7)[0])
    d = set(grid.disk(c, 7, k).tolist())
    r = set(grid.ring(c, 7, k).tolist())
    assert r <= d
    assert c in d and c not in r
    inner = set(grid.disk(c, 7, k - 1).tolist())
    assert d == inner | r


@st.composite
def convex_polygons(draw):
    """Random well-conditioned convex polygon: points on a circle at
    angles separated by >= 0.3 rad (no needle edges)."""
    n = draw(st.integers(min_value=3, max_value=8))
    cx = draw(st.floats(min_value=-100, max_value=100))
    cy = draw(st.floats(min_value=-60, max_value=60))
    r = draw(st.floats(min_value=0.5, max_value=20.0))
    slots = draw(
        st.lists(st.integers(min_value=0, max_value=19), min_size=n, max_size=n,
                 unique=True)
    )
    angles = sorted(s * (2 * np.pi / 20.0) for s in slots)
    verts = np.array([[cx + r * np.cos(a), cy + r * np.sin(a)] for a in angles])
    return Polygon(1, "rand", verts)


@settings(max_examples=100, deadline=None)
@given(convex_polygons(), st.integers(min_value=0, max_value=1000))
def test_convex_and_raycast_agree(poly, seed):
    """Away from edges, the half-plane and ray-casting predicates must
    agree — the engine relies on both (convex fast path, general)."""
    rng = np.random.RandomState(seed)
    x0, y0, x1, y1 = poly.bbox
    px = rng.uniform(x0 - 1.0, x1 + 1.0, 64)
    py = rng.uniform(y0 - 1.0, y1 + 1.0, 64)
    from ocgis_ray.geometry import _contains_convex, _contains_raycast

    a = _contains_convex(poly.verts, px, py, keep_touches=True)
    b = _contains_raycast(poly.verts, px, py)
    # exclude points within eps of any edge (where conventions differ)
    eps_mask = np.ones(64, dtype=bool)
    v = poly.verts
    n = v.shape[0]
    for i in range(n):
        e0, e1 = v[i], v[(i + 1) % n]
        d = e1 - e0
        ln = np.hypot(*d)
        if ln == 0:
            continue
        cross = np.abs(d[0] * (py - e0[1]) - d[1] * (px - e0[0])) / ln
        eps_mask &= cross > 1e-6
    assert (a[eps_mask] == b[eps_mask]).all()


@settings(max_examples=150, deadline=None)
@given(
    st.floats(-50, 50), st.floats(-50, 50),
    st.floats(0.1, 30), st.floats(0.1, 30),
    st.floats(-50, 50), st.floats(-50, 50),
    st.floats(0.1, 30), st.floats(0.1, 30),
)
def test_rect_clip_symmetry_and_bounds(ax, ay, aw, ah, bx, by, bw, bh):
    a = rect_clip_area_sqlparity(
        np.array([ax]), np.array([ay]), np.array([ax + aw]), np.array([ay + ah]),
        bx, by, bx + bw, by + bh,
    )[0]
    b = rect_clip_area_sqlparity(
        np.array([bx]), np.array([by]), np.array([bx + bw]), np.array([by + bh]),
        ax, ay, ax + aw, ay + ah,
    )[0]
    assert a == b  # symmetric
    assert 0.0 <= a <= min(aw * ah, bw * bh) + 1e-9


@settings(max_examples=100, deadline=None)
@given(convex_polygons())
def test_covering_conserves_area(poly):
    """Full-cell area + boundary clip areas == polygon area exactly —
    the invariant the join fast path rests on."""
    from ocgis_ray.cover import cover_polygon

    res = 6
    cov = cover_polygon(poly, res)
    cell_area = grid.cell_size(res) ** 2
    total = len(cov.full) * cell_area + cov.boundary_clip_area.sum()
    assert abs(total - shoelace_area(poly.verts)) < 1e-6 * max(1.0, shoelace_area(poly.verts))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.tuples(st.floats(-50, 50), st.floats(-50, 50)),
             min_size=3, max_size=8),
    st.floats(-40, 30), st.floats(-40, 30),
    st.floats(1.0, 30.0), st.floats(1.0, 30.0),
)
def test_clip_convex_bounded_and_rect_consistent(pts, cx, cy, cw, ch):
    """clip area is bounded by both inputs, and the general convex
    kernel agrees with the axis-rect kernel on rectangles."""
    import numpy as np

    from ocgis_ray.geometry import (_is_convex, clip_poly_convex,
                                    clip_poly_rect, shoelace_area)

    hull = _convex_hull(np.asarray(pts, dtype=np.float64))
    if hull is None or shoelace_area(hull) < 1e-6:
        return
    rect = np.array([[cx, cy], [cx + cw, cy], [cx + cw, cy + ch], [cx, cy + ch]])
    c1 = clip_poly_convex(hull, rect)
    c2 = clip_poly_rect(hull, cx, cy, cx + cw, cy + ch)
    a1 = shoelace_area(c1) if c1 is not None and c1.shape[0] >= 3 else 0.0
    a2 = shoelace_area(c2) if c2 is not None and c2.shape[0] >= 3 else 0.0
    assert abs(a1 - a2) < 1e-6 * max(1.0, a2)
    assert a1 <= shoelace_area(hull) + 1e-9
    assert a1 <= cw * ch + 1e-9


def _convex_hull(pts):
    """tiny Andrew monotone chain (test helper)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        return None

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1])
    return hull if len(hull) >= 3 else None


@settings(max_examples=100, deadline=None)
@given(st.floats(-170, 170), st.floats(5, 40), st.floats(-60, 60),
       st.floats(2, 20))
def test_antimeridian_split_preserves_containment(lon0, width, lat0, h):
    """for any box (possibly crossing ±180 after wrapping), the
    auto-split polygon classifies points identically to direct
    longitude-interval membership."""
    import numpy as np

    from ocgis_ray.geometry import Polygon

    lo = lon0
    hi = lon0 + width
    # express the ring in wrapped coordinates (crossing representation)
    def wrap(x):
        return (x + 180.0) % 360.0 - 180.0

    ring = np.array([[wrap(lo), lat0], [wrap(hi), lat0],
                     [wrap(hi), lat0 + h], [wrap(lo), lat0 + h]])
    try:
        p = Polygon(1, "t", ring)
    except NotImplementedError:
        return
    rng = np.random.RandomState(0)
    qx = rng.uniform(-180, 180, 200)
    qy = rng.uniform(lat0 - 2, lat0 + h + 2, 200)
    got = p.contains(qx, qy)
    # truth: lon in [lo, hi] modulo 360, lat in [lat0, lat0+h]
    rel = (qx - lo) % 360.0
    want = (rel <= width) & (qy >= lat0) & (qy <= lat0 + h)
    # exclude points within 1e-6 deg of any boundary (float edge rules)
    safe = (np.abs(rel) > 1e-6) & (np.abs(rel - width) > 1e-6) & \
        (np.abs(qy - lat0) > 1e-6) & (np.abs(qy - (lat0 + h)) > 1e-6)
    assert (got[safe] == want[safe]).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**40), st.floats(0.05, 0.95))
def test_sample_by_key_sql_parity_property(key, rate):
    import duckdb
    import numpy as np

    from ocgis_ray.stages.reshape import sample_by_key_sql_pred

    threshold = np.uint64(int(rate * (1 << 32)))
    with np.errstate(over="ignore"):
        h = (np.uint64(key) * np.uint64(2654435761)) % np.uint64(1 << 32)
    mine = bool(h < threshold)
    sql = duckdb.sql(
        f"SELECT {sample_by_key_sql_pred(str(key), rate)}").fetchone()[0]
    assert mine == sql


def _hull(pts: np.ndarray) -> np.ndarray:
    """tiny Andrew-monotone convex hull (no scipy in container)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2],
                                             p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out[:-1]
    lower = half(list(pts))
    upper = half(list(pts[::-1]))
    return np.asarray(lower + upper, dtype=np.float64)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=6),
       st.integers(min_value=0, max_value=10**6))
def test_coverage_sweep_properties(n_polys, seed):
    """invariants of the exact coverage sweep on random convex soups:
    (a) conservation: sum(d * area_d) == sum of polygon areas;
    (b) inclusion-exclusion for pairs: |A|+|B| == |A∪B|+|A∩B|;
    (c) union faces tile the union measure exactly."""
    from ocgis_ray.geometry import (coverage_areas, intersection_area,
                                    shoelace_area, union_area_n,
                                    union_faces)

    rng = np.random.default_rng(seed)
    polys = []
    for i in range(n_polys):
        pts = rng.uniform(0, 10, (8, 2))
        hull = _hull(pts)
        if hull.shape[0] < 3 or shoelace_area(hull) < 1e-6:
            return  # degenerate draw — vacuous case
        polys.append(Polygon(i, "h", hull))
    cov = coverage_areas(polys)
    total = sum(p.area() for p in polys)
    assert abs(sum((i + 1) * v for i, v in enumerate(cov)) - total) \
        <= 1e-9 * max(1.0, total)
    if len(polys) >= 2:
        a, b = polys[0], polys[1]
        lhs = a.area() + b.area()
        rhs = union_area_n([a, b]) + intersection_area(a, b)
        assert abs(lhs - rhs) <= 1e-9 * max(1.0, lhs)
    faces = union_faces(polys)
    assert abs(sum(shoelace_area(f) for f in faces) - cov.sum()) \
        <= 1e-9 * max(1.0, cov.sum())


@settings(max_examples=60, deadline=None)
@given(convex_polygons(), st.integers(min_value=4, max_value=8))
def test_conservative_weights_properties(poly, res):
    """Invariants of the ESMF-CONSERVE analog on random convex
    polygons: positive weights in (0, 1], per-dst sum 1, raw areas sum
    to the shoelace area, and every weighted cell intersects bbox."""
    from ocgis_ray.stages.regrid import conservative_weights

    w = conservative_weights([poly], res)
    assert len(w) > 0
    vals = w["w"].to_numpy()
    assert ((vals > 0) & (vals <= 1.0 + 1e-12)).all()
    np.testing.assert_allclose(vals.sum(), 1.0, rtol=1e-10)
    raw = conservative_weights([poly], res, normalize="none")
    np.testing.assert_allclose(raw["w"].sum(), poly.area(), rtol=1e-9)
    x0, y0, x1, y1 = grid.bounds(w["src"].to_numpy(np.int64), res)
    bx0, by0, bx1, by1 = poly.bbox
    eps = 1e-9
    assert (x1 >= bx0 - eps).all() and (x0 <= bx1 + eps).all()
    assert (y1 >= by0 - eps).all() and (y0 <= by1 + eps).all()


# ------------------------------------------------- text kernel parity

# arbitrary unicode text with frequent spaces/newlines (the separator
# regimes the byte-view kernels care about)
_texty = st.text(alphabet=list(" \n\taZ9.,!é日'\"{"), max_size=60)


@settings(max_examples=60, deadline=None)
@given(st.lists(_texty, min_size=1, max_size=8))
def test_quality_stats_duckdb_parity_property(texts):
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from ocgis_ray.stages.quality import quality_stats_arrays, quality_stats_sql

    tbl = pa.table({"doc_id": list(range(len(texts))),
                    "text": pa.array(texts, type=pa.string())})
    stats = quality_stats_arrays(tbl["text"])
    stats.pop("_null_mask", None)
    eng = pd.DataFrame({"doc_id": tbl["doc_id"].to_numpy(), **stats}) \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = con.execute(quality_stats_sql()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    con.close()
    for c in ["dup_word_frac", "mean_word_len", "stopword_frac",
              "top_bigram_frac", "gopher_keep"]:
        a = eng[c].to_numpy(np.float64)
        b = ora[c].to_numpy(np.float64)
        assert ((np.isnan(a) & np.isnan(b)) | (a == b)).all(), c


@settings(max_examples=60, deadline=None)
@given(st.lists(_texty, min_size=1, max_size=8))
def test_bpe_token_count_duckdb_parity_property(texts):
    import duckdb
    import pyarrow as pa

    from ocgis_ray.stages.text import bpe_token_count_arrays, bpe_token_count_sql

    arr = pa.array(texts, type=pa.string())
    counts, _ = bpe_token_count_arrays(arr)
    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(texts))), "text": arr}))
    sql = con.execute(
        f"SELECT {bpe_token_count_sql()} AS n FROM t ORDER BY i"
    ).fetchdf()["n"].to_numpy(np.int64)
    con.close()
    assert (counts == sql).all()


# ------------------------------------------------------------- CRS registry

#: per-code service areas (lon_lo, lon_hi, lat_lo, lat_hi) — random
#: points inside each must round-trip through the generic constructor
_CRS_AREAS = {
    3857: (-179.0, 179.0, -84.0, 84.0),
    5070: (-124.0, -67.0, 25.0, 49.0),
    2230: (-118.0, -115.0, 32.2, 34.5),
    2154: (-4.5, 8.0, 42.0, 51.0),
    3035: (-10.0, 30.0, 35.0, 70.0),
    3347: (-140.0, -52.0, 42.0, 83.0),
    25832: (6.0, 12.0, 38.0, 83.0),
    32615: (-96.0, -90.0, -80.0, 84.0),
    32733: (12.0, 18.0, -80.0, 0.0),
    54008: (-179.0, 179.0, -85.0, 85.0),
    3413: (-179.0, 179.0, 55.0, 89.9),
    3031: (-179.0, 179.0, -89.9, -55.0),
    5041: (-179.0, 179.0, 60.0, 89.9),
    3375: (99.0, 105.0, 1.0, 7.5),
}


@settings(max_examples=150, deadline=None)
@given(st.sampled_from(sorted(_CRS_AREAS)),
       st.floats(0.0, 1.0), st.floats(0.0, 1.0))
def test_crs_registry_roundtrip_property(code, fx, fy):
    """Hypothesis sweep: any point in a CRS's service area round-trips
    forward->inverse to <1e-7 deg (~1 cm; TM is a truncated series)
    through the data-driven EPSG registry."""
    from ocgis_ray.stages.crs import crs_from_epsg

    x0, x1, y0, y1 = _CRS_AREAS[code]
    lon = np.array([x0 + fx * (x1 - x0)])
    lat = np.array([y0 + fy * (y1 - y0)])
    fwd, inv = crs_from_epsg(code)
    lo, la = inv(*fwd(lon, lat))
    assert abs(lo[0] - lon[0]) < 1e-7, code
    assert abs(la[0] - lat[0]) < 1e-7, code


# ------------------------------------------------------- round-4 parsers

@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=400))
def test_dom_extract_total_and_deterministic(html):
    """extract_text is total over arbitrary text (never raises, always
    a str) and deterministic; bytes and str inputs agree."""
    from ocgis_ray.stages.dom import extract_text

    a = extract_text(html)
    assert isinstance(a, str)
    assert extract_text(html) == a
    assert extract_text(html.encode("utf-8")) == a


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_dom_extract_total_on_bytes(raw):
    from ocgis_ray.stages.dom import extract_text

    a = extract_text(raw)
    assert isinstance(a, str) and extract_text(raw) == a


@settings(max_examples=60, deadline=None)
@given(
    var_specs=st.lists(
        st.tuples(
            st.sampled_from(["i2", "i4", "f4", "f8"]),
            st.integers(min_value=0, max_value=3),  # ndims
        ),
        min_size=1, max_size=4),
    d1=st.integers(min_value=1, max_value=5),
    d2=st.integers(min_value=1, max_value=4),
)
def test_netcdf3_roundtrip_property(var_specs, d1, d2, tmp_path_factory):
    """write_netcdf3 -> read_netcdf3 is the identity on dims, attrs,
    dtypes and values for arbitrary small fixed-dim variables."""
    import numpy as np

    from ocgis_ray.sources.netcdf3 import NcVar, read_netcdf3, write_netcdf3

    dims = {"a": d1, "b": d2, "c": 2}
    dim_names = list(dims)
    rng = np.random.RandomState(0)
    variables = {}
    for i, (dt, nd) in enumerate(var_specs):
        vdims = dim_names[:nd]
        shape = tuple(dims[d] for d in vdims)
        if dt.startswith("f"):
            data = rng.standard_normal(shape).astype(dt)
        else:
            data = rng.randint(-100, 100, size=shape).astype(dt)
        variables[f"v{i}"] = NcVar(vdims, {"idx": np.int32(i)}, data)
    path = str(tmp_path_factory.mktemp("nc") / "p.nc")
    write_netcdf3(path, dims, variables, {"title": "prop"})
    rdims, gatts, rvars = read_netcdf3(path)
    assert rdims == dims and gatts["title"] == "prop"
    for nm, v in variables.items():
        got = rvars[nm]
        assert got.dims == list(v.dims)
        assert got.data.dtype == np.asarray(v.data).dtype
        assert np.array_equal(got.data, v.data)
        assert got.attrs["idx"][0] == int(nm[1:])
