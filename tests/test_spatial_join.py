"""Spatial join: quadrant-fixture exact placements, join modes,
keep_touches, multipart/antimeridian, overlaps.

Mirrors the reference's quadrant assertions
(test/test_simple/test_simple.py:552-560: intersects subset returns
exact quadrant members)."""

import numpy as np
import pyarrow as pa
import pytest

from ocgis_ray import grid
from ocgis_ray.sources.cabinet import layer
from ocgis_ray.stages.spatial_join import SpatialJoinProbe, build_index


def probe_batch(lon, lat, res=7):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    return pa.table({
        "lon": pa.array(lon),
        "lat": pa.array(lat),
        "page_id": pa.array(np.arange(len(lon), dtype=np.int64)),
        f"cell_r{res}": pa.array(grid.encode(lon, lat, res)),
    })


def run_probe(polys, batch, how="inner", keep_touches=True, res=7):
    idx = build_index(polys, res=res)
    return SpatialJoinProbe(idx, how=how, keep_touches=keep_touches)(batch)


def test_quadrant_exact_membership():
    # 16 points at the quadrant-fixture cell centers (-105..-102, 38..41)
    xs, ys = np.meshgrid(np.arange(-105.0, -101.0), np.arange(38.0, 42.0))
    batch = probe_batch(xs.ravel(), ys.ravel())
    out = run_probe(layer("quadrants"), batch)
    assert out.num_rows == 16  # every point in exactly one quadrant
    got = {}
    for pid, ugid in zip(out["page_id"].to_pylist(), out["ugid"].to_pylist()):
        got.setdefault(ugid, set()).add(pid)
    # quadrant sizes: 2x2 each
    assert all(len(v) == 4 for v in got.values())
    # NW quadrant = lon in {-105,-104}, lat in {40,41} -> indices
    lonv, latv = xs.ravel(), ys.ravel()
    nw = {i for i in range(16) if lonv[i] < -103.5 and latv[i] > 39.5}
    assert got[1] == nw


def test_inner_vs_semi_vs_anti_partition():
    rng = np.random.RandomState(11)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85, 85, 2000)
    batch = probe_batch(lon, lat)
    polys = layer("world_regions")
    semi = run_probe(polys, batch, how="semi")
    anti = run_probe(polys, batch, how="anti")
    assert semi.num_rows + anti.num_rows == 2000
    inner = run_probe(polys, batch, how="inner")
    assert inner.num_rows >= semi.num_rows  # overlaps multiply


def test_overlapping_polygons_multiply_rows():
    # bay_area (1) sits inside bay_wide (9)
    batch = probe_batch([-122.0], [37.9])
    out = run_probe(layer("world_regions"), batch, how="inner")
    assert sorted(out["ugid"].to_pylist()) == [1, 9]


def test_keep_touches_edges_and_corners():
    polys = [p for p in layer("world_regions") if p.ugid == 2]  # nyc rect
    # edge point, corner point, interior, exterior
    batch = probe_batch([-75.0, -75.0, -74.0, -76.0], [40.5, 40.0, 40.5, 40.5])
    incl = run_probe(polys, batch, how="inner", keep_touches=True)
    assert sorted(incl["page_id"].to_pylist()) == [0, 1, 2]
    excl = run_probe(polys, batch, how="inner", keep_touches=False)
    assert sorted(excl["page_id"].to_pylist()) == [2]


def test_multipart_antimeridian():
    polys = [p for p in layer("hard_cases") if p.ugid == 102]
    batch = probe_batch([179.0, -178.0, 0.0], [-17.0, -17.0, -17.0])
    out = run_probe(polys, batch, how="inner")
    assert sorted(out["page_id"].to_pylist()) == [0, 1]
    assert set(out["ugid"].to_pylist()) == {102}
    # a page in both halves' cells still emits ONE row per ugid
    assert out.num_rows == 2


def test_nonconvex_lshape():
    polys = [p for p in layer("hard_cases") if p.ugid == 101]
    batch = probe_batch([11.0, 18.0, 18.0, 12.0], [18.0, 12.0, 18.0, 12.0])
    out = run_probe(polys, batch, how="inner")
    assert sorted(out["page_id"].to_pylist()) == [0, 1, 3]


def test_empty_batch():
    batch = probe_batch([], [])
    out = run_probe(layer("world_regions"), batch, how="inner")
    assert out.num_rows == 0
    assert "ugid" in out.column_names


def test_full_cell_fast_path_agrees_with_exact():
    """Pages in 'full' cells skip the exact test — verify the fast path
    and a pure-exact probe agree (the hint-mask/exact split contract,
    spatial/grid.py:635-705)."""
    rng = np.random.RandomState(4)
    lon = rng.uniform(-130, -114, 3000)
    lat = rng.uniform(29, 46, 3000)  # dense around bay_wide
    batch = probe_batch(lon, lat)
    polys = layer("world_regions")
    fast = run_probe(polys, batch, how="inner")
    # exact reference: direct contains() per polygon
    rows = []
    for p in polys:
        m = np.zeros(len(lon), dtype=bool)
        m |= p.contains(lon, lat, keep_touches=True)
        rows.extend((i, p.ugid) for i in np.nonzero(m)[0])
    expect = sorted(set(rows))
    got = sorted(zip(fast["page_id"].to_pylist(), fast["ugid"].to_pylist()))
    assert got == expect


def test_ray_pipeline_join(ray_session, sf_dir):
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import spatial_join

    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    n = ds.count()
    semi = spatial_join(ds, layer("world_regions"), how="semi", concurrency=2).count()
    anti = spatial_join(ds, layer("world_regions"), how="anti", concurrency=2).count()
    assert semi + anti == n
    assert semi > 0


def test_unknown_how_rejected():
    idx = build_index(layer("quadrants"), res=7)
    with pytest.raises(ValueError):
        SpatialJoinProbe(idx, how="outer")


def test_us_states48_partition():
    """48-rect tiling of CONUS: interior points land in exactly one
    state; the probe's inverted cell maps handle the larger layer."""
    rng = np.random.RandomState(9)
    lon = rng.uniform(-124.9, -67.1, 5000)
    lat = rng.uniform(25.1, 48.9, 5000)
    # keep clear of internal edges (shared boundaries match 2 states)
    x0, x1, y0, y1 = -125.0, -67.0, 25.0, 49.0
    dx, dy = (x1 - x0) / 8, (y1 - y0) / 6
    fx = (lon - x0) / dx % 1.0
    fy = (lat - y0) / dy % 1.0
    keep = (fx > 0.01) & (fx < 0.99) & (fy > 0.01) & (fy < 0.99)
    batch = probe_batch(lon[keep], lat[keep])
    out = run_probe(layer("us_states48"), batch, how="inner")
    assert out.num_rows == int(keep.sum())  # exactly one state each
    # spot-check one point against arithmetic
    i = 0
    exp_state = (int((lat[keep][i] - y0) // dy)) * 8 + int((lon[keep][i] - x0) // dx) + 1
    got = [u for p, u in zip(out["page_id"].to_pylist(), out["ugid"].to_pylist()) if p == i]
    assert got == [exp_state]


def test_shared_boundary_matches_both():
    """A point ON an internal edge of the states grid belongs to both
    neighbors under keep_touches=True — the reference's touch
    semantics (spatial/grid.py:627-631)."""
    x_edge = -125.0 + ((-67.0) - (-125.0)) / 8  # boundary between state 1 and 2
    batch = probe_batch([x_edge], [26.0])
    out = run_probe(layer("us_states48"), batch, how="inner")
    assert sorted(out["ugid"].to_pylist()) == [1, 2]
    out2 = run_probe(layer("us_states48"), batch, how="inner", keep_touches=False)
    assert out2.num_rows == 0


def test_dissolve_preserves_antimeridian(ray_session):
    """dissolve() must re-wrap unwrapped verts so a crossing polygon
    keeps its canonical parts — the far-side half was silently lost."""
    import numpy as np

    from ocgis_ray.sources import cabinet

    polys = [p for p in cabinet.layer("hard_cases") if p.crosses_am]
    assert polys, "hard_cases should contain a crossing polygon"
    merged = cabinet.dissolve(polys, ugid=99)
    src = polys[0]
    d = next(m for m, s in zip(merged, polys) if s is src)
    assert d.crosses_am and len(d.parts) == 2
    # far-side membership preserved
    qx = np.array([(src.parts[1].verts[:, 0].mean())])
    qy = np.array([(src.parts[1].verts[:, 1].mean())])
    assert d.contains(qx, qy)[0] == src.contains(qx, qy)[0] == True  # noqa: E712


def test_dissolve_geometry_join_equals_semi(ray_session, sf_dir):
    """joining against the TRUE dissolved geometry (union faces) keeps
    exactly the rows a semi join against the member polygons keeps —
    overlap regions counted once."""
    from ocgis_ray.sources import cabinet
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import spatial_join
    from ocgis_ray.stages.regrid import _axis_rect

    polys = [p for p in cabinet.layer("world_regions") if _axis_rect(p)]
    faces = cabinet.dissolve_geometry(polys, ugid=77)
    assert len({f.ugid for f in faces}) == 1
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    via_faces = spatial_join(ds, faces, how="inner",
                             concurrency=2).count()
    via_semi = spatial_join(ds, polys, how="semi", concurrency=2).count()
    assert via_faces == via_semi


# =====================================================================
# Partitioned (large-layer) spatial join: must equal the broadcast join
# =====================================================================

def _pairs(tbl, id_col="page_id"):
    import pandas as pd
    df = tbl.to_pandas() if not isinstance(tbl, pd.DataFrame) else tbl
    return set(zip(df[id_col].tolist(), df["ugid"].tolist()))


def test_pack_unpack_roundtrip():
    from ocgis_ray.sources import cabinet
    from ocgis_ray.stages.spatial_join import pack_part, unpack_part

    for p in cabinet.layer("hard_cases"):
        for part in p.parts:
            q = unpack_part(pack_part(part), part.ugid)
            assert np.array_equal(q.verts, part.verts)
            assert len(q.holes) == len(part.holes)
            for ha, hb in zip(q.holes, part.holes):
                assert np.array_equal(ha, hb)
            assert q.convex == part.convex and q.bbox == part.bbox


@pytest.mark.parametrize("layer_name", ["world_regions", "hard_cases"])
@pytest.mark.parametrize("how", ["inner", "semi", "anti"])
def test_partitioned_equals_broadcast(ray_session, sf_dir, layer_name, how):
    from ocgis_ray.sources import cabinet
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import (spatial_join,
                                               spatial_join_partitioned)

    polys = cabinet.layer(layer_name)
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    bc = spatial_join(ds, polys, how=how, concurrency=2).to_pandas()
    pt = spatial_join_partitioned(ds, polys, how=how,
                                  num_buckets=8).to_pandas()
    if how == "inner":
        assert _pairs(pt) == _pairs(bc)
    else:
        assert set(pt["page_id"]) == set(bc["page_id"])


def test_partitioned_keep_touches_false(ray_session):
    """on-edge point dropped under keep_touches=False in BOTH paths."""
    import ray.data as rd
    from ocgis_ray.sources import cabinet
    from ocgis_ray.stages.spatial_join import (spatial_join,
                                               spatial_join_partitioned)

    polys = cabinet.layer("quadrants")
    # a point exactly on the quadrant-fixture outer edge + one interior
    lon = np.array([-105.5, -104.0])
    lat = np.array([41.5, 40.0])
    batch = probe_batch(lon, lat)
    ds = rd.from_arrow(batch)
    for kt in (True, False):
        bc = spatial_join(ds, polys, how="inner", keep_touches=kt,
                          concurrency=2).to_pandas()
        pt = spatial_join_partitioned(ds, polys, how="inner",
                                      keep_touches=kt,
                                      num_buckets=4).to_pandas()
        assert _pairs(pt) == _pairs(bc)


def test_partitioned_attach_payload(ray_session, sf_dir):
    from ocgis_ray.sources import cabinet
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import (spatial_join,
                                               spatial_join_partitioned)

    polys = cabinet.layer("world_regions")
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    out = spatial_join_partitioned(ds, polys, how="inner", num_buckets=8,
                                   attach=True).to_pandas()
    bc = spatial_join(ds, polys, how="inner", concurrency=2).to_pandas()
    assert "url" in out.columns and "lon" in out.columns
    assert _pairs(out) == _pairs(bc)


def test_partitioned_layer_as_dataset(ray_session, sf_dir):
    """the scale shape: the layer arrives as a Dataset of packed parts
    (never driver-resident) and the cover stage runs distributed."""
    from ocgis_ray.sources import cabinet
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import (layer_to_dataset,
                                               spatial_join,
                                               spatial_join_partitioned)

    polys = cabinet.layer("us_states48")
    layer_ds = layer_to_dataset(polys, num_blocks=4)
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    pt = spatial_join_partitioned(ds, layer_ds, how="inner",
                                  num_buckets=8).to_pandas()
    bc = spatial_join(ds, polys, how="inner", concurrency=2).to_pandas()
    assert _pairs(pt) == _pairs(bc)


def test_partitioned_full_cell_keep_touches_false(ray_session):
    """regression: under keep_touches=False the probe demotes FULL
    cells to the exact test, so full-cell rows must ship geometry too.
    world_regions has full cells at res 7 (quadrants does not); a high
    bucket count isolates full cells from their part's boundary rows,
    which crashed (KeyError) before the fix."""
    import ray.data as rd
    from ocgis_ray.sources import cabinet
    from ocgis_ray.stages.spatial_join import (build_index, spatial_join,
                                               spatial_join_partitioned)

    polys = cabinet.layer("world_regions")
    idx = build_index(polys, res=7)
    assert any(a.size for a in idx.full.values())  # fixture sanity
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    ds = rd.from_arrow(probe_batch(lon, lat))
    bc = spatial_join(ds, polys, how="inner", keep_touches=False,
                      concurrency=2).to_pandas()
    pt = spatial_join_partitioned(ds, polys, how="inner",
                                  keep_touches=False,
                                  num_buckets=256).to_pandas()
    assert _pairs(pt) == _pairs(bc) and len(pt) > 0
