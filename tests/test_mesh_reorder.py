"""Unstructured-mesh source (sources/mesh.py) + spatial reorder
(stages/reorder.py) — the UGRID / Grid.reorder analogs."""

import numpy as np
import pandas as pd
import pytest

from ocgis_ray.sources.mesh import (
    mesh_covering,
    mesh_polygons,
    register_mesh_layer,
    synth_tri_mesh,
)
from ocgis_ray.stages.reorder import (
    _spread_bits,
    morton_key,
    morton_key_naive,
    spatial_reorder,
)


# ---------------------------------------------------------------- morton

def test_spread_bits_small():
    x = np.array([0b0, 0b1, 0b10, 0b11, 0b111], dtype=np.uint64)
    got = _spread_bits(x)
    assert got.tolist() == [0b0, 0b1, 0b100, 0b101, 0b10101]


def test_spread_bits_wide():
    """Bits above position 15 must land at 2*b — the round-2 bug
    corrupted these via a bogus shift-32 pre-step."""
    for b in (16, 20, 31):
        got = int(_spread_bits(np.array([1 << b], dtype=np.uint64))[0])
        assert got == 1 << (2 * b)


@pytest.mark.parametrize("res", [3, 7, 12, 20])
def test_morton_key_matches_naive(res):
    rng = np.random.default_rng(42 + res)
    lon = rng.uniform(-180.0, 180.0, 500)
    lat = rng.uniform(-90.0, 90.0, 500)
    fast = morton_key(lon, lat, res)
    slow = morton_key_naive(lon, lat, res)
    np.testing.assert_array_equal(fast, slow)
    assert (fast >= 0).all()  # int64-safe for res <= 20


def test_morton_locality():
    """Z-order keys of a 2x2 block of adjacent cells are closer to
    each other than to a far-away cell."""
    from ocgis_ray import grid

    res = 7
    cs = grid.cell_size(res)
    lon = np.array([0.1 * cs, 1.1 * cs, 0.1 * cs, 150.0])
    lat = np.array([0.1 * cs, 0.1 * cs, 1.1 * cs, 70.0])
    k = morton_key(lon, lat, res)
    # the three points occupy a genuine 2x2 cell block
    assert len(set(k[:3].tolist())) == 3
    assert max(abs(k[1] - k[0]), abs(k[2] - k[0])) < abs(k[3] - k[0])


def test_spatial_reorder_lon(ray_session):
    import ray

    df = pd.DataFrame({
        "lon": [170.0, -170.0, 10.0, -10.0],
        "lat": [0.0, 1.0, 2.0, 3.0],
        "v": [0, 1, 2, 3],
    })
    ds = ray.data.from_pandas(df)
    # reference semantics: ascending lon measured from the wrap start
    # (spatial/grid.py:750-793 rotates a 0..360 grid to -180..180)
    out = spatial_reorder(ds, order="lon", wrap_start=0.0).to_pandas()
    assert out["v"].tolist() == [2, 0, 1, 3]
    assert list(out.columns) == ["lon", "lat", "v"]  # key dropped
    out2 = spatial_reorder(ds, order="lon", wrap_start=-180.0).to_pandas()
    assert out2["v"].tolist() == [1, 3, 2, 0]


def test_spatial_reorder_morton_sorts_by_key(ray_session):
    import ray

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "lon": rng.uniform(-180, 180, 200),
        "lat": rng.uniform(-90, 90, 200),
    })
    ds = ray.data.from_pandas(df)
    out = spatial_reorder(ds, order="morton", res=9,
                          key_col="zkey").to_pandas()
    key = out["zkey"].to_numpy()
    assert (np.diff(key) >= 0).all()
    np.testing.assert_array_equal(
        np.sort(key),
        np.sort(morton_key(df["lon"].to_numpy(), df["lat"].to_numpy(), 9)),
    )


def test_spatial_reorder_bad_order(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({"lon": [0.0], "lat": [0.0]}))
    with pytest.raises(ValueError):
        spatial_reorder(ds, order="peano")


# ------------------------------------------------------------------ mesh

def test_synth_tri_mesh_shapes():
    nodes, faces = synth_tri_mesh(0.0, 0.0, nx=3, ny=2, cell=1.0)
    assert len(nodes) == 4 * 3 and len(faces) == 2 * 3 * 2
    polys = mesh_polygons(nodes, faces)
    assert len(polys) == 12
    # two CCW triangles per unit square -> total area nx*ny*cell^2
    total = sum(p.area() for p in polys)
    assert total == pytest.approx(6.0, rel=1e-12)
    # face_id is the stable ugid
    assert [p.ugid for p in polys] == list(range(12))


def test_mesh_start_index_parity():
    n0, f0 = synth_tri_mesh(10.0, 20.0, nx=2, ny=2, cell=0.5, start_index=0)
    n1, f1 = synth_tri_mesh(10.0, 20.0, nx=2, ny=2, cell=0.5, start_index=1)
    p0 = mesh_polygons(n0, f0, start_index=0)
    p1 = mesh_polygons(n1, f1, start_index=1)
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(a.verts, b.verts)


def test_mesh_closed_ring_tolerated():
    nodes = pd.DataFrame({"node_id": [0, 1, 2],
                          "lon": [0.0, 1.0, 0.0],
                          "lat": [0.0, 0.0, 1.0]})
    faces = pd.DataFrame({"face_id": [5],
                          "node_ids": [np.array([0, 1, 2, 0])]})
    (p,) = mesh_polygons(nodes, faces)
    assert p.verts.shape[0] == 3 and p.ugid == 5


def test_mesh_invalid_faces_raise():
    nodes = pd.DataFrame({"node_id": [0, 1, 2],
                          "lon": [0.0, 1.0, 0.0],
                          "lat": [0.0, 0.0, 1.0]})
    dangling = pd.DataFrame({"face_id": [0], "node_ids": [np.array([0, 1, 9])]})
    with pytest.raises(ValueError, match="unknown node"):
        mesh_polygons(nodes, dangling)
    degen = pd.DataFrame({"face_id": [0], "node_ids": [np.array([0, 1, 1])]})
    with pytest.raises(ValueError, match="degenerate"):
        mesh_polygons(nodes, degen)


def test_mesh_layer_spatial_join(ray_session):
    """A registered mesh layer drives the ordinary spatial machinery;
    membership equals driver-side Polygon.contains."""
    import pyarrow as pa
    import ray

    from ocgis_ray import grid
    from ocgis_ray.sources.cabinet import layer
    from ocgis_ray.stages.spatial_join import spatial_join

    nodes, faces = synth_tri_mesh(-1.0, -1.0, nx=2, ny=2, cell=1.0)
    register_mesh_layer("tri_mesh_test", nodes, faces)
    polys = layer("tri_mesh_test")

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "pid": np.arange(300, dtype=np.int64),
        "lon": rng.uniform(-2.0, 2.0, 300),
        "lat": rng.uniform(-2.0, 2.0, 300),
    })

    def add_cell(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        return t.append_column("cell_r7", pa.array(grid.encode(lon, lat, 7)))

    ds = ray.data.from_pandas(df).map_batches(add_cell, batch_format="pyarrow")
    got = spatial_join(ds, polys, how="inner", concurrency=2).to_pandas()
    got_pairs = set(zip(got["pid"], got["ugid"]))
    exp_pairs = set()
    for p in polys:
        inside = p.contains(df["lon"].to_numpy(), df["lat"].to_numpy())
        for pid in df["pid"].to_numpy()[inside]:
            exp_pairs.add((pid, p.ugid))
    assert got_pairs == exp_pairs


def test_mesh_covering_matches_driver_path(ray_session):
    """The Dataset-native covering (scale path) emits exactly the
    (face_id, cell, full) rows cover_polygon produces driver-side."""
    import ray

    from ocgis_ray.cover import cover_polygon

    nodes, faces = synth_tri_mesh(5.0, 5.0, nx=2, ny=1, cell=2.0)
    res = 7
    faces_ds = ray.data.from_pandas(faces)
    got = mesh_covering(faces_ds, nodes, res=res).to_pandas()
    got_rows = set(zip(got["face_id"], got["cell"], got["full"]))

    exp_rows = set()
    for p in mesh_polygons(nodes, faces):
        cov = cover_polygon(p, res)
        for c in cov.full.tolist():
            exp_rows.add((p.ugid, c, True))
        for c in cov.boundary.tolist():
            exp_rows.add((p.ugid, c, False))
    assert got_rows == exp_rows


def test_spatial_reorder_key_collision(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame(
        {"lon": [0.0], "lat": [0.0], "zkey": [1]}))
    with pytest.raises(ValueError, match="already exists"):
        spatial_reorder(ds, order="morton", key_col="zkey")


def test_auto_buckets_validation():
    from ocgis_ray.tuning import auto_buckets

    assert auto_buckets(5) == 5
    with pytest.raises(ValueError):
        auto_buckets(0)
    with pytest.raises(ValueError):
        auto_buckets(-3)


def test_morton_ranges_exact_and_coalesced():
    from ocgis_ray import grid
    from ocgis_ray.stages.reorder import morton_key_cells, morton_ranges

    res = 5
    cs = grid.cell_size(res)
    x0, y0, x1, y1 = -10.0, -5.0, 33.0, 21.0
    full = morton_ranges(x0, y0, x1, y1, res, max_ranges=10**9)
    got = set()
    for lo, hi in full:
        got |= set(range(lo, hi + 1))
    ix0, ix1 = int(np.floor((x0 + 180) / cs)), int(np.floor((x1 + 180) / cs))
    iy0, iy1 = int(np.floor((y0 + 90) / cs)), int(np.floor((y1 + 90) / cs))
    ix, iy = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
    exp = set(morton_key_cells(ix.ravel(), iy.ravel()).tolist())
    assert got == exp  # exact decomposition
    # coalescing widens but never loses keys, and respects the cap
    few = morton_ranges(x0, y0, x1, y1, res, max_ranges=4)
    assert len(few) <= 4
    cov = set()
    for lo, hi in few:
        cov |= set(range(lo, hi + 1))
    assert exp <= cov
    # degenerate bbox
    assert morton_ranges(10.0, 10.0, 5.0, 5.0, res) == []


def test_read_morton_pruned_end_to_end(ray_session, sf_dir, tmp_path):
    """Morton-sorted parquet + range predicates == plain bbox filter,
    and whole row groups are skipped via footer statistics."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.reorder import (morton_filter_expr, morton_ranges,
                                          read_morton_pruned, spatial_reorder)
    from ocgis_ray.stages.subset import bbox_filter

    res = 7
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html", "text"]))
    ordered = spatial_reorder(ds, order="morton", res=res,
                              key_col="zkey").to_pandas()
    path = str(tmp_path / "pages_morton.parquet")
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(ordered, preserve_index=False),
                   path, row_group_size=100)

    bbox = (-60.0, -30.0, 40.0, 45.0)
    pruned = read_morton_pruned(path, *bbox, res=res).to_pandas()
    plain = bbox_filter(ds, *bbox).to_pandas()
    assert sorted(pruned["page_id"]) == sorted(plain["page_id"])
    assert len(pruned) > 0

    # row-group skip evidence: the predicate admits strictly fewer
    # row groups than the file holds
    expr = morton_filter_expr(morton_ranges(*bbox, res=res), "zkey")
    frag = list(pads.dataset(path).get_fragments())[0]
    total = frag.num_row_groups
    kept = len(list(frag.split_by_row_group(expr)))
    assert kept < total, (kept, total)


def test_mesh_destination_conservative_regrid(ray_session):
    """The reference's headline ESMF workflow — conservative regrid to
    an UNSTRUCTURED destination mesh — as generate->smm over the mesh
    faces: constant source field regrids to the constant on every
    triangle."""
    import ray.data as rd

    from ocgis_ray.stages.regrid import apply_weights, conservative_weights

    nodes, faces = synth_tri_mesh(12.0, -8.0, nx=3, ny=2, cell=4.0)
    tris = mesh_polygons(nodes, faces)
    w = conservative_weights(tris, res=7)
    assert set(w["dst"]) == {p.ugid for p in tris}
    sums = w.groupby("dst")["w"].sum()
    np.testing.assert_allclose(sums, 1.0, rtol=1e-10)
    field = pd.DataFrame({"cell_r7": np.unique(w["src"].to_numpy()),
                          "value": -3.5})
    out = apply_weights(rd.from_pandas(field), w, src_col="cell_r7",
                        value_col="value").to_pandas()
    assert len(out) == len(tris)
    np.testing.assert_allclose(out["wsum"], -3.5, rtol=1e-10)


# ------------------------------------------------------- hilbert order

class TestHilbert:
    def test_vectorized_matches_scalar(self):
        from ocgis_ray.stages.reorder import (_hilbert_scalar,
                                              hilbert_key_cells)

        rng = np.random.RandomState(0)
        for bits in (1, 3, 6, 10):
            n = 1 << bits
            ix = rng.randint(0, n, 200)
            iy = rng.randint(0, n, 200)
            got = hilbert_key_cells(ix, iy, bits)
            want = [_hilbert_scalar(x, y, bits) for x, y in zip(ix, iy)]
            assert list(got) == want

    def test_bijective_and_adjacent(self):
        """The full grid traversal visits every key once and every
        consecutive key pair is GRID-ADJACENT (the Hilbert property
        Morton lacks)."""
        from ocgis_ray.stages.reorder import hilbert_key_cells, morton_key_cells

        bits = 4
        n = 1 << bits
        ix, iy = np.meshgrid(np.arange(n), np.arange(n))
        ix, iy = ix.ravel(), iy.ravel()
        key = hilbert_key_cells(ix, iy, bits)
        assert sorted(key) == list(range(n * n))
        order = np.argsort(key)
        steps = (np.abs(np.diff(ix[order])) + np.abs(np.diff(iy[order])))
        assert (steps == 1).all()
        # Morton, by contrast, jumps: total path length strictly larger
        morder = np.argsort(morton_key_cells(ix, iy))
        msteps = (np.abs(np.diff(ix[morder])) + np.abs(np.diff(iy[morder])))
        assert msteps.sum() > steps.sum()

    def test_ranges_cover_exactly(self):
        """hilbert_ranges at unlimited budget covers EXACTLY the keys
        of cells intersecting the bbox."""
        from ocgis_ray import grid
        from ocgis_ray.stages.reorder import hilbert_key_cells, hilbert_ranges

        rng = np.random.RandomState(7)
        res = 4
        side = 1 << res
        ix, iy = np.meshgrid(np.arange(side), np.arange(side))
        ix, iy = ix.ravel(), iy.ravel()
        keys = hilbert_key_cells(ix, iy, res + 1)
        for _ in range(10):
            x0, x1 = np.sort(rng.uniform(-180, 180, 2))
            y0, y1 = np.sort(rng.uniform(-90, 90, 2))
            qx0, qy0, qx1, qy1 = grid.bbox_index_rect(x0, y0, x1, y1, res)
            inside = ((ix >= qx0) & (ix <= qx1)
                      & (iy >= qy0) & (iy <= qy1))
            want = set(keys[inside])
            ranges = hilbert_ranges(x0, y0, x1, y1, res, max_ranges=10**9)
            got = {k for k in keys
                   if any(lo <= k <= hi for lo, hi in ranges)}
            assert got == want

    def test_spatial_reorder_hilbert(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from ocgis_ray.stages.reorder import hilbert_key, spatial_reorder

        rng = np.random.RandomState(3)
        df = pd.DataFrame({"lon": rng.uniform(-180, 180, 500),
                           "lat": rng.uniform(-90, 90, 500)})
        out = spatial_reorder(rd.from_pandas(df), order="hilbert", res=6,
                              key_col="hkey").to_pandas()
        assert (np.diff(out["hkey"]) >= 0).all()
        want = np.sort(hilbert_key(df["lon"].to_numpy(),
                                   df["lat"].to_numpy(), 6))
        assert list(out["hkey"]) == list(want)
