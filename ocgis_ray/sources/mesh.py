"""Unstructured-mesh source — the UGRID / SCRIP / ESMF-unstructured
driver analog over parquet tables.

The reference reads unstructured meshes from NetCDF conventions
(``driver/nc_ugrid.py`` — ``face_node_connectivity`` +
``start_index``; ``driver/nc_scrip.py``; ``driver/nc_esmf_unstruct.py``)
into ``GeometryCoordinates`` objects (``spatial/geomc.py``) whose
elements become polygons.  Here the same mesh is two parquet tables —
the north rule retires NetCDF in favor of columnar storage:

* ``nodes``:  ``node_id`` int64, ``lon`` double, ``lat`` double
* ``faces``:  ``face_id`` int64, ``node_ids`` list<int64>
  (counter-clockwise ring of node ids, UGRID
  ``face_node_connectivity`` row; ``start_index`` 0 or 1 supported
  exactly as the UGRID attribute is)

``mesh_polygons`` materializes the faces as :class:`Polygon` objects
(driver-resident, broadcast via ``ray.put`` like every cabinet layer),
so the entire existing spatial machinery — ``spatial_join``, covering,
area-weighted aggregation, dissolve, vector writers — works on
unstructured meshes unchanged.

Scale note (100 TB): a planetary mesh has millions of faces and must
NOT be a driver-resident list.  The scale path is the same one the
reference's ``GridChunker`` takes for big grids: keep ``faces`` as a
Dataset, ``flat_map`` each face row through ``cover.cover_polygon`` to
a (face_id, cell, full) covering table, and run joins against the
covering with ``io.join_datasets`` — no driver materialization.
``mesh_covering`` below implements exactly that.  The driver-resident
list is for selection geometries (the cabinet role: dozens to
thousands of faces), matching the reference split between selection
shapefiles and regrid meshes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ocgis_ray.geometry import Polygon


def synth_tri_mesh(x0: float, y0: float, nx: int, ny: int, cell: float,
                   start_index: int = 0):
    """Deterministic triangulated quad grid (two CCW triangles per
    square), the test/bench fixture generator — analog of the
    reference's ``fixture_element_dimension``-style synthetic UGRID
    fixtures (``driver/nc_ugrid.py`` tests).

    Returns ``(nodes_df, faces_df)`` pandas frames in the mesh schema.
    """
    xs = x0 + cell * np.arange(nx + 1)
    ys = y0 + cell * np.arange(ny + 1)
    lon, lat = np.meshgrid(xs, ys)  # (ny+1, nx+1), row-major
    # node ids are 0-based; ``start_index`` offsets the CONNECTIVITY
    # only — exactly the UGRID attribute's meaning
    nodes = pd.DataFrame({
        "node_id": np.arange(lon.size, dtype=np.int64),
        "lon": lon.ravel(),
        "lat": lat.ravel(),
    })

    def nid(iy, ix):
        return iy * (nx + 1) + ix + start_index

    face_ids, rings = [], []
    fid = 0
    for iy in range(ny):
        for ix in range(nx):
            # lower-left triangle then upper-right, both CCW
            rings.append([nid(iy, ix), nid(iy, ix + 1), nid(iy + 1, ix)])
            face_ids.append(fid)
            fid += 1
            rings.append([nid(iy, ix + 1), nid(iy + 1, ix + 1), nid(iy + 1, ix)])
            face_ids.append(fid)
            fid += 1
    faces = pd.DataFrame({
        "face_id": np.asarray(face_ids, dtype=np.int64),
        "node_ids": [np.asarray(r, dtype=np.int64) for r in rings],
    })
    return nodes, faces


def mesh_polygons(nodes, faces, start_index: int = 0,
                  name_prefix: str = "face") -> list[Polygon]:
    """Mesh tables -> driver-resident :class:`Polygon` list.

    ``nodes``/``faces`` are pandas frames or parquet paths.  ``ugid``
    is the ``face_id`` (stable across runs — resume-safe).
    ``start_index`` is subtracted from the connectivity before the
    ``node_id`` match (the UGRID attribute: connectivity offset over a
    0-based node set).  Node lookup is a vectorized sorted-id gather,
    not a per-face dict probe; degenerate faces (< 3 distinct nodes)
    and dangling node references raise, mirroring the reference's
    refusal to build invalid elements (``spatial/geomc.py`` polygon
    construction).
    """
    if isinstance(nodes, str):
        nodes = pd.read_parquet(nodes)
    if isinstance(faces, str):
        faces = pd.read_parquet(faces)
    node_id = nodes["node_id"].to_numpy(np.int64)
    lon = nodes["lon"].to_numpy(np.float64)
    lat = nodes["lat"].to_numpy(np.float64)
    # skip the sort when ids arrive sorted (the mesh_covering path
    # pre-sorts ONCE on the driver so per-batch work is pure gathers)
    if not np.all(node_id[1:] >= node_id[:-1]):
        order = np.argsort(node_id, kind="stable")
        node_id, lon, lat = node_id[order], lon[order], lat[order]
    sorted_ids = node_id

    polys = []
    for fid, ring in zip(faces["face_id"].to_numpy(np.int64),
                         faces["node_ids"]):
        ids = np.asarray(ring, dtype=np.int64) - np.int64(start_index)
        pos = np.searchsorted(sorted_ids, ids)
        if pos.max(initial=-1) >= sorted_ids.size or \
                not np.array_equal(sorted_ids[pos], ids):
            raise ValueError(f"face {fid} references unknown node ids")
        verts = np.column_stack([lon[pos], lat[pos]])
        # Polygon.__post_init__ drops an explicitly closed ring's
        # repeat vertex itself; np.unique below already ignores it
        if np.unique(verts, axis=0).shape[0] < 3:
            raise ValueError(f"face {fid} is degenerate (<3 distinct nodes)")
        polys.append(Polygon(int(fid), f"{name_prefix}_{int(fid)}", verts))
    return polys


def register_mesh_layer(layer_name: str, nodes, faces,
                        start_index: int = 0) -> None:
    """Expose a mesh as a named cabinet layer (lazy factory), so
    ``spatial_join(ds, layer(layer_name))`` etc. work verbatim."""
    from ocgis_ray.sources.cabinet import register_layer

    register_layer(
        layer_name,
        lambda: mesh_polygons(nodes, faces, start_index=start_index),
    )


def mesh_covering(faces_ds, nodes, res: int, start_index: int = 0):
    """The scale path: faces as a **Dataset** -> (face_id, cell, full)
    covering rows via ``flat_map``-style batch expansion, nodes
    broadcast once (``ray.put``) — never a driver-side polygon list.

    Output joins against any geocoded table on ``cell`` with
    ``io.join_datasets`` exactly like the cabinet coverings do.
    """
    import ray

    from ocgis_ray.cover import cover_polygon

    if isinstance(nodes, str):
        nodes = pd.read_parquet(nodes)
    # sort ONCE on the driver: every expand batch then skips the
    # O(N log N) argsort and gathers through searchsorted directly
    node_ref = ray.put(nodes[["node_id", "lon", "lat"]]
                       .sort_values("node_id", kind="stable")
                       .reset_index(drop=True))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        nd = ray.get(node_ref)
        polys = mesh_polygons(nd, df, start_index=start_index)
        out_fid, out_cell, out_full = [], [], []
        for p in polys:
            cov = cover_polygon(p, res)
            out_fid.append(np.full(cov.cells.size, p.ugid, dtype=np.int64))
            out_cell.append(cov.cells)
            # cells is concat(full, boundary); mark which are full
            out_full.append(np.concatenate([
                np.ones(cov.full.size, dtype=bool),
                np.zeros(cov.boundary.size, dtype=bool)]))
        if not out_fid:
            return pd.DataFrame({"face_id": pd.Series(dtype=np.int64),
                                 "cell": pd.Series(dtype=np.int64),
                                 "full": pd.Series(dtype=bool)})
        return pd.DataFrame({"face_id": np.concatenate(out_fid),
                             "cell": np.concatenate(out_cell),
                             "full": np.concatenate(out_full)})

    return faces_ds.map_batches(expand, batch_format="pandas")
