"""PolygonCabinet — named selection-geometry layers.

The analog of the reference's ``GeomCabinet`` shapefile library
(``/root/reference/src/ocgis/spatial/geom_cabinet.py:98-110``): a small
registry of named polygon layers with stable ``ugid`` keys, loaded
driver-side and broadcast to probe actors via ``ray.put`` — never a
Dataset.  Layers here stand in for the reference's US-state boundaries
fixture (``test/bin/shp/state_boundaries``): a handful of rectangles /
convex polygons placed to exercise hot-city skew, background sprinkle,
multi-polygon overlap, and an empty selection (the ``allow_empty``
case, ``ops/parms/definition.py:57``).

Convex layers generate their own exact DuckDB point-in-polygon SQL
(see ``Polygon.convex_pip_sql``) so the spatial joins are
oracle-checkable; the non-convex and antimeridian layers are covered by
pytest fixtures instead.
"""

from __future__ import annotations

import numpy as np

from ocgis_ray.geometry import Polygon


def _rect(ugid: int, name: str, x0: float, y0: float, x1: float, y1: float) -> Polygon:
    return Polygon(ugid, name, np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]))


def _world_regions() -> list[Polygon]:
    """The canonical oracle-checked layer: all convex, overlapping on
    purpose (ugid 9 contains ugid 1's area -> inner-join multi-match),
    with one certainly-empty selection (ugid 8)."""
    return [
        _rect(1, "bay_area", -123.0, 37.0, -121.5, 38.5),
        _rect(2, "nyc", -75.0, 40.0, -73.0, 41.5),
        _rect(3, "london", -1.0, 51.0, 1.0, 52.2),
        Polygon(4, "tokyo_diamond",
                np.array([[139.7, 34.7], [141.0, 35.7], [139.7, 36.7], [138.4, 35.7]])),
        _rect(5, "sydney", 150.0, -35.0, 152.5, -33.0),
        _rect(6, "atlantic_band", -60.0, -20.0, -20.0, 20.0),
        Polygon(7, "central_asia_tri",
                np.array([[60.0, 30.0], [100.0, 30.0], [80.0, 55.0]])),
        _rect(8, "pacific_empty", -170.0, -60.0, -160.0, -50.0),
        _rect(9, "bay_wide", -130.0, 30.0, -115.0, 45.0),
    ]


def _quadrants() -> list[Polygon]:
    """Port of the reference's analytic 4x4 quadrant fixture
    (``test/test_simple/make_test_data.py:35-120``: 1-degree cells at
    origin (-105, 40), quadrant values [[1,1,2,2],[1,1,2,2],[3,3,4,4],
    [3,3,4,4]]) re-expressed as four 2x2-degree selection rectangles."""
    x0, y0 = -105.5, 37.5  # grid outer corner (cell centers -105..-102, 38..41)
    return [
        _rect(1, "q_nw", x0, y0 + 2.0, x0 + 2.0, y0 + 4.0),
        _rect(2, "q_ne", x0 + 2.0, y0 + 2.0, x0 + 4.0, y0 + 4.0),
        _rect(3, "q_sw", x0, y0, x0 + 2.0, y0 + 2.0),
        _rect(4, "q_se", x0 + 2.0, y0, x0 + 4.0, y0 + 2.0),
    ]


def _hard_cases() -> list[Polygon]:
    """pytest-only layer: non-convex ring + a RAW antimeridian-crossing
    ring (auto-split at construction into canonical parts — the
    reference's wrap/unwrap subsystem, ``spatial/wrap.py:38-304``;
    see ``geometry._unwrap_ring`` / ``Polygon._split_canonical``)."""
    lshape = Polygon(
        101, "lshape",
        np.array([[10.0, 10.0], [20.0, 10.0], [20.0, 14.0], [14.0, 14.0],
                  [14.0, 20.0], [10.0, 20.0]]),
    )
    fiji = Polygon(
        102, "fiji",
        np.array([[175.0, -20.0], [-177.0, -20.0], [-177.0, -15.0],
                  [175.0, -15.0]]),
    )
    return [lshape, fiji]


def _nonconvex_holes() -> list[Polygon]:
    """Oracle-checkable layer of NON-CONVEX polygons with interior
    rings, placed over hot-city regions so joins are non-trivial.
    Edge coordinates are deliberately non-round so no synthetic page
    lands exactly on a boundary (the generated even-odd SQL matches
    the raycast kernel bit-for-bit only off-boundary)."""
    # the bay hot box is lon [-122.5, -122.3] x lat [37.7, 37.9]; the
    # notch/hole straddle PART of it so the join splits the cluster
    u_shape = Polygon(
        201, "bay_u",
        np.array([[-123.07, 36.91], [-121.43, 36.91], [-121.43, 38.61],
                  [-121.87, 38.61], [-121.87, 37.79], [-122.41, 37.79],
                  [-122.41, 38.61], [-123.07, 38.61]]),
    )
    donut = Polygon(
        202, "nyc_donut",
        np.array([[-75.13, 39.87], [-72.89, 39.87], [-72.89, 41.63],
                  [-75.13, 41.63]]),
        holes=[np.array([[-74.03, 40.63], [-73.57, 40.63], [-73.57, 41.08],
                         [-74.03, 41.08]])],
    )
    arrow = Polygon(
        203, "london_arrow",
        np.array([[-1.07, 50.91], [1.09, 50.91], [0.13, 51.57],
                  [1.09, 52.23], [-1.07, 52.23]]),
    )
    return [u_shape, donut, arrow]


def _us_states48() -> list[Polygon]:
    """A 48-polygon CONUS-style layer (8x6 grid of rectangles over
    (-125..-67, 25..49)) — the state_boundaries-scale fixture proving
    the probe's cost is driven by candidates present, not layer size."""
    polys = []
    x0, x1 = -125.0, -67.0
    y0, y1 = 25.0, 49.0
    nx, ny = 8, 6
    dx = (x1 - x0) / nx
    dy = (y1 - y0) / ny
    ugid = 0
    for j in range(ny):
        for i in range(nx):
            ugid += 1
            polys.append(
                _rect(ugid, f"state_{ugid:02d}",
                      x0 + i * dx, y0 + j * dy, x0 + (i + 1) * dx, y0 + (j + 1) * dy)
            )
    return polys


#: the reference's REAL GeomCabinet fixture (51 states, 134 parts,
#: mostly non-convex) — read with the pure-stdlib shapefile loader
REFERENCE_STATES_SHP = ("/root/reference/src/ocgis/test/bin/shp/"
                        "state_boundaries/state_boundaries.shp")
_STATES_CACHE: list | None = None


def _state_boundaries() -> list[Polygon]:
    """Load (once per process) the reference's state_boundaries
    shapefile — the fixture its own GeomCabinet tests select from
    (``test/test_ocgis/test_util/test_shp_cabinet.py``)."""
    global _STATES_CACHE
    if _STATES_CACHE is None:
        import os

        if not os.path.exists(REFERENCE_STATES_SHP):
            raise FileNotFoundError(
                f"reference fixture not present: {REFERENCE_STATES_SHP}")
        from ocgis_ray.sources.geojson import load_shapefile

        _STATES_CACHE = load_shapefile(REFERENCE_STATES_SHP)
    return _STATES_CACHE


_LAYERS = {
    "world_regions": _world_regions,
    "quadrants": _quadrants,
    "hard_cases": _hard_cases,
    "nonconvex_holes": _nonconvex_holes,
    "us_states48": _us_states48,
    "state_boundaries": _state_boundaries,
}


def layer(name: str) -> list[Polygon]:
    """Load a named polygon layer (the ``GeomCabinetIterator`` analog).

    Multiple entries may share a ugid (split multipart geometries, e.g.
    antimeridian halves) — joins treat them as one logical selection.
    """
    try:
        return _LAYERS[name]()
    except KeyError:
        raise KeyError(f"unknown layer {name!r}; have {sorted(_LAYERS)}") from None


def layer_names() -> list[str]:
    return sorted(_LAYERS)


def register_layer(name: str, factory) -> None:
    """User-extension seam (the converter/driver-registry analog,
    ``conv/base.py:263-291``)."""
    _LAYERS[name] = factory


def dissolve(polys: list[Polygon], ugid: int, name: str | None = None) -> list[Polygon]:
    """Merge selection geometries into ONE logical selection — the
    ``cascaded_union`` / aggregate-geometry analog
    (``/root/reference/src/ocgis/variable/geom.py:941``).

    The engine never needs a geometric union for joins: a point is in
    the union iff it is in ANY part, and ``SpatialJoinIndex`` already
    merges same-ugid parts (full-cell wins, coverings concatenate), so
    dissolve is a relabeling.  Exact union AREA (weights/reporting)
    is ``geometry.union_area``."""
    name = name or f"dissolved_{ugid}"
    out = []
    for i, p in enumerate(polys):
        # p.verts is post-unwrap (an antimeridian ring holds continuous
        # lons like 175..183 with no >180 jump) — re-wrap into the
        # canonical window so the rebuilt Polygon re-detects crossing
        # and re-splits; a non-crossing ring is unchanged by the wrap
        v = p.verts.copy()
        v[:, 0] = ((v[:, 0] + 180.0) % 360.0) - 180.0
        out.append(Polygon(ugid, f"{name}/{i}", v, holes=list(p.holes)))
    return out


def dissolve_geometry(polys: list[Polygon], ugid: int,
                      name: str | None = None) -> list[Polygon]:
    """TRUE geometric union as a layer: the exact disjoint face
    decomposition of the union (``geometry.union_faces``) relabeled as
    multipart members of one ugid.  Unlike :func:`dissolve` (a pure
    relabeling, where overlapping members would double-count in
    weights), the faces are disjoint — membership, covering cells and
    clip areas all behave as the single unioned geometry."""
    from ocgis_ray.geometry import union_faces

    name = name or f"dissolved_{ugid}"
    return [Polygon(ugid, f"{name}/face{i}", f)
            for i, f in enumerate(union_faces(polys))]
