"""ocgis_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing
capabilities of NCPP/ocgis (OpenClimateGIS, reference at
/root/reference), re-expressed over Ray Data pipelines:

- tables of Common-Crawl-style web pages (url, warc_ts, html, text,
  lang) instead of masked n-d arrays,
- a hierarchical lon/lat quadgrid cell index (``ocgis_ray.grid``)
  instead of structured CF grids (the H3/S2 analog mandated by the
  north star; no external geo libraries are available, so the cell
  scheme and all geometry kernels are pure numpy),
- broadcast polygon layers + two-stage (cell-prefilter, exact
  point-in-polygon) probes instead of rtree + prepared geometries
  (reference: spatial/index.py, spatial/grid.py:555-724),
- ``groupby``/``map_batches`` rollups instead of the 5-D conformed
  calculation engine (reference: calc/engine.py).

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

from ocgis_ray import geometry, grid  # noqa: F401


def __getattr__(name):
    # lazy top-level API (avoids importing ray at package import time)
    if name == "OcgRayOperations":
        from ocgis_ray.pipelines.ops import OcgRayOperations

        return OcgRayOperations
    raise AttributeError(name)
