"""Polygon -> cell covering (the engine's canonical rasterization).

Replaces the reference's vector->mesh conversion
(``/root/reference/src/ocgis/variable/geom.py:333-637``) and the
two-stage hint-mask / exact-predicate split of its spatial subset
(``spatial/grid.py:635-705``): a polygon's covering is split into

- ``full`` cells: entirely inside the polygon — pages in these cells
  join WITHOUT any exact geometry test (the fast path), and
- ``boundary`` cells: partially covered — pages there go through the
  exact point-in-polygon kernel.

Coverings are computed once, driver-side, per (small) polygon layer and
broadcast via ``ray.put``; they are never Dataset rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ocgis_ray import grid
from ocgis_ray.geometry import Polygon


@dataclass
class Covering:
    ugid: int
    res: int
    full: np.ndarray      # int64 cell ids fully inside
    boundary: np.ndarray  # int64 cell ids partially covered
    #: clipped area (sq deg) per boundary cell, aligned with ``boundary``
    boundary_clip_area: np.ndarray

    @property
    def cells(self) -> np.ndarray:
        return np.concatenate([self.full, self.boundary])


def cover_polygon(poly: Polygon, res: int) -> Covering:
    """Classify every candidate cell of ``poly``'s bbox as full /
    boundary / outside using exact Sutherland-Hodgman clip areas.

    A cell whose clipped area equals the cell area (within 1e-9
    relative) is full; misclassifying a full cell as boundary is safe
    (it only adds exact point tests), the reverse is not.

    Antimeridian-crossing polygons cover via their canonical split
    parts (``Polygon.parts``); clip areas sum across parts and
    subtract holes (``Polygon.clip_area_rect``), so a raw +-180-
    crossing ring needs no caller-side pre-splitting.
    """
    cells = np.unique(np.concatenate(
        [grid.cells_in_bbox(*p.bbox, res) for p in poly.parts]
    ))
    cell_area = grid.cell_size(res) ** 2
    full, bnd, bnd_area = [], [], []
    for c in cells.tolist():
        x0, y0, x1, y1 = (float(v[0]) for v in grid.bounds(np.asarray([c]), res))
        a = poly.clip_area_rect(x0, y0, x1, y1)
        if a <= 0.0:
            continue
        if a >= cell_area * (1.0 - 1e-9):
            full.append(c)
        else:
            bnd.append(c)
            bnd_area.append(a)
    return Covering(
        ugid=poly.ugid,
        res=res,
        full=np.asarray(full, dtype=np.int64),
        boundary=np.asarray(bnd, dtype=np.int64),
        boundary_clip_area=np.asarray(bnd_area, dtype=np.float64),
    )


def build_cell_index(
    polys: list[Polygon], res: int
) -> tuple[dict[int, list[int]], dict[int, list[int]], dict[int, Covering]]:
    """Invert coverings into cell -> candidate-polygon lookups.

    Returns ``(full_map, boundary_map, coverings)`` where ``full_map``
    maps a cell id to ugids that fully contain it and ``boundary_map``
    to ugids needing an exact test.  This is the broadcast "R-tree"
    of the new engine (reference: ``spatial/index.py:5-87``).
    """
    full_map: dict[int, list[int]] = {}
    boundary_map: dict[int, list[int]] = {}
    coverings: dict[int, Covering] = {}
    for p in polys:
        cov = cover_polygon(p, res)
        coverings[p.ugid] = cov
        for c in cov.full.tolist():
            full_map.setdefault(c, []).append(p.ugid)
        for c in cov.boundary.tolist():
            boundary_map.setdefault(c, []).append(p.ugid)
    return full_map, boundary_map, coverings
