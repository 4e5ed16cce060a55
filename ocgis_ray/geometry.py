"""Vectorized geometry kernels (pure numpy — no GEOS in this container).

Replaces the reference's Shapely/GEOS layer: prepared-geometry
``intersects`` (``/root/reference/src/ocgis/variable/geom.py:154-186``),
``clip``/``intersection`` (``variable/geom.py:718-764``), nearest lookup
(``variable/geom.py:803-821``), and polygon->mesh rasterization
(``variable/geom.py:333-637``).  All predicates operate on float64
arrays of points against small driver-side polygon layers.

Convex polygons use a half-plane sign test whose arithmetic matches the
generated DuckDB oracle SQL operation-for-operation (see
``Polygon.convex_pip_sql``), so engine and oracle agree bit-for-bit
away from degenerate on-edge points.  Non-convex polygons fall back to
even-odd ray casting.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

EARTH_RADIUS_KM = 6371.0088


def _is_ccw(verts: np.ndarray) -> bool:
    x, y = verts[:, 0], verts[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) > 0.0


def _is_convex(verts: np.ndarray) -> bool:
    v = np.vstack([verts, verts[:2]])
    d = np.diff(v, axis=0)
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    return bool(np.all(cross >= 0) or np.all(cross <= 0))


@dataclass
class Polygon:
    """A single-ring polygon in lon/lat degrees.

    ``verts`` is (n, 2), open ring (no repeated last vertex), stored
    CCW.  The ``GeometryVariable`` analog for the build side of spatial
    joins — always a small, driver-resident object broadcast via
    ``ray.put``, never a Dataset row."""

    ugid: int
    name: str
    verts: np.ndarray
    convex: bool = field(init=False)
    bbox: tuple[float, float, float, float] = field(init=False)

    def __post_init__(self) -> None:
        v = np.asarray(self.verts, dtype=np.float64)
        if v.shape[0] >= 3 and np.allclose(v[0], v[-1]):
            v = v[:-1]
        if not _is_ccw(v):
            v = v[::-1].copy()
        self.verts = v
        self.convex = _is_convex(v)
        self.bbox = (
            float(v[:, 0].min()),
            float(v[:, 1].min()),
            float(v[:, 0].max()),
            float(v[:, 1].max()),
        )

    # -- predicates -------------------------------------------------

    def contains(
        self, px: np.ndarray, py: np.ndarray, keep_touches: bool = True
    ) -> np.ndarray:
        """Boolean mask: point in polygon.

        ``keep_touches`` mirrors the reference's touch-inclusion flag
        (``spatial/grid.py:627-631``): True keeps points on the
        boundary, False drops them.  Exact only for convex rings;
        ray-casting (non-convex) has the usual even-odd edge rules.
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if self.convex:
            return _contains_convex(self.verts, px, py, keep_touches)
        return _contains_raycast(self.verts, px, py)

    def convex_pip_sql(self, px_expr: str, py_expr: str) -> str:
        """DuckDB predicate equivalent to ``contains`` for convex rings.

        Generated from the same vertex array the engine tests against,
        with identical operation order, so floor/sign decisions match
        numpy exactly."""
        if not self.convex:
            raise ValueError(f"polygon {self.name} is not convex")
        terms = []
        v = self.verts
        n = v.shape[0]
        for i in range(n):
            x0, y0 = repr(v[i, 0]), repr(v[i, 1])
            x1, y1 = repr(v[(i + 1) % n, 0]), repr(v[(i + 1) % n, 1])
            terms.append(
                f"(({x1} - {x0}) * (({py_expr}) - {y0}) - "
                f"({y1} - {y0}) * (({px_expr}) - {x0})) >= 0.0"
            )
        return "(" + " AND ".join(terms) + ")"

    # -- measures ---------------------------------------------------

    def area(self) -> float:
        """Planar shoelace area in square degrees (the reference's
        area weights are planar too, ``variable/geom.py:229-321``)."""
        return shoelace_area(self.verts)

    def clip_area_rect(self, x0: float, y0: float, x1: float, y1: float) -> float:
        """Area of ``self`` intersected with an axis-aligned rect
        (e.g. a grid cell) via Sutherland-Hodgman clipping."""
        clipped = clip_poly_rect(self.verts, x0, y0, x1, y1)
        if clipped is None or clipped.shape[0] < 3:
            return 0.0
        return shoelace_area(clipped)


def _contains_convex(
    verts: np.ndarray, px: np.ndarray, py: np.ndarray, keep_touches: bool
) -> np.ndarray:
    ok = np.ones(px.shape, dtype=bool)
    n = verts.shape[0]
    for i in range(n):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % n]
        cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        ok &= (cross >= 0.0) if keep_touches else (cross > 0.0)
    return ok


def _contains_raycast(verts: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Even-odd rule, vectorized over points x edges."""
    inside = np.zeros(px.shape, dtype=bool)
    n = verts.shape[0]
    for i in range(n):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % n]
        crosses = (y0 > py) != (y1 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
        inside ^= crosses & (px < xint)
    return inside


def shoelace_area(verts: np.ndarray) -> float:
    x, y = verts[:, 0], verts[:, 1]
    return float(abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) * 0.5)


def clip_poly_rect(
    verts: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> np.ndarray | None:
    """Sutherland-Hodgman: clip polygon ring by an axis-aligned rect.

    The ``geom.intersection(subset)`` analog (``variable/geom.py:
    718-764``) for the cell-clip case the tiling service needs."""
    poly = [tuple(p) for p in np.asarray(verts, dtype=np.float64)]

    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, prv = pts[i], pts[i - 1]
            cin, pin = inside(cur), inside(prv)
            if cin:
                if not pin:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prv, cur))
        return out

    def ix_at_x(p, q, x):
        t = (x - p[0]) / (q[0] - p[0])
        return (x, p[1] + t * (q[1] - p[1]))

    def ix_at_y(p, q, y):
        t = (y - p[1]) / (q[1] - p[1])
        return (p[0] + t * (q[0] - p[0]), y)

    poly = clip_edge(poly, lambda p: p[0] >= x0, lambda p, q: ix_at_x(p, q, x0))
    if not poly:
        return None
    poly = clip_edge(poly, lambda p: p[0] <= x1, lambda p, q: ix_at_x(p, q, x1))
    if not poly:
        return None
    poly = clip_edge(poly, lambda p: p[1] >= y0, lambda p, q: ix_at_y(p, q, y0))
    if not poly:
        return None
    poly = clip_edge(poly, lambda p: p[1] <= y1, lambda p, q: ix_at_y(p, q, y1))
    if not poly:
        return None
    return np.asarray(poly, dtype=np.float64)


def rect_clip_area_sqlparity(
    rx0: np.ndarray,
    ry0: np.ndarray,
    rx1: np.ndarray,
    ry1: np.ndarray,
    qx0: float,
    qy0: float,
    qx1: float,
    qy1: float,
) -> np.ndarray:
    """Rect-x-rect intersection area with the exact op order of the SQL
    ``greatest(0, least(..)-greatest(..)) * greatest(0, ...)`` oracle
    expression, for bit-identical float results."""
    w = np.maximum(0.0, np.minimum(rx1, qx1) - np.maximum(rx0, qx0))
    h = np.maximum(0.0, np.minimum(ry1, qy1) - np.maximum(ry0, qy0))
    return w * h


def haversine_km(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in km (vectorized, broadcastable)."""
    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = rl2 - rl1
    dlon = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def buffer_bbox(
    bbox: tuple[float, float, float, float], dist_deg: float
) -> tuple[float, float, float, float]:
    """Buffered bounding box — the selection-geometry buffer analog
    (``variable/geom.py:646-677``, ``ops/engine.py:515-531``) used for
    radius searches and chunk pairing."""
    x0, y0, x1, y1 = bbox
    return (x0 - dist_deg, y0 - dist_deg, x1 + dist_deg, y1 + dist_deg)
