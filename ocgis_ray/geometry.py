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


def _dlit(v: float) -> str:
    """Float literal for generated SQL, forced to DOUBLE — DuckDB
    types bare decimal literals as DECIMAL, whose exact arithmetic
    diverges from (and at full precision overflows on) the engine's
    float64 ops."""
    return f"CAST({float(v)!r} AS DOUBLE)"


def _is_ccw(verts: np.ndarray) -> bool:
    x, y = verts[:, 0], verts[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) > 0.0


def _is_convex(verts: np.ndarray) -> bool:
    v = np.vstack([verts, verts[:2]])
    d = np.diff(v, axis=0)
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    return bool(np.all(cross >= 0) or np.all(cross <= 0))


def _unwrap_ring(v: np.ndarray) -> tuple[np.ndarray, bool]:
    """Make ring longitudes continuous (no >180-degree jumps between
    consecutive vertices).  Returns (unwrapped verts, crossed) — the
    analog of the reference's wrap/unwrap subsystem
    (``/root/reference/src/ocgis/spatial/wrap.py:38-304``)."""
    lon = v[:, 0].copy()
    d = np.diff(lon)
    corr = np.zeros(len(lon))
    corr[1:] = np.cumsum(np.where(d > 180.0, -360.0, np.where(d < -180.0, 360.0, 0.0)))
    out = v.copy()
    out[:, 0] = lon + corr
    # closure check: after unwrapping, the last->first edge must also
    # take the short way.  A residual >180 closure jump means the ring
    # has NET winding around the globe (a pole-encircling cap) — a
    # different topology this planar representation cannot express;
    # refuse loudly rather than produce a silently wrong 340-degree
    # planar ring.
    if abs(out[-1, 0] - out[0, 0]) > 180.0:
        raise NotImplementedError(
            "ring winds around the globe (pole-encircling cap); "
            "split it at a meridian before constructing the Polygon"
        )
    if not corr.any():
        return v, False
    return out, True


@dataclass
class Polygon:
    """A polygon in lon/lat degrees: one outer ring plus optional
    interior rings (holes — ``variable/geom.py:333-637`` handles these
    during polygon->mesh conversion in the reference).

    ``verts`` is (n, 2), open ring (no repeated last vertex), stored
    CCW.  ``holes`` is a list of open rings.  A ring crossing the
    antimeridian (consecutive lon jump > 180) is detected at
    construction, unwrapped to continuous lons, and split into
    canonical [-180, 180] parts that every predicate/measure delegates
    to — callers never pre-split.  The ``GeometryVariable`` analog for
    the build side of spatial joins — always a small, driver-resident
    object broadcast via ``ray.put``, never a Dataset row."""

    ugid: int
    name: str
    verts: np.ndarray
    holes: list = field(default_factory=list)
    convex: bool = field(init=False)
    bbox: tuple[float, float, float, float] = field(init=False)
    crosses_am: bool = field(init=False)

    def __post_init__(self) -> None:
        v = np.asarray(self.verts, dtype=np.float64)
        if v.shape[0] >= 3 and np.allclose(v[0], v[-1]):
            v = v[:-1]
        v, self.crosses_am = _unwrap_ring(v)
        if not _is_ccw(v):
            v = v[::-1].copy()
        self.verts = v
        hs = []
        for h in self.holes:
            h = np.asarray(h, dtype=np.float64)
            if h.shape[0] >= 3 and np.allclose(h[0], h[-1]):
                h = h[:-1]
            hs.append(h)
        self.holes = hs
        self.convex = _is_convex(v) and not self.holes and not self.crosses_am
        self.bbox = (
            float(v[:, 0].min()),
            float(v[:, 1].min()),
            float(v[:, 0].max()),
            float(v[:, 1].max()),
        )
        # eager antimeridian split into canonical-window parts (the
        # parts are non-crossing, so no recursion)
        self._parts: list[Polygon] = []
        if self.crosses_am:
            self._parts = self._split_canonical()

    def _split_canonical(self) -> "list[Polygon]":
        """Clip the unwrapped ring against the canonical lon window and
        its +-360 neighbors; shift each piece back into [-180, 180]."""
        if self.holes:
            raise NotImplementedError(
                "antimeridian-crossing polygons with holes are not supported"
            )
        parts = []
        for shift in (-360.0, 0.0, 360.0):
            clipped = clip_poly_rect(
                self.verts, -180.0 + shift, -90.0, 180.0 + shift, 90.0
            )
            if clipped is not None and clipped.shape[0] >= 3 \
                    and shoelace_area(clipped) > 1e-12:
                part = clipped.copy()
                part[:, 0] -= shift
                parts.append(Polygon(self.ugid, f"{self.name}/am{int(shift)}", part))
        return parts

    @property
    def parts(self) -> "list[Polygon]":
        """Canonical-window parts (self if not antimeridian-crossing)."""
        return self._parts if self.crosses_am else [self]

    @property
    def rings(self) -> list:
        """All rings (outer + holes) — the even-odd edge set."""
        return [self.verts] + list(self.holes)

    # -- predicates -------------------------------------------------

    def contains(
        self, px: np.ndarray, py: np.ndarray, keep_touches: bool = True
    ) -> np.ndarray:
        """Boolean mask: point in polygon.

        ``keep_touches`` mirrors the reference's touch-inclusion flag
        (``spatial/grid.py:627-631``): True keeps points on the
        boundary (outer OR hole edges), False drops them.  Convex
        hole-free rings use the half-plane test (bit-identical to the
        generated oracle SQL); everything else uses even-odd ray
        casting over all rings with an explicit on-boundary test, so
        ``keep_touches`` is honored in BOTH paths.
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if self.crosses_am:
            # union of parts WITH touches, else the artificial +-180
            # cut line (each part's boundary, but the polygon's
            # interior) would wrongly exclude strictly interior
            # points; the TRUE boundary is then removed explicitly
            # against the unwrapped ring (+-360 lon aliases)
            out = np.zeros(px.shape, dtype=bool)
            for part in self._parts:
                out |= part.contains(px, py, keep_touches=True)
            if not keep_touches:
                onb = np.zeros(px.shape, dtype=bool)
                for shift in (-360.0, 0.0, 360.0):
                    onb |= _on_boundary(self.verts, px + shift, py)
                out &= ~onb
            return out
        if self.convex:
            return _contains_convex(self.verts, px, py, keep_touches)
        inside = np.zeros(px.shape, dtype=bool)
        onb = np.zeros(px.shape, dtype=bool)
        for ring in self.rings:
            inside ^= _contains_raycast(ring, px, py)
            onb |= _on_boundary(ring, px, py)
        return (inside | onb) if keep_touches else (inside & ~onb)

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
            # CAST AS DOUBLE: bare repr() literals parse as DECIMAL in
            # DuckDB — full-precision coords overflow DECIMAL(18) on
            # literal-literal subtraction, and DECIMAL-exact (x1-x0)
            # differs from the engine's float64 subtraction by 1 ulp
            x0, y0 = _dlit(v[i, 0]), _dlit(v[i, 1])
            x1, y1 = _dlit(v[(i + 1) % n, 0]), _dlit(v[(i + 1) % n, 1])
            terms.append(
                f"(({x1} - {x0}) * (({py_expr}) - {y0}) - "
                f"({y1} - {y0}) * (({px_expr}) - {x0})) >= 0.0"
            )
        return "(" + " AND ".join(terms) + ")"

    def evenodd_pip_sql(self, px_expr: str, py_expr: str,
                        keep_touches: bool = True) -> str:
        """DuckDB predicate equivalent to the even-odd ``contains``
        (non-convex rings and holes — hole edges join the same edge
        set, which is exactly how even-odd encodes interior rings).

        Generated from the same vertex arrays with identical operation
        order (``x0 + (py - y0) * (x1 - x0) / (y1 - y0)``), so float
        crossing decisions match numpy bit-for-bit away from
        on-boundary points.  Only ``keep_touches=True`` semantics are
        expressible this way (pure even-odd parity); requesting False
        raises instead of silently emitting the same SQL."""
        if not keep_touches:
            raise NotImplementedError(
                "evenodd_pip_sql cannot express keep_touches=False "
                "(the parity SQL has no boundary term)")
        terms = []
        for ring in ([self.verts] + list(self.holes)):
            n = ring.shape[0]
            for i in range(n):
                x0, y0 = _dlit(ring[i, 0]), _dlit(ring[i, 1])
                x1, y1 = _dlit(ring[(i + 1) % n, 0]), _dlit(ring[(i + 1) % n, 1])
                terms.append(
                    f"CASE WHEN (({y0} > ({py_expr})) != ({y1} > ({py_expr})))"
                    f" AND (({px_expr}) < {x0} + (({py_expr}) - {y0})"
                    f" * ({x1} - {x0}) / ({y1} - {y0})) THEN 1 ELSE 0 END"
                )
        # balanced-tree sum: a flat "t1 + t2 + ..." binds left-
        # associatively and blows DuckDB's 128-deep binder recursion on
        # real-fixture rings (state_boundaries' New York has 200+
        # edges); grouping 32 per level keeps depth ~32 + log32(n)
        while len(terms) > 1:
            terms = ["(" + " + ".join(terms[i:i + 32]) + ")"
                     for i in range(0, len(terms), 32)]
        return f"(({terms[0]}) % 2 = 1)"

    # -- measures ---------------------------------------------------

    def area(self) -> float:
        """Planar shoelace area in square degrees, holes subtracted
        (the reference's area weights are planar too,
        ``variable/geom.py:229-321``)."""
        a = sum(shoelace_area(p.verts) for p in self.parts)
        return a - sum(shoelace_area(h) for h in self.holes)

    def clip_area_rect(self, x0: float, y0: float, x1: float, y1: float) -> float:
        """Area of ``self`` intersected with an axis-aligned rect
        (e.g. a grid cell) via Sutherland-Hodgman clipping; hole
        overlap is subtracted (holes are convex-clipped the same way)."""
        a = 0.0
        for part in self.parts:
            clipped = clip_poly_rect(part.verts, x0, y0, x1, y1)
            if clipped is not None and clipped.shape[0] >= 3:
                a += shoelace_area(clipped)
        for h in self.holes:
            clipped = clip_poly_rect(h, x0, y0, x1, y1)
            if clipped is not None and clipped.shape[0] >= 3:
                a -= shoelace_area(clipped)
        return a


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


def _on_boundary(verts: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Boolean mask: point exactly on a ring edge (collinear and
    within the segment's bbox) — gives the raycast path the explicit
    touch test the convex half-plane path gets for free, so
    ``keep_touches`` has defined semantics on non-convex rings
    (reference rule: ``spatial/grid.py:627-631``)."""
    onb = np.zeros(px.shape, dtype=bool)
    n = verts.shape[0]
    for i in range(n):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % n]
        cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        inx = (px >= min(x0, x1)) & (px <= max(x0, x1))
        iny = (py >= min(y0, y1)) & (py <= max(y0, y1))
        onb |= (cross == 0.0) & inx & iny
    return onb


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


def clip_poly_convex(subject: np.ndarray, clip_verts: np.ndarray) -> np.ndarray | None:
    """Sutherland-Hodgman against an ARBITRARY convex clip ring (CCW)
    — generalizes :func:`clip_poly_rect` beyond axis-aligned rects
    (the ``geom.intersection`` analog for convex selection geometries,
    ``variable/geom.py:718-764``).  The subject may be non-convex."""
    cv = np.asarray(clip_verts, dtype=np.float64)
    if not _is_ccw(cv):
        cv = cv[::-1]
    poly = [tuple(pt) for pt in np.asarray(subject, dtype=np.float64)]
    n = cv.shape[0]
    for i in range(n):
        if not poly:
            return None
        x0, y0 = cv[i]
        x1, y1 = cv[(i + 1) % n]
        ex, ey = x1 - x0, y1 - y0

        def inside(pt):
            return ex * (pt[1] - y0) - ey * (pt[0] - x0) >= 0.0

        def intersect(p, q):
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            t = (ey * (p[0] - x0) - ex * (p[1] - y0)) / denom
            return (p[0] + t * dx, p[1] + t * dy)

        out = []
        m = len(poly)
        for j in range(m):
            cur, prv = poly[j], poly[j - 1]
            cin, pin = inside(cur), inside(prv)
            if cin:
                if not pin:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prv, cur))
        poly = out
    if len(poly) < 3:
        return None
    return np.asarray(poly, dtype=np.float64)


def intersection_area(a: "Polygon", b: "Polygon") -> float:
    """Area of ``a INTERSECT b`` where ``b`` is convex (hole-free):
    clip every part of ``a`` by ``b`` and subtract ``a``'s hole overlap
    (holes clipped by the same ring).  The convex-selection case is
    exactly what the reference's clip operation runs per selection
    geometry (``ops/engine.py:287-385``)."""
    if b.holes or not b.convex:
        # arbitrary simple polygons: triangulate b's rings and sum
        # convex clips (exact; see intersection_area_general)
        return intersection_area_general(a, b)
    area = 0.0
    for part in a.parts:
        c = clip_poly_convex(part.verts, b.verts)
        if c is not None:
            area += shoelace_area(c)
    for h in a.holes:
        c = clip_poly_convex(h, b.verts)
        if c is not None:
            area -= shoelace_area(c)
    return area


def union_area(polys: list) -> float:
    """Exact union area by inclusion-exclusion for up to 3 convex
    polygons, additive for disjoint inputs (the ``cascaded_union``
    measure analog, ``variable/geom.py:941``).

    NOTE on dissolve semantics: the engine never needs a geometric
    union for joins — "dissolved" selection geometries are multipart
    ``Polygon`` lists sharing a ugid, and point-in-union is point-in-
    any-part.  Union AREA is only needed for weights/reporting."""
    n = len(polys)
    total = sum(p.area() for p in polys)
    if n == 1:
        return total
    import itertools

    # bbox prefilter BEFORE any expensive exact intersection: pairs
    # whose boxes are disjoint cannot overlap.  Antimeridian-crossing
    # polygons keep unwrapped bboxes, so they stay candidates against
    # everything rather than risking a false 'disjoint'.
    def _bbox_hits(a: int, b: int) -> bool:
        if polys[a].crosses_am or polys[b].crosses_am:
            return True
        ba, bb = polys[a].bbox, polys[b].bbox
        return (ba[0] < bb[2] and bb[0] < ba[2]
                and ba[1] < bb[3] and bb[1] < ba[3])

    cand = [ab for ab in itertools.combinations(range(n), 2)
            if _bbox_hits(*ab)]
    involved = sorted({i for ab in cand for i in ab})
    if len(involved) > 3 or any(polys[i].holes for i in involved):
        # candidate-overlap set too entangled (or holes) for
        # inclusion-exclusion: dispatch straight to the exact sweep —
        # BEFORE paying the O(n^2) triangulated intersections
        return float(coverage_areas(polys).sum())
    pair_overlap = {}
    for a, b in cand:
        ia = intersection_area(polys[a], polys[b])
        if ia > 0.0:
            pair_overlap[(a, b)] = ia
        total -= ia
    overlapping = sorted({i for ab in pair_overlap for i in ab})
    for a, b, c in itertools.combinations(overlapping, 3):
        # triple term area(a ∩ b ∩ c): clip a's parts by every
        # (triangle of b) x (triangle of c) — exact for arbitrary
        # hole-free simple polygons
        for part in polys[a].parts:
            for bp in polys[b].parts:
                for tb in triangulate_ring(bp.verts):
                    ring = clip_poly_convex(part.verts, tb)
                    if ring is None:
                        continue
                    for cp in polys[c].parts:
                        for tc in triangulate_ring(cp.verts):
                            ring2 = clip_poly_convex(ring, tc)
                            if ring2 is not None:
                                total += shoelace_area(ring2)
    return total


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


def triangulate_ring(verts: np.ndarray) -> list[np.ndarray]:
    """Ear-clipping triangulation of a simple (possibly non-convex)
    ring -> list of (3, 2) triangles.  O(n^2) — build-side geometry
    only (selection layers are small); the piece that upgrades
    :func:`intersection_area` / :func:`union_area` from convex-only to
    ARBITRARY simple polygons (triangles are convex, so every pairwise
    term reduces to Sutherland-Hodgman against a convex clip)."""
    v = np.asarray(verts, dtype=np.float64)
    if v.shape[0] >= 3 and np.allclose(v[0], v[-1]):
        v = v[:-1]
    if not _is_ccw(v):
        v = v[::-1].copy()
    idx = list(range(v.shape[0]))
    tris: list[np.ndarray] = []
    guard = 0

    def find_ear(keep_touches: bool) -> int | None:
        n = len(idx)
        for i in range(n):
            a, b, c = idx[(i - 1) % n], idx[i], idx[(i + 1) % n]
            pa_, pb, pc = v[a], v[b], v[c]
            cross = (pb[0] - pa_[0]) * (pc[1] - pa_[1]) - \
                (pb[1] - pa_[1]) * (pc[0] - pa_[0])
            if cross <= 1e-15:  # reflex or degenerate corner
                continue
            tri = np.array([pa_, pb, pc])
            others = [j for j in idx if j not in (a, b, c)]
            if others:
                ox = v[others, 0]
                oy = v[others, 1]
                # keep_touches=True: a vertex ON the candidate ear's
                # boundary must REJECT the ear — accepting it produces
                # triangles that overlap later ones (found via a
                # sum-of-areas mismatch on an L-shape whose reflex
                # vertex was collinear with an ear edge)
                if _contains_convex(tri, ox, oy, keep_touches=keep_touches).any():
                    continue
            return i
        return None

    while len(idx) > 3 and guard < 10000:
        guard += 1
        i = find_ear(keep_touches=True)
        if i is None:
            # all strict ears blocked by boundary-touching vertices
            # (collinear chains): fall back to the lenient test
            i = find_ear(keep_touches=False)
        if i is None:
            # numerically stuck: drop the flattest corner
            i = min(range(len(idx)), key=lambda j: abs(
                (v[idx[j]][0] - v[idx[j - 1]][0]) * (v[idx[(j + 1) % len(idx)]][1] - v[idx[j - 1]][1])
                - (v[idx[j]][1] - v[idx[j - 1]][1]) * (v[idx[(j + 1) % len(idx)]][0] - v[idx[j - 1]][0])))
            idx.pop(i)
            continue
        n = len(idx)
        tris.append(np.array([v[idx[(i - 1) % n]], v[idx[i]], v[idx[(i + 1) % n]]]))
        idx.pop(i)
    if len(idx) == 3:
        tris.append(v[idx])
    total = sum(shoelace_area(t) for t in tris)
    ring_area = shoelace_area(v)
    if abs(total - ring_area) > 1e-9 * max(1.0, ring_area):
        raise ValueError(
            f"triangulation does not conserve area ({total} vs {ring_area}) — "
            "ring may be self-intersecting"
        )
    return tris


def intersection_area_general(a: "Polygon", b: "Polygon") -> float:
    """Area of ``a INTERSECT b`` for ARBITRARY simple polygons (holes
    and antimeridian parts on both sides): triangulate every ring of
    ``b`` and sum convex clips, with hole rings entering negatively on
    both sides (area is additive over the triangulation and
    inclusion-exclusion over rings)."""
    total = 0.0
    for bpart in b.parts:
        rings_b = [(bpart.verts, 1.0)] + [(h, -1.0) for h in bpart.holes]
        for ring_b, sign_b in rings_b:
            for tri in triangulate_ring(ring_b):
                for apart in a.parts:
                    c = clip_poly_convex(apart.verts, tri)
                    if c is not None:
                        total += sign_b * shoelace_area(c)
                    for h in apart.holes:
                        ch = clip_poly_convex(h, tri)
                        if ch is not None:
                            total -= sign_b * shoelace_area(ch)
    return total


def coverage_areas(polys: list) -> np.ndarray:
    """Exact area covered by exactly ``d`` of the given polygons for
    every depth ``d = 1..N`` — one vertical-strip sweep, arbitrary
    simple polygons with holes and antimeridian parts, any N.

    This is the measure side of the reference's ``cascaded_union``
    (``variable/geom.py:941``) and boolean-overlay family, done as a
    coverage sweep instead of topology surgery: x-breakpoints are all
    vertex x's plus all proper pairwise edge crossings, so inside a
    strip no two edges cross and the region between two y-adjacent
    edges is a trapezoid of constant coverage depth.  Holes need no
    special casing — a hole edge flips its polygon's even-odd parity
    exactly like an outer-ring edge.

    Returns ``areas`` with ``areas[d-1]`` = area covered by exactly
    ``d`` polygons; ``areas.sum()`` is the union area and
    ``areas[N-1]`` the common intersection.  Conservation invariant
    (asserted by tests): ``sum(d * areas[d-1]) == sum(p.area())``.

    Fully vectorized: bbox-prefiltered pairwise crossing tests, then
    ONE global lexsort over all (strip, edge) incidences with segmented
    cumsums — no per-strip Python loop.  Layers are small driver-side
    broadcast objects so this never runs on the per-batch hot path;
    the 51-state reference shapefile (13.6k vertices) sweeps in ~0.8 s.
    """
    n_polys = len(polys)
    sw = _coverage_sweep(polys)
    areas = np.zeros(max(n_polys, 1))
    if sw is None:
        return areas
    st, xa, xb, ya, yb, depth, _edge, _mask = sw
    gap = (ya[1:] - ya[:-1]) + (yb[1:] - yb[:-1])
    hit = (st[1:] == st[:-1]) & (depth[:-1] > 0) & (gap > 0.0)
    if hit.any():
        hw = 0.5 * (xb - xa)[:-1]
        np.add.at(areas, depth[:-1][hit] - 1, hw[hit] * gap[hit])
    return areas


def _coverage_sweep(polys: list):
    """Shared sweep core for :func:`coverage_areas` /
    :func:`boolean_faces`: returns ``(st, xa, xb, ya, yb, depth, edge,
    mask)`` — one row per (strip, active edge), sorted by (strip, y),
    where ``depth[j]`` is the coverage depth of the region between row
    j and row j+1 of the same strip, ``edge[j]`` the global edge id,
    and ``mask[j]`` the per-polygon membership bitmask of that region
    (``None`` beyond 63 polygons).  ``None`` when the layer has no
    area."""
    n_polys = len(polys)
    ex0, ey0, ex1, ey1, epid = [], [], [], [], []
    vxs = []
    for pid, p in enumerate(polys):
        for part in p.parts:
            for ring in part.rings:
                v = np.asarray(ring, dtype=np.float64)
                vxs.append(v[:, 0])
                w = np.roll(v, -1, axis=0)
                keep = v[:, 0] != w[:, 0]  # vertical edges: zero x-span
                a, b = v[keep], w[keep]
                swap = a[:, 0] > b[:, 0]
                lo = np.where(swap[:, None], b, a)
                hi = np.where(swap[:, None], a, b)
                ex0.append(lo[:, 0]); ey0.append(lo[:, 1])
                ex1.append(hi[:, 0]); ey1.append(hi[:, 1])
                epid.append(np.full(int(keep.sum()), pid, dtype=np.int64))
    if not ex0 or not sum(len(a) for a in ex0):
        return None
    sx0, sy0 = np.concatenate(ex0), np.concatenate(ey0)
    sx1, sy1 = np.concatenate(ex1), np.concatenate(ey1)
    spid = np.concatenate(epid)
    E = len(sx0)
    dx, dy = sx1 - sx0, sy1 - sy0
    slope = dy / dx

    # breakpoints: vertices + proper pairwise crossings.  Chunked
    # bbox-overlap prefilter, exact solve only on surviving pairs.
    xs_parts = [np.concatenate(vxs)]
    ymin, ymax = np.minimum(sy0, sy1), np.maximum(sy0, sy1)
    chunk = max(1, int(16e6) // E)
    for clo in range(0, E, chunk):
        chi = min(clo + chunk, E)
        cand = (
            (sx0[clo:chi, None] < sx1[None, :])
            & (sx1[clo:chi, None] > sx0[None, :])
            & (ymin[clo:chi, None] <= ymax[None, :])
            & (ymax[clo:chi, None] >= ymin[None, :])
        )
        ii, jj = np.nonzero(cand)
        gi = ii + clo
        up = jj > gi  # each unordered pair once
        gi, jj = gi[up], jj[up]
        if not len(gi):
            continue
        qx, qy = sx0[gi] - sx0[jj], sy0[gi] - sy0[jj]
        denom = dx[gi] * dy[jj] - dy[gi] * dx[jj]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (qx * dy[jj] - qy * dx[jj]) / -denom
            s = (qx * dy[gi] - qy * dx[gi]) / -denom
        ok = (denom != 0) & (t > 0) & (t < 1) & (s > 0) & (s < 1)
        if ok.any():
            xs_parts.append(sx0[gi][ok] + t[ok] * dx[gi][ok])
    xs = np.unique(np.concatenate(xs_parts))

    # incidence expansion: edge e is active in strips
    # [start_strip[e], end_strip[e]) — build all (strip, edge) rows
    start_strip = np.searchsorted(xs, sx0)
    end_strip = np.searchsorted(xs, sx1)  # exclusive
    counts = end_strip - start_strip
    T = int(counts.sum())
    if T == 0:
        return None
    edge = np.repeat(np.arange(E), counts)
    offs = np.arange(T) - np.repeat(np.cumsum(counts) - counts, counts)
    st = start_strip[edge] + offs
    xa, xb = xs[st], xs[st + 1]
    ya = sy0[edge] + slope[edge] * (xa - sx0[edge])
    yb = sy0[edge] + slope[edge] * (xb - sx0[edge])
    # sort rows by (strip, y at strip midpoint); no crossings inside a
    # strip so the order is a consistent bottom-up scan
    ords = np.lexsort((ya + yb, st))
    st, ya, yb = st[ords], ya[ords], yb[ords]
    pid = spid[edge[ords]]
    # depth between row j and j+1 = #polygons with odd crossing parity
    # after rows 0..j of the strip.  Each row toggles its polygon:
    # +1 on its 1st/3rd/... crossing, -1 on the 2nd/4th/... —
    # the occurrence index within the (strip, pid) group, y-ordered.
    combo = st * n_polys + pid
    bypid = np.argsort(combo, kind="stable")
    sc = combo[bypid]
    grp = np.r_[0, np.flatnonzero(np.diff(sc)) + 1]
    occ = np.empty(T, dtype=np.int64)
    occ[bypid] = np.arange(T) - np.repeat(grp, np.diff(np.r_[grp, T]))
    contrib = np.where(occ % 2 == 0, 1, -1)
    csum = np.cumsum(contrib)
    seg = np.r_[0, np.flatnonzero(np.diff(st)) + 1]  # strip starts
    base = np.repeat(csum[seg] - contrib[seg], np.diff(np.r_[seg, T]))
    depth = csum - base
    # per-gap membership bitmask (bit p set <=> inside polygon p):
    # segmented XOR-accumulate of 1<<pid — enables arbitrary boolean
    # overlays (difference/xor), not just depth counts
    mask = None
    if n_polys <= 63:
        bits = (np.uint64(1) << pid.astype(np.uint64))
        acc = np.bitwise_xor.accumulate(bits)
        prefix_before = acc[seg] ^ bits[seg]
        mask = acc ^ np.repeat(prefix_before, np.diff(np.r_[seg, T]))
    return st, xa[ords], xb[ords], ya, yb, depth, edge[ords], mask


def union_area_n(polys: list) -> float:
    """Exact union area for ANY collection of polygons (the general
    ``cascaded_union`` measure, ``variable/geom.py:941``) — see
    :func:`coverage_areas`.  Prefer :func:`union_area` which fast-paths
    disjoint and <=3-overlap cases with cheaper arithmetic."""
    return float(coverage_areas(polys).sum())


def intersection_area_n(polys: list) -> float:
    """Exact area of the common intersection of all N polygons."""
    return float(coverage_areas(polys)[len(polys) - 1])


def union_faces(polys: list) -> list[np.ndarray]:
    """The UNION of the polygons as geometry: a list of disjoint
    convex quad faces (CCW rings) exactly tiling the covered region —
    the geometry side of the reference's ``cascaded_union``
    (``variable/geom.py:941``), as a vertical decomposition instead of
    topology surgery.

    Within each strip the covered region is a set of y-intervals
    bounded by original polygon edges; faces bounded by the SAME
    (bottom edge, top edge) pair across consecutive strips merge into
    one trapezoid, so long straight boundaries stay single faces.
    Exactness: the faces' shoelace areas sum to ``union_area_n`` (no
    approximation anywhere), holes come out as the uncovered gaps
    between faces, and faces never overlap."""
    return boolean_faces(polys, lambda mask: mask != 0)


def boolean_faces(polys: list, pred) -> list[np.ndarray]:
    """General boolean overlay as geometry: faces tiling the region
    where ``pred(membership_bitmask)`` holds (bit p set <=> inside
    ``polys[p]``, even-odd incl. holes).  ``pred`` receives a uint64
    array and returns a boolean array — e.g. ``mask != 0`` (union),
    ``mask == (1 << N) - 1`` (intersection),
    ``((mask & 1) != 0) & ((mask & 2) == 0)`` (difference a - b —
    note the parentheses: ``&`` binds tighter than ``!=``), popcount
    odd (symmetric difference).  Same face merging/exactness as
    :func:`union_faces`.
    Supports up to 63 polygons (bitmask width)."""
    sw = _coverage_sweep(polys)
    if sw is None:
        return []
    st, xa, xb, ya, yb, depth, edge, mask = sw
    if mask is None:
        raise ValueError("boolean_faces supports at most 63 polygons")
    inside = np.asarray(pred(mask), dtype=bool)
    T = len(st)
    faces: list[np.ndarray] = []
    # open faces keyed by (bot_edge, top_edge): [x_start, ybot_start,
    # ytop_start, x_end, ybot_end, ytop_end, strip_of_end]
    open_faces: dict[tuple[int, int], list[float]] = {}
    j = 0
    while j < T:
        k = st[j]
        end = j
        while end < T and st[end] == k:
            end += 1
        # selected intervals of strip k: maximal runs of pred-true gaps
        nxt: dict[tuple[int, int], list[float]] = {}
        i = j
        while i < end - 1:
            if inside[i]:
                lo = i
                hi = i
                while hi < end - 1 and inside[hi]:
                    hi += 1
                key = (int(edge[lo]), int(edge[hi]))
                prev = open_faces.pop(key, None)
                if prev is not None and prev[6] == k - 1 \
                        and prev[3] == xa[lo]:
                    prev[3:7] = [xb[lo], yb[lo], yb[hi], k]
                    nxt[key] = prev
                else:
                    if prev is not None:
                        faces.append(_face_ring(prev))
                    nxt[key] = [xa[lo], ya[lo], ya[hi],
                                xb[lo], yb[lo], yb[hi], k]
                i = hi
            else:
                i += 1
        for f in open_faces.values():
            faces.append(_face_ring(f))
        open_faces = nxt
        j = end
    for f in open_faces.values():
        faces.append(_face_ring(f))
    return [f for f in faces if shoelace_area(f) > 0.0]


def _face_ring(f: list[float]) -> np.ndarray:
    """CCW quad from an open-face record (degenerate sides collapse)."""
    x0, yb0, yt0, x1, yb1, yt1 = f[:6]
    pts = [(x0, yb0), (x1, yb1), (x1, yt1), (x0, yt0)]
    out = []
    for p in pts:
        if not out or p != out[-1]:
            out.append(p)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    return np.asarray(out, dtype=np.float64)


def union_geometry_wkt(polys: list, digits: int = 10) -> str:
    """MULTIPOLYGON WKT of the exact union decomposition
    (:func:`union_faces`) — the dissolved-geometry output analog of
    the reference's converter writing unioned selection geometries."""
    parts = []
    for ring in union_faces(polys):
        pts = ", ".join(f"{x:.{digits}g} {y:.{digits}g}" for x, y in ring)
        first = f"{ring[0][0]:.{digits}g} {ring[0][1]:.{digits}g}"
        parts.append(f"(({pts}, {first}))")
    return "MULTIPOLYGON (" + ", ".join(parts) + ")" if parts \
        else "MULTIPOLYGON EMPTY"


def boolean_area(polys: list, pred) -> float:
    """Exact area of the region where ``pred(membership_bitmask)``
    holds (see :func:`boolean_faces`) — no face construction, just the
    sweep's trapezoid sums."""
    sw = _coverage_sweep(polys)
    if sw is None:
        return 0.0
    st, xa, xb, ya, yb, _depth, _edge, mask = sw
    if mask is None:
        raise ValueError("boolean_area supports at most 63 polygons")
    inside = np.asarray(pred(mask), dtype=bool)
    gap = (ya[1:] - ya[:-1]) + (yb[1:] - yb[:-1])
    hit = (st[1:] == st[:-1]) & inside[:-1] & (gap > 0.0)
    return float((0.5 * (xb - xa)[:-1][hit] * gap[hit]).sum())


def difference_faces(a: "Polygon", b: "Polygon") -> list[np.ndarray]:
    """Faces of ``a MINUS b`` (the clip complement — reference
    ``geom.difference`` analog)."""
    one, two = np.uint64(1), np.uint64(2)
    return boolean_faces(
        [a, b], lambda m: ((m & one) != 0) & ((m & two) == 0))


def symmetric_difference_area(a: "Polygon", b: "Polygon") -> float:
    """Exact area of ``a XOR b``."""
    return boolean_area([a, b], lambda m: (m == 1) | (m == 2))


# ------------------------------------------------- simplification (DP)

def _dp_chain(verts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask over an open chain (first and last
    vertices are always kept).  Iterative stack + vectorized
    point-to-segment distances per split — no recursion depth limit,
    no per-vertex Python loop inside a segment."""
    n = len(verts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        a, b = verts[i], verts[j]
        pts = verts[i + 1: j]
        ab = b - a
        denom = float(ab @ ab)
        if denom == 0.0:
            d = np.hypot(*(pts - a).T)
        else:
            t = np.clip(((pts - a) @ ab) / denom, 0.0, 1.0)
            proj = a + t[:, None] * ab
            d = np.hypot(*(pts - proj).T)
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            m = i + 1 + kmax
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_ring(verts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker on an OPEN ring: anchor at vertex 0 and the
    vertex farthest from it (the classic ring split — no edge of the
    ring is ever simplified across the seam), simplify both chains,
    rejoin.  Kept vertices are a SUBSET of the input; every dropped
    vertex lies within ``tol`` of the simplified boundary (the DP
    guarantee per chain).  Collapsed results fall back to the
    original ring (never emits a degenerate <3-vertex ring)."""
    v = np.asarray(verts, dtype=np.float64)
    n = len(v)
    if n <= 3 or tol < 0:
        return v.copy()
    far = int(np.argmax(np.hypot(*(v - v[0]).T)))
    if far == 0:  # all points coincident
        return v.copy()
    c1 = v[: far + 1]
    c2 = np.concatenate([v[far:], v[:1]])
    k1 = _dp_chain(c1, tol)
    k2 = _dp_chain(c2, tol)
    keep = np.zeros(n, dtype=bool)
    keep[: far + 1] = k1
    keep[far:] |= k2[:-1]
    keep[0] |= k2[-1]
    out = v[keep]
    return out if len(out) >= 3 else v.copy()


def simplify_polygon(p: "Polygon", tol: float) -> "Polygon":
    """Topology-light polygon simplification (reference users run
    ``geom.simplify`` via shapely/GEOS before a join; the engine's
    layers are driver-resident, so this runs once at build time and
    every probe afterwards gets cheaper point-in-polygon tests).
    Holes whose simplified ring drops below ``min_hole_area`` = 0
    area are kept as-is by the ring fallback; holes are simplified
    with the same tolerance."""
    return Polygon(
        ugid=p.ugid, name=p.name,
        verts=simplify_ring(p.verts, tol),
        holes=[simplify_ring(h, tol) for h in p.holes],
    )


def simplify_layer(polys: list, tol: float) -> list:
    """Simplify every polygon of a layer (build-side prep for
    :func:`ocgis_ray.stages.spatial_join.build_index`)."""
    return [simplify_polygon(p, tol) for p in polys]


# --------------------------------------------- spherical area + hulls

def spherical_ring_area_km2(verts: np.ndarray,
                            radius_km: float = None) -> float:
    """TRUE spherical polygon area (km^2) of a lon/lat ring via the
    signed spherical excess (L'Huilier per vertex fan is unstable near
    antipodes; this uses the standard summed-longitude form of
    Girard's theorem over great-circle arcs, exact for geodesic
    edges).  The reference leaves areas to GEOS in map units; climate
    weights want physical areas — this is the physical-area analog of
    :func:`shoelace_area`.

    Formula (Bevis & Cambareri 1987): for consecutive vertices i, j,
    sum ``(lon_j - lon_i) * (2 + sin(lat_i) + sin(lat_j))`` halved —
    i.e. the spherical trapezoid sum; wraps handled by normalizing
    each dlon to (-180, 180]."""
    R = EARTH_RADIUS_KM if radius_km is None else radius_km
    v = np.asarray(verts, dtype=np.float64)
    lon = np.radians(v[:, 0])
    lat = np.radians(v[:, 1])
    lon2 = np.roll(lon, -1)
    lat2 = np.roll(lat, -1)
    dlon = lon2 - lon
    dlon = (dlon + np.pi) % (2.0 * np.pi) - np.pi
    s = np.sum(dlon * (2.0 + np.sin(lat) + np.sin(lat2)))
    return float(abs(s) * 0.5 * R * R)


def spherical_polygon_area_km2(p: "Polygon",
                               radius_km: float = None) -> float:
    """Outer ring minus holes, antimeridian parts summed."""
    parts = p._parts if p.crosses_am else [p]
    total = 0.0
    for part in parts:
        total += spherical_ring_area_km2(part.verts, radius_km)
        for h in part.holes:
            total -= spherical_ring_area_km2(h, radius_km)
    return total


def convex_hull(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain -> (k, 2) CCW hull vertices (collinear
    boundary points dropped).  O(n log n), pure numpy sort + Python
    chain loop over the SORTED points (the loop is 2n steps on
    driver-side or per-group data, never the corpus)."""
    pts = np.unique(np.c_[np.asarray(x, np.float64),
                          np.asarray(y, np.float64)], axis=0)
    n = len(pts)
    if n <= 2:
        return pts

    def half(iterable):
        out: list[np.ndarray] = []
        for p in iterable:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) \
                        - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def hull_by_group(ds, keys, lon_col: str = "lon", lat_col: str = "lat",
                  num_buckets: int | None = None):
    """Per-group convex hull aggregate: (keys..., hull_wkt, hull_n,
    hull_area, hull_area_km2) — the footprint-per-domain shape.

    Scale path: per-batch LOCAL hulls first (a batch's thousand points
    collapse to <= ~30 hull vertices BEFORE the shuffle — the hull of
    hulls is the hull, so this is an exact combiner, same trick as
    the rollup partials), then a bucketed exact hull per group."""
    import pandas as pd
    import pyarrow as pa

    from ocgis_ray.sources.io import bucketed_group_apply

    keys = [keys] if isinstance(keys, str) else list(keys)

    def local(t: pa.Table) -> pd.DataFrame:
        df = t.select(keys + [lon_col, lat_col]).to_pandas()
        outs = []
        for kv, g in df.groupby(keys, sort=False):
            h = convex_hull(g[lon_col].to_numpy(), g[lat_col].to_numpy())
            kv = kv if isinstance(kv, tuple) else (kv,)
            outs.append(pd.DataFrame({
                **{k: np.repeat(v, len(h)) for k, v in zip(keys, kv)},
                lon_col: h[:, 0], lat_col: h[:, 1]}))
        return (pd.concat(outs, ignore_index=True) if outs
                else df.iloc[:0])

    partials = ds.map_batches(local, batch_format="pyarrow",
                              zero_copy_batch=True)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for kv, gg in g.groupby(keys, sort=False):
            h = convex_hull(gg[lon_col].to_numpy(), gg[lat_col].to_numpy())
            kv = kv if isinstance(kv, tuple) else (kv,)
            ring = np.vstack([h, h[:1]])
            wkt = "POLYGON ((" + ", ".join(
                f"{_dlit(px)} {_dlit(py)}" for px, py in ring) + "))" \
                if len(h) >= 3 else "POLYGON EMPTY"
            area = shoelace_area(h) if len(h) >= 3 else 0.0
            km2 = spherical_ring_area_km2(h) if len(h) >= 3 else 0.0
            outs.append({**{k: v for k, v in zip(keys, kv)},
                         "hull_wkt": wkt, "hull_n": len(h),
                         "hull_area": area, "hull_area_km2": km2})
        return pd.DataFrame(outs)

    return bucketed_group_apply(partials, keys, finalize,
                                num_buckets=num_buckets)
