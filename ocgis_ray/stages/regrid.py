"""Raster-tile <-> vector-cell conversion + kNN/IDW interpolation —
the engine's replacement for the reference's ESMF regrid path.

Reference: ``RegridOperation``/``regrid_field`` generate ESMF weights
and sparse-matrix-multiply them per time slice
(``/root/reference/src/ocgis/regrid/base.py:24-119,646-840``);
``smm`` applies chunked weight files (``regrid/base.py:937-992``);
polygon->mesh conversion is ``variable/geom.py:333-637`` and
mesh->geometry ``spatial/geomc.py:283-415``.

Here (per the north star) regridding becomes:
- **rasterize**: polygon -> cell covering (``ocgis_ray.cover``);
- **vectorize**: cell ids -> boundary polygons (:func:`cells_to_polygons`);
- **interpolate**: per-target inverse-distance weights over the k
  nearest pages (:func:`idw_interpolate`) — weights computed once
  per target from streamed partial top-k gathers (no all-pairs);
- **apply_weights**: a precomputed sparse (src_cell, dst_cell, w)
  table applied as broadcast lookup + partial aggregation
  (:func:`apply_weights`) — the ``smm`` analog;
- **conservative_weights**: first-order conservative weight
  GENERATION from exact cell∩polygon clip areas
  (:func:`conservative_weights`) — the ESMF ``regrid_method=
  CONSERVE`` weight-file analog, closing the generate→``smm`` loop.
"""

from __future__ import annotations


def _ap() -> int:
    from ocgis_ray.tuning import auto_pool

    return auto_pool()

import numpy as np
import pandas as pd
import pyarrow as pa

from ocgis_ray import grid
from ocgis_ray.geometry import haversine_km


def cells_to_polygons(cells: np.ndarray, res: int) -> pa.Table:
    """Vectorize cell ids to boundary rectangles (bounds + WKT ring).

    The computed-not-stored cell geometry (``grid.boundary``) in bulk;
    WKT keeps the output engine-agnostic (no WKB writer available)."""
    cells = np.asarray(cells, dtype=np.int64)
    x0, y0, x1, y1 = grid.bounds(cells, res)
    wkt = [
        f"POLYGON(({a} {b}, {c} {b}, {c} {d}, {a} {d}, {a} {b}))"
        for a, b, c, d in zip(x0, y0, x1, y1)
    ]
    return pa.table({
        "cell": pa.array(cells),
        "x0": pa.array(x0), "y0": pa.array(y0),
        "x1": pa.array(x1), "y1": pa.array(y1),
        "area": pa.array((x1 - x0) * (y1 - y0)),
        "wkt": pa.array(wkt, pa.string()),
    })


class _IdwGather:
    """Per batch: for each target, the local k nearest (dist, value)."""

    def __init__(self, targets_ref, k: int, value_col: str):
        import ray

        t = ray.get(targets_ref) if not isinstance(targets_ref, dict) else targets_ref
        self.tid = t["target_id"]
        self.tlon = t["lon"]
        self.tlat = t["lat"]
        self.k = k
        self.value_col = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"target_id": pa.array([], pa.int64()),
                             "dist_km": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        val = batch[self.value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        d = haversine_km(self.tlon[:, None], self.tlat[:, None], lon[None, :], lat[None, :])
        k = min(self.k, d.shape[1])
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        return pa.table({
            "target_id": pa.array(np.repeat(self.tid, k)),
            "dist_km": pa.array(np.take_along_axis(d, part, axis=1).ravel()),
            "value": pa.array(val[part.ravel()]),
        })


def idw_interpolate(ds, targets: pd.DataFrame, k: int = 8, power: float = 2.0,
                    value_col: str = "n_chars", out_col: str = "idw_value",
                    batch_size: int = 16384, round_digits: int = 4):
    """Inverse-distance-weighted estimate at each target point from the
    k nearest source rows.  ``targets``: (target_id, lon, lat), small,
    broadcast once.  Zero-distance sources short-circuit to their exact
    value (standard IDW convention)."""
    import ray

    from ocgis_ray.parity import sql_round

    tref = ray.put({
        "target_id": targets["target_id"].to_numpy(np.int64),
        "lon": targets["lon"].to_numpy(np.float64),
        "lat": targets["lat"].to_numpy(np.float64),
    })
    partial = ds.map_batches(
        _IdwGather, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=_ap(),
        fn_constructor_kwargs={"targets_ref": tref, "k": k, "value_col": value_col},
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic tie-break: equal distances order by value (the
        # knn/ann convention — nsmallest alone keeps arrival order,
        # which varies run to run with block scheduling)
        g = g.sort_values(["dist_km", "value"], kind="mergesort").head(k)
        d = g["dist_km"].to_numpy()
        v = g["value"].to_numpy()
        exact = d <= 1e-12
        if exact.any():
            est = float(v[exact].min())
        else:
            w = 1.0 / d ** power
            est = float(np.sum(w * v) / np.sum(w))
        return pd.DataFrame({
            "target_id": [int(g["target_id"].iloc[0])],
            out_col: [float(sql_round(est, round_digits))],
        })

    return partial.groupby("target_id").map_groups(finalize, batch_format="pandas")


def idw_regrid_join(targets, sources, k: int = 8, power: float = 2.0,
                    value_col: str = "n_chars", out_col: str = "idw_value",
                    target_id: str = "target_id",
                    source_id: str = "page_id", res: int = 7,
                    round_digits: int = 4, num_buckets: int | None = None):
    """IDW interpolation with BOTH sides as Datasets — the
    corpus-sized-targets regrid :func:`idw_interpolate` (broadcast
    targets) cannot do.  Composes :func:`ocgis_ray.stages.knn.knn_join`
    (which carries the source value through, so no join back) with a
    vectorized per-target finalize: zero-distance sources
    short-circuit to their exact MIN value (the same convention the
    broadcast path uses), else estimate = sum(v/d^p) / sum(1/d^p).

    Neighbor-set tie convention differs from the broadcast path at the
    k-th boundary only: knn_join breaks distance ties by source id,
    idw_interpolate by value — identical results whenever the k-th
    distance is unique (always, for continuous coordinates).

    Returns (target_id, out_col) — one row per target with >= 1
    neighbor."""
    from ocgis_ray.parity import sql_round
    from ocgis_ray.sources.io import bucketed_group_apply
    from ocgis_ray.stages.knn import knn_join

    nn = knn_join(targets, sources, k, res=res, left_id=target_id,
                  right_id=source_id, right_cols=(value_col,),
                  num_buckets=num_buckets)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        d = g["dist_km"].to_numpy(np.float64)
        v = g[value_col].to_numpy(np.float64)
        exact = d <= 1e-12
        w = np.where(exact, 0.0, 1.0 / np.where(exact, 1.0, d) ** power)
        gb = pd.DataFrame({
            target_id: g[target_id].to_numpy(np.int64),
            "_wv": w * v, "_w": w,
            "_ex": exact,
            "_exv": np.where(exact, v, np.inf),
        }).groupby(target_id, sort=False).agg(
            _wv=("_wv", "sum"), _w=("_w", "sum"),
            _ex=("_ex", "any"), _exv=("_exv", "min"))
        est = np.where(gb["_ex"].to_numpy(),
                       gb["_exv"].to_numpy(),
                       gb["_wv"].to_numpy() / gb["_w"].to_numpy())
        return pd.DataFrame({
            target_id: gb.index.to_numpy(np.int64),
            out_col: sql_round(est, round_digits)})

    return bucketed_group_apply(nn, target_id, finalize,
                                num_buckets=num_buckets)


def apply_weights(ds, weights: pd.DataFrame, src_col: str = "cell_r7",
                  value_col: str = "n_chars", out_col: str = "wsum"):
    """Sparse weight application (the chunked-``smm`` analog): weights
    (src, dst, w) broadcast as a lookup; each batch emits partial
    (dst, w*value) sums; a tiny grouped aggregate finishes.

    At 100 TB the weights table is itself sharded by dst range and the
    broadcast becomes a hash-partitioned join on src — same dataflow."""
    import ray

    from ocgis_ray.stages.tiles import grouped_aggregate

    lut: dict[int, list[tuple[int, float]]] = {}
    for s, dst, w in zip(weights["src"], weights["dst"], weights["w"]):
        lut.setdefault(int(s), []).append((int(dst), float(w)))
    lref = ray.put(lut)

    def expand(batch: pa.Table) -> pa.Table:
        table = ray.get(lref)
        src = batch[src_col].to_numpy(zero_copy_only=False)
        val = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        dsts, wv = [], []
        uniq = np.unique(src)
        for s in uniq.tolist():
            hits = table.get(int(s))
            if not hits:
                continue
            m = src == s
            sv = val[m]
            for dst, w in hits:
                dsts.append(np.full(sv.shape, dst, dtype=np.int64))
                wv.append(sv * w)
        if not dsts:
            return pa.table({"dst": pa.array([], pa.int64()),
                             "wv": pa.array([], pa.float64())})
        return pa.table({"dst": pa.array(np.concatenate(dsts)),
                         "wv": pa.array(np.concatenate(wv))})

    expanded = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(expanded, ["dst"], {out_col: ("wv", "sum")})


def conservative_weights(polys, res: int,
                         normalize: str = "dstarea") -> pd.DataFrame:
    """First-order conservative regrid weight generation — the ESMF
    ``regrid_method=CONSERVE`` weight-computation analog
    (``/root/reference/src/ocgis/regrid/base.py:24-119`` drives ESMF to
    produce exactly these (src, dst, fraction) triples; here the
    overlap areas come from the engine's own exact Sutherland-Hodgman
    clip, ``cover.cover_polygon``).

    For each destination polygon ``d`` and source cell ``s`` at
    resolution ``res``:  ``w(s, d) = area(s ∩ d) / area(d)``
    (``normalize="dstarea"``, the default — a destination value is the
    area-weighted MEAN of overlapping source-cell values, and a
    constant source field regrids to that constant exactly).  With
    ``normalize="none"`` the raw overlap areas are returned (the
    integral/flux form: destination value is the area INTEGRAL).

    ``area(d)`` is computed as the sum of the clip areas rather than
    the shoelace area so the weights of every destination sum to 1.0
    to within float64 rounding of the divisions — same decomposition,
    same operation order.

    Output schema matches :func:`apply_weights` input: columns
    ``src`` (int64 cell id), ``dst`` (int64 ugid), ``w`` (float64).
    The input Dataset for ``apply_weights`` should hold one row per
    source cell (a raster field), e.g. the per-cell rollup a
    ``grouped_aggregate`` over the geocoded pages produces.

    Driver-side by design: destination layers are cabinet-scale
    (dozens–thousands of polygons, same broadcast role as the spatial
    join build side).  A planetary destination mesh takes the
    Dataset-native route instead: ``sources.mesh.mesh_covering`` emits
    the same (face_id, cell, full) rows as a stream.
    """
    if normalize not in ("dstarea", "none"):
        raise ValueError(f"normalize={normalize!r}")
    from ocgis_ray.cover import cover_polygon

    cell_area = grid.cell_size(res) ** 2
    src_parts, dst_parts, w_parts = [], [], []
    for p in polys:
        cov = cover_polygon(p, res)
        areas = np.concatenate([
            np.full(cov.full.size, cell_area, dtype=np.float64),
            cov.boundary_clip_area,
        ])
        denom = float(areas.sum())
        if denom <= 0.0:
            continue
        src_parts.append(np.concatenate([cov.full, cov.boundary]))
        dst_parts.append(np.full(areas.size, p.ugid, dtype=np.int64))
        w_parts.append(areas / denom if normalize == "dstarea" else areas)
    if not src_parts:
        return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                             "dst": pd.Series(dtype=np.int64),
                             "w": pd.Series(dtype=np.float64)})
    return pd.DataFrame({"src": np.concatenate(src_parts),
                         "dst": np.concatenate(dst_parts),
                         "w": np.concatenate(w_parts)})


def _axis_rect(poly) -> tuple[float, float, float, float] | None:
    """(x0, y0, x1, y1) if ``poly`` is a hole-free axis-aligned
    rectangle, else None."""
    v = poly.verts
    if poly.holes or poly.crosses_am or v.shape[0] != 4:
        return None
    xs, ys = np.unique(v[:, 0]), np.unique(v[:, 1])
    if xs.size == 2 and ys.size == 2:
        return float(xs[0]), float(ys[0]), float(xs[1]), float(ys[1])
    return None


def rect_union_terms(rects: list) -> list[tuple[float, ...]]:
    """Inclusion-exclusion terms for ``area(X INTERSECT union of axis
    rects)``: ``(sign, x0, y0, x1, y1)`` for every subset of the rects
    with a non-empty common intersection, in a DETERMINISTIC order
    (subset size ascending, then lexicographic) — the engine
    accumulates ``w += sign * clip_area(term)`` in this order and the
    SQL generator emits the terms in the same order, so both sides run
    the identical float op sequence.  Exponential in the number of
    MUTUALLY overlapping rects — fine for selection layers (<= ~16
    rects); use :func:`ocgis_ray.geometry.coverage_areas` for large
    collections."""
    import itertools

    terms: list[tuple[float, ...]] = []
    n = len(rects)
    if n > 20:
        raise ValueError("rect_union_terms is for small selection layers")
    for size in range(1, n + 1):
        found = False
        for combo in itertools.combinations(range(n), size):
            x0 = max(rects[i][0] for i in combo)
            y0 = max(rects[i][1] for i in combo)
            x1 = min(rects[i][2] for i in combo)
            y1 = min(rects[i][3] for i in combo)
            if x1 > x0 and y1 > y0:
                sign = 1.0 if size % 2 else -1.0
                terms.append((sign, x0, y0, x1, y1))
                found = True
        if not found:
            break  # no k-subset intersects => no (k+1)-subset does
    return terms


def area_weighted_aggregate(ds, polys, value_col: str = "n_chars", res: int = 7,
                            out_col: str = "awm", round_digits: int = 6,
                            dissolve: bool = False, dissolve_ugid: int = 0,
                            with_dissolved: bool = False):
    """Area-fraction weighted spatial mean — the true analog of the
    reference's area-weighted aggregation (``variable/geom.py:307-321``,
    weights = clipped cell area), finishing the containment-fraction
    path of the regrid replacement (SURVEY §2.9).

    Per selection polygon: per-cell means of the joined rows, combined
    with weights = area(cell INTERSECT polygon) — full cells weigh the
    whole cell, boundary cells their Sutherland-Hodgman clip area
    (``Covering.boundary_clip_area``).  Axis-aligned rectangle layers
    use the ``rect_clip_area_sqlparity`` kernel so the weights are
    bit-identical to the generated oracle SQL.

    Dataflow: broadcast join -> per-(ugid, cell) partial aggregate
    (the only big shuffle) -> tiny per-ugid weighted combine.

    ``dissolve=True`` is the reference's ``agg_selection=True``
    (``ops/engine.py``: union all selection geometries into ONE):
    rows in ANY polygon counted once (semi join), one output row
    ``ugid=dissolve_ugid``, and per-cell weights =
    ``area(cell INTERSECT union)``.  Axis-rect layers use
    :func:`rect_union_terms` inclusion-exclusion (terms shared with
    the SQL oracle generator for bit-identical weights); general
    layers reuse each polygon's clip area for singly-covered cells and
    run an exact per-cell coverage sweep over the clipped pieces where
    covers overlap (see :func:`_dissolved_cell_weights`).

    ``with_dissolved=True`` emits BOTH the per-ugid rows and the
    dissolved ``dissolve_ugid`` row from ONE pages scan: the probe's
    ``how="inner_semi"`` mode adds the semi-join rows (tagged with the
    synthetic ugid) from the same match matrix, so the second full
    read+geocode the two separate calls pay disappears.  Requires
    ``dissolve_ugid`` to not collide with a real layer ugid.
    """
    import ray

    from ocgis_ray import grid as _grid
    from ocgis_ray.cover import cover_polygon
    from ocgis_ray.geometry import rect_clip_area_sqlparity
    from ocgis_ray.parity import sql_round
    from ocgis_ray.sources.io import bucketed_group_apply
    from ocgis_ray.stages.spatial_join import spatial_join
    from ocgis_ray.stages.tiles import grouped_aggregate

    cell_col = f"cell_r{res}"
    if dissolve and with_dissolved:
        raise ValueError("dissolve=True already returns ONLY the "
                         "dissolved row; with_dissolved adds it to the "
                         "per-ugid rows — pick one")
    if (dissolve or with_dissolved) and \
            any(p.ugid == dissolve_ugid for p in polys):
        raise ValueError(f"dissolve_ugid {dissolve_ugid} collides with "
                         "a layer ugid")
    if dissolve:
        from ocgis_ray.stages.spatial_join import semi_join_tagged

        j = semi_join_tagged(ds, polys, ugid_out=dissolve_ugid, res=res)
    elif with_dissolved:
        j = spatial_join(ds, polys, how="inner_semi", res=res,
                         semi_ugid=dissolve_ugid)
    else:
        j = spatial_join(ds, polys, how="inner", res=res)
    per_cell = grouped_aggregate(
        j, ["ugid", cell_col],
        {"n": (None, "count"), "sum_v": (value_col, "sum")},
    )

    wmap: dict[tuple[int, int], float] = {}
    if dissolve:
        wmap = _dissolved_cell_weights(polys, res, dissolve_ugid)
        _finish = _make_awm_finalizer(ray.put(wmap), cell_col, out_col,
                                      round_digits)
        return bucketed_group_apply(per_cell, "ugid", _finish)
    covers = [cover_polygon(p, res) for p in polys]
    if with_dissolved:
        wmap.update(_dissolved_cell_weights(polys, res, dissolve_ugid,
                                            covers=covers))
    for p, cov in zip(polys, covers):
        rect = _axis_rect(p)
        cells = np.concatenate([cov.full, cov.boundary])
        if rect is not None:
            x0, y0, x1, y1 = _grid.bounds(cells, res)
            areas = rect_clip_area_sqlparity(x0, y0, x1, y1, *rect)
        else:
            areas = np.concatenate([
                np.full(cov.full.shape, _grid.cell_size(res) ** 2),
                cov.boundary_clip_area,
            ])
        for c, a in zip(cells.tolist(), areas.tolist()):
            wmap[(p.ugid, c)] = wmap.get((p.ugid, c), 0.0) + a
    per_bucket = _make_awm_finalizer(ray.put(wmap), cell_col, out_col,
                                     round_digits)
    return bucketed_group_apply(per_cell, "ugid", per_bucket)


def _dissolved_cell_weights(polys, res: int, ugid_out: int,
                            covers=None) -> dict[tuple[int, int], float]:
    """``(ugid_out, cell) -> area(cell INTERSECT union of polys)``.

    Axis-rect layers: vectorized :func:`rect_union_terms`
    inclusion-exclusion (bit-identical to the generated oracle SQL).
    General layers: cells covered by exactly one polygon reuse that
    polygon's clip area (same kernel as the per-ugid path); cells
    under two or more covers clip every overlapping polygon (outer
    ring AND holes) to the cell and measure the union of the pieces
    with an exact :func:`ocgis_ray.geometry.coverage_areas` sweep —
    overlap cells are the rare case, so the per-cell sweeps stay a
    driver-side layer cost, never per-batch work."""
    from collections import defaultdict

    from ocgis_ray import grid as _grid
    from ocgis_ray.cover import cover_polygon
    from ocgis_ray.geometry import (Polygon, clip_poly_rect,
                                    coverage_areas,
                                    rect_clip_area_sqlparity)

    rects = [_axis_rect(p) for p in polys]
    if covers is None:
        covers = [cover_polygon(p, res) for p in polys]
    cs = _grid.cell_size(res)
    if all(r is not None for r in rects):
        terms = rect_union_terms(rects)
        cells = np.unique(np.concatenate(
            [np.concatenate([c.full, c.boundary]) for c in covers]))
        x0, y0, x1, y1 = _grid.bounds(cells, res)
        w = np.zeros(cells.shape[0])
        for sign, rx0, ry0, rx1, ry1 in terms:
            w += sign * rect_clip_area_sqlparity(x0, y0, x1, y1,
                                                 rx0, ry0, rx1, ry1)
        return {(ugid_out, c): a for c, a in zip(cells.tolist(), w.tolist())}
    contrib: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for idx, cov in enumerate(covers):
        cells = np.concatenate([cov.full, cov.boundary])
        areas = np.concatenate([np.full(cov.full.shape, cs * cs),
                                cov.boundary_clip_area])
        for c, a in zip(cells.tolist(), areas.tolist()):
            contrib[c].append((idx, a))
    out: dict[tuple[int, int], float] = {}
    multi = [c for c, lst in contrib.items() if len(lst) > 1]
    for c, lst in contrib.items():
        if len(lst) == 1:
            out[(ugid_out, c)] = lst[0][1]
    if multi:
        cx0, cy0, cx1, cy1 = _grid.bounds(np.asarray(multi, np.int64), res)
        for k, c in enumerate(multi):
            pieces = []
            for idx, _a in contrib[c]:
                for part in polys[idx].parts:
                    ring = clip_poly_rect(part.verts, cx0[k], cy0[k],
                                          cx1[k], cy1[k])
                    if ring is None or ring.shape[0] < 3:
                        continue
                    holes = []
                    for h in part.holes:
                        hc = clip_poly_rect(h, cx0[k], cy0[k],
                                            cx1[k], cy1[k])
                        if hc is not None and hc.shape[0] >= 3:
                            holes.append(hc)
                    pieces.append(Polygon(idx, "piece", ring, holes=holes))
            out[(ugid_out, c)] = (
                float(coverage_areas(pieces).sum()) if pieces else 0.0)
    return out


def _make_awm_finalizer(wref, cell_col: str, out_col: str,
                        round_digits: int):
    """Per-ugid weighted combine: cells sorted, weights looked up from
    the broadcast (ugid, cell) -> clip-area map."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import ray

        from ocgis_ray.parity import sql_round

        wm = ray.get(wref)
        df = df.sort_values(["ugid", cell_col], kind="mergesort")
        w = np.asarray([wm[(int(u), int(c))]
                        for u, c in zip(df["ugid"], df[cell_col])])
        mean_c = df["sum_v"].to_numpy(np.float64) / df["n"].to_numpy(np.float64)
        df = df.assign(_w=w, _wx=w * mean_c)
        g = df.groupby("ugid", sort=False)
        out = pd.DataFrame({
            "ugid": np.asarray(list(g.groups), dtype=np.int64),
            "n_cells": g.size().to_numpy(np.int64),
            "n_rows": g["n"].sum().to_numpy(np.int64),
            out_col: sql_round(
                g["_wx"].sum().to_numpy() / g["_w"].sum().to_numpy(),
                round_digits),
        })
        return out

    return per_bucket


def bilinear_weights(targets: pd.DataFrame, res: int) -> pd.DataFrame:
    """Bilinear regrid weight generation — the ESMF
    ``regrid_method=BILINEAR`` analog (the reference's default method,
    ``/root/reference/src/ocgis/regrid/base.py:646-720`` drives ESMF;
    here the four enclosing source CELL CENTERS and their fractional
    weights are closed-form on the engine's regular grid).

    ``targets`` columns: ``target_id`` (int64), ``lon``, ``lat``.
    Output: up to 4 ``(src, dst, w)`` rows per target in the shared
    :func:`apply_weights` schema; weights sum to 1 per target.
    Longitude wraps modulo the grid; latitude rows clamp at the poles
    (degenerating to linear interpolation along the boundary row,
    ESMF's pole-option NONE shape).  Bilinear reproduces fields linear
    in lon/lat exactly away from the clamped rows — property-tested.
    """
    from ocgis_ray import grid

    cs = grid.cell_size(res)
    nx = int(round(360.0 / cs))
    ny = int(round(180.0 / cs))
    lon = targets["lon"].to_numpy(np.float64)
    lat = targets["lat"].to_numpy(np.float64)
    tid = targets["target_id"].to_numpy(np.int64)
    fx = (lon + 180.0) / cs - 0.5   # position in cell-center coords
    fy = (lat + 90.0) / cs - 0.5
    i0 = np.floor(fx).astype(np.int64)
    j0 = np.floor(fy).astype(np.int64)
    tx = fx - i0
    ty = fy - j0
    # latitude clamp: rows outside [0, ny-1] collapse both stencil rows
    # onto the boundary row (weights still sum to 1)
    j0c = np.clip(j0, 0, ny - 1)
    j1c = np.clip(j0 + 1, 0, ny - 1)
    i0w = np.mod(i0, nx)            # longitude wrap
    i1w = np.mod(i0 + 1, nx)
    src = np.concatenate([grid.pack(i0w, j0c), grid.pack(i1w, j0c),
                          grid.pack(i0w, j1c), grid.pack(i1w, j1c)])
    w = np.concatenate([(1.0 - tx) * (1.0 - ty), tx * (1.0 - ty),
                        (1.0 - tx) * ty, tx * ty])
    dst = np.tile(tid, 4)
    out = pd.DataFrame({"src": src, "dst": dst, "w": w})
    # clamped rows produce duplicate (src, dst) pairs — combine them so
    # apply_weights sees one row per stencil point
    out = out.groupby(["src", "dst"], as_index=False, sort=False)["w"].sum()
    return out[out["w"] > 0.0].reset_index(drop=True)


def nearest_stod_weights(targets: pd.DataFrame, res: int) -> pd.DataFrame:
    """Nearest-source-to-destination weights (ESMF
    ``regrid_method=NEAREST_STOD``): on a regular grid the nearest
    source CELL CENTER to a point is the center of the cell containing
    it, so the stencil is the containment cell with weight 1."""
    from ocgis_ray import grid

    return pd.DataFrame({
        "src": grid.encode(targets["lon"].to_numpy(np.float64),
                           targets["lat"].to_numpy(np.float64), res),
        "dst": targets["target_id"].to_numpy(np.int64),
        "w": np.ones(len(targets)),
    })


# Zienkiewicz-Zhu patch recovery over the symmetric 3x3 stencil: the
# design matrix A (9 points x 6 quadratic monomials {1,x,y,x2,xy,y2})
# is FIXED, so the least-squares evaluation operator M = (AtA)^-1 At
# is a constant 6x9 matrix; per-target weights are b(t)^T M (one row
# of 9), vectorized as B @ M.
def _patch_lsq_operator() -> np.ndarray:
    xs, ys = np.meshgrid(np.arange(-1.0, 2.0), np.arange(-1.0, 2.0))
    x, y = xs.ravel(), ys.ravel()
    A = np.stack([np.ones(9), x, y, x * x, x * y, y * y], axis=1)
    return np.linalg.solve(A.T @ A, A.T)   # (6, 9)


_PATCH_M = _patch_lsq_operator()


def patch_weights(targets: pd.DataFrame, res: int) -> pd.DataFrame:
    """Patch-recovery regrid weight generation — the ESMF
    ``regrid_method=PATCH`` analog (the fourth method the reference
    exposes, ``/root/reference/src/ocgis/regrid/base.py:24-119``; ESMF
    implements Zienkiewicz-Zhu patch recovery, a HIGHER-ORDER method
    than bilinear).

    For each target point: least-squares fit of a full quadratic
    polynomial over the 3x3 patch of source cell centers around the
    nearest center, evaluated at the target — per-target weights are
    one row of the fixed LSQ evaluation operator, so generation is a
    single (n, 6) x (6, 9) matmul, no per-target solve.

    Properties (tested): weights sum to 1 (constant reproduction);
    any field QUADRATIC in lon/lat reproduces exactly away from the
    clamped boundary rows, where bilinear is only exact to degree 1 —
    the "smooth-field error < bilinear" criterion.  Longitude wraps;
    latitude rows clamp at the poles (duplicate stencil entries
    combine, degrading the fit order at the boundary exactly like the
    bilinear clamp).  Output schema matches :func:`apply_weights`
    (up to 9 ``(src, dst, w)`` rows per target)."""
    from ocgis_ray import grid

    cs = grid.cell_size(res)
    nx = int(round(360.0 / cs))
    ny = int(round(180.0 / cs))
    lon = targets["lon"].to_numpy(np.float64)
    lat = targets["lat"].to_numpy(np.float64)
    tid = targets["target_id"].to_numpy(np.int64)
    fx = (lon + 180.0) / cs - 0.5    # cell-center coordinates
    fy = (lat + 90.0) / cs - 0.5
    # nearest center = patch center; floor(x+0.5) (not rint) so the
    # SQL twin's floor-based expression matches bit-for-bit at .5 ties
    ic = np.floor(fx + 0.5).astype(np.int64)
    jc = np.floor(fy + 0.5).astype(np.int64)
    tx = fx - ic                          # in [-0.5, 0.5]
    ty = fy - jc
    B = np.stack([np.ones_like(tx), tx, ty, tx * tx, tx * ty, ty * ty],
                 axis=1)
    W = B @ _PATCH_M                      # (n, 9), rows sum to 1
    offs = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    src_cols = []
    for dx, dy in offs:
        i = np.mod(ic + dx, nx)
        j = np.clip(jc + dy, 0, ny - 1)
        src_cols.append(grid.pack(i, j))
    out = pd.DataFrame({
        "src": np.concatenate(src_cols),
        "dst": np.tile(tid, 9),
        "w": W.T.ravel(),
    })
    # pole-clamped rows duplicate (src, dst) pairs -> combine
    out = out.groupby(["src", "dst"], as_index=False, sort=False)["w"].sum()
    return out[np.abs(out["w"].to_numpy()) > 1e-15].reset_index(drop=True)
