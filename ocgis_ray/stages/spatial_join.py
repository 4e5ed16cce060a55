"""Broadcast spatial join: pages (points) x polygon layer.

The engine's core operator, replacing the reference's sequential
selection-geometry loop (``/root/reference/src/ocgis/ops/engine.py:
287-385``) and its rtree + prepared-geometry machinery
(``spatial/index.py:5-87``, ``variable/geom.py:154-186``,
``spatial/grid.py:555-724``) with the Ray-native shape:

- **build side** (small): polygon layer -> per-polygon cell coverings
  (full vs boundary cells, ``ocgis_ray.cover``) built ONCE on the
  driver and broadcast via ``ray.put`` — the whole layer ships to each
  actor exactly once, never per batch;
- **probe side** (the 100 TB side): an actor-pool ``map_batches`` stage
  that per batch runs the two-stage test: (1) vectorized cell-membership
  prefilter (``np.isin`` on int64 cell columns — the reference's bbox
  "hint mask", ``spatial/grid.py:1234-1273``), (2) exact vectorized
  point-in-polygon only on rows in *boundary* cells.  Rows in *full*
  cells join with no geometry work at all.

Join modes (``how``):
- ``inner``: one output row per (page, polygon) match, ``ugid`` column
  appended — overlapping polygons multiply rows;
- ``semi``: pages with >=1 match, original schema (``intersects`` keep);
- ``anti``: pages with no match (the ``allow_empty`` complement,
  ``ops/parms/definition.py:57``).

``keep_touches`` mirrors ``spatial/grid.py:627-631``: boundary-touching
points kept (True) or dropped (False).

No shuffle: the join is embarrassingly parallel over page batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ocgis_ray.cover import Covering, cover_polygon
from ocgis_ray.geometry import Polygon


@dataclass
class SpatialJoinIndex:
    """Driver-built broadcast index: polygons + their coverings, plus
    the INVERTED cell -> candidate-ugid maps that make probe cost
    proportional to the candidates actually present in a batch (not to
    layer size — the O(10^3)-polygon county-layer case).

    Multipart geometries (several ``Polygon`` parts sharing a ugid,
    e.g. antimeridian splits) are merged: a page matches the ugid if it
    matches any part."""

    res: int
    parts: dict[int, list[Polygon]]        # ugid -> polygon parts
    full: dict[int, np.ndarray]            # ugid -> cells fully inside
    boundary: dict[int, np.ndarray]        # ugid -> cells needing exact test
    cell_full: dict[int, list[int]]        # cell -> ugids fully covering it
    cell_boundary: dict[int, list[int]]    # cell -> ugids needing exact test

    @property
    def ugids(self) -> list[int]:
        return sorted(self.parts)


def build_index(polys: list[Polygon], res: int = 7) -> SpatialJoinIndex:
    parts: dict[int, list[Polygon]] = {}
    for p in polys:
        parts.setdefault(p.ugid, []).append(p)
    full: dict[int, np.ndarray] = {}
    boundary: dict[int, np.ndarray] = {}
    cell_full: dict[int, list[int]] = {}
    cell_boundary: dict[int, list[int]] = {}
    for ugid, plist in parts.items():
        covs: list[Covering] = [cover_polygon(p, res) for p in plist]
        f = np.unique(np.concatenate([c.full for c in covs]))
        b = np.unique(np.concatenate([c.boundary for c in covs]))
        # a cell full in one part may be boundary in another; full wins
        boundary[ugid] = np.setdiff1d(b, f)
        full[ugid] = f
        for c in full[ugid].tolist():
            cell_full.setdefault(c, []).append(ugid)
        for c in boundary[ugid].tolist():
            cell_boundary.setdefault(c, []).append(ugid)
    return SpatialJoinIndex(
        res=res, parts=parts, full=full, boundary=boundary,
        cell_full=cell_full, cell_boundary=cell_boundary,
    )


def _match_matrix(
    index: SpatialJoinIndex,
    lon: np.ndarray,
    lat: np.ndarray,
    cell: np.ndarray,
    keep_touches: bool,
) -> dict[int, np.ndarray]:
    """Per ugid present in the batch: boolean row mask of matches.

    Candidate discovery is via the inverted cell maps over the batch's
    UNIQUE cells, so per-batch cost is O(unique_cells + candidate
    (ugid, rows) work) — independent of total layer size; ugids with no
    cells in the batch are never touched."""
    uniq, inverse = np.unique(cell, return_inverse=True)
    n = lon.shape[0]
    # candidate ugids and, per ugid, which unique-cell slots hit them.
    # keep_touches=False demotes full cells to exact-test cells: a cell
    # classified "full" may still have its closed boundary touching the
    # polygon boundary (shared edge), and touch exclusion must apply
    # (spatial/grid.py:627-631 semantics).  The fast path is a
    # keep_touches=True (default) optimization only.
    full_hits: dict[int, list[int]] = {}
    boundary_hits: dict[int, list[int]] = {}
    for slot, c in enumerate(uniq.tolist()):
        for u in index.cell_full.get(c, ()):  # type: ignore[arg-type]
            if keep_touches:
                full_hits.setdefault(u, []).append(slot)
            else:
                boundary_hits.setdefault(u, []).append(slot)
        for u in index.cell_boundary.get(c, ()):  # type: ignore[arg-type]
            boundary_hits.setdefault(u, []).append(slot)
    out: dict[int, np.ndarray] = {}
    for ugid in set(full_hits) | set(boundary_hits):
        m = np.zeros(n, dtype=bool)
        slots = full_hits.get(ugid)
        if slots:
            m |= np.isin(inverse, slots)
        bslots = boundary_hits.get(ugid)
        if bslots:
            bmask = np.isin(inverse, bslots) & ~m
            if bmask.any():
                idx = np.nonzero(bmask)[0]
                exact = np.zeros(idx.shape, dtype=bool)
                for part in index.parts[ugid]:
                    exact |= part.contains(
                        lon[idx], lat[idx], keep_touches=keep_touches
                    )
                m[idx[exact]] = True
        out[ugid] = m
    return out


class SpatialJoinProbe:
    """Actor-pool probe stage (``map_batches(SpatialJoinProbe, ...)``).

    ``__init__`` runs once per actor: it fetches the broadcast index
    from the object store (zero-copy for the numpy cell arrays).  Pass
    ``index_ref=ray.put(build_index(...))`` via ``fn_constructor_kwargs``.
    """

    def __init__(
        self,
        index_ref,
        how: str = "inner",
        keep_touches: bool = True,
        cell_col: str | None = None,
        semi_ugid: int = 0,
    ):
        import ray

        self.index: SpatialJoinIndex = (
            ray.get(index_ref) if not isinstance(index_ref, SpatialJoinIndex) else index_ref
        )
        if how not in ("inner", "semi", "anti", "inner_semi"):
            raise ValueError(f"how={how!r}")
        self.how = how
        self.keep_touches = keep_touches
        self.cell_col = cell_col or f"cell_r{self.index.res}"
        self.semi_ugid = semi_ugid

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        cell = batch[self.cell_col].to_numpy(zero_copy_only=False)
        matches = _match_matrix(self.index, lon, lat, cell, self.keep_touches)

        if self.how in ("inner", "inner_semi"):
            rows, ugids = [], []
            for ugid in sorted(matches):
                m = matches[ugid]
                if m.any():
                    r = np.nonzero(m)[0]
                    rows.append(r)
                    ugids.append(np.full(r.shape, ugid, dtype=np.int64))
            if self.how == "inner_semi" and rows:
                # ONE extra output row per matching input row, tagged
                # with the synthetic dissolve ugid — the semi join's
                # rows from the SAME match matrix, same scan
                any_match = np.zeros(batch.num_rows, dtype=bool)
                for m in matches.values():
                    any_match |= m
                r = np.nonzero(any_match)[0]
                rows.append(r)
                ugids.append(np.full(r.shape, self.semi_ugid, dtype=np.int64))
            if not rows:
                empty = batch.slice(0, 0)
                return empty.append_column("ugid", pa.array([], type=pa.int64()))
            take = np.concatenate(rows)
            out = batch.take(pa.array(take))
            return out.append_column("ugid", pa.array(np.concatenate(ugids)))

        any_match = np.zeros(batch.num_rows, dtype=bool)
        for m in matches.values():
            any_match |= m
        keep = any_match if self.how == "semi" else ~any_match
        return batch.filter(pa.array(keep))


def spatial_join(
    ds,
    polys: list[Polygon],
    how: str = "inner",
    keep_touches: bool = True,
    res: int = 7,
    concurrency=None,
    batch_size: int = 8192,
    semi_ugid: int = 0,
):
    """pages Dataset (geocoded) -> joined Dataset.

    Builds and broadcasts the index, then attaches the probe actor
    pool.  Probe batches are larger than extract batches (slim rows,
    cheap per-row work — SURVEY §4 sizing).

    ``how``: ``inner`` (one row per (page, matching ugid)), ``semi`` /
    ``anti`` (filter), or ``inner_semi`` — inner rows PLUS one row per
    matching page tagged ``ugid=semi_ugid`` (the dissolved-selection
    rows from the same scan; see ``area_weighted_aggregate(
    with_dissolved=True)``).
    """
    import ray

    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    index_ref = ray.put(build_index(polys, res=res))
    return ds.map_batches(
        SpatialJoinProbe,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={
            "index_ref": index_ref,
            "how": how,
            "keep_touches": keep_touches,
            "semi_ugid": semi_ugid,
        },
    )


# =====================================================================
# Partitioned spatial join — the LARGE-layer path.
#
# The broadcast join above assumes the polygon layer (plus coverings)
# fits in the object store of every node — true for country/state/county
# layers (10^2..10^5 polygons), false for e.g. a global building or
# parcel layer (10^8+).  The partitioned path is the Sedona/GeoSpark
# shape re-expressed in Ray Data, with NO driver-resident geometry:
#
#   1. the layer itself is a Dataset of packed polygon parts
#      (``layer_to_dataset`` / any parquet source with (ugid, blob));
#   2. a distributed COVER stage (`map_batches`) expands each part into
#      its res-r cell covering: one row per (cell, ugid) with
#      ``full`` flag, boundary rows CARRYING the packed geometry so the
#      exact test needs no second join;
#   3. points and cell-map rows co-locate via ONE hash shuffle on
#      ``cell`` (``io.bucketed_group_apply``); each bucket rebuilds a
#      local cell->candidate index and runs the same vectorized
#      ``_match_matrix`` the broadcast probe uses.
#
# Semantics equal the broadcast join exactly (tested) because candidate
# discovery via cells is complete: a polygon containing a point must
# cover the point's cell (fully or as boundary), and every boundary row
# ships its part's geometry to that cell's bucket.  ``anti`` is local to
# the bucket for the same reason — all candidates for a point's cell
# land in the point's bucket.
# =====================================================================


def pack_part(p: Polygon) -> bytes:
    """Serialize one NON-crossing polygon part (exterior + holes) to a
    flat little-endian blob: [n_ext:i64, ext:(n,2) f64, n_holes:i64,
    (n_h:i64, hole:(n_h,2) f64)*].  Antimeridian-crossing polygons must
    be split first (``Polygon.parts``) — packed lons are canonical, so
    round-tripping through ``Polygon()`` is exact (re-wrap rule, see
    geometry._unwrap_ring)."""
    out = [np.asarray([p.verts.shape[0]], np.int64).tobytes(),
           np.ascontiguousarray(p.verts, np.float64).tobytes(),
           np.asarray([len(p.holes)], np.int64).tobytes()]
    for h in p.holes:
        out.append(np.asarray([h.shape[0]], np.int64).tobytes())
        out.append(np.ascontiguousarray(h, np.float64).tobytes())
    return b"".join(out)


def unpack_part(blob: bytes, ugid: int) -> Polygon:
    off = 0

    def take_i64() -> int:
        nonlocal off
        v = int(np.frombuffer(blob, np.int64, 1, off)[0])
        off += 8
        return v

    def take_ring(n: int) -> np.ndarray:
        nonlocal off
        r = np.frombuffer(blob, np.float64, 2 * n, off).reshape(n, 2).copy()
        off += 16 * n
        return r

    verts = take_ring(take_i64())
    holes = [take_ring(take_i64()) for _ in range(take_i64())]
    return Polygon(ugid, f"part_{ugid}", verts, holes=holes)


def layer_to_dataset(polys: list[Polygon], num_blocks: int | None = None):
    """Polygon list -> Dataset of packed parts (ugid:i64, blob:binary).

    The in-memory convenience constructor; at real scale the layer
    arrives as parquet with this schema and never touches the driver.
    Antimeridian-crossing members are split into canonical parts here
    so every row round-trips exactly."""
    import ray.data as rd

    from ocgis_ray.tuning import auto_pool

    ugids, blobs = [], []
    for p in polys:
        for part in p.parts:
            ugids.append(part.ugid)
            blobs.append(pack_part(part))
    tbl = pa.table({"ugid": pa.array(ugids, pa.int64()),
                    "blob": pa.array(blobs, pa.binary())})
    ds = rd.from_arrow(tbl)
    n = num_blocks if num_blocks is not None else auto_pool()
    # spread the cover work: from_arrow yields ONE block and map-task
    # bundling would run the whole cover stage as one task otherwise
    return ds.repartition(min(n, max(1, len(blobs))))


def _cover_rows(batch: pa.Table, res: int, keep_touches: bool = True) -> pa.Table:
    """COVER stage kernel: packed parts -> (cell, ugid, full, blob)
    rows.  Boundary rows carry the part blob (the exact test needs the
    geometry in the cell's bucket); full rows carry b'' — at res 7+ the
    full cells dominate, so the shuffled geometry volume tracks the
    polygon PERIMETER, not its area.  Under ``keep_touches=False`` the
    probe demotes full cells to the exact test (shared-edge semantics,
    see ``_match_matrix``), so full rows must ship the geometry too —
    that mode pays an area-proportional shuffle by construction."""
    cells, ugids, fulls, blobs = [], [], [], []
    full_blob_of = (lambda blob: b"") if keep_touches else (lambda blob: blob)
    for ugid, blob in zip(batch["ugid"].to_pylist(), batch["blob"].to_pylist()):
        part = unpack_part(blob, ugid)
        cov = cover_polygon(part, res)
        for arr, is_full, b in ((cov.full, 1, full_blob_of(blob)),
                                (cov.boundary, 0, blob)):
            if arr.size:
                cells.append(arr.astype(np.int64))
                ugids.append(np.full(arr.size, ugid, np.int64))
                fulls.append(np.full(arr.size, is_full, np.int8))
                blobs.extend([b] * arr.size)
    if not cells:
        return pa.table({"cell": pa.array([], pa.int64()),
                         "ugid": pa.array([], pa.int64()),
                         "full": pa.array([], pa.int8()),
                         "blob": pa.array([], pa.binary())})
    return pa.table({"cell": pa.array(np.concatenate(cells)),
                     "ugid": pa.array(np.concatenate(ugids)),
                     "full": pa.array(np.concatenate(fulls)),
                     "blob": pa.array(blobs, pa.binary())})


@dataclass
class _BucketIndex:
    """Duck-typed mini ``SpatialJoinIndex`` rebuilt per bucket from the
    cell-map rows present — only the fields ``_match_matrix`` reads."""

    parts: dict
    cell_full: dict
    cell_boundary: dict


def spatial_join_partitioned(
    ds,
    layer,
    how: str = "inner",
    keep_touches: bool = True,
    res: int = 7,
    id_col: str = "page_id",
    cell_col: str | None = None,
    num_buckets: int | None = None,
    attach: bool = False,
):
    """Hash-partitioned spatial join for layers too large to broadcast.

    ``layer``: list[Polygon] (converted via ``layer_to_dataset``) or a
    Dataset with (ugid:int64, blob:binary) packed-part rows.

    Returns (``how``):
    - ``inner``: (id_col, ugid) match pairs — one row per match;
    - ``semi``: distinct id_col rows with >=1 match;
    - ``anti``: id_col rows with no match.
    With ``attach=True`` the point payload is joined back onto the
    result by ``id_col`` via a hash-shuffle ``Dataset.join`` (the
    large-large path; broadcast callers don't need it).

    Output row equality with ``spatial_join`` is the regression test
    (tests/test_spatial_join.py)."""
    import pandas as pd

    from ocgis_ray.sources.io import bucketed_group_apply, join_datasets

    if how not in ("inner", "semi", "anti"):
        raise ValueError(f"how={how!r}")
    cell_col = cell_col or f"cell_r{res}"
    layer_ds = layer_to_dataset(layer) if isinstance(layer, list) else layer

    cellmap = layer_ds.map_batches(
        lambda b: _cover_rows(b, res, keep_touches), batch_format="pyarrow",
        zero_copy_batch=True)

    def project_cellmap(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "_side": pa.array(np.zeros(n, np.int8)),
            "cell": t["cell"], "id": pa.array(np.full(n, -1, np.int64)),
            "lon": pa.array(np.zeros(n, np.float64)),
            "lat": pa.array(np.zeros(n, np.float64)),
            "ugid": t["ugid"], "full": t["full"], "blob": t["blob"]})

    def project_points(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "_side": pa.array(np.ones(n, np.int8)),
            "cell": t[cell_col].cast(pa.int64()),
            "id": t[id_col].cast(pa.int64()),
            "lon": t["lon"].cast(pa.float64()),
            "lat": t["lat"].cast(pa.float64()),
            "ugid": pa.array(np.full(n, -1, np.int64)),
            "full": pa.array(np.zeros(n, np.int8)),
            "blob": pa.array([b""] * n, pa.binary())})

    unioned = cellmap.map_batches(
        project_cellmap, batch_format="pyarrow", zero_copy_batch=True,
    ).union(ds.map_batches(
        project_points, batch_format="pyarrow", zero_copy_batch=True))

    empty = pd.DataFrame(
        {id_col: pd.Series([], dtype=np.int64)}
        if how != "inner" else
        {id_col: pd.Series([], dtype=np.int64),
         "ugid": pd.Series([], dtype=np.int64)})

    def probe_bucket(df: pd.DataFrame) -> pd.DataFrame:
        pts = df[df["_side"] == 1]
        if pts.empty:
            return empty
        cm = df[df["_side"] == 0]
        parts: dict[int, dict[bytes, Polygon]] = {}
        cell_full: dict[int, list[int]] = {}
        cell_boundary: dict[int, list[int]] = {}
        for cell, ugid, is_full, blob in zip(
                cm["cell"].to_numpy(np.int64).tolist(),
                cm["ugid"].to_numpy(np.int64).tolist(),
                cm["full"].to_numpy(np.int8).tolist(),
                cm["blob"]):
            if is_full:
                cell_full.setdefault(cell, []).append(ugid)
            else:
                cell_boundary.setdefault(cell, []).append(ugid)
            if blob:  # boundary rows always; full rows when keep_touches=False
                seen = parts.setdefault(ugid, {})
                if blob not in seen:
                    seen[blob] = unpack_part(blob, ugid)
        index = _BucketIndex(
            parts={u: list(d.values()) for u, d in parts.items()},
            cell_full=cell_full, cell_boundary=cell_boundary)
        lon = pts["lon"].to_numpy(np.float64)
        lat = pts["lat"].to_numpy(np.float64)
        cell = pts["cell"].to_numpy(np.int64)
        ids = pts["id"].to_numpy(np.int64)
        matches = _match_matrix(index, lon, lat, cell, keep_touches)
        if how == "inner":
            out_ids, out_ugids = [], []
            for ugid in sorted(matches):
                m = matches[ugid]
                if m.any():
                    out_ids.append(ids[m])
                    out_ugids.append(np.full(int(m.sum()), ugid, np.int64))
            if not out_ids:
                return empty
            return pd.DataFrame({id_col: np.concatenate(out_ids),
                                 "ugid": np.concatenate(out_ugids)})
        any_match = np.zeros(len(pts), dtype=bool)
        for m in matches.values():
            any_match |= m
        keep = any_match if how == "semi" else ~any_match
        return pd.DataFrame({id_col: ids[keep]})

    result = bucketed_group_apply(unioned, "cell", probe_bucket,
                                  num_buckets=num_buckets)
    if attach:
        result = join_datasets(result, ds, on=[id_col])
    return result


def semi_join_tagged(ds, polys: list[Polygon], ugid_out: int = 0,
                     **join_kwargs):
    """Dissolved-selection membership: rows matching ANY polygon kept
    exactly once (semi join) and tagged with the constant synthetic
    ``ugid_out`` — the shared core of ``agg_selection=True``
    (``pipelines/ops.py``) and ``area_weighted_aggregate(dissolve=
    True)``."""
    import numpy as np

    sj = spatial_join(ds, polys, how="semi", **join_kwargs)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ugid", pa.array(np.full(t.num_rows, ugid_out, np.int64)))

    return sj.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
