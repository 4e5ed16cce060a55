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
