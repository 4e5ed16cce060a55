"""Spatial reorder — ascending-longitude parity + Morton locality order.

The reference's ``Grid.reorder`` (``spatial/grid.py:750-793``, driven
by ``ops/engine.py:561-570`` via the ``spatial_reorder`` operation
parameter) rotates a wrapped grid's columns so longitude ascends from
the wrap start.  In table form the exact analog is a sort by the
wrapped longitude — implemented here as ``order="lon"``.

``order="morton"`` is the cluster-scale generalization: sort by the
bit-interleaved (Z-order) quadgrid cell so spatially-near rows land in
the same output blocks.  At 100 TB this is what makes the reorder
worth a shuffle at all — written back as partitioned parquet, every
downstream bbox/polygon subset prunes whole row groups by the min/max
statistics of the Morton key instead of scanning the world.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ocgis_ray import grid

def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Insert a zero between consecutive bits of each uint64 (low 32
    bits) — the standard parallel-prefix Morton spread."""
    x = x.astype(np.uint64) & np.uint64(0x0000_0000_FFFF_FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000_FFFF_0000_FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF_00FF_00FF_00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F_0F0F_0F0F_0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333_3333_3333_3333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555_5555_5555_5555)
    return x


def morton_key(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Z-order key of the ``res`` quadgrid cell: interleave(ix, iy)
    with ``ix`` bit b at position 2b+1 (odd bits) and ``iy`` in the
    even bits.  int64, non-negative for res <= 20 (2*20+2 bits < 63)."""
    return morton_key_cells(*grid.split(grid.encode(lon, lat, res)))


def _interleave_scalar(mx: int, my: int) -> int:
    """Scalar (python-int) twin of :func:`morton_key_cells` for the
    per-node quadtree walk — no 1-element array allocations."""
    key = 0
    for v, off in ((mx, 1), (my, 0)):
        v &= 0xFFFF_FFFF
        v = (v | (v << 16)) & 0x0000_FFFF_0000_FFFF
        v = (v | (v << 8)) & 0x00FF_00FF_00FF_00FF
        v = (v | (v << 4)) & 0x0F0F_0F0F_0F0F_0F0F
        v = (v | (v << 2)) & 0x3333_3333_3333_3333
        v = (v | (v << 1)) & 0x5555_5555_5555_5555
        key |= v << off
    return key


def morton_key_naive(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Per-bit loop twin of :func:`morton_key` (test parity only)."""
    cell = grid.encode(lon, lat, res)
    ix, iy = grid.split(cell)
    ix = ix.astype(np.uint64)
    iy = iy.astype(np.uint64)
    key = np.zeros_like(ix)
    for b in range(res + 1):
        key |= ((ix >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b + 1)
        key |= ((iy >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
    return key.astype(np.int64)


def spatial_reorder(ds, lon_col: str = "lon", lat_col: str = "lat",
                    order: str = "lon", res: int = 7,
                    wrap_start: float = -180.0, key_col: str | None = None):
    """Reorder a table spatially.

    ``order="lon"`` — the reference-parity reorder: ascending longitude
    measured from ``wrap_start`` (``spatial/grid.py:750-793`` rotates a
    0..360 grid to -180..180; here any wrap start is a sort key
    ``(lon - wrap_start) mod 360``), ties broken by latitude (rows
    equal on both keys come back in arbitrary order — the distributed
    sort is not stable).  ``order="morton"`` — Z-order locality
    clustering at quadgrid resolution ``res``.

    Pass ``key_col`` to keep the sort key as a column (needed when the
    output is written to parquet for min/max row-group pruning);
    otherwise it is dropped after the sort.  The name must not already
    exist in the table.
    """
    if order not in ("lon", "morton", "hilbert"):
        raise ValueError("order must be 'lon', 'morton' or 'hilbert'")
    keep_key = key_col is not None
    key_col = key_col or "_spatial_key"
    existing = ds.schema().names
    if key_col in existing:
        raise ValueError(
            f"key_col {key_col!r} already exists in the table; "
            "pass a fresh column name"
        )

    def add_key(t: pa.Table) -> pa.Table:
        lon = np.asarray(t[lon_col].to_numpy(zero_copy_only=False), np.float64)
        if order == "lon":
            key = np.mod(lon - wrap_start, 360.0)
            t = t.append_column(key_col, pa.array(key, pa.float64()))
        else:
            lat = np.asarray(t[lat_col].to_numpy(zero_copy_only=False), np.float64)
            fn = morton_key if order == "morton" else hilbert_key
            t = t.append_column(key_col, pa.array(
                fn(lon, lat, res), pa.int64()))
        return t

    out = ds.map_batches(add_key, batch_format="pyarrow",
                         zero_copy_batch=True)
    sort_cols = [key_col] + ([lat_col] if order == "lon" else [])
    out = out.sort(sort_cols)
    if not keep_key:
        out = out.drop_columns([key_col])
    return out


def morton_ranges(x0: float, y0: float, x1: float, y1: float, res: int,
                  max_ranges: int = 64) -> list[tuple[int, int]]:
    """bbox -> sorted inclusive ``(lo, hi)`` Z-order key ranges whose
    union covers EXACTLY the keys of cells intersecting the bbox
    (then coalesced down to ``max_ranges`` by merging the smallest
    gaps — coalescing only ever widens, so the union stays a
    superset; readers post-filter exactly).

    The scale purpose: data written in Morton order (``spatial_reorder
    (order="morton")``) carries the key's min/max in every parquet
    row-group footer, so a bbox subset becomes ``max_ranges`` interval
    predicates the reader pushes down — whole row groups skip without
    a byte read (:func:`read_morton_pruned`).  This is the table-form
    analog of the reference's optimized bbox subset
    (``spatial/grid.py:1234-1273`` hint masks over coordinate
    arrays), moved to where 100 TB needs it: the storage layer.

    Decomposition: iterative quadtree walk emitting a node's whole
    contiguous key span ``[base, base + s*s)`` when its square lies
    inside the query's cell-index rectangle; boundary-overflow
    indices (lon=180 / lat=90 encode one past the grid) stay
    addressable via one extra level bit.
    """
    if res < 0 or res > 20:
        raise ValueError("res must be in [0, 20]")
    if x1 < x0 or y1 < y0:
        return []
    qx0, qy0, qx1, qy1 = grid.bbox_index_rect(x0, y0, x1, y1, res)
    if qx1 < qx0 or qy1 < qy0:
        return []
    side_bits = res + 1  # covers the boundary-overflow index 2**res
    ranges: list[list[int]] = []
    # stack of (depth, mx, my); children pushed in REVERSE Morton
    # order so emission is globally sorted
    stack = [(0, 0, 0)]
    while stack:
        d, mx, my = stack.pop()
        s = 1 << (side_bits - d)
        if mx > qx1 or my > qy1 or mx + s - 1 < qx0 or my + s - 1 < qy0:
            continue
        if (qx0 <= mx and mx + s - 1 <= qx1
                and qy0 <= my and my + s - 1 <= qy1):
            # fully inside — covers the s == 1 leaf too: a surviving
            # single cell is inside by the disjoint test above
            base = _interleave_scalar(mx, my)
            ranges.append([base, base + s * s - 1])
            continue
        h = s >> 1
        for ix_half, iy_half in ((1, 1), (1, 0), (0, 1), (0, 0)):
            stack.append((d + 1, mx + ix_half * h, my + iy_half * h))
    # merge touching/adjacent spans
    merged: list[list[int]] = []
    for lo, hi in ranges:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    # coalesce to max_ranges in ONE pass: keep the (max_ranges - 1)
    # LARGEST gaps as separators — equivalent to repeatedly closing
    # the smallest gap, without the O(k^2) loop
    if max_ranges < 1:
        raise ValueError("max_ranges must be >= 1")
    if len(merged) > max_ranges:
        if max_ranges == 1:
            return [(merged[0][0], merged[-1][1])]
        los = np.array([m[0] for m in merged], dtype=np.int64)
        his = np.array([m[1] for m in merged], dtype=np.int64)
        sep = np.sort(np.argsort(los[1:] - his[:-1],
                                 kind="stable")[-(max_ranges - 1):])
        starts = np.concatenate([[0], sep + 1])
        ends = np.concatenate([sep, [len(merged) - 1]])
        merged = [[int(los[s]), int(his[e])] for s, e in zip(starts, ends)]
    return [(lo, hi) for lo, hi in merged]


def morton_key_cells(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """(ix, iy) cell indices -> Z-order keys (same layout as
    :func:`morton_key`: ix in the odd bits)."""
    key = (_spread_bits(np.asarray(ix).astype(np.uint64)) << np.uint64(1)) | \
        _spread_bits(np.asarray(iy).astype(np.uint64))
    return key.astype(np.int64)


def morton_filter_expr(ranges: list[tuple[int, int]], key_col: str):
    """Ranges -> pyarrow dataset expression ``OR_i (lo_i <= key <=
    hi_i)`` for parquet row-group predicate pushdown."""
    import pyarrow.dataset as pads

    if not ranges:
        return pads.field(key_col) < pads.scalar(int(np.iinfo(np.int64).min))
    expr = None
    for lo, hi in ranges:
        e = (pads.field(key_col) >= lo) & (pads.field(key_col) <= hi)
        expr = e if expr is None else expr | e
    return expr


def read_morton_pruned(path, x0: float, y0: float, x1: float, y1: float,
                       res: int, key_col: str = "zkey",
                       lon_col: str = "lon", lat_col: str = "lat",
                       max_ranges: int = 64, **read_kwargs):
    """bbox subset over Morton-ordered parquet with row-group
    pruning: the interval predicates skip whole row groups via footer
    min/max statistics, then the exact bbox filter runs over the
    survivors.  Returns a Dataset — the pruned twin of
    ``subset.bbox_filter`` over an unordered table."""
    import ray.data as rd

    from ocgis_ray.stages.subset import bbox_filter

    if "schema" not in read_kwargs and isinstance(path, str) \
            and os.path.isfile(path):
        # strip pandas metadata: unhashable-schema warning + disabled
        # Ray schema-dedup fast path (shared helper in sources/io)
        from ocgis_ray.sources.io import stripped_schema

        sch = stripped_schema(path, read_kwargs.get("columns"))
        if sch is not None:
            read_kwargs["schema"] = sch
    ranges = morton_ranges(x0, y0, x1, y1, res, max_ranges=max_ranges)
    ds = rd.read_parquet(path,
                         filter=morton_filter_expr(ranges, key_col),
                         **read_kwargs)
    return bbox_filter(ds, x0, y0, x1, y1, lon_col=lon_col, lat_col=lat_col)


# ------------------------------------------------------- hilbert order

def hilbert_key_cells(ix: np.ndarray, iy: np.ndarray,
                      side_bits: int) -> np.ndarray:
    """(ix, iy) cell indices -> Hilbert curve keys on the
    ``2**side_bits``-square grid (vectorized xy->d, the standard
    quadrant-rotation loop).  Unlike Morton, the key depends on the
    grid SIZE — writers and range queries must use the same
    ``side_bits`` (:func:`hilbert_key` pins ``res + 1``, covering the
    lon=180/lat=90 boundary-overflow index like the Morton path)."""
    x = np.asarray(ix).astype(np.int64).copy()
    y = np.asarray(iy).astype(np.int64).copy()
    d = np.zeros(x.shape, dtype=np.int64)
    s = np.int64(1) << np.int64(side_bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant so the sub-square is in canonical orientation
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def _hilbert_scalar(ix: int, iy: int, side_bits: int) -> int:
    """Python-int twin (test parity + range decomposition corners)."""
    x, y, d = int(ix), int(iy), 0
    s = 1 << (side_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_key(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Hilbert key of the ``res`` quadgrid cell — the Morton
    alternative with strictly better locality (every consecutive key
    pair is GRID-ADJACENT; Z-order jumps across quadrant seams), so
    range reads touch fewer row groups per bbox at the same
    ``max_ranges`` budget."""
    return hilbert_key_cells(*grid.split(grid.encode(lon, lat, res)),
                             side_bits=res + 1)


def hilbert_ranges(x0: float, y0: float, x1: float, y1: float, res: int,
                   max_ranges: int = 64) -> list[tuple[int, int]]:
    """bbox -> sorted inclusive Hilbert-key ranges covering exactly
    the cells intersecting the bbox (same contract/coalescing as
    :func:`morton_ranges`).

    Decomposition rides the Hilbert invariant that every quadtree-
    aligned square is CONTIGUOUS on the curve: a fully-inside node
    emits ``[floor(key(corner) / s^2) * s^2, +s^2)`` — no orientation
    bookkeeping needed; ranges sort afterwards (the walk's emission
    order is Morton, not Hilbert)."""
    if res < 0 or res > 20:
        raise ValueError("res must be in [0, 20]")
    if x1 < x0 or y1 < y0:
        return []
    qx0, qy0, qx1, qy1 = grid.bbox_index_rect(x0, y0, x1, y1, res)
    if qx1 < qx0 or qy1 < qy0:
        return []
    side_bits = res + 1
    ranges: list[list[int]] = []
    stack = [(0, 0, 0)]
    while stack:
        d, mx, my = stack.pop()
        s = 1 << (side_bits - d)
        if mx > qx1 or my > qy1 or mx + s - 1 < qx0 or my + s - 1 < qy0:
            continue
        if (qx0 <= mx and mx + s - 1 <= qx1
                and qy0 <= my and my + s - 1 <= qy1):
            sq = s * s
            base = (_hilbert_scalar(mx, my, side_bits) // sq) * sq
            ranges.append([base, base + sq - 1])
            continue
        h = s >> 1
        for ix_half, iy_half in ((1, 1), (1, 0), (0, 1), (0, 0)):
            stack.append((d + 1, mx + ix_half * h, my + iy_half * h))
    ranges.sort()
    merged: list[list[int]] = []
    for lo, hi in ranges:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    if max_ranges < 1:
        raise ValueError("max_ranges must be >= 1")
    if len(merged) > max_ranges:
        if max_ranges == 1:
            return [(merged[0][0], merged[-1][1])]
        los = np.array([m[0] for m in merged], dtype=np.int64)
        his = np.array([m[1] for m in merged], dtype=np.int64)
        sep = np.sort(np.argsort(los[1:] - his[:-1],
                                 kind="stable")[-(max_ranges - 1):])
        starts = np.concatenate([[0], sep + 1])
        ends = np.concatenate([sep, [len(merged) - 1]])
        merged = [[int(los[s]), int(his[e])] for s, e in zip(starts, ends)]
    return [(lo, hi) for lo, hi in merged]
