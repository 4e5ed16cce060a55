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
    cell = grid.encode(lon, lat, res)
    ix, iy = grid.split(cell)
    key = (_spread_bits(ix.astype(np.uint64)) << np.uint64(1)) | \
        _spread_bits(iy.astype(np.uint64))
    return key.astype(np.int64)


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
    if order not in ("lon", "morton"):
        raise ValueError("order must be 'lon' or 'morton'")
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
            t = t.append_column(key_col, pa.array(
                morton_key(lon, lat, res), pa.int64()))
        return t

    out = ds.map_batches(add_key, batch_format="pyarrow",
                         zero_copy_batch=True)
    sort_cols = [key_col] + ([lat_col] if order == "lon" else [])
    out = out.sort(sort_cols)
    if not keep_key:
        out = out.drop_columns([key_col])
    return out
