"""Hierarchical lon/lat quadgrid cell index (the engine's H3/S2 analog).

The reference models space as structured 2-D grids of x/y coordinate
variables with on-demand point/polygon abstractions
(``/root/reference/src/ocgis/spatial/grid.py:181-941``).  This engine
replaces (row, col) grid slices with *cell ids*: at resolution ``r``
the globe is divided into square cells of ``360 / 2**r`` degrees;
a cell is identified by ``ix * 2**32 + iy`` where ``ix``/``iy`` are the
integer column/row of the cell.  Resolutions 7/8/9 (2.8125deg /
1.40625deg / 0.703125deg) play the role H3 res 7-9 plays in the north
star.  Cell sizes are exact binary fractions so the float arithmetic
(and therefore cell assignment) is bit-identical between numpy and any
IEEE-754 SQL engine evaluating the same expression — which is what
makes the DuckDB oracle checks exact.

Everything here is vectorized numpy over int64/float64 arrays; no
Python-per-row loops.
"""

from __future__ import annotations

import numpy as np

#: multiplier packing (ix, iy) into one int64: cell = ix * CELL_PACK + iy
CELL_PACK = np.int64(1) << np.int64(32)

RES_MIN, RES_MAX = 0, 20


def cell_size(res: int) -> float:
    """Cell edge length in degrees at resolution ``res`` (exact binary)."""
    return 360.0 / (1 << res)


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """lon/lat (degrees, float64) -> int64 cell ids at ``res``.

    Matches the SQL expression produced by :func:`encode_sql` bit for
    bit.  Analog of the reference's cell assignment / ``get_point``
    (``spatial/grid.py:526-533``).
    """
    cs = cell_size(res)
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / cs).astype(np.int64)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / cs).astype(np.int64)
    return ix * CELL_PACK + iy


def encode_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """DuckDB SQL expression equivalent to :func:`encode`."""
    cs = repr(cell_size(res))
    return (
        f"CAST(floor(({lon_expr} + 180.0) / {cs}) AS BIGINT) * 4294967296 "
        f"+ CAST(floor(({lat_expr} + 90.0) / {cs}) AS BIGINT)"
    )


def split(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell ids -> (ix, iy)."""
    cell = np.asarray(cell, dtype=np.int64)
    return cell // CELL_PACK, cell % CELL_PACK


def pack(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return np.asarray(ix, dtype=np.int64) * CELL_PACK + np.asarray(iy, dtype=np.int64)


def parent(cell: np.ndarray, from_res: int, to_res: int) -> np.ndarray:
    """Coarsen cell ids from ``from_res`` to ``to_res`` (to_res <= from_res)."""
    if to_res > from_res:
        raise ValueError("to_res must be <= from_res")
    shift = from_res - to_res
    ix, iy = split(cell)
    return pack(ix >> shift, iy >> shift)


def bounds(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell ids -> (x0, y0, x1, y1) degree bounds.

    The computed-not-stored analog of the reference's bounds
    interpolation (``spatial/grid.py:794-804``): a cell's polygon is a
    pure function of its id.
    """
    cs = cell_size(res)
    ix, iy = split(cell)
    x0 = ix.astype(np.float64) * cs - 180.0
    y0 = iy.astype(np.float64) * cs - 90.0
    return x0, y0, x0 + cs, y0 + cs


def boundary(cell: int, res: int) -> np.ndarray:
    """One cell id -> (5, 2) closed CCW ring of lon/lat vertices.

    Analog of mesh->geometry vectorization
    (``spatial/geomc.py:283-415``): cell id -> boundary polygon.
    """
    x0, y0, x1, y1 = bounds(np.asarray([cell]), res)
    x0, y0, x1, y1 = float(x0[0]), float(y0[0]), float(x1[0]), float(y1[0])
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])


def disk(cell: int, res: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of ``cell`` (the
    ``h3.grid_disk`` analog used for kNN ring expansion).  Longitude
    wraps; latitude clamps at the poles."""
    ix, iy = split(np.asarray([cell]))
    ix, iy = int(ix[0]), int(iy[0])
    n = 1 << res
    nlat = n >> 1  # lat spans 180 deg = half the cells of the 360-deg lon span
    dxs, dys = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (ix + dxs.ravel()) % n
    ys = iy + dys.ravel()
    keep = (ys >= 0) & (ys < nlat)
    return np.unique(pack(xs[keep], ys[keep]))


def ring(cell: int, res: int, k: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance ``k`` (hollow ring)."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    inner = set(disk(cell, res, k - 1).tolist())
    return np.asarray(
        [c for c in disk(cell, res, k).tolist() if c not in inner], dtype=np.int64
    )


def bbox_index_rect(x0: float, y0: float, x1: float, y1: float,
                    res: int) -> tuple[int, int, int, int]:
    """bbox -> inclusive cell-index rectangle ``(ix0, iy0, ix1, iy1)``
    using the SAME floor/cell-size formula as :func:`encode` — the one
    place the bbox→index convention lives (cells_in_bbox and the
    Morton pruning ranges both derive from it, so they can never
    diverge from the stored cell assignment)."""
    cs = cell_size(res)
    return (int(np.floor((x0 + 180.0) / cs)),
            int(np.floor((y0 + 90.0) / cs)),
            int(np.floor((x1 + 180.0) / cs)),
            int(np.floor((y1 + 90.0) / cs)))


def cells_in_bbox(x0: float, y0: float, x1: float, y1: float, res: int) -> np.ndarray:
    """All cell ids whose square intersects the bbox (inclusive of
    cells the bbox edge touches from inside).  Vectorized; the analog
    of the reference's bbox "hint mask"
    (``spatial/grid.py:1234-1273``)."""
    ix0, iy0, ix1, iy1 = bbox_index_rect(x0, y0, x1, y1, res)
    xs, ys = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
    return pack(xs.ravel(), ys.ravel())
