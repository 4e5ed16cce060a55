"""Geocode stage: pages -> lon/lat + quadgrid cell-id columns.

The analog of the reference's point-abstraction materialization and
cell assignment (``/root/reference/src/ocgis/spatial/grid.py:477-533``,
``1162-1203``): every page gains ``lon``, ``lat`` and ``cell_r7/8/9``
columns in one vectorized pass over zero-copy Arrow batches.

Longitude is canonical [-180, 180) at this stage by construction — the
normalize-once answer to the reference's wrap/unwrap subsystem
(``spatial/wrap.py:38-304``).

The lon/lat derivation is the deterministic synthetic geocoder from
``ocgis_ray.sources.pages`` (a pure hash of page_id); in a real
deployment this stage would instead parse server-location metadata, but
the Ray plumbing — stateless vectorized ``map_batches``, int64 cell
columns, res 7-9 hierarchy — is the real thing.
"""

from __future__ import annotations

import pyarrow as pa

from ocgis_ray import grid
from ocgis_ray.sources.pages import coords_from_page_id

DEFAULT_RESOLUTIONS = (7, 8, 9)


def geocode_batch(batch: pa.Table, resolutions=DEFAULT_RESOLUTIONS) -> pa.Table:
    """Append lon/lat + cell id columns (pyarrow in/out, zero-copy)."""
    page_id = batch["page_id"].to_numpy(zero_copy_only=False)
    lon, lat = coords_from_page_id(page_id)
    batch = batch.append_column("lon", pa.array(lon))
    batch = batch.append_column("lat", pa.array(lat))
    for r in resolutions:
        batch = batch.append_column(f"cell_r{r}", pa.array(grid.encode(lon, lat, r)))
    return batch


def geocode(ds, resolutions=DEFAULT_RESOLUTIONS):
    """Dataset -> Dataset with geocode columns (stateless tasks)."""
    return ds.map_batches(
        lambda b: geocode_batch(b, resolutions),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def cell_sql_columns(resolutions=DEFAULT_RESOLUTIONS) -> str:
    """SQL select-list fragment matching :func:`geocode_batch`."""
    return ", ".join(
        f"{grid.encode_sql('lon', 'lat', r)} AS cell_r{r}" for r in resolutions
    )
