"""Temporal subsets and grouping keys.

Replaces the reference's ``TemporalVariable`` machinery
(``/root/reference/src/ocgis/variable/temporal.py``): time-range subset
with bounds (``variable/base.py:1150-1237``), time-region subsets by
date-part membership (``variable/temporal.py:380-445``), arbitrary
time-function subsets (``variable/temporal.py:345-378``), and temporal
grouping by date parts / seasons (``variable/temporal.py:227-271,
447-597``).  In the columnar model, temporal groups are *derived key
columns* + ``groupby`` — no boolean group-mask (``dgroups``) plumbing
needed.

All kernels are ``pyarrow.compute`` temporal functions over zero-copy
Arrow batches; every derivation has an exact DuckDB SQL equivalent for
the oracle gate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PART_FNS = {
    "year": pc.year,
    "month": pc.month,
    "day": pc.day,
    "hour": pc.hour,
    "minute": pc.minute,
    "second": pc.second,
}


def time_range_filter(ds, col: str, lower, upper):
    """Keep rows with ``lower <= col <= upper`` (inclusive both ends,
    matching the reference's bounds-overlap rule)."""
    import numpy as np

    lo = pa.scalar(np.datetime64(lower, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(upper, "us"), pa.timestamp("us"))

    def f(t: pa.Table) -> pa.Table:
        c = t[col]
        return t.filter(pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def time_region_filter(ds, col: str, region: dict[str, list[int]]):
    """Date-part membership, e.g. ``{'month': [6, 7], 'year': [2024]}``
    — the ``get_time_region`` analog."""
    items = [(k, list(v)) for k, v in region.items()]
    for k, _ in items:
        if k not in _PART_FNS:
            raise ValueError(f"unknown date part {k!r}")

    def f(t: pa.Table) -> pa.Table:
        mask = None
        for part, values in items:
            m = pc.is_in(
                _PART_FNS[part](t[col]),
                value_set=pa.array(values, type=pa.int64()),
            )
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def time_subset_fn(ds, col: str, fn):
    """Arbitrary-UDF time subset (the user-extension hook,
    ``variable/temporal.py:345-378``): ``fn(numpy datetime64 array) ->
    bool mask``, applied vectorized per batch."""

    def f(t: pa.Table) -> pa.Table:
        mask = fn(t[col].to_numpy(zero_copy_only=False))
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def add_time_parts(ds, col: str, parts=("year", "month", "day")):
    """Append int64 date-part key columns (groupby-ready)."""
    parts = tuple(parts)
    for p in parts:
        if p not in _PART_FNS:
            raise ValueError(f"unknown date part {p!r}")

    def f(t: pa.Table) -> pa.Table:
        for p in parts:
            t = t.append_column(p, pc.cast(_PART_FNS[p](t[col]), pa.int64()))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def add_season(ds, col: str, out: str = "season"):
    """Meteorological season id: DJF=0, MAM=1, JJA=2, SON=3 — the
    seasonal-grouping analog (``variable/temporal.py:467-597``).
    SQL equivalent: ``(month(ts) % 12) // 3``."""

    def f(t: pa.Table) -> pa.Table:
        # (month % 12) // 3; pc.divide on int64 is integer (trunc)
        # division and months are positive, so trunc == floor == SQL //.
        m = pc.cast(pc.month(t[col]), pa.int64())
        m12 = pc.subtract(m, pc.multiply(pc.divide(m, pa.scalar(12)), pa.scalar(12)))
        season = pc.divide(m12, pa.scalar(3))
        return t.append_column(out, season)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def season_sql(ts_expr: str) -> str:
    return f"(month({ts_expr}) % 12) // 3"
