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

import numpy as np
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


# ------------------------------------------------------------ CF calendars

_CF_UNITS = {"days": 86400.0, "hours": 3600.0, "minutes": 60.0, "seconds": 1.0}

#: month lengths for the fixed-length CF calendars
_NOLEAP_MONTHS = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
_ALLLEAP_MONTHS = np.array([31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def _parse_cf_units(units: str) -> tuple[float, tuple[int, int, int, int, int, int]]:
    """'days since 2000-01-15 06:00:00' -> (seconds per unit, epoch)."""
    import re

    m = re.match(
        r"\s*(\w+)\s+since\s+(\d+)-(\d+)-(\d+)"
        r"(?:[T ](\d+):(\d+)(?::(\d+(?:\.\d*)?))?)?",
        units,
    )
    if not m or m.group(1).lower() not in _CF_UNITS:
        raise ValueError(f"unsupported CF units {units!r}")
    g = m.groups()
    epoch = (int(g[1]), int(g[2]), int(g[3]),
             int(g[4] or 0), int(g[5] or 0), int(float(g[6] or 0)))
    return _CF_UNITS[g[0].lower()], epoch


def cf_time_decode(values: np.ndarray, units: str,
                   calendar: str = "standard") -> dict[str, np.ndarray]:
    """CF numeric time -> calendar field arrays (year/month/day/hour/
    minute/second) under the CF calendars the reference decodes
    (``/root/reference/src/ocgis/variable/temporal.py:768-980``):
    ``standard``/``gregorian``/``proleptic_gregorian`` (real datetimes),
    ``360_day``, ``365_day``/``noleap``, ``366_day``/``all_leap``.

    Fixed-length calendars don't map onto real datetimes, so the
    decode returns integer field columns (the reference's
    ``get_datetime`` returns netcdftime objects for the same reason).
    Fully vectorized."""
    per_unit, epoch = _parse_cf_units(units)
    vals = np.asarray(values, dtype=np.float64)
    secs = vals * per_unit
    cal = calendar.lower()
    if cal in ("standard", "gregorian", "proleptic_gregorian"):
        base = np.datetime64(
            f"{epoch[0]:04d}-{epoch[1]:02d}-{epoch[2]:02d}"
            f"T{epoch[3]:02d}:{epoch[4]:02d}:{epoch[5]:02d}", "us")
        ts = base + (secs * 1e6).astype("timedelta64[us]")
        Y = ts.astype("datetime64[Y]").astype(np.int64) + 1970
        M = ts.astype("datetime64[M]").astype(np.int64) % 12 + 1
        D = (ts.astype("datetime64[D]") - ts.astype("datetime64[M]")).astype(np.int64) + 1
        rem = (ts - ts.astype("datetime64[D]")).astype("timedelta64[s]").astype(np.int64)
        return {"year": Y, "month": M.astype(np.int64), "day": D,
                "hour": rem // 3600, "minute": rem % 3600 // 60,
                "second": rem % 60, "timestamp": ts}
    if cal == "360_day":
        month_len = np.full(12, 30)
    elif cal in ("365_day", "noleap"):
        month_len = _NOLEAP_MONTHS
    elif cal in ("366_day", "all_leap"):
        month_len = _ALLLEAP_MONTHS
    else:
        raise ValueError(f"unsupported CF calendar {calendar!r}")
    year_len = int(month_len.sum())
    cum = np.concatenate([[0], np.cumsum(month_len)])
    # epoch -> absolute day number within the fixed-length calendar
    e_day = (epoch[0] * year_len + cum[epoch[1] - 1] + (epoch[2] - 1))
    e_sec = e_day * 86400.0 + epoch[3] * 3600 + epoch[4] * 60 + epoch[5]
    tot = e_sec + secs
    day_abs = np.floor(tot / 86400.0).astype(np.int64)
    rem = (tot - day_abs * 86400.0).astype(np.int64)
    year = day_abs // year_len
    doy = day_abs % year_len  # 0-based day of year
    month = np.searchsorted(cum, doy, side="right")  # 1..12
    day = doy - cum[month - 1] + 1
    return {"year": year, "month": month.astype(np.int64), "day": day,
            "hour": rem // 3600, "minute": rem % 3600 // 60, "second": rem % 60}


def add_cf_time_parts(ds, col: str, units: str, calendar: str = "standard",
                      parts=("year", "month", "day")):
    """Decode a CF numeric time column into calendar-part columns
    (vectorized map stage) — the RequestDataset time-decode analog for
    non-standard calendars."""

    def f(t):
        import pyarrow as pa

        vals = t[col].to_numpy(zero_copy_only=False)
        fields = cf_time_decode(vals, units, calendar)
        for p in parts:
            t = t.append_column(p, pa.array(fields[p]))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def add_month_groups(ds, col: str, groups, out: str = "season"):
    """Seasonal aggregation with ARBITRARY month groups — the
    reference's ``calc_grouping=[[12, 1, 2], ...]`` form
    (``ops/parms/definition.py:309-372``; standard seasons are just
    one instance).  Each row is tagged with the INDEX of the month
    group containing its month; rows whose month is in no group are
    DROPPED (matching the reference, which restricts the temporal
    dimension to the grouped months).

    Groups must be disjoint; months are 1-12.  SQL twin:
    :func:`month_groups_sql`.
    """
    lut = _month_group_lut(groups)
    lref = lut  # small (13,) array; captured by value in the closure

    def f(t: pa.Table) -> pa.Table:
        m = pc.cast(pc.month(t[col]), pa.int64()).to_numpy(zero_copy_only=False)
        gid = lref[m]
        keep = gid >= 0
        t = t.filter(pa.array(keep))
        return t.append_column(out, pa.array(gid[keep], pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _month_group_lut(groups) -> np.ndarray:
    """Validated month -> group-index LUT (index 0 unused; -1 = none)."""
    lut = np.full(13, -1, dtype=np.int64)
    for i, g in enumerate(groups):
        for m in g:
            m = int(m)
            if not 1 <= m <= 12:
                raise ValueError(f"month {m} out of range 1-12")
            if lut[m] != -1:
                raise ValueError(f"month {m} appears in two groups")
            lut[m] = i
    if (lut == -1).all():
        raise ValueError("no month groups given")
    return lut


def month_groups_sql(ts_expr: str, groups) -> tuple[str, str]:
    """(CASE expression, WHERE predicate) matching
    :func:`add_month_groups` — group ids by list position, rows
    outside every group excluded."""
    _month_group_lut(groups)  # validate identically
    whens = " ".join(
        f"WHEN month({ts_expr}) IN ({', '.join(str(int(m)) for m in g)}) "
        f"THEN {i}"
        for i, g in enumerate(groups)
    )
    months = sorted({int(m) for g in groups for m in g})
    pred = f"month({ts_expr}) IN ({', '.join(map(str, months))})"
    return f"CASE {whens} END", pred
