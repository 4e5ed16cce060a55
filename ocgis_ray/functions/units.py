"""Unit conversion — the ``conform_units_to`` analog.

Reference: ``Variable.cfunits_conform`` routes through cfunits/UDUNITS
(``/root/reference/src/ocgis/variable/base.py:909``,
``util/units.py:get_conformed_units``; backend selected in
``environment.py:73``).  This container has no UDUNITS, and the
pipelines only ever need affine conversions, so this is a small
explicit registry: every unit maps to its dimension family's base via
``base = scale * value + offset``; converting between families raises.

The distributed form is :func:`conform_units` — a stateless
``map_batches`` affine kernel (two flops/row, no actor state needed).
"""

from __future__ import annotations

import numpy as np

#: unit -> (family, scale, offset): base_value = scale * v + offset
UNITS: dict[str, tuple[str, float, float]] = {
    # temperature (base K)
    "K": ("temperature", 1.0, 0.0),
    "degC": ("temperature", 1.0, 273.15),
    "degF": ("temperature", 5.0 / 9.0, 255.3722222222222),
    # length (base m)
    "m": ("length", 1.0, 0.0),
    "km": ("length", 1000.0, 0.0),
    "mi": ("length", 1609.344, 0.0),
    "ft": ("length", 0.3048, 0.0),
    # precipitation rate (base kg m-2 s-1 == mm/s of water)
    "kg m-2 s-1": ("precip_rate", 1.0, 0.0),
    "mm/s": ("precip_rate", 1.0, 0.0),
    "mm/day": ("precip_rate", 1.0 / 86400.0, 0.0),
    "mm/hr": ("precip_rate", 1.0 / 3600.0, 0.0),
    # duration (base s)
    "s": ("duration", 1.0, 0.0),
    "min": ("duration", 60.0, 0.0),
    "h": ("duration", 3600.0, 0.0),
    "day": ("duration", 86400.0, 0.0),
}


def register_unit(name: str, family: str, scale: float,
                  offset: float = 0.0) -> None:
    """Plugin seam (mirrors the calc/driver registries)."""
    UNITS[name] = (family, scale, offset)


def conversion(src: str, dst: str) -> tuple[float, float]:
    """(scale, offset) with ``dst_value = scale * src_value + offset``.

    Composed through the family base: ``base = s1*v + o1``,
    ``dst = (base - o2) / s2``."""
    try:
        f1, s1, o1 = UNITS[src]
    except KeyError:
        raise KeyError(f"unknown unit {src!r}; have {sorted(UNITS)}") from None
    try:
        f2, s2, o2 = UNITS[dst]
    except KeyError:
        raise KeyError(f"unknown unit {dst!r}; have {sorted(UNITS)}") from None
    if f1 != f2:
        raise ValueError(
            f"cannot convert {src!r} ({f1}) to {dst!r} ({f2})")
    return s1 / s2, (o1 - o2) / s2


def convert_values(v: np.ndarray, src: str, dst: str) -> np.ndarray:
    scale, offset = conversion(src, dst)
    return np.asarray(v, dtype=np.float64) * scale + offset


def conform_units(ds, col: str, src: str, dst: str,
                  out_col: str | None = None):
    """Distributed ``conform_units_to``: affine conversion of ``col``
    from ``src`` to ``dst`` units (in place unless ``out_col``)."""
    import pyarrow as pa

    scale, offset = conversion(src, dst)
    target = out_col or col

    def xf(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = v * scale + offset
        if target in t.column_names:
            # replace IN PLACE: drop+append would move the column to
            # the end and break schema-order-sensitive consumers
            return t.set_column(t.schema.get_field_index(target),
                                target, pa.array(out))
        return t.append_column(target, pa.array(out))

    return ds.map_batches(xf, batch_format="pyarrow", zero_copy_batch=True)
