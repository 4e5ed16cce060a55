"""User-extension seams: kernel, source and aggregate registries.

The reference exposes three plugin surfaces — calculation functions
via ``FunctionRegistry.append``
(``/root/reference/src/ocgis/calc/library/register.py:10-43``), drivers
via ``driver/registry.py``, and converters via ``get_converter_map``
(``conv/base.py:263-291``).  Same three seams, idiomatic Ray:

- ``register_kernel(name, fn)`` — a named per-batch transform usable
  as ``apply_kernel(ds, name)``; ``fn(batch: pa.Table) -> pa.Table``.
- ``register_source(name, fn)`` — ``fn(sf_dir, **kw) -> Dataset``.
- ``register_aggregate(name, spec)`` — a ``grouped_aggregate`` spec
  reusable by name.

Registries are plain module dicts (import-time registration, no
metaclass magic); ``ocgis_ray.sources.cabinet.register_layer`` is the
polygon-layer seam.
"""

from __future__ import annotations

from collections.abc import Callable

_KERNELS: dict[str, Callable] = {}
_SOURCES: dict[str, Callable] = {}
_AGGREGATES: dict[str, dict] = {}


def register_kernel(name: str, fn: Callable) -> None:
    _KERNELS[name] = fn


def register_source(name: str, fn: Callable) -> None:
    _SOURCES[name] = fn


def register_aggregate(name: str, spec: dict) -> None:
    _AGGREGATES[name] = spec


def kernel(name: str) -> Callable:
    return _KERNELS[name]


def source(name: str) -> Callable:
    return _SOURCES[name]


def aggregate_spec(name: str) -> dict:
    return _AGGREGATES[name]


def apply_kernel(ds, name: str, **map_batches_kwargs):
    kw = {"batch_format": "pyarrow", "zero_copy_batch": True}
    kw.update(map_batches_kwargs)
    return ds.map_batches(_KERNELS[name], **kw)


def names() -> dict[str, list[str]]:
    return {
        "kernels": sorted(_KERNELS),
        "sources": sorted(_SOURCES),
        "aggregates": sorted(_AGGREGATES),
    }
