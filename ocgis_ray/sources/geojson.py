"""GeoJSON vector-layer loader (pure stdlib json — no Fiona/GDAL).

The analog of the reference's vector driver + GeomCabinet file loading
(``/root/reference/src/ocgis/driver/vector.py``,
``spatial/geom_cabinet.py:98-110``): reads a FeatureCollection into the
engine's driver-resident :class:`~ocgis_ray.geometry.Polygon` list.

Supported geometries: ``Polygon`` (first ring exterior, rest holes) and
``MultiPolygon`` (parts share the feature's ugid — the multipart
convention ``SpatialJoinIndex`` already merges).  Antimeridian-crossing
rings are handled downstream by ``Polygon``'s auto-split.

``ugid`` comes from the feature's properties (``UGID``/``ugid``/``id``,
first found) or enumeration order; ``name`` likewise.
"""

from __future__ import annotations

import json

import numpy as np

from ocgis_ray.geometry import Polygon

_UGID_KEYS = ("UGID", "ugid", "id", "ID")
_NAME_KEYS = ("name", "NAME", "title")


def _feature_ugid(props: dict, fallback: int) -> int:
    for k in _UGID_KEYS:
        if k in props:
            return int(props[k])
    return fallback


def _feature_name(props: dict, fallback: str) -> str:
    for k in _NAME_KEYS:
        if k in props:
            return str(props[k])
    return fallback


def _polygon_from_rings(rings: list, ugid: int, name: str) -> Polygon:
    outer = np.asarray(rings[0], dtype=np.float64)
    holes = [np.asarray(r, dtype=np.float64) for r in rings[1:]]
    return Polygon(ugid, name, outer, holes=holes)


def load_geojson(path: str) -> list[Polygon]:
    """FeatureCollection (or single Feature / bare geometry) -> list of
    :class:`Polygon` (MultiPolygon parts share their feature's ugid)."""
    with open(path) as f:
        doc = json.load(f)
    if doc.get("type") == "FeatureCollection":
        features = doc["features"]
    elif doc.get("type") == "Feature":
        features = [doc]
    else:  # bare geometry
        features = [{"type": "Feature", "geometry": doc, "properties": {}}]
    polys: list[Polygon] = []
    for i, feat in enumerate(features):
        geom = feat.get("geometry") or {}
        props = feat.get("properties") or {}
        ugid = _feature_ugid(props, i + 1)
        name = _feature_name(props, f"feature_{ugid}")
        gtype = geom.get("type")
        if gtype == "Polygon":
            polys.append(_polygon_from_rings(geom["coordinates"], ugid, name))
        elif gtype == "MultiPolygon":
            for j, rings in enumerate(geom["coordinates"]):
                polys.append(_polygon_from_rings(rings, ugid, f"{name}/{j}"))
        else:
            raise ValueError(
                f"unsupported geometry type {gtype!r} in feature {i} "
                "(only Polygon / MultiPolygon)"
            )
    if not polys:
        raise ValueError(f"no polygon features in {path}")
    return polys


def register_geojson_layer(name: str, path: str) -> None:
    """Make a GeoJSON file available as a named cabinet layer."""
    from ocgis_ray.sources import cabinet

    cabinet.register_layer(name, lambda: load_geojson(path))
