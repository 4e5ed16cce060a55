"""Vector-file layer loaders: GeoJSON, GeoPackage, ESRI Shapefile —
all pure stdlib (json / sqlite3 / struct), no Fiona/GDAL.

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
            try:
                return int(props[k])
            except (TypeError, ValueError):
                continue  # non-numeric id (e.g. "US-CA"): keep looking
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


# ------------------------------------------------------------- GeoPackage

def _parse_wkb_polygons(buf: bytes) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Minimal WKB parser for Polygon / MultiPolygon (2-D) -> list of
    (outer_ring, holes).  Handles both byte orders; Z/M variants and
    other geometry types raise."""
    import struct

    def parse_geom(mv: memoryview, pos: int):
        little = mv[pos] == 1
        fmt = "<" if little else ">"
        (gtype,) = struct.unpack_from(fmt + "I", mv, pos + 1)
        pos += 5
        base = gtype & 0xFF
        # EWKB flag bits: Z=0x80000000, M=0x40000000, SRID=0x20000000;
        # ISO WKB encodes Z/M as +1000/+2000/+3000
        if gtype & 0xE0000000 or (gtype // 1000) in (1, 2, 3):
            raise ValueError("only plain 2-D WKB supported "
                             "(Z/M/EWKB-SRID variants raise)")
        if base == 3:  # Polygon
            (nrings,) = struct.unpack_from(fmt + "I", mv, pos)
            pos += 4
            rings = []
            for _ in range(nrings):
                (npts,) = struct.unpack_from(fmt + "I", mv, pos)
                pos += 4
                ring = np.frombuffer(
                    mv, dtype=("<f8" if little else ">f8"),
                    count=npts * 2, offset=pos,
                ).reshape(npts, 2).astype(np.float64)
                pos += npts * 16
                rings.append(ring)
            return [(rings[0], rings[1:])], pos
        if base == 6:  # MultiPolygon
            (nparts,) = struct.unpack_from(fmt + "I", mv, pos)
            pos += 4
            out = []
            for _ in range(nparts):
                polys, pos = parse_geom(mv, pos)
                out.extend(polys)
            return out, pos
        raise ValueError(f"unsupported WKB geometry type {base}")

    polys, _ = parse_geom(memoryview(buf), 0)
    return polys


def load_geopackage(path: str, table: str | None = None) -> list[Polygon]:
    """GeoPackage (OGC 12-128r15) polygon layer -> Polygon list —
    pure stdlib ``sqlite3`` + the minimal WKB parser (no GDAL/Fiona),
    the second vector driver (``driver/vector.py`` analog).

    The GPKG geometry BLOB is the 'GP' header (magic, flags, srs_id,
    optional envelope) followed by standard WKB; the envelope length
    is derived from the flags byte."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        if table is None:
            row = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type='features' LIMIT 1"
            ).fetchone()
            if row is None:
                raise ValueError(f"no feature tables in {path}")
            table = row[0]
        geom_row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?",
            (table,),
        ).fetchone()
        if geom_row is None:
            raise ValueError(
                f"table {table!r} is not a registered geometry table")
        (geom_col,) = geom_row
        cols = [r[1] for r in con.execute(f"PRAGMA table_info({table})")]
        name_col = next((c for c in cols if c.lower() in ("name", "title")), None)
        ugid_col = next((c for c in cols if c.upper() in ("UGID", "ID", "FID")), None)
        sel = [geom_col, ugid_col or "rowid", name_col or "rowid"]
        polys: list[Polygon] = []
        for i, (blob, ugid, name) in enumerate(
            con.execute(f"SELECT {', '.join(sel)} FROM {table}")
        ):
            if blob is None:
                continue  # NULL geometry rows are allowed by the spec
            if blob[:2] != b"GP":
                raise ValueError("not a GeoPackage geometry blob")
            flags = blob[3]
            env_code = (flags >> 1) & 0x07
            try:
                env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_code]
            except KeyError:
                raise ValueError(
                    f"invalid GPKG envelope code {env_code}") from None
            wkb = blob[8 + env_len:]
            for j, (outer, holes) in enumerate(_parse_wkb_polygons(wkb)):
                polys.append(Polygon(int(ugid), f"{name}/{j}" if j else str(name),
                                     outer, holes=holes))
        if not polys:
            raise ValueError(f"no polygons in {path}:{table}")
        return polys
    finally:
        con.close()


# ------------------------------------------------------------- Shapefile

def _ring_is_cw(ring: np.ndarray) -> bool:
    from ocgis_ray.geometry import _is_ccw

    return not _is_ccw(ring)


def _point_in_ring(ring: np.ndarray, px: float, py: float) -> bool:
    from ocgis_ray.geometry import _contains_raycast

    return bool(_contains_raycast(ring[:-1] if np.allclose(ring[0], ring[-1])
                                  else ring, np.asarray([px]), np.asarray([py]))[0])


def _read_dbf(path: str) -> list[dict]:
    """Minimal dBASE III reader (attribute table of a shapefile)."""
    import struct

    with open(path, "rb") as f:
        buf = f.read()
    nrec = struct.unpack_from("<I", buf, 4)[0]
    hdr_size = struct.unpack_from("<H", buf, 8)[0]
    rec_size = struct.unpack_from("<H", buf, 10)[0]
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    out = []
    for i in range(nrec):
        rpos = hdr_size + i * rec_size
        if buf[rpos] == 0x2A:  # deleted: keep a PLACEHOLDER — attrs
            out.append({})     # align 1:1 with .shp record numbers
            continue
        rec, fpos = {}, rpos + 1
        for name, ftype, flen in fields:
            raw = buf[fpos:fpos + flen].decode("ascii", "replace").strip()
            fpos += flen
            if ftype == "N" and raw:
                rec[name] = float(raw) if "." in raw else int(raw)
            else:
                rec[name] = raw
        out.append(rec)
    return out


def load_shapefile(path: str) -> list[Polygon]:
    """ESRI Shapefile polygon layer -> Polygon list (pure ``struct``;
    .dbf attributes read when present) — the reference's native
    GeomCabinet format (``spatial/geom_cabinet.py``,
    ``test/bin/shp/state_boundaries``).

    Ring semantics per the ESRI spec: clockwise rings are exteriors,
    counter-clockwise rings are holes, assigned to the exterior that
    contains their first vertex."""
    import os
    import struct

    with open(path, "rb") as f:
        buf = f.read()
    if struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError(f"{path} is not a shapefile")
    shp_type = struct.unpack_from("<i", buf, 32)[0]
    if shp_type not in (5, 15, 25):  # Polygon, PolygonZ, PolygonM
        raise ValueError(f"shapefile type {shp_type} is not a polygon layer")
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    attrs = _read_dbf(dbf_path) if os.path.exists(dbf_path) else []

    polys: list[Polygon] = []
    pos, idx = 100, 0
    while pos < len(buf):
        content_len = struct.unpack_from(">i", buf, pos + 4)[0] * 2
        rpos = pos + 8
        pos = rpos + content_len
        rtype = struct.unpack_from("<i", buf, rpos)[0]
        if rtype == 0:  # null shape
            idx += 1
            continue
        nparts = struct.unpack_from("<i", buf, rpos + 36)[0]
        npoints = struct.unpack_from("<i", buf, rpos + 40)[0]
        parts = np.frombuffer(buf, "<i4", nparts, rpos + 44)
        pts = np.frombuffer(buf, "<f8", npoints * 2, rpos + 44 + 4 * nparts)
        pts = pts.reshape(npoints, 2).astype(np.float64)
        bounds = np.concatenate([parts, [npoints]])
        rings = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
        outers = [(r, []) for r in rings if _ring_is_cw(r)]
        if not outers:  # degenerate: treat all rings as exteriors
            outers = [(r, []) for r in rings]
        else:
            for r in rings:
                if _ring_is_cw(r):
                    continue
                px, py = float(r[0, 0]), float(r[0, 1])
                host = next((o for o in outers if _point_in_ring(o[0], px, py)),
                            outers[0])
                host[1].append(r)
        rec = attrs[idx] if idx < len(attrs) else {}
        ugid = next((int(rec[k]) for k in ("UGID", "ID", "FID") if k in rec
                     and rec[k] != ""), idx + 1)
        name = str(next((rec[k] for k in ("NAME", "STATE_NAME", "name")
                         if k in rec and rec[k] != ""), f"feature_{ugid}"))
        for j, (outer, holes) in enumerate(outers):
            polys.append(Polygon(ugid, f"{name}/{j}" if j else name,
                                 outer, holes=holes))
        idx += 1
    if not polys:
        raise ValueError(f"no polygons in {path}")
    return polys


# ------------------------------------------------------------- writers

def _closed(ring: np.ndarray) -> list[list[float]]:
    out = [[float(x), float(y)] for x, y in ring]
    out.append(out[0])
    return out


def write_geojson(polys: list[Polygon], path: str,
                  extra_props: dict[int, dict] | None = None) -> str:
    """Polygon list -> GeoJSON FeatureCollection file — the
    ``GeoJsonConverter`` analog (reference ``conv/fiona_.py`` via
    Fiona; here pure json).  Exterior CCW + holes as written by the
    engine's normalized rings; round-trips through
    :func:`load_geojson`.  ``extra_props`` merges per-ugid attribute
    dicts into each feature's properties (the ops-API aggregate
    output: selection geometry + its computed values)."""
    feats = []
    for p in polys:
        rings = [_closed(p.verts)] + [_closed(h) for h in p.holes]
        props = {"UGID": int(p.ugid), "name": p.name}
        if extra_props and int(p.ugid) in extra_props:
            props.update(extra_props[int(p.ugid)])
        feats.append({
            "type": "Feature",
            "properties": props,
            "geometry": {"type": "Polygon", "coordinates": rings},
        })
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return path


def write_geojson_points(ds, path: str, lon_col: str = "lon",
                         lat_col: str = "lat",
                         batch_size: int = 65536) -> str:
    """Row Dataset -> GeoJSON FeatureCollection of POINT features,
    streamed batch-at-a-time (the row output never materializes on
    the driver; the FILE is inherently single-writer, which is the
    GeoJSON format's own scale ceiling — partitioned parquet/csv are
    the big-output sinks)."""
    import numpy as np
    import pandas as pd

    first = True
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [\n')
        for batch in ds.iter_batches(batch_size=batch_size,
                                     batch_format="pandas"):
            prop_cols = [c for c in batch.columns
                         if c not in (lon_col, lat_col)]
            lon = batch[lon_col].to_numpy(np.float64)
            lat = batch[lat_col].to_numpy(np.float64)
            for i in range(len(batch)):
                props = {}
                for c in prop_cols:
                    v = batch[c].iloc[i]
                    if isinstance(v, (bool, np.bool_)):
                        v = bool(v)
                    elif isinstance(v, (np.integer,)):
                        v = int(v)
                    elif isinstance(v, (np.floating,)):
                        # bare NaN is not valid JSON — emit null
                        v = None if np.isnan(v) else float(v)
                    elif isinstance(v, pd.Timestamp):
                        v = v.isoformat()
                    props[c] = v
                feat = {"type": "Feature", "properties": props,
                        "geometry": {"type": "Point",
                                     "coordinates": [float(lon[i]),
                                                     float(lat[i])]}}
                f.write(("" if first else ",\n") + json.dumps(feat))
                first = False
        f.write("\n]}\n")
    return path


def write_shapefile(polys: list[Polygon], path: str) -> str:
    """Polygon list -> ESRI Shapefile trio (.shp/.shx/.dbf) — the
    ``ShpConverter`` analog (reference ``conv/fiona_.py:ShpConverter``),
    pure ``struct``.  Ring orientation per the ESRI spec (exterior CW,
    holes CCW); attributes UGID (N) and NAME (C); round-trips through
    :func:`load_shapefile` including hole assignment."""
    import os
    import struct

    base = os.path.splitext(path)[0]
    records = []
    gxmin = gymin = np.inf
    gxmax = gymax = -np.inf
    for p in polys:
        rings = [p.verts[::-1]] + [h if not _ring_is_cw(h) else h[::-1]
                                   for h in p.holes]
        # exterior reversed to CW; holes forced CCW
        parts = np.cumsum([0] + [len(r) + 1 for r in rings[:-1]])
        # each ring written CLOSED (first vertex repeated)
        closed = [np.concatenate([r, r[:1]]) for r in rings]
        pts = np.concatenate(closed)
        xmin, ymin = pts.min(axis=0)
        xmax, ymax = pts.max(axis=0)
        gxmin, gymin = min(gxmin, xmin), min(gymin, ymin)
        gxmax, gymax = max(gxmax, xmax), max(gymax, ymax)
        content = struct.pack("<i4d", 5, xmin, ymin, xmax, ymax)
        content += struct.pack("<2i", len(closed), len(pts))
        content += struct.pack(f"<{len(parts)}i", *parts.tolist())
        content += pts.astype("<f8").tobytes()
        records.append(content)

    shp = bytearray(100)
    shx = bytearray(100)
    offset_words = 50
    body = bytearray()
    shx_body = bytearray()
    for i, content in enumerate(records):
        clen_words = len(content) // 2
        body += struct.pack(">2i", i + 1, clen_words) + content
        shx_body += struct.pack(">2i", offset_words, clen_words)
        offset_words += 4 + clen_words
    for header, total_words in ((shp, 50 + len(body) // 2),
                                (shx, 50 + len(shx_body) // 2)):
        struct.pack_into(">i", header, 0, 9994)
        struct.pack_into(">i", header, 24, total_words)
        struct.pack_into("<2i", header, 28, 1000, 5)
        struct.pack_into("<4d", header, 36, gxmin, gymin, gxmax, gymax)
    with open(base + ".shp", "wb") as f:
        f.write(bytes(shp) + bytes(body))
    with open(base + ".shx", "wb") as f:
        f.write(bytes(shx) + bytes(shx_body))

    # minimal dBASE III: UGID numeric + NAME character
    n = len(polys)
    fields = [(b"UGID", b"N", 10), (b"NAME", b"C", 40)]
    rec_len = 1 + sum(w for _, _, w in fields)
    hdr_len = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack("<B3BIHH20x", 0x03, 26, 8, 17, n, hdr_len, rec_len)
    for fname, ftype, width in fields:
        dbf += struct.pack("<11sc4xBB14x", fname, ftype, width, 0)
    dbf += b"\x0d"
    for p in polys:
        dbf += b" "
        dbf += str(int(p.ugid)).rjust(10).encode()[:10]
        dbf += p.name[:40].ljust(40).encode("ascii", "replace")[:40]
    dbf += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(dbf))
    return base + ".shp"
