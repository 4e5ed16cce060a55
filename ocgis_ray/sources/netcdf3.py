"""Pure-numpy NetCDF-3 classic reader/writer (CDF-1 / CDF-2).

The reference's primary driver is CF-netCDF
(``/root/reference/src/ocgis/driver/nc.py:60-120``); this sandbox has
no netCDF4/scipy, so the ingest shim implements the *published* NetCDF
Classic Format Specification (Unidata, "The NetCDF Classic Format
Spec", appendix of the NetCDF User Guide) directly:

    file   = header, data
    header = magic('CDF\\x01'|'CDF\\x02'), numrecs,
             dim_list(0x0A), gatt_list(0x0C), var_list(0x0B)
    var    = name, ndims, dimids, vatt_list, nc_type, vsize, begin
    data   = fixed vars contiguous at begin; record vars interleaved
             one record slab per variable per record

All integers big-endian; names and attribute payloads pad to 4-byte
boundaries; type codes 1=byte 2=char 3=short 4=int 5=float 6=double.

Scope: everything the CF ingest path needs — multi-dimensional fixed
and record variables, text and numeric attributes, both offset widths
on read (writer emits CDF-1, or CDF-2 when any begin exceeds 2^31).
NetCDF-4/HDF5 files are out of scope and rejected by magic check.

The writer is deterministic (stable field order, zero padding), so
fixture files are byte-reproducible across runs.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy dtype (big-endian), size)
_TYPES = {
    1: np.dtype(">i1"), 2: np.dtype("S1"), 3: np.dtype(">i2"),
    4: np.dtype(">i4"), 5: np.dtype(">f4"), 6: np.dtype(">f8"),
}
_REV_TYPES = {
    np.dtype(np.int8): 1, np.dtype(np.int16): 3, np.dtype(np.int32): 4,
    np.dtype(np.float32): 5, np.dtype(np.float64): 6,
}


class NcVar:
    """One variable: ``dims`` (names), ``attrs``, ``data`` (numpy,
    native byte order)."""

    def __init__(self, dims, attrs, data):
        self.dims = list(dims)
        self.attrs = dict(attrs)
        self.data = data


# ------------------------------------------------------------------ read

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.pos: self.pos + n].decode("utf-8")
        self.pos += (n + 3) & ~3
        return s

    def values(self, nc_type: int, n: int):
        dt = _TYPES[nc_type]
        nbytes = dt.itemsize * n
        arr = np.frombuffer(self.buf, dt, count=n, offset=self.pos)
        self.pos += (nbytes + 3) & ~3
        if nc_type == 2:
            return arr.tobytes().decode("utf-8", errors="replace")
        return arr.astype(dt.newbyteorder("="))

    def att_list(self) -> dict:
        tag = self.u32()
        n = self.u32()
        if tag == 0:  # ABSENT
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute list tag 0x{tag:x}")
        out = {}
        for _ in range(n):
            nm = self.name()
            t = self.u32()
            cnt = self.u32()
            out[nm] = self.values(t, cnt)
        return out


def read_netcdf3(path: str):
    """-> (dims: {name: size}, global_attrs, {var_name: NcVar}).

    Record variables come back with the record dimension realized
    (shape[0] = numrecs)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(
            f"{path}: not a NetCDF classic file (magic {buf[:4]!r}); "
            "NetCDF-4/HDF5 is out of scope for this shim")
    version = buf[3]
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.u32()
    # dim_list
    tag, n = r.u32(), r.u32()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        for _ in range(n):
            nm = r.name()
            dims.append((nm, r.u32()))
    elif tag != 0:
        raise ValueError(f"bad dim list tag 0x{tag:x}")
    gatts = r.att_list()
    # var_list
    tag, n = r.u32(), r.u32()
    if tag not in (0, _NC_VARIABLE):
        raise ValueError(f"bad var list tag 0x{tag:x}")
    heads = []
    for _ in range(n if tag else 0):
        nm = r.name()
        nd = r.u32()
        dimids = [r.u32() for _ in range(nd)]
        atts = r.att_list()
        t = r.u32()
        vsize = r.u32()
        begin = r.i64() if version == 2 else r.u32()
        heads.append((nm, dimids, atts, t, vsize, begin))

    rec_dim = next((i for i, (_, sz) in enumerate(dims) if sz == 0), None)
    rec_vars = [h for h in heads if rec_dim is not None and h[1][:1] == [rec_dim]]
    recsize = sum(h[4] for h in rec_vars)

    out: dict[str, NcVar] = {}
    for nm, dimids, atts, t, vsize, begin in heads:
        dt = _TYPES[t]
        dnames = [dims[i][0] for i in dimids]
        shape = [dims[i][1] for i in dimids]
        is_rec = rec_dim is not None and dimids[:1] == [rec_dim]
        if is_rec:
            shape[0] = numrecs
            slab = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
            if len(rec_vars) == 1:
                # sole record variable: stored contiguously (spec)
                arr = np.frombuffer(buf, dt, count=numrecs * slab,
                                    offset=begin).reshape(shape)
            else:
                arr = np.empty(shape, dtype=dt)
                flat = arr.reshape(numrecs, -1)
                for rec in range(numrecs):
                    off = begin + rec * recsize
                    flat[rec] = np.frombuffer(buf, dt, count=slab, offset=off)
        else:
            cnt = int(np.prod(shape, dtype=np.int64)) if shape else 1
            arr = np.frombuffer(buf, dt, count=cnt, offset=begin).reshape(shape)
        # NOT ascontiguousarray: it is documented ndmin=1 and would
        # silently promote scalar (0-dim) variables to shape (1,)
        data = (arr if t == 2
                else np.asarray(arr, order="C").astype(dt.newbyteorder("=")))
        out[nm] = NcVar(dnames, atts, data)
    return dict(dims), gatts, out


# ------------------------------------------------------------------ write

def _pack_name(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">I", len(b)) + b + b"\x00" * (-len(b) % 4)


def _pack_values(v) -> tuple[int, int, bytes]:
    """attribute payload -> (nc_type, nelems, packed bytes)."""
    if isinstance(v, str):
        b = v.encode("utf-8")
        return 2, len(b), b + b"\x00" * (-len(b) % 4)
    a = np.atleast_1d(np.asarray(v))
    if a.dtype == np.int64:
        a = a.astype(np.int32)
    t = _REV_TYPES[a.dtype]
    raw = a.astype(_TYPES[t]).tobytes()
    return t, a.size, raw + b"\x00" * (-len(raw) % 4)


def _pack_atts(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)
    out = [struct.pack(">II", _NC_ATTRIBUTE, len(attrs))]
    for k, v in attrs.items():
        t, n, payload = _pack_values(v)
        out.append(_pack_name(k) + struct.pack(">II", t, n) + payload)
    return b"".join(out)


def write_netcdf3(path: str, dims: dict, variables: dict,
                  global_attrs: dict | None = None) -> None:
    """Write a classic (CDF-1; CDF-2 if needed) file.

    ``dims``: {name: size} (insertion order = dim ids); ``variables``:
    {name: NcVar | (dims, attrs, data)}.  All dims fixed (numrecs=0) —
    the fixture writer's scope; the reader handles record files."""
    dim_names = list(dims)
    dim_id = {d: i for i, d in enumerate(dim_names)}
    vars_norm: dict[str, NcVar] = {}
    for nm, v in variables.items():
        vars_norm[nm] = v if isinstance(v, NcVar) else NcVar(*v)

    heads = []
    for nm, v in vars_norm.items():
        a = np.asarray(v.data)
        if a.dtype == np.int64:
            a = a.astype(np.int32)
        if a.dtype.kind == "S":
            t = 2
            raw = a.astype("S1").tobytes()
        else:
            t = _REV_TYPES[a.dtype]
            raw = a.astype(_TYPES[t]).tobytes()
        raw += b"\x00" * (-len(raw) % 4)
        shape = tuple(dims[d] for d in v.dims)
        if tuple(a.shape) != shape:
            raise ValueError(f"{nm}: data shape {a.shape} != dims {shape}")
        heads.append((nm, v, t, raw))

    def header(version: int, begins: list[int]) -> bytes:
        parts = [b"CDF" + bytes([version]), struct.pack(">I", 0)]
        if dim_names:
            parts.append(struct.pack(">II", _NC_DIMENSION, len(dim_names)))
            for d in dim_names:
                parts.append(_pack_name(d) + struct.pack(">I", dims[d]))
        else:
            parts.append(struct.pack(">II", 0, 0))
        parts.append(_pack_atts(global_attrs or {}))
        parts.append(struct.pack(">II", _NC_VARIABLE, len(heads))
                     if heads else struct.pack(">II", 0, 0))
        for (nm, v, t, raw), begin in zip(heads, begins):
            parts.append(_pack_name(nm))
            parts.append(struct.pack(">I", len(v.dims)))
            for d in v.dims:
                parts.append(struct.pack(">I", dim_id[d]))
            parts.append(_pack_atts(v.attrs))
            parts.append(struct.pack(">II", t, len(raw)))
            parts.append(struct.pack(">q", begin) if version == 2
                         else struct.pack(">I", begin))
        return b"".join(parts)

    # fixed-point: header size depends on begin offsets' width only
    for version in (1, 2):
        hlen = len(header(version, [0] * len(heads)))
        begins, off = [], hlen
        for _, _, _, raw in heads:
            begins.append(off)
            off += len(raw)
        if version == 1 and off >= 1 << 31:
            continue
        with open(path, "wb") as f:
            f.write(header(version, begins))
            for _, _, _, raw in heads:
                f.write(raw)
        return
