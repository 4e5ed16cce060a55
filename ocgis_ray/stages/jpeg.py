"""Baseline JPEG (ITU-T T.81) codec — pure numpy + stdlib, no PIL.

Closes the last real-image-codec gap in the multimodal family
(``stages/multimodal.py``): PPM/PNG/WAV/motion-PPM already decode for
real; JPEG was an honest ``fake=True`` stub.  The reference engine
delegates opaque payloads to external libraries (VLEN ``ObjectType``,
``/root/reference/src/ocgis/variable/base.py:202-219``); here the
codec itself is in-repo so the decode stage is real end to end.

Scope (baseline sequential DCT, the profile every camera/web JPEG
decoder must support):

- **Encoder**: 8-bit YCbCr 4:4:4 or 4:2:0 (box-averaged chroma), or
  single-component grayscale; Annex K quantization tables under the
  IJG quality scaling; Annex K "typical" Huffman tables; optional
  restart markers (``restart_interval`` MCUs per RST segment).
- **Decoder**: SOI/APPn/COM/DQT/DRI/SOF0/SOF1/DHT/SOS marker walk,
  canonical Huffman entropy decode with 0xFF00 unstuffing and RSTn
  resynchronization, dequantize -> inverse zigzag -> vectorized IDCT
  (one einsum over all blocks) -> chroma upsample -> RGB.  Sampling
  factors 1 and 2 per axis; 1 or 3 components.  Progressive (SOF2)
  raises ``NotImplementedError``.

Everything below is from the public T.81 spec (tables in Annex K are
spec text, not library code).  Per-payload by nature — like the PNG
zlib path, callers bound memory with small ``batch_size``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

def _zigzag() -> np.ndarray:
    """scan-position -> row-major block index, generated (not typed)."""
    def key(k: int):
        i, j = divmod(k, 8)
        return (i + j, j if (i + j) % 2 == 0 else i)

    return np.array(sorted(range(64), key=key), dtype=np.int64)


ZIGZAG = _zigzag()

# Annex K.1/K.2 base quantization tables (luminance / chrominance).
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 "typical" Huffman tables: (bits[1..16], values).
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_codes(bits, vals) -> dict:
    """Canonical JPEG Huffman assignment: value -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals) -> dict:
    """(length, code) -> value, for the bit-walking decoder."""
    enc = _huff_codes(bits, vals)
    return {(ln, code): v for v, (code, ln) in enc.items()}


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: dct(B) = A @ B @ A.T."""
    i = np.arange(8)[:, None]
    j = np.arange(8)[None, :]
    A = 0.5 * np.cos((2 * j + 1) * i * np.pi / 16.0)
    A[0] /= np.sqrt(2.0)
    return A


_DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K base tables."""
    q = int(min(max(quality, 1), 100))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUM, QUANT_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# --------------------------------------------------------------- encoder

def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (n, 8, 8) blocks in
    raster MCU-free order (row-major block grid)."""
    H, W = plane.shape
    return (plane.reshape(H // 8, 8, W // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    H, W = plane.shape
    ph = (-H) % mult
    pw = (-W) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def pad_align(self):
        """pad the final partial byte with 1-bits (spec F.1.2.3)."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC amplitude coding: value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(w: _BitWriter, q: np.ndarray, block: np.ndarray,
                  pred: int, dc_tab: dict, ac_tab: dict) -> int:
    """DCT + quantize + entropy-code one 8x8 block; returns new DC pred."""
    coef = _DCT @ (block - 128.0) @ _DCT.T
    qc = np.round(coef.ravel() / q).astype(np.int64)[ZIGZAG]
    dc = int(qc[0])
    s, bits = _magnitude(dc - pred)
    code, ln = dc_tab[s]
    w.put(code, ln)
    w.put(bits, s)
    run = 0
    nz = np.nonzero(qc[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(qc[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tab[0xF0]          # ZRL
            w.put(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | s]
        w.put(code, ln)
        w.put(bits, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]              # EOB
        w.put(code, ln)
    return dc


def jpeg_encode(raster: np.ndarray, quality: int = 90,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Baseline JFIF bytes from an (h, w, 3) RGB or (h, w) grayscale
    uint8 raster.  ``subsample=True`` writes 4:2:0, else 4:4:4."""
    gray = raster.ndim == 2
    h, w = raster.shape[:2]
    # _quality_tables returns NATURAL (row-major) order; the quant
    # division runs in natural order (before zigzag), while the DQT
    # segment is written in zigzag order per spec B.2.4.1.
    qlum, qchrom = _quality_tables(quality)
    qnat = [qlum.astype(np.float64), qchrom.astype(np.float64)]

    if gray:
        planes = [raster.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        f = raster.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(p):
                p = _pad_to(p, 2)
                return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2]
                               + p[1::2, 0::2] + p[1::2, 1::2])
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad each plane so the MCU grid is complete
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = list(planes)
    for i, (p, (hi, vi)) in enumerate(zip(padded, samp)):
        need_h = mcuy * 8 * vi
        need_w = mcux * 8 * hi
        H, W = p.shape
        padded[i] = np.pad(p, ((0, need_h - H), (0, need_w - W)), mode="edge")

    dc_tabs = [_huff_codes(*_DC_LUM), _huff_codes(*_DC_CHROM)]
    ac_tabs = [_huff_codes(*_AC_LUM), _huff_codes(*_AC_CHROM)]

    bw = _BitWriter()
    preds = [0] * len(planes)
    out_entropy = []
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.pad_align()
                out_entropy.append(bytes(bw.buf))
                out_entropy.append(bytes([0xFF, 0xD0 + (rst_idx % 8)]))
                bw = _BitWriter()
                rst_idx += 1
                preds = [0] * len(planes)
            for ci, (p, (hi, vi)) in enumerate(zip(padded, samp)):
                tsel = 0 if qsel[ci] == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        block = p[r0:r0 + 8, c0:c0 + 8]
                        preds[ci] = _encode_block(
                            bw, qnat[qsel[ci]], block, preds[ci],
                            dc_tabs[tsel], ac_tabs[tsel])
            mcu_count += 1
    bw.pad_align()
    out_entropy.append(bytes(bw.buf))
    entropy = b"".join(out_entropy)

    # ---- marker segments
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    parts = [b"\xFF\xD8"]  # SOI
    parts.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    parts.append(seg(0xFFDB, bytes([0]) + bytes(qlum[ZIGZAG].tolist())))
    if not gray:
        parts.append(seg(0xFFDB, bytes([1]) + bytes(qchrom[ZIGZAG].tolist())))
    if restart_interval:
        parts.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qsel[ci]])
    parts.append(seg(0xFFC0, sof))
    for cls, (bits, vals) in ((0, _DC_LUM), (1, _AC_LUM)):
        parts.append(seg(0xFFC4, bytes([cls << 4])
                         + bytes(bits) + bytes(vals)))
    if not gray:
        for cls, (bits, vals) in ((0, _DC_CHROM), (1, _AC_CHROM)):
            parts.append(seg(0xFFC4, bytes([(cls << 4) | 1])
                             + bytes(bits) + bytes(vals)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if qsel[ci] == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    parts.append(seg(0xFFDA, sos))
    parts.append(entropy)
    parts.append(b"\xFF\xD9")  # EOI
    return b"".join(parts)


# --------------------------------------------------------------- decoder

class _BitReader:
    """MSB-first reader over one unstuffed entropy run."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        p = self.pos
        for k in range(n):
            v = (v << 1) | int(self.bits[p + k])
        self.pos = p + n
        return v

    def huff(self, table: dict) -> int:
        code = 0
        ln = 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _entropy_runs(payload: bytes, start: int) -> list[bytes]:
    """Unstuffed entropy data from ``start``, split at RSTn markers."""
    runs = []
    cur = bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:      # RSTn
            runs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                        # any other marker ends the scan
            break
    runs.append(bytes(cur))
    return runs


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB (grayscale payloads
    are replicated across channels)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan_comps = None
    entropy_start = None

    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:          # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", payload, i + 2)
        data = payload[i + 4: i + 2 + ln]
        if marker == 0xDB:                      # DQT (may hold several)
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                qt[tq] = np.frombuffer(data[p + 1: p + 65],
                                       dtype=np.uint8).astype(np.float64)
                p += 65
        elif marker in (0xC0, 0xC1):            # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG not supported")
        elif marker == 0xC4:                    # DHT (may hold several)
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = list(data[p + 1: p + 17])
                nv = sum(bits)
                vals = list(data[p + 17: p + 17 + nv])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:                    # SOS
            ns = data[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = data[1 + 2 * c: 3 + 2 * c]
                scan_comps.append({"cs": cs, "td": tdta >> 4,
                                   "ta": tdta & 0xF})
            entropy_start = i + 2 + ln
            break
        i += 2 + ln
    if comps is None or scan_comps is None or entropy_start is None:
        raise ValueError("JPEG missing SOF/SOS")
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 not supported")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan_comps]
    for c, s in zip(order, scan_comps):
        c["td"], c["ta"] = s["td"], s["ta"]

    planes = [np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
              for c in order]
    inv_zz = np.argsort(ZIGZAG)  # natural index -> scan position
    runs = _entropy_runs(payload, entropy_start)
    run_i = 0
    reader = _BitReader(runs[0])
    preds = [0] * len(order)
    # collect quantized blocks per component, IDCT them all at once
    blocks: list[list[tuple[int, int, np.ndarray]]] = [[] for _ in order]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                run_i += 1
                reader = _BitReader(runs[run_i])
                preds = [0] * len(order)
            for ci, c in enumerate(order):
                dct = huff[(0, c["td"])]
                act = huff[(1, c["ta"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        s = reader.huff(dct)
                        preds[ci] += _receive_extend(reader, s)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r_, s_ = rs >> 4, rs & 0xF
                            if s_ == 0:
                                if r_ == 15:
                                    k += 16
                                    continue
                                break            # EOB
                            k += r_
                            zz[k] = _receive_extend(reader, s_)
                            k += 1
                        coef = (zz * q)[inv_zz].reshape(8, 8)
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        blocks[ci].append((r0, c0, coef))
            mcu_count += 1

    for ci, c in enumerate(order):
        if not blocks[ci]:
            continue
        coefs = np.stack([b[2] for b in blocks[ci]])
        pix = np.einsum("ij,njk,lk->nil", _DCT.T, coefs, _DCT.T) + 128.0
        for (r0, c0, _), px in zip(blocks[ci], pix):
            planes[ci][r0:r0 + 8, c0:c0 + 8] = px

    # upsample + crop
    full = []
    for c, p in zip(order, planes):
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
