"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
metadata columns alongside (kind, width/height or duration, codec) —
the Arrow-native answer to the reference's VLEN ``ObjectType`` payloads
(``/root/reference/src/ocgis/variable/base.py:202-219``).

The container has NO image/audio libraries, so decode is real where a
format is numpy/stdlib-decodable and an honest stub otherwise:

- REAL: PPM (P6) pixels, PNG (stdlib zlib, all five scanline
  filters), baseline JPEG (in-repo T.81 codec,
  :mod:`ocgis_ray.stages.jpeg` — Huffman entropy decode, IDCT, 4:2:0
  upsampling, restart markers), PCM/WAV samples, and motion-PPM video
  (concatenated P6 frames — header-validated frame sampling to
  standalone decodable images, the MJPEG shape), plus MJPEG in real
  AVI (:mod:`ocgis_ray.stages.avi`) and MP4/ISO-BMFF
  (:mod:`ocgis_ray.stages.mp4`) containers.
- STUBS behind ``fake=True``: H.264/H.265 video BITSTREAMS
  (``MediaDecoder`` / ``FrameSampler`` raise ``NotImplementedError``
  when ``fake=False``; a real deployment plugs ffmpeg into the same
  batch signature — the MP4 container itself parses in-repo).

Memory rule for fat binary rows (ray_guide "Memory-aware"): batches of
256-1024 rows, ``batch_format="pyarrow"`` (binary columns do NOT
round-trip pandas cleanly), project the payload away as soon as
features are extracted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
        ("meta_w", pa.int64()),      # image width / audio sample rate / video fps
        ("meta_h", pa.int64()),      # image height / channels / frame count
    ]
)


def _binary_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow binary column -> (data bytes, int64 offsets) zero-copy."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    if bufs[2] is None:
        return np.empty(0, np.uint8), np.zeros(len(arr) + 1, np.int64)
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset: arr.offset + len(arr) + 1]
    return np.frombuffer(bufs[2], dtype=np.uint8), off.astype(np.int64)


def _first_bytes(data: np.ndarray, off: np.ndarray, k: int) -> np.ndarray:
    """(n, k) array of each payload's first k bytes, with rows shorter
    than k zero-padded — a SAFE gather: ``data[off[:-1]]`` indexes one
    past the buffer when a trailing payload is empty (off[-2] ==
    len(data)), an IndexError before any per-row validation runs."""
    n = len(off) - 1
    lens = off[1:] - off[:-1]
    out = np.zeros((n, k), dtype=np.uint8)
    for j in range(k):
        ok = lens > j
        out[ok, j] = data[off[:-1][ok] + j]
    return out


def _media_table(media_id: np.ndarray, kind: str, payload: pa.Array,
                 n_bytes, meta_w, meta_h) -> pa.Table:
    """The MEDIA_SCHEMA row builder shared by every synth path —
    scalars broadcast, arrays pass through (one place to touch when
    the media schema grows a column)."""
    n = len(media_id)

    def col(v):
        v = np.asarray(v, dtype=np.int64)
        return pa.array(np.full(n, v, np.int64) if v.ndim == 0 else v)

    return pa.table({
        "media_id": pa.array(media_id),
        "kind": pa.array(np.full(n, kind, dtype=object)),
        "payload": payload,
        "n_bytes": col(n_bytes),
        "meta_w": col(meta_w),
        "meta_h": col(meta_h),
    })


def _docs_media(sf_dir: str, make, columns: tuple[str, ...] = ("doc_id",)):
    """documents.parquet -> media Dataset via one synth kernel (the
    shared read + small-batch map every synth path uses)."""
    from ocgis_ray.sources.io import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=list(columns))
    return docs.map_batches(make, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=1024)


def synth_media_batch(batch: pa.Table, kind: str = "image") -> pa.Table:
    """Deterministic fake media derived from documents (payload bytes =
    text repeated 4x, utf-8) — plumbing fixture, not content.
    Vectorized: Arrow element-wise join builds the payloads, no Python
    per-row string work."""
    import pyarrow.compute as pc

    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    t = batch["text"]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    rep = pc.binary_join_element_wise(t, t, t, t, "")
    payload = rep.cast(pa.binary())
    return pa.table(
        {
            "media_id": pa.array(doc_id),
            "kind": pa.array(np.full(len(doc_id), kind, dtype=object)),
            "payload": payload,
            "n_bytes": pc.binary_length(payload).cast(pa.int64()),
            "meta_w": pa.array(64 + (doc_id % 64)),
            "meta_h": pa.array(48 + (doc_id % 48)),
        }
    )


def synth_media(sf_dir: str, kind: str = "image"):
    from ocgis_ray.sources.io import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda b: synth_media_batch(b, kind), batch_format="pyarrow", zero_copy_batch=True
    )


def synth_ppm_media(sf_dir: str, w: int = 32, h: int = 24):
    """REAL image payloads: binary PPM (P6) — a format decodable with
    pure numpy, no image library.  Deterministic doc_id-seeded RGB
    gradients, fully vectorized assembly (one (N, h, w, 3) tensor, one
    flat byte buffer, zero per-row Python)."""

    header = f"P6\n{w} {h}\n255\n".encode()

    def make(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(doc_id)
        px = _gradient_pixels(doc_id, w, h)
        hdr = np.frombuffer(header, dtype=np.uint8)
        flat = np.concatenate(
            [np.broadcast_to(hdr, (n, len(hdr))),
             px.reshape(n, -1)], axis=1).reshape(-1)
        row_len = len(hdr) + h * w * 3
        off = (np.arange(n + 1, dtype=np.int32) * row_len)
        payload = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(off.tobytes()),
             pa.py_buffer(flat.tobytes())])
        return _media_table(doc_id, "image", payload, row_len, w, h)

    return _docs_media(sf_dir, make)


def decode_ppm_stats(batch: pa.Table) -> pa.Table:
    """REAL pixel decode for P6 payloads — pure numpy, fully
    vectorized over variable image sizes: validate the magic, locate
    pixel data from the payload tail (meta_w x meta_h x 3 bytes —
    metadata is authoritative, asserted against the buffer), then
    per-(row, channel) sums/sumsqs via one bincount over the gathered
    pixel bytes.  Emits mean_r/g/b, luma and contrast; the payload
    column dies here."""
    data, off = _binary_view(batch["payload"])
    n = batch.num_rows
    w = batch["meta_w"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["meta_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    npx = w * h * 3
    L = off[1:] - off[:-1]
    if n and (L < npx + 7).any():
        # validated BEFORE the len(data) gate: a batch of all-empty
        # payloads has an empty buffer and would otherwise fall through
        # to silent zero stats
        raise ValueError("payload shorter than meta_w*meta_h*3 pixels")
    if n and len(data):
        fb = _first_bytes(data, off, 2)
        magic_ok = (fb[:, 0] == ord("P")) & (fb[:, 1] == ord("6"))
        if not magic_ok.all():
            raise ValueError("not a P6 PPM payload")
        starts = off[1:] - npx  # pixel data is the payload tail
        total = int(npx.sum())
        within = np.arange(total) - np.repeat(np.cumsum(npx) - npx, npx)
        px = data[np.repeat(starts, npx) + within].astype(np.float64)
        key = np.repeat(np.arange(n, dtype=np.int64), npx) * 3 + within % 3
        sums = np.bincount(key, weights=px, minlength=3 * n).reshape(n, 3)
        sumsq = np.bincount(key, weights=px * px,
                            minlength=3 * n).reshape(n, 3)
        cnt = (npx // 3).astype(np.float64)[:, None]
        means = sums / cnt
        var = sumsq / cnt - means ** 2
        luma = 0.299 * means[:, 0] + 0.587 * means[:, 1] + 0.114 * means[:, 2]
        contrast = np.sqrt(np.maximum(var, 0.0).mean(axis=1))
    else:
        means = np.zeros((n, 3))
        luma = np.zeros(n)
        contrast = np.zeros(n)
    out = batch.drop_columns(["payload"])
    out = out.append_column("mean_r", pa.array(means[:, 0]))
    out = out.append_column("mean_g", pa.array(means[:, 1]))
    out = out.append_column("mean_b", pa.array(means[:, 2]))
    out = out.append_column("luma", pa.array(luma))
    return out.append_column("contrast", pa.array(contrast))


def decode_ppm(ds, concurrency=None, batch_size: int = 512):
    """Distributed real-image decode (P6): stateless elastic tasks by
    default; pass ``concurrency`` to cap parallel decode tasks (fat
    payload batches x concurrency must fit the worker heap)."""
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return ds.map_batches(decode_ppm_stats, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          **kwargs)


def _gradient_pixels(doc_id: np.ndarray, w: int, h: int) -> np.ndarray:
    """The shared deterministic doc_id-seeded RGB raster — ONE pixel
    formula for every container format (PPM and PNG carry identical
    rasters, so the SQL oracle that re-derives these pixels is
    container-agnostic)."""
    n = len(doc_id)
    yy = np.arange(h, dtype=np.int64)[None, :, None]
    xx = np.arange(w, dtype=np.int64)[None, None, :]
    did = doc_id[:, None, None]
    px = np.empty((n, h, w, 3), dtype=np.uint8)
    px[..., 0] = (did * 31 + xx * 8) % 256          # R: x gradient
    px[..., 1] = (did * 17 + yy * 11) % 256         # G: y gradient
    px[..., 2] = (did * 7 + xx * 3 + yy * 5) % 256  # B: diagonal
    return px


def _png_encode_rgb(raster: np.ndarray) -> bytes:
    """One 8-bit RGB (color type 2) non-interlaced PNG from an (h, w,
    3) uint8 raster — stdlib zlib only.  Scanlines use filter 0; the
    DECODER handles all five filter types."""
    import struct
    import zlib

    h, w, _ = raster.shape

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), raster.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(scan.tobytes(), 6)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def _png_decode_rgb(payload: bytes) -> np.ndarray:
    """Real PNG decode, stdlib only: signature + chunk walk -> IHDR
    (8-bit RGB, non-interlaced) -> concatenated IDAT zlib stream ->
    scanline de-filtering (all five PNG filter types).  Returns (h, w,
    3) uint8.  Per-payload by nature (zlib streams don't vectorize
    across rows); callers bound memory with small batch_size."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if (depth, color, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit RGB non-interlaced PNG is supported "
                    f"(got depth={depth} color={color} interlace={inter})")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * 3
    raw = raw[: h * stride].reshape(h, stride)
    ftypes, scans = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, w * 3), np.uint8)
    bpp = 3
    for r in range(h):
        f, line = int(ftypes[r]), scans[r]
        prior = out[r - 1] if r else np.zeros(w * 3, np.uint8)
        if f == 0:
            out[r] = line
        elif f == 2:  # up
            out[r] = line + prior
        elif f == 1:  # sub: cumsum per byte lane (uint8 wraps mod 256)
            lanes = line.reshape(w, bpp)
            out[r] = np.add.accumulate(lanes, axis=0, dtype=np.uint8).ravel()
        else:  # average / Paeth need the left neighbor sequentially
            row = out[r]
            for x in range(w * 3):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                if f == 3:
                    row[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                else:  # Paeth
                    c = int(prior[x - bpp]) if x >= bpp else 0
                    pp = a + b - c
                    pa_, pb_, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                    row[x] = (int(line[x]) + pred) & 0xFF
    return out.reshape(h, w, 3)


def synth_png_media(sf_dir: str, w: int = 32, h: int = 24):
    """REAL PNG image payloads (stdlib zlib): same deterministic
    gradient raster as :func:`synth_ppm_media`, different container —
    exercises a real compressed-codec decode path."""

    def make(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(doc_id)
        px = _gradient_pixels(doc_id, w, h)
        payloads = [_png_encode_rgb(px[i]) for i in range(n)]  # zlib is per-stream
        payload = pa.array(payloads, pa.binary())
        n_bytes = np.asarray([len(b) for b in payloads], np.int64)
        return _media_table(doc_id, "image", payload, n_bytes, w, h)

    return _docs_media(sf_dir, make)


def synth_image_media(sf_dir: str, w: int = 32, h: int = 24):
    """Mixed-container image table: even doc_ids as raw PPM, odd as
    zlib-compressed PNG — SAME raster either way, so downstream stats
    (and the SQL pixel oracle) are container-independent."""

    header = f"P6\n{w} {h}\n255\n".encode()

    def make(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(doc_id)
        px = _gradient_pixels(doc_id, w, h)
        payloads = [
            _png_encode_rgb(px[i]) if doc_id[i] % 2 else
            header + px[i].tobytes()
            for i in range(n)
        ]
        payload = pa.array(payloads, pa.binary())
        n_bytes = np.asarray([len(b) for b in payloads], np.int64)
        return _media_table(doc_id, "image", payload, n_bytes, w, h)

    return _docs_media(sf_dir, make)


def synth_jpeg_media(sf_dir: str, w: int = 32, h: int = 24,
                     quality: int = 95, subsample: bool = False):
    """REAL JPEG image payloads (in-repo baseline T.81 codec,
    :mod:`ocgis_ray.stages.jpeg`): same deterministic gradient raster,
    lossy-compressed — so JPEG rows are pytest-verified (decoded stats
    within codec tolerance of the raster's), NOT oracle rows (a lossy
    stream's pixels are not SQL-derivable)."""
    from ocgis_ray.stages.jpeg import jpeg_encode

    def make(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(doc_id)
        px = _gradient_pixels(doc_id, w, h)
        payloads = [jpeg_encode(px[i], quality=quality, subsample=subsample)
                    for i in range(n)]
        payload = pa.array(payloads, pa.binary())
        n_bytes = np.asarray([len(b) for b in payloads], np.int64)
        return _media_table(doc_id, "image", payload, n_bytes, w, h)

    return _docs_media(sf_dir, make)


def _pixel_stats(px: np.ndarray):
    """(mean_rgb(3,), luma, contrast) from an (h, w, 3) uint8 raster —
    shared by the PPM tail path and the PNG decode path so mixed
    tables emit identical statistics columns."""
    f = px.reshape(-1, 3).astype(np.float64)
    means = f.mean(axis=0)
    var = (f * f).mean(axis=0) - means ** 2
    luma = 0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2]
    return means, luma, float(np.sqrt(np.maximum(var, 0.0).mean()))


def _codec_stats(batch: pa.Table, data: np.ndarray, off: np.ndarray,
                 decode) -> pa.Table:
    """Per-payload codec decode (PNG zlib / JPEG entropy streams don't
    vectorize across rows) -> the shared stats columns."""
    n = batch.num_rows
    means = np.zeros((n, 3))
    luma = np.zeros(n)
    contrast = np.zeros(n)
    for i in range(n):
        px = decode(data[off[i]:off[i + 1]].tobytes())
        means[i], luma[i], contrast[i] = _pixel_stats(px)
    out = batch.drop_columns(["payload"])
    out = out.append_column("mean_r", pa.array(means[:, 0]))
    out = out.append_column("mean_g", pa.array(means[:, 1]))
    out = out.append_column("mean_b", pa.array(means[:, 2]))
    out = out.append_column("luma", pa.array(luma))
    return out.append_column("contrast", pa.array(contrast))


def decode_image_stats(batch: pa.Table) -> pa.Table:
    """Format-dispatching REAL image decode: P6/PPM rows take the
    vectorized tail path (:func:`decode_ppm_stats`), PNG rows the
    stdlib zlib chunk decode, JPEG rows the in-repo baseline T.81
    decoder (:mod:`ocgis_ray.stages.jpeg`) — one mixed batch in, one
    stats table out in the original row order."""
    from ocgis_ray.stages.jpeg import jpeg_decode

    data, off = _binary_view(batch["payload"])
    n = batch.num_rows
    if n == 0 or not len(data):
        return decode_ppm_stats(batch)
    head = _first_bytes(data, off, 2)
    lens = off[1:] - off[:-1]
    is_png = (lens >= 8) & (head[:, 0] == 0x89)
    is_jpg = (lens >= 4) & (head[:, 0] == 0xFF) & (head[:, 1] == 0xD8)
    if not is_png.any() and not is_jpg.any():
        return decode_ppm_stats(batch)
    if is_png.all():
        return _codec_stats(batch, data, off, _png_decode_rgb)
    if is_jpg.all():
        return _codec_stats(batch, data, off, jpeg_decode)
    idx = np.arange(n, dtype=np.int64)
    is_ppm = ~(is_png | is_jpg)
    parts = []
    for mask in (is_png, is_jpg, is_ppm):
        if mask.any():
            sub = batch.take(pa.array(idx[mask]))
            parts.append(decode_ppm_stats(sub) if mask is is_ppm
                         else decode_image_stats(sub))
    both = pa.concat_tables(parts)
    # restore the original row order
    src = np.concatenate([idx[m] for m in (is_png, is_jpg, is_ppm)
                          if m.any()])
    return both.take(pa.array(np.argsort(src, kind="stable")))


def decode_images(ds, concurrency=None, batch_size: int = 512):
    """Distributed mixed-format image decode (PPM + PNG)."""
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return ds.map_batches(decode_image_stats, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          **kwargs)


def synth_wav_media(sf_dir: str, n_samples: int = 2048,
                    rate: int = 8000):
    """REAL audio payloads: 16-bit mono PCM WAV (RIFF) — decodable
    with pure numpy.  Deterministic doc_id-seeded sine+harmonic
    waveforms, vectorized assembly like :func:`synth_ppm_media`."""

    data_len = n_samples * 2

    def _header(n: int) -> np.ndarray:
        import struct

        hdr = struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + data_len, b"WAVE",
            b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16, b"data", data_len)
        return np.frombuffer(hdr, dtype=np.uint8)

    def make(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(doc_id)
        t = np.arange(n_samples, dtype=np.float64)[None, :]
        f0 = 100.0 + (doc_id % 50)[:, None] * 7.0
        wave = (0.6 * np.sin(2 * np.pi * f0 * t / rate)
                + 0.3 * np.sin(2 * np.pi * 2 * f0 * t / rate))
        pcm = np.round(wave * 32767.0 * 0.5).astype("<i2")
        hdr = _header(n)
        flat = np.concatenate(
            [np.broadcast_to(hdr, (n, len(hdr))),
             pcm.view(np.uint8).reshape(n, -1)], axis=1).reshape(-1)
        row_len = len(hdr) + data_len
        off = (np.arange(n + 1, dtype=np.int32) * row_len)
        payload = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(off.tobytes()),
             pa.py_buffer(flat.tobytes())])
        return _media_table(doc_id, "audio", payload, row_len, rate,
                            n_samples)

    return _docs_media(sf_dir, make)


def decode_wav_stats(batch: pa.Table) -> pa.Table:
    """REAL PCM decode: validate RIFF/WAVE magic, take the payload
    tail as ``meta_h`` little-endian int16 samples, compute RMS,
    peak and zero-crossing RATE per row — one gathered byte view,
    bincount per-row sums, no per-row Python."""
    data, off = _binary_view(batch["payload"])
    n = batch.num_rows
    ns = batch["meta_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    nbytes = ns * 2
    L = off[1:] - off[:-1]
    if n and (L < nbytes + 44).any():  # 44 = minimal RIFF/fmt/data header
        raise ValueError("payload shorter than meta_h PCM16 samples")
    if n and len(data):
        s0 = off[:-1]
        fb = _first_bytes(data, off, 10)
        if not ((fb[:, 0] == ord("R")) & (fb[:, 1] == ord("I"))
                & (fb[:, 8] == ord("W")) & (fb[:, 9] == ord("A"))).all():
            raise ValueError("not a RIFF/WAVE payload")
        starts = off[1:] - nbytes
        total = int(nbytes.sum())
        within = np.arange(total) - np.repeat(
            np.cumsum(nbytes) - nbytes, nbytes)
        raw = data[np.repeat(starts, nbytes) + within]
        samples = raw.view("<i2").astype(np.float64)
        row = np.repeat(np.arange(n, dtype=np.int64), ns)
        sumsq = np.bincount(row, weights=samples * samples, minlength=n)
        rms = np.sqrt(sumsq / ns)
        peak = np.zeros(n)
        np.maximum.at(peak, row, np.abs(samples))
        sgn = samples >= 0
        cross = (sgn[1:] != sgn[:-1]) & (row[1:] == row[:-1])
        zcr = np.bincount(row[1:][cross], minlength=n) / np.maximum(ns - 1, 1)
    else:
        rms = np.zeros(n)
        peak = np.zeros(n)
        zcr = np.zeros(n)
    out = batch.drop_columns(["payload"])
    out = out.append_column("rms", pa.array(rms))
    out = out.append_column("peak", pa.array(peak))
    return out.append_column("zcr", pa.array(zcr))


def decode_wav(ds, concurrency=None, batch_size: int = 512):
    """Distributed real-audio decode (PCM WAV); ``concurrency`` caps
    parallel decode tasks (see :func:`decode_ppm`)."""
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return ds.map_batches(decode_wav_stats, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          **kwargs)


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    ``fake=True``: deterministic 16-dim feature from payload byte
    statistics (pure function — resume-safe).  ``fake=False`` raises
    ``NotImplementedError`` — a real deployment plugs ffmpeg here for
    the remaining CODEC bitstreams (H.264/H.265); every other modality
    has a REAL path (:func:`decode_images` for PPM/PNG/JPEG,
    :func:`decode_wav` for PCM, AVI/MJPEG video via
    :mod:`ocgis_ray.stages.avi` and MP4/MJPEG via
    :mod:`ocgis_ray.stages.mp4` + the in-repo T.81 codec); only
    ``__init__`` (model/codec load) and ``__call__`` (batch decode)
    change, the pipeline shape does not."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real H.264/H.265 bitstream decoding requires ffmpeg, "
                "absent in this container; image (PPM/PNG/JPEG), WAV, "
                "AVI/MJPEG (stages/avi.py) and MP4/MJPEG (stages/mp4.py) "
                "payloads have real decode paths"
            )
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized fake decode: per-row chunk means over the payload
        # buffer via one byte-cumsum + np.array_split-equivalent edge
        # math (no per-row Python, no payload copies)
        data, off = _binary_view(batch["payload"])
        n = batch.num_rows
        feats = np.zeros((n, self.FEATURE_DIM), dtype=np.float64)
        if len(data) and n:
            cums = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(data, out=cums[1:])
            L = np.minimum(off[1:] - off[:-1], 4096)  # first 4096 bytes
            d = self.FEATURE_DIM
            i = np.arange(d + 1)
            # np.array_split edges: first L%d chunks get ceil(L/d)
            edges = (i[None, :] * (L // d)[:, None]
                     + np.minimum(i[None, :], (L % d)[:, None]))
            abs_edges = off[:-1][:, None] + edges
            sums = cums[abs_edges[:, 1:]] - cums[abs_edges[:, :-1]]
            lens = edges[:, 1:] - edges[:, :-1]
            with np.errstate(invalid="ignore", divide="ignore"):
                feats = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
        out = batch.drop_columns(["payload"])  # fat column dies here
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.astype(np.float32).ravel()), self.FEATURE_DIM
            ),
        )


def decode_features(ds, concurrency=None, batch_size: int = 512,
                    fake: bool = True):
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        MediaDecoder, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"fake": fake},
    )


def synth_ppm_video(sf_dir: str, w: int = 16, h: int = 12,
                    n_frames: int = 6):
    """REAL video payloads: a concatenated-PPM stream (motion-PPM —
    every frame is a complete P6 image; the concatenation IS the
    container, like MJPEG is concatenated JPEGs).  Frame f of doc d
    carries the deterministic gradient of seed ``d * 131 + f`` so each
    sampled frame's pixel statistics are closed-form checkable."""
    header = f"P6\n{w} {h}\n255\n".encode()
    frame_len = len(header) + w * h * 3

    def make(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(doc_id)
        # (n, n_frames, h, w, 3) via the shared gradient on per-frame seeds
        seeds = (doc_id[:, None] * 131
                 + np.arange(n_frames, dtype=np.int64)[None, :]).ravel()
        px = _gradient_pixels(seeds, w, h).reshape(n, n_frames, h, w, 3)
        hdr = np.frombuffer(header, dtype=np.uint8)
        frames = np.concatenate(
            [np.broadcast_to(hdr, (n, n_frames, len(hdr))),
             px.reshape(n, n_frames, -1)], axis=2)
        flat = frames.reshape(-1)
        row_len = n_frames * frame_len
        off = (np.arange(n + 1, dtype=np.int32) * row_len)
        payload = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(off.tobytes()),
             pa.py_buffer(flat.tobytes())])
        return _media_table(doc_id, "video", payload, row_len, w, h)

    return _docs_media(sf_dir, make)


def sample_ppm_frames_batch(batch: pa.Table, n_sample: int = 3) -> pa.Table:
    """REAL frame sampling from motion-PPM payloads: parse the stream
    (P6 magic + dimensions from the first header — validated on every
    sampled frame boundary), pick ``n_sample`` evenly spaced frames,
    and emit each as a COMPLETE standalone PPM row decodable by
    :func:`decode_ppm_stats`.  One vectorized gather; no per-row
    Python."""
    data, off = _binary_view(batch["payload"])
    ids = batch["media_id"].to_numpy(zero_copy_only=False)
    w = batch["meta_w"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["meta_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = batch.num_rows
    if n == 0 or not len(data):
        return pa.table({
            "media_id": pa.array([], pa.int64()),
            "frame_idx": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "payload": pa.array([], pa.binary()),
            "n_bytes": pa.array([], pa.int64()),
            "meta_w": pa.array([], pa.int64()),
            "meta_h": pa.array([], pa.int64()),
        })
    if not ((w == w[0]) & (h == h[0])).all():
        raise ValueError("sample_ppm_frames expects uniform frame dims "
                         "per batch (repartition by dims upstream)")
    header = f"P6\n{int(w[0])} {int(h[0])}\n255\n".encode()
    frame_len = len(header) + int(w[0]) * int(h[0]) * 3
    L = off[1:] - off[:-1]
    if (L % frame_len != 0).any() or (L == 0).any():
        raise ValueError("payload is not a whole number of PPM frames")
    n_frames = L // frame_len
    k = np.minimum(n_sample, n_frames)
    # evenly spaced frame indices per row: floor(i * nf / k)
    total = int(k.sum())
    row = np.repeat(np.arange(n, dtype=np.int64), k)
    within = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(k) - k, k)
    fidx = within * n_frames[row] // k[row]
    starts = off[:-1][row] + fidx * frame_len
    # validate every sampled boundary is a P6 header (stream integrity)
    if not ((data[starts] == ord("P")) & (data[starts + 1] == ord("6"))).all():
        raise ValueError("frame boundary does not start with a P6 header")
    gwithin = np.arange(total * frame_len, dtype=np.int64) % frame_len
    gathered = data[np.repeat(starts, frame_len) + gwithin]
    out_off = (np.arange(total + 1, dtype=np.int32) * frame_len)
    frame_arr = pa.BinaryArray.from_buffers(
        pa.binary(), total,
        [None, pa.py_buffer(out_off.tobytes()),
         pa.py_buffer(gathered.tobytes())])
    return pa.table({
        "media_id": pa.array(ids[row]),
        "frame_idx": pa.array(fidx),
        "kind": pa.array(np.full(total, "image", dtype=object)),
        "payload": frame_arr,
        "n_bytes": pa.array(np.full(total, frame_len, dtype=np.int64)),
        "meta_w": pa.array(w[row]),
        "meta_h": pa.array(h[row]),
    })


def sample_ppm_frames(ds, n_sample: int = 3, batch_size: int = 256):
    """Distributed REAL frame sampling (motion-PPM): video rows ->
    ``n_sample`` decodable image rows each — chain with
    :func:`decode_ppm` for per-frame features.  Small batches: each
    input row fans out n_sample full frames."""
    return ds.map_batches(
        lambda b: sample_ppm_frames_batch(b, n_sample),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)


class FrameSampler:
    """video -> frame rows (flat expansion): every media row emits
    ``n_frames`` rows with a deterministic byte-slice 'frame'.  Real
    frame decode would replace ``_slice``; the fan-out plumbing and
    small-batch discipline are the tested part."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        if not fake:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        self.n_frames = n_frames

    def _slice(self, payload: bytes, i: int) -> bytes:
        if not payload:
            return b""
        step = max(1, len(payload) // self.n_frames)
        return payload[i * step : i * step + min(step, 256)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized flat fan-out: frame byte ranges computed as arrays,
        # output binary column assembled with one gather (segment-
        # arange) — no per-row Python, no payload round-trips
        data, off = _binary_view(batch["payload"])
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        nf = self.n_frames
        L = (off[1:] - off[:-1]).astype(np.int64)
        step = np.maximum(1, L // nf)
        fi = np.tile(np.arange(nf, dtype=np.int64), n)
        mid = np.repeat(ids, nf)
        starts = np.repeat(off[:-1], nf) + np.repeat(step, nf) * fi
        lens = np.minimum(np.repeat(step, nf), 256)
        # clamp to the row's payload end (empty payloads -> 0 bytes)
        row_end = np.repeat(off[1:], nf)
        lens = np.maximum(np.minimum(row_end - starts, lens), 0)
        total = int(lens.sum())
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        gathered = data[np.repeat(starts, lens) + within] if total else \
            np.empty(0, np.uint8)
        out_off = np.zeros(len(lens) + 1, dtype=np.int32)
        np.cumsum(lens, out=out_off[1:])
        frame_arr = pa.BinaryArray.from_buffers(
            pa.binary(), len(lens),
            [None, pa.py_buffer(out_off.tobytes()),
             pa.py_buffer(gathered.tobytes())],
        )
        return pa.table({
            "media_id": pa.array(mid),
            "frame_idx": pa.array(fi),
            "frame": frame_arr,
        })


def sample_frames(ds, n_frames: int = 4, concurrency=None,
                  batch_size: int = 256):
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"n_frames": n_frames},
    )


# ----------------------------------------------------- perceptual hash

_PHASH_N = 32  # DCT input side (hash_size 8 x highfreq_factor 4)
_DCT32: np.ndarray | None = None


def _dct_matrix(n: int = _PHASH_N) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, 'ortho' norm) — cached; the
    2-D DCT of G is then ``C @ G @ C.T`` (two 32x32 matmuls)."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        c = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        c[0] /= np.sqrt(2.0)
        _DCT32 = c
    return _DCT32


def _resize_area(g: np.ndarray, out_n: int = _PHASH_N) -> np.ndarray:
    """Deterministic resize to (out_n, out_n): nearest-neighbor
    upsample on any axis smaller than ``out_n``, then integer-edge
    area-mean binning (``reduceat``-free integral image) — no
    interpolation-library dependence, bit-stable across platforms."""
    h, w = g.shape
    if h < out_n:
        g = g[(np.arange(out_n, dtype=np.int64) * h) // out_n]
        h = out_n
    if w < out_n:
        g = g[:, (np.arange(out_n, dtype=np.int64) * w) // out_n]
        w = out_n
    ri = (np.arange(out_n + 1, dtype=np.int64) * h) // out_n
    ci = (np.arange(out_n + 1, dtype=np.int64) * w) // out_n
    integ = np.zeros((h + 1, w + 1))
    np.cumsum(np.cumsum(g, axis=0), axis=1, out=integ[1:, 1:])
    blk = (integ[ri[1:], :][:, ci[1:]] - integ[ri[:-1], :][:, ci[1:]]
           - integ[ri[1:], :][:, ci[:-1]] + integ[ri[:-1], :][:, ci[:-1]])
    area = (ri[1:] - ri[:-1])[:, None] * (ci[1:] - ci[:-1])[None, :]
    return blk / area


def _phash64(px: np.ndarray, hash_size: int = 8) -> np.uint64:
    """64-bit perceptual hash of an (h, w, 3) uint8 raster — the
    imagehash ``phash`` recipe: luma (BT.601) -> 32x32 area resize ->
    2-D DCT-II -> top-left ``hash_size`` x ``hash_size`` low-frequency
    block -> bit per coefficient > block median (DC included in the
    median, per the reference implementation).  Robust to brightness
    shifts, mild noise and re-encoding (JPEG), which is what makes it
    the image near-dup key."""
    f = px.astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    c = _dct_matrix()
    d = c @ _resize_area(luma) @ c.T
    low = d[:hash_size, :hash_size]
    bits = (low > np.median(low)).ravel()
    return np.uint64(np.packbits(bits).view(">u8")[0])


def _decode_raster(payload: bytes, w: int, h: int) -> np.ndarray:
    """Per-payload raster decode with the same format dispatch as
    :func:`decode_image_stats` (PPM tail / PNG / in-repo JPEG)."""
    from ocgis_ray.stages.jpeg import jpeg_decode

    if payload[:1] == b"\x89":
        return _png_decode_rgb(payload)
    if payload[:2] == b"\xff\xd8":
        return jpeg_decode(payload)
    if payload[:2] != b"P6":
        raise ValueError("unknown image payload (want PPM/PNG/JPEG)")
    npx = w * h * 3
    tail = np.frombuffer(payload, dtype=np.uint8)[-npx:]
    return tail.reshape(h, w, 3)


def phash_batch(batch: pa.Table, id_col: str = "media_id") -> pa.Table:
    """(id, payload, meta_w, meta_h) -> (id, phash int64).  Codec
    entropy streams don't vectorize across rows, so the decode is the
    per-row loop every real pipeline pays; the DCT/resize math inside
    is pure numpy."""
    data, off = _binary_view(batch["payload"])
    w = batch["meta_w"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["meta_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = batch.num_rows
    out = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        px = _decode_raster(data[off[i]:off[i + 1]].tobytes(),
                            int(w[i]), int(h[i]))
        out[i] = _phash64(px)
    return pa.table({id_col: batch[id_col],
                     "phash": pa.array(out.astype(np.int64))})


def phash_images(ds, id_col: str = "media_id", concurrency=None,
                 batch_size: int = 512):
    """Distributed perceptual-hash stage over a mixed PPM/PNG/JPEG
    media table — emits the slim (id, phash) signature table that
    :func:`phash_near_duplicates` pairs up."""
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        lambda b: phash_batch(b, id_col=id_col), batch_format="pyarrow",
        zero_copy_batch=True, concurrency=concurrency,
        batch_size=batch_size)


def phash_near_duplicates(sig_ds, max_hamming: int = 8,
                          id_col: str = "media_id"):
    """Image near-dup pairs within ``max_hamming`` bits — delegates to
    the text SimHash pairing machinery (pigeonhole banding over
    ``max_hamming + 1`` bands, bucketed shuffle, in-bucket exact
    popcount): a 64-bit signature is a 64-bit signature.  Returns
    (``<id>_a``, ``<id>_b``, hamming)."""
    from ocgis_ray.stages.dedup import simhash_near_duplicates

    def to_sig(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t[id_col], "simhash": t["phash"]})

    pairs = simhash_near_duplicates(
        sig_ds.map_batches(to_sig, batch_format="pyarrow",
                           zero_copy_batch=True),
        max_hamming=max_hamming)

    # rename through an Arrow map: the pair table arrives as pandas
    # blocks (map_groups output) where Dataset.rename_columns fails
    def rename(t: pa.Table) -> pa.Table:
        return pa.table({f"{id_col}_a": t["doc_a"],
                         f"{id_col}_b": t["doc_b"],
                         "hamming": t["hamming"]})

    return pairs.map_batches(rename, batch_format="pyarrow")


def video_near_duplicates(ds, container: str = "ppm", n_sample: int = 3,
                          max_hamming: int = 8, min_matching_frames: int = 2,
                          id_col: str = "media_id",
                          frame_stride: int = 1 << 20,
                          batch_size: int = 128, concurrency=None):
    """Video near-dup pairs by sampled-frame pHash consensus.

    Composition over the existing REAL paths — reference analog is the
    image near-dup generalized along the time axis (same role
    ``phash_near_duplicates`` plays for stills): sample ``n_sample``
    evenly spaced frames per video (motion-PPM stream walk or
    AVI/MJPEG chunk walk, per ``container``), pHash every sampled
    frame, pair FRAMES within ``max_hamming`` bits via the pigeonhole-
    banded SimHash machinery, then roll frame pairs up to video pairs
    keeping those with at least ``min_matching_frames`` matching
    sampled-frame pairs (consensus kills single-frame coincidences —
    e.g. two different videos sharing a black frame).

    Returns (``<id>_a``, ``<id>_b``, ``n_frames_matched``,
    ``min_hamming``) with ``<id>_a < <id>_b``.

    Scale design: the fat video payloads are touched exactly ONCE —
    frame sampling and pHash fuse into a single streaming map that
    emits the slim (frame_key, phash) signature table; every stage
    that shuffles afterwards (banding, candidate pairing, the video-
    pair rollup) moves 16-byte rows.  ``frame_stride`` packs
    (video, frame) into one int64 key — frame indices must stay below
    it (raises otherwise), and ``media_id * frame_stride`` must fit
    int64 (media_id < 2^43 at the default stride).
    """
    from ocgis_ray.stages.avi import sample_avi_frames_batch
    from ocgis_ray.stages.dedup import simhash_near_duplicates
    from ocgis_ray.stages.mp4 import sample_mp4_frames_batch
    from ocgis_ray.stages.tiles import grouped_aggregate
    from ocgis_ray.tuning import auto_pool

    samplers = {"ppm": sample_ppm_frames_batch,
                "avi": sample_avi_frames_batch,
                "mp4": sample_mp4_frames_batch}
    if container not in samplers:
        raise ValueError("container must be 'ppm' (motion-PPM), "
                         "'avi' (AVI/MJPEG) or 'mp4' (ISO BMFF MJPEG)")
    sampler = samplers[container]
    concurrency = auto_pool() if concurrency is None else concurrency

    def frame_signatures(batch: pa.Table) -> pa.Table:
        if id_col != "media_id":
            batch = batch.rename_columns(
                ["media_id" if c == id_col else c
                 for c in batch.column_names])
        frames = sampler(batch, n_sample)
        fidx = frames["frame_idx"].to_numpy(zero_copy_only=False)
        if len(fidx) and fidx.max() >= frame_stride:
            raise ValueError(
                f"frame_idx {int(fidx.max())} >= frame_stride "
                f"{frame_stride}; raise frame_stride")
        mid = frames["media_id"].to_numpy(zero_copy_only=False)
        sig = phash_batch(frames)
        return pa.table({
            "doc_id": pa.array(mid * frame_stride + fidx),
            "simhash": sig["phash"],
        })

    sigs = ds.map_batches(frame_signatures, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency)
    frame_pairs = simhash_near_duplicates(sigs, max_hamming=max_hamming)

    def to_video_pairs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False) // frame_stride
        b = t["doc_b"].to_numpy(zero_copy_only=False) // frame_stride
        ham = t["hamming"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi  # frame pairs inside one video are not dups
        return pa.table({f"{id_col}_a": pa.array(lo[m]),
                         f"{id_col}_b": pa.array(hi[m]),
                         "hamming": pa.array(ham[m])})

    vid_pairs = frame_pairs.map_batches(to_video_pairs,
                                        batch_format="pyarrow")
    rolled = grouped_aggregate(
        vid_pairs, [f"{id_col}_a", f"{id_col}_b"],
        {"n_frames_matched": ("hamming", "count"),
         "min_hamming": ("hamming", "min")})

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t["n_frames_matched"],
                                         min_matching_frames))

    return rolled.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------- audio fingerprint (HK)

def _wav_pcm(data: np.ndarray, off_lo: int, off_hi: int,
             n_samples: int) -> np.ndarray:
    """One payload's PCM16 samples as float64 (the RIFF tail contract
    :func:`decode_wav_stats` validates)."""
    nbytes = n_samples * 2
    if nbytes <= 0 or off_hi - off_lo < nbytes:
        return np.zeros(0, np.float64)
    raw = data[off_hi - nbytes: off_hi]
    return np.frombuffer(raw.tobytes(), dtype="<i2").astype(np.float64)


def hk_subfingerprints(samples: np.ndarray, rate: int,
                       frame: int = 2048, hop: int = 1024,
                       nbands: int = 65, f_lo: float = 300.0,
                       f_hi: float = 3000.0) -> np.ndarray:
    """Haitsma-Kalker (2002) audio sub-fingerprints, 64 bits/frame.

    Hann-windowed frames -> power spectrum -> ``nbands`` log-spaced
    bands in [f_lo, f_hi] -> bit(b, t) = sign of the band-energy
    difference's TIME difference: ``(E[t,b]-E[t,b+1]) -
    (E[t-1,b]-E[t-1,b+1]) > 0``.  Energy-ratio signs are invariant to
    volume scaling and robust to coding noise — the property the
    original paper exploits for 3-second clip lookup.  Returns uint64
    sub-fingerprints, one per frame after the first (vectorized across
    all frames; the FFT is the only O(n log n) step)."""
    n = len(samples)
    # degenerate metadata guard: a corrupt/hostile WAV header can
    # claim rate<=0 (ZeroDivisionError in rfftfreq) or a Nyquist below
    # f_lo (geomspace would emit DECREASING edges -> non-monotonic
    # reduceat indices -> garbage bits). No usable band range -> no
    # fingerprints, matching the too-short-clip contract.
    if rate <= 0 or rate <= 2.0 * f_lo or n < 2 * frame:
        # <= 2*f_lo: at exactly 2*f_lo the Nyquist EQUALS f_lo, the
        # geomspace edges all collapse onto one frequency and every
        # clip produces the same all-zero-difference "fingerprint"
        return np.zeros(0, dtype=np.uint64)
    n_frames = 1 + (n - frame) // hop
    idx = (np.arange(frame)[None, :]
           + (np.arange(n_frames) * hop)[:, None])
    win = samples[idx] * np.hanning(frame)[None, :]
    spec = np.abs(np.fft.rfft(win, axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame, 1.0 / rate)
    f_hi = min(f_hi, rate / 2.0)
    edges = np.geomspace(f_lo, f_hi, nbands + 1)
    band_idx = np.searchsorted(freqs, edges)
    spec[:, band_idx[-1]:] = 0.0  # cut energy above the top band edge
    E = np.add.reduceat(spec, band_idx[:-1], axis=1)
    d = E[:, :-1] - E[:, 1:]          # band differences (nbands-1=64)
    bits = (d[1:] - d[:-1]) > 0       # time difference signs
    packed = np.zeros(bits.shape[0], dtype=np.uint64)
    for b in range(bits.shape[1]):
        packed |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return packed


def audio_fingerprint_batch(batch: pa.Table,
                            id_col: str = "media_id") -> pa.Table:
    """(id, payload PCM WAV, meta_w=rate, meta_h=n_samples) ->
    (id, af_frames list<int64> sub-fingerprints, af_sig int64
    majority-vote clip signature).

    ``af_sig`` is the clip-level 64-bit signature (per-bit majority
    over frames) that rides the pigeonhole SimHash pairing machinery;
    ``af_frames`` is the full HK stream for alignment-level matching
    downstream."""
    data, off = _binary_view(batch["payload"])
    rate = batch["meta_w"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = batch["meta_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = batch.num_rows
    frames: list[np.ndarray] = []
    sig = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        pcm = _wav_pcm(data, int(off[i]), int(off[i + 1]), int(ns[i]))
        fp = hk_subfingerprints(pcm, int(rate[i]))
        frames.append(fp.astype(np.int64))
        if len(fp):
            cols = (fp[:, None] >> np.arange(64, dtype=np.uint64)[None, :]
                    ) & np.uint64(1)
            maj = cols.sum(axis=0) * 2 > len(fp)
            sig[i] = np.bitwise_or.reduce(
                maj.astype(np.uint64) << np.arange(64, dtype=np.uint64))
    return pa.table({
        id_col: batch[id_col],
        "af_frames": pa.array(frames, type=pa.list_(pa.int64())),
        "af_sig": pa.array(sig.astype(np.int64)),
    })


def audio_fingerprints(ds, id_col: str = "media_id", concurrency=None,
                       batch_size: int = 256):
    """Distributed HK fingerprint stage over an audio media table."""
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        lambda b: audio_fingerprint_batch(b, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size)


def audio_near_duplicates(sig_ds, max_hamming: int = 8,
                          id_col: str = "media_id"):
    """Audio near-dup pairs within ``max_hamming`` signature bits —
    the same pigeonhole-banded pairing :func:`phash_near_duplicates`
    rides (a 64-bit signature is a 64-bit signature)."""
    from ocgis_ray.stages.dedup import simhash_near_duplicates

    def to_sig(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t[id_col], "simhash": t["af_sig"]})

    pairs = simhash_near_duplicates(
        sig_ds.map_batches(to_sig, batch_format="pyarrow",
                           zero_copy_batch=True),
        max_hamming=max_hamming)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({f"{id_col}_a": t["doc_a"],
                         f"{id_col}_b": t["doc_b"],
                         "hamming": t["hamming"]})

    return pairs.map_batches(rename, batch_format="pyarrow")
