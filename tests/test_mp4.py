"""MP4/ISO-BMFF MJPEG container (stages/mp4.py): real compressed video
through the in-repo T.81 codec — box-tree round-trip, general stsc/
co64/largesize parsing, honest H.264 stub, Dataset-level frame
sampling, and decode through the existing real image path."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from ocgis_ray.stages.jpeg import jpeg_decode, jpeg_encode
from ocgis_ray.stages.mp4 import (mp4_mjpeg_encode, mp4_mjpeg_frames,
                                  mp4_sample_table, sample_mp4_frames,
                                  synth_mp4_video)


def _frames(n=5, w=16, h=12, seed=0):
    rng = np.random.RandomState(seed)
    px = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
          for _ in range(n)]
    return px, [jpeg_encode(p, quality=90) for p in px]


def test_container_roundtrip_and_validation():
    px, frames = _frames()
    mp4 = mp4_mjpeg_encode(frames, 16, 12)
    assert mp4[4:8] == b"ftyp"
    codec, samples, w, h = mp4_sample_table(mp4)
    assert (codec, w, h) == (b"jpeg", 16, 12)
    assert len(samples) == len(frames)
    assert mp4_mjpeg_frames(mp4) == frames
    # deterministic bytes
    assert mp4_mjpeg_encode(frames, 16, 12) == mp4
    # every frame decodes through the real codec
    for f, p in zip(mp4_mjpeg_frames(mp4), px):
        got = jpeg_decode(f)
        assert got.shape == p.shape
        assert abs(got.astype(float).mean() - p.astype(float).mean()) < 3.0
    with pytest.raises(ValueError, match="ISO BMFF"):
        mp4_mjpeg_frames(b"not an mp4 at all")
    with pytest.raises(ValueError, match="no frames"):
        mp4_mjpeg_encode([], 4, 4)
    with pytest.raises(ValueError, match="JPEG"):
        mp4_mjpeg_frames(mp4_mjpeg_encode([b"zzzz"], 4, 4))


def test_h264_codec_is_honest_stub():
    """An avc1-coded track parses at the container level but raises
    NotImplementedError (ffmpeg seam), not a wrong answer."""
    _px, frames = _frames(n=2)
    mp4 = bytearray(mp4_mjpeg_encode(frames, 16, 12))
    i = bytes(mp4).index(b"jpeg", 12)  # the stsd sample-entry fourcc
    mp4[i:i + 4] = b"avc1"
    codec, samples, _w, _h = mp4_sample_table(bytes(mp4))
    assert codec == b"avc1" and len(samples) == 2
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mp4_mjpeg_frames(bytes(mp4))


def test_multi_sample_chunks_and_co64_and_largesize():
    """Hand-built stbl variants the encoder never emits: one chunk
    holding all samples (stsc run expansion), co64 64-bit chunk
    offsets, and a 64-bit largesize mdat header."""
    _px, frames = _frames(n=3)
    ref = mp4_mjpeg_frames(mp4_mjpeg_encode(frames, 16, 12))
    mp4 = bytearray(mp4_mjpeg_encode(frames, 16, 12))
    buf = bytes(mp4)

    # locate the stco box and rewrite it as one-chunk stsc + co64
    i = buf.index(b"stco") - 4
    (stco_size,) = struct.unpack_from(">I", buf, i)
    first_off = struct.unpack_from(">I", buf, i + 16)[0]
    j = buf.index(b"stsc") - 4
    (stsc_size,) = struct.unpack_from(">I", buf, j)
    new_stsc = (struct.pack(">I", 28) + b"stsc" + b"\x00" * 4
                + struct.pack(">IIII", 1, 1, 3, 1))
    new_co64 = (struct.pack(">I", 24) + b"co64" + b"\x00" * 4
                + struct.pack(">IQ", 1, first_off))
    # stsc comes before stco in the encoder's stbl
    out = (buf[:j] + new_stsc + buf[j + stsc_size:i] + new_co64
           + buf[i + stco_size:])
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov all shrink)
    delta = len(out) - len(buf)
    out = bytearray(out)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        k = bytes(out).index(fourcc) - 4
        (sz,) = struct.unpack_from(">I", bytes(out), k)
        struct.pack_into(">I", out, k, sz + delta)
    got_codec, got_samples, _w, _h = mp4_sample_table(bytes(out))
    assert got_codec == b"jpeg"
    assert mp4_mjpeg_frames(bytes(out)) == ref

    # 64-bit largesize on mdat: size field 1 + 8-byte size after fourcc
    buf2 = bytes(mp4)
    m = buf2.index(b"mdat") - 4
    (msz,) = struct.unpack_from(">I", buf2, m)
    big = (struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", msz + 8)
           + buf2[m + 8:m + msz])
    out2 = buf2[:m] + big + buf2[m + msz:]
    # stco offsets shifted by the extra 8 header bytes
    out2 = bytearray(out2)
    i2 = bytes(out2).index(b"stco") - 4
    (cnt,) = struct.unpack_from(">I", bytes(out2), i2 + 12)
    for s in range(cnt):
        (o,) = struct.unpack_from(">I", bytes(out2), i2 + 16 + 4 * s)
        struct.pack_into(">I", out2, i2 + 16 + 4 * s, o + 8)
    assert mp4_mjpeg_frames(bytes(out2)) == ref


def test_mp4_video_pipeline(ray_session):
    """synth -> sample -> REAL decode: sampled frames carry the
    per-frame gradient (JPEG-lossy but mean within tolerance), flow
    through decode_image_stats' JPEG path, and match the AVI fixture
    pixels (same seeds, container-independent)."""
    from ocgis_ray.stages.multimodal import (_gradient_pixels,
                                             decode_image_stats)

    vids = synth_mp4_video("/root/testdata/sf0.001", w=16, h=12,
                           n_frames=4).limit(6)
    frames = sample_mp4_frames(vids, n_sample=2).materialize()
    fdf = frames.to_pandas()
    assert len(fdf) == 12  # 6 videos x 2 sampled frames
    assert sorted(fdf["frame_idx"].unique()) == [0, 2]
    assert (fdf["kind"] == "image").all()

    stats = decode_image_stats(
        frames.take_batch(12, batch_format="pyarrow")).to_pandas()
    stats = stats.sort_values(["media_id", "frame_idx"],
                              ignore_index=True)
    fdf = fdf.sort_values(["media_id", "frame_idx"], ignore_index=True)
    src = _gradient_pixels(
        (fdf["media_id"].to_numpy(np.int64) * 131
         + fdf["frame_idx"].to_numpy(np.int64)), 16, 12) \
        .reshape(len(fdf), -1, 3).astype(np.float64)
    for ci, c in enumerate(("mean_r", "mean_g", "mean_b")):
        want = src[:, :, ci].mean(axis=1)
        got = stats[c].to_numpy(np.float64)
        assert np.abs(got - want).max() < 3.0, c


def test_video_near_dup_mp4_container(ray_session):
    """video_near_duplicates over the mp4 container finds the planted
    exact-duplicate video and not the distinct ones."""
    import ray

    from ocgis_ray.stages.multimodal import (_gradient_pixels,
                                             video_near_duplicates)

    w, h, nf = 16, 12, 4
    rows_id, rows_pl = [], []
    for d in range(8):
        seed_base = (0 if d == 7 else d) * 131  # 7 duplicates 0
        px = _gradient_pixels(
            seed_base + np.arange(nf, dtype=np.int64), w, h
        ).reshape(nf, h, w, 3)
        frames = [jpeg_encode(px[f], quality=90) for f in range(nf)]
        rows_id.append(d)
        rows_pl.append(mp4_mjpeg_encode(frames, w, h))
    tbl = pa.table({"media_id": pa.array(rows_id, pa.int64()),
                    "payload": pa.array(rows_pl, pa.binary()),
                    "meta_w": pa.array([w] * 8, pa.int64()),
                    "meta_h": pa.array([h] * 8, pa.int64())})
    ds = ray.data.from_arrow(tbl)
    pairs = video_near_duplicates(ds, container="mp4", n_sample=3,
                                  max_hamming=4).to_pandas()
    assert len(pairs) == 1
    assert (int(pairs.media_id_a.iloc[0]),
            int(pairs.media_id_b.iloc[0])) == (0, 7)
